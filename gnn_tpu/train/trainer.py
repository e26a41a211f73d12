"""Training orchestration: the Trainer epoch loop over a TPU mesh.

TPU-native replacement for the reference's `train()` thread body
(`/root/reference/main.py:68-241`):

* The per-iteration recipe matches the reference exactly — forward, masked
  BCE/CE loss (`utils.py:129-140`), backward, per-replica global-norm grad
  clip at 5 (`main.py:146`), cross-replica gradient **sum** (NOT average —
  `main.py:159` sums), Adam step (`main.py:102`).

* The parallelism is a `shard_map` over a 1-D ``data`` mesh instead of
  one Python thread per GPU: stacked minibatches are sharded on their
  leading axis, parameters are replicated, and the gradient exchange is a
  single `lax.psum` over ICI that XLA schedules/overlaps — replacing the
  shared-list + threading.Barrier + peer-to-peer `.to(device)` pulls of
  `main.py:149-168`.

* Input features are gathered on-device from a resident feature source
  (replicated table here; the sharded/placed cache lives in
  `gnn_tpu.parallel.feature_cache`), replacing the host loop at
  `main.py:129-134`.

Round-4 split (zero behavior change): the jitted step builders live in
`gnn_tpu.train.stepfns`, the host->device transports + grouped dispatch
in `gnn_tpu.train.dispatch`, evaluation in `gnn_tpu.train.evalloop`,
and the `--op_timing` probes in `gnn_tpu.train.optiming`; this module
keeps the `Trainer` epoch loop/fit/checkpoint surface. All public names
re-export from here, so `from gnn_tpu.train.trainer import ...` keeps
working.
"""
from __future__ import annotations

import dataclasses
import sys
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from gnn_tpu.parallel.feature_cache import ReplicatedFeatures
from gnn_tpu.parallel.mesh import (make_mesh, put_replicated,
                                   replicated as replicated_sharding)
from gnn_tpu.sampling.ladies import DeviceBatch, to_device_batch
from gnn_tpu.train.dispatch import DispatchMixin
from gnn_tpu.train.evalloop import EvalMixin
from gnn_tpu.train.loss import calc_f1, masked_loss, predict_proba
from gnn_tpu.train.metrics import EpochMetrics
from gnn_tpu.train.optiming import OpTimingMixin
# re-exports (public API lived here before the round-4 split)
from gnn_tpu.train.stepfns import (TrainStepFns, _squeeze_batch,
                                   bind_agg_state, build_step_fns,
                                   clip_by_global_norm, init_stub_adjs,
                                   prepare_adjs)

__all__ = [
    "TrainStepFns", "build_step_fns", "bind_agg_state", "prepare_adjs",
    "init_stub_adjs", "clip_by_global_norm", "EpochMetrics", "Trainer",
    "ReplicatedFeatures",
]


class Trainer(DispatchMixin, OpTimingMixin, EvalMixin):
    """End-to-end trainer mirroring `main.py`'s behavior on a TPU mesh."""

    def __init__(self, net, pipeline, feats: np.ndarray, mesh=None,
                 lr: float = 0.01, sigmoid_loss: bool = True,
                 seed: int = 0, feature_source=None, hot_dense=None,
                 steps_per_dispatch: int = 1, resident_graph=None,
                 resident_parts: int = 0, lr_warmup: int = 0):
        self.net = net
        self.pipeline = pipeline
        self.mesh = mesh if mesh is not None else make_mesh(
            pipeline.world_size)
        self.feature_source = (feature_source if feature_source is not None
                               else ReplicatedFeatures(feats))
        # optional linear lr warmup (``lr_warmup`` optimizer steps,
        # lr/100 -> lr, constant after). Attention models at canonical
        # scale sit near a stability edge at the reference's flat
        # lr=0.01: the first large steps can saturate the softmax into
        # a uniform-prediction fixed point (loss pinned at ln(C));
        # measured on chip round 5 — GAT at flat 0.01 trains at chance,
        # at 0.002 or with warmup it converges. The schedule rides the
        # Adam step count, so multi-step scan dispatch sees it exactly.
        self.optimizer = optax.adam(
            optax.linear_schedule(lr / 100.0, lr, lr_warmup)
            if lr_warmup > 0 else lr)
        # resident_parts > 1: shard the resident-graph state over the
        # mesh's 'part' axis (gnn_tpu.parallel.shardedresident) — for
        # graphs whose slot table / hot blocks exceed one chip's HBM.
        # Batches stay data-parallel over the remaining axes.
        self.part_axis = None
        if resident_parts and resident_parts > 1:
            if resident_graph is None:
                raise ValueError("resident_parts needs resident_graph")
            from gnn_tpu.parallel.multihost import PART_AXIS
            if (PART_AXIS not in self.mesh.axis_names
                    or self.mesh.shape[PART_AXIS] != resident_parts):
                raise ValueError(
                    f"resident_parts={resident_parts} needs a mesh with "
                    f"a '{PART_AXIS}' axis of that size (got "
                    f"{dict(self.mesh.shape)}); use make_hybrid_mesh")
            self.part_axis = PART_AXIS
        self._rep_axes = tuple(a for a in self.mesh.axis_names
                               if a != self.part_axis)
        from jax.sharding import NamedSharding as _NS
        self._batch_sh = _NS(self.mesh, P(self._rep_axes))
        self._gbatch_sh = _NS(self.mesh, P(None, self._rep_axes))
        self.fns = build_step_fns(net, self.optimizer, sigmoid_loss,
                                  self.mesh, self.feature_source,
                                  part_axis=self.part_axis)
        self.sigmoid_loss = sigmoid_loss
        # >1: run this many train steps per dispatch (one H2D + one jitted
        # lax.scan), amortizing per-call host/relay latency
        self.steps_per_dispatch = max(int(steps_per_dispatch), 1)
        # consolidated batch transport (gnn_tpu.parallel.packbuf):
        # "typed" (default) ships one array per dtype (~5 device_put
        # calls instead of ~55, dtype-aware wire encoding preserved,
        # element-aligned device unpack); "blob" ships ONE uint8 buffer
        # (fewest calls but measured slower on this relay's wire
        # encoding); GNN_TPU_PACKED=0 falls back to per-leaf puts.
        import os as _os2
        _pk = _os2.environ.get("GNN_TPU_PACKED", "typed")
        self.packed_transport = {"0": False, "false": False,
                                 "blob": "blob", "1": "blob"}.get(
            _pk.lower(), "typed")
        self._packed_fns = {}
        from gnn_tpu.parallel.packbuf import BufferPool
        # staging-buffer reuse is only safe when device_put COPIES the
        # host buffer (TPU: serialized over the transport during the
        # call). The CPU backend can alias numpy memory zero-copy, so
        # reusing a buffer there would mutate arrays queued
        # computations still read.
        self._buf_pool = BufferPool() if \
            self.mesh.devices.flat[0].platform != "cpu" else None
        # concurrent device_put of the typed pools (GNN_TPU_PAR_PUT=1):
        # parallel wire streams won the isolated transport probe, but
        # e2e epochs showed no repeatable win (relay throughput drifts
        # 2-3x between epochs) and the extra threads contend with the
        # 4-core host's sampler pool — default serial
        self._xfer = None
        if _os2.environ.get("GNN_TPU_PAR_PUT", "0") == "1":
            from concurrent.futures import ThreadPoolExecutor
            self._xfer = ThreadPoolExecutor(4)
        # transfer lookahead (grouped dispatch): pack+device_put of the
        # next N groups run on ONE dedicated thread while the current
        # group dispatches and the sampler refills — H2D overlaps
        # sampling instead of adding to it. The BufferPool is sized
        # lookahead+2 deep (see its docstring): device_put may return
        # before the transfer completes, so up to lookahead+1 staging
        # buffers can be in flight while the next pack wants a fresh
        # one. GNN_TPU_LOOKAHEAD=0 restores the serial loop.
        self._transfer_lookahead = int(
            _os2.environ.get("GNN_TPU_LOOKAHEAD", "2"))
        if self._buf_pool is not None:
            from gnn_tpu.parallel.packbuf import BufferPool as _BP
            self._buf_pool = _BP(depth=self._transfer_lookahead + 2)
        self._prep_exec = None
        if self._transfer_lookahead > 0:
            from concurrent.futures import ThreadPoolExecutor
            self._prep_exec = ThreadPoolExecutor(
                1, thread_name_prefix="gnn-prep")
        # optional per-step progress to stderr (diagnosing slow runs
        # through the relay): GNN_TPU_STEP_LOG=<N> prints every N steps
        import os as _os
        self._step_log = int(_os.environ.get("GNN_TPU_STEP_LOG", "0"))
        self._seed = seed
        self.rng = jax.random.PRNGKey(seed)
        from jax.sharding import NamedSharding
        self.feat_state = jax.device_put(
            self.feature_source.state(),
            NamedSharding(self.mesh, self.feature_source.state_spec()))
        # resident hot-subgraph dense blocks (D, D^T) for
        # adj_format='hot', replicated across the mesh once at setup —
        # never re-shipped per step
        self.agg_state = ()
        if resident_graph is not None and self.part_axis is not None:
            # part-sharded resident state: stacked [P, ...] shards,
            # device_put split over the part axis. Param init never
            # materializes the full blocks — it runs through shape-only
            # COO stand-ins (see `init_stub_adjs`), so per-chip HBM is
            # bounded by the 1/P shards from the start.
            from gnn_tpu.parallel.shardedresident import \
                shard_resident_state
            # full-expansion mode (the pipeline's resident_ship_cold=
            # False) reads the CSR on device — ship row-range shards of
            # it (per-chip footprint E/P); lite mode ships no device
            # CSR at all. Derived from the sampler config so the two
            # ends cannot disagree.
            ship_csr = not getattr(self.pipeline.cfg,
                                   "resident_ship_cold", True)
            g_sh = shard_resident_state(dict(resident_graph),
                                        resident_parts,
                                        ship_csr=ship_csr)
            shp = NamedSharding(self.mesh, P(self.part_axis))
            self.agg_state = (jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), shp), g_sh),)
        elif resident_graph is not None:
            # resident-graph mode (adj_format='resident'): full CSR +
            # hot tables + dense blocks live in HBM; per-step payloads
            # carry only node ids + normfact (gnn_tpu.ops.residentgraph)
            from gnn_tpu.ops.residentgraph import ResidentGraph
            rep = NamedSharding(self.mesh, P())
            rg = dict(resident_graph)
            rg.pop("val_free", None)  # host-only flag (see CLI)
            n, k = rg.pop("n"), rg.pop("k")
            col_trivial = rg.pop("col_trivial", True)
            self.agg_state = (ResidentGraph(
                **{f: jax.device_put(jnp.asarray(v), rep)
                   for f, v in rg.items()}, n=n, k=k,
                col_trivial=col_trivial),)
        elif hot_dense is not None:
            d, dt = hot_dense
            rep = NamedSharding(self.mesh, P())
            self.agg_state = (jax.device_put(jnp.asarray(d), rep),
                              jax.device_put(jnp.asarray(dt), rep))
        self.n_feats = feats.shape[1]
        self.params = None
        self.opt_state = None
        self.best_val = -1.0
        self.best_params = None
        self.history: List[EpochMetrics] = []

    def close(self):
        """Release the trainer's worker threads (idempotent; also runs
        at GC so sessions that build many Trainers don't accumulate
        parked prep/transfer threads)."""
        if getattr(self, "_prep_exec", None) is not None:
            self._prep_exec.shutdown(wait=False)
            self._prep_exec = None
        if getattr(self, "_xfer", None) is not None:
            self._xfer.shutdown(wait=False)
            self._xfer = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _init_params(self, batch: DeviceBatch):
        one = jax.tree_util.tree_map(lambda a: a[0], batch)
        x = jnp.asarray(np.zeros(
            (one.input_nodes.shape[0], self.n_feats), np.float32))
        if self.part_axis is not None:
            # sharded resident state cannot (and must not) be
            # materialized replicated for init — use shape-only stubs
            adjs = init_stub_adjs(list(one.adjs))
        else:
            adjs = prepare_adjs(one, self.agg_state)
        self.params = self.net.init(jax.random.PRNGKey(0), x, adjs,
                                    list(one.sampled_nodes))
        self.opt_state = self.optimizer.init(self.params)
        self.params = put_replicated(self.mesh, self.params)
        self.opt_state = put_replicated(self.mesh, self.opt_state)

    def train_epoch(self, train_nodes, epoch: int,
                    rank_chunks=None) -> EpochMetrics:
        # epoch-deterministic randomness (sampling seeds, dropout): a
        # resumed run replays exactly the epochs an uninterrupted run
        # would have executed
        self.rng = jax.random.fold_in(jax.random.PRNGKey(self._seed),
                                      epoch)
        self._epoch_key = jax.device_put(
            self.rng, replicated_sharding(self.mesh))
        if self.steps_per_dispatch > 1:
            return self._train_epoch_grouped(train_nodes, epoch,
                                             rank_chunks)
        t_sample = 0.0
        t_move = 0.0
        t_exec = 0.0
        losses = []
        n_steps = 0
        t_start = t0 = time.perf_counter()
        for mb in self.pipeline.train_epoch(train_nodes, rank_chunks,
                                            epoch=epoch):
            batch = to_device_batch(mb)
            plan = self.feature_source.plan(mb)
            t1 = time.perf_counter()
            t_sample += t1 - t0
            if self.params is None:
                self._init_params(batch)
            if self.packed_transport == "typed":
                from gnn_tpu.parallel import packbuf
                tspec = self._typed_spec((batch, plan), 0)
                pools = tspec.pack((batch, plan), base_step=n_steps,
                                   n_valid=1, pool=self._buf_pool)
                dev_pools = self._put_pools(pools)
                t2 = time.perf_counter()
                t_move += t2 - t1
                self.params, self.opt_state, loss = self._typed_fn(
                    tspec)(self.params, self.opt_state, self.feat_state,
                           self.agg_state, self._epoch_key, dev_pools)
                self._last_host_batch, self._last_host_plan = batch, plan
                self._last_dev_batch = None
            elif self.packed_transport:
                from gnn_tpu.parallel import packbuf
                spec = packbuf.PackSpec.from_tree((batch, plan), 0)
                buf = packbuf.pack(
                    spec, (batch, plan), base_step=n_steps, n_valid=1,
                    out=None if self._buf_pool is None else
                    self._buf_pool.get(
                        spec.ws, spec.row_bytes + packbuf.TRAILER_BYTES))
                dev_buf = jax.device_put(buf, self._batch_sh)
                t2 = time.perf_counter()
                t_move += t2 - t1
                self.params, self.opt_state, loss = self._packed_fn(
                    spec)(self.params, self.opt_state, self.feat_state,
                          self.agg_state, self._epoch_key, dev_buf)
                self._last_host_batch, self._last_host_plan = batch, plan
                self._last_dev_batch = None
            else:
                dev_batch = self._put_b(batch)
                dev_plan = self._put_b(plan)
                t2 = time.perf_counter()
                t_move += t2 - t1
                # per-step dropout key: fold_in(epoch_key, step) — the
                # same derivation the packed path computes on device
                step_rng = jax.random.fold_in(self.rng, n_steps)
                self.params, self.opt_state, loss = self.fns.train_step(
                    self.params, self.opt_state, self.feat_state,
                    self.agg_state, dev_batch, dev_plan, step_rng)
                self._last_dev_batch, self._last_plan = dev_batch, dev_plan
            losses.append(loss)
            n_steps += 1
            self._last_is_grouped = False
            t0 = time.perf_counter()
            t_exec += t0 - t2
            if self._step_log and n_steps % self._step_log == 0:
                print(f"  step {n_steps}: sample {t_sample:.1f}s "
                      f"move {t_move:.1f}s exec {t_exec:.1f}s",
                      file=sys.stderr, flush=True)
        self._last_epoch_steps = n_steps
        # sync once per epoch for honest timing
        jax.block_until_ready(self.params)
        # ONE stacked readback for the epoch's losses — a per-step
        # float(l) would pay the ~35 ms relay round trip 300 times
        train_loss = float(np.mean(np.asarray(jnp.stack(losses)))) \
            if losses else float("nan")
        t_total = time.perf_counter() - t_start
        return EpochMetrics(epoch=epoch, train_loss=train_loss,
                            valid_loss=float("nan"),
                            valid_f1=float("nan"),
                            data_movement_time=t_move,
                            execution_time=t_exec,
                            sample_wait_time=t_sample,
                            total_time=t_total)

    def fit(self, train_nodes, valid_nodes, epochs: int,
            rank_chunks=None, log: bool = True,
            checkpoint_dir: Optional[str] = None,
            locality_tuner: bool = False,
            metrics=None, profile_dir: Optional[str] = None,
            op_timing: bool = False, resume: bool = False):
        """Train for ``epochs`` epochs. ``resume=True`` picks up from the
        ``latest`` checkpoint in ``checkpoint_dir`` (params + optimizer
        state + next epoch + best-F1 watermark) and, because every
        epoch's randomness derives from (seed, epoch), replays exactly
        the remaining epochs of the uninterrupted run — the recovery
        story the reference lacks entirely (SURVEY.md §5.4)."""
        import os

        tuner = None
        if locality_tuner:
            from gnn_tpu.train.metrics import ScaleFactorTuner
            tuner = ScaleFactorTuner(self.pipeline.cfg.scale_factor)
        start_epoch = 0
        if resume and checkpoint_dir is not None and os.path.exists(
                os.path.join(checkpoint_dir, "latest_model.msgpack")):
            if self.params is None:
                self._init_params(self._peek_batch(train_nodes))
            start_epoch = self.restore(checkpoint_dir, name="latest")
            # the best-so-far PARAMS must survive resume too: the final
            # test sweep evaluates the best checkpoint (the reference's
            # intended protocol, `main.py:218-235`), and without this a
            # resumed run would silently sweep with the LATEST params
            if os.path.exists(os.path.join(checkpoint_dir,
                                           "best_model.msgpack")):
                from gnn_tpu.train.checkpoint import load_checkpoint
                host = jax.tree_util.tree_map(np.asarray, self.params)
                host_opt = jax.tree_util.tree_map(np.asarray,
                                                  self.opt_state)
                bp, _, _, bv = load_checkpoint(checkpoint_dir, host,
                                               host_opt, name="best")
                self.best_params = bp
                self.best_val = max(self.best_val, bv)
            print(f"resumed from {checkpoint_dir} at epoch "
                  f"{start_epoch} (best val F1 {self.best_val:.3f})",
                  flush=True)
        # stop cross-epoch priming after the last epoch (the primed
        # futures would queue ahead of the final test eval's pool work)
        self.pipeline.final_epoch = epochs - 1
        for epoch in range(start_epoch, epochs):
            if profile_dir is not None and epoch == 1:
                # profile the second epoch (first is dominated by compiles)
                jax.profiler.start_trace(profile_dir)
            m = self.train_epoch(train_nodes, epoch, rank_chunks)
            if profile_dir is not None and epoch == 1:
                jax.profiler.stop_trace()
            if op_timing:
                fwd, bwd, comm = self.measure_op_buckets()
                steps = getattr(self, "_last_epoch_steps", 0)
                m.spmm_fwd_time = fwd * steps
                m.spmm_bwd_time = bwd * steps
                m.communication_time = comm * steps
            f1, vloss = self.evaluate(valid_nodes, 128, "val")
            m.valid_f1, m.valid_loss = f1, vloss
            self.history.append(m)
            if log:
                print(m.format(self.pipeline.cfg.scale_factor), flush=True)
            if metrics is not None:
                from gnn_tpu.train.metrics import device_memory_stats
                metrics.log(epoch=epoch, train_loss=m.train_loss,
                            valid_loss=m.valid_loss, valid_f1=m.valid_f1,
                            sample_wait_s=m.sample_wait_time,
                            data_movement_s=m.data_movement_time,
                            execution_s=m.execution_time,
                            spmm_fwd_s=m.spmm_fwd_time,
                            spmm_bwd_s=m.spmm_bwd_time,
                            communication_s=m.communication_time,
                            scale_factor=self.pipeline.cfg.scale_factor,
                            device_memory=device_memory_stats())
            # live scale-factor controller (the reference left this
            # commented out at `main.py:200-212`). Epoch 0's execution
            # bucket is compile-dominated (ratio reads ~0), which would
            # permanently deactivate the controller before it ever saw
            # a steady epoch — skip the first measurement.
            if tuner is not None and epoch > start_epoch:
                new_sf = tuner.update(m.data_movement_time,
                                      m.execution_time)
                if new_sf != self.pipeline.cfg.scale_factor:
                    self.pipeline.cfg = dataclasses.replace(
                        self.pipeline.cfg, scale_factor=new_sf)
            # best-model selection at +1e-2 improvement (`main.py:197-199`)
            if f1 > self.best_val + 1e-2:
                self.best_val = f1
                self.best_params = jax.tree_util.tree_map(
                    np.asarray, self.params)
                if checkpoint_dir is not None:
                    from gnn_tpu.train.checkpoint import save_checkpoint
                    save_checkpoint(checkpoint_dir, self.best_params,
                                    step=epoch,
                                    opt_state=self.opt_state,
                                    best_val=self.best_val)
            if checkpoint_dir is not None:
                # rolling crash-recovery checkpoint: params + optimizer
                # + next epoch (atomic write)
                from gnn_tpu.train.checkpoint import save_checkpoint
                save_checkpoint(checkpoint_dir, self.params,
                                step=epoch + 1,
                                opt_state=self.opt_state, name="latest",
                                best_val=self.best_val)
        return self.history

    def _peek_batch(self, train_nodes):
        """Sample one stacked minibatch to shape parameter init (used by
        resume before any training step has run)."""
        from gnn_tpu.sampling.pipeline import stack_minibatches
        ws = self.pipeline.world_size
        bs = self.pipeline.cfg.batch_size
        mbs = [self.pipeline._sample_one(0, train_nodes[:bs], rank=r)
               for r in range(ws)]
        return to_device_batch(stack_minibatches(mbs))

    def save(self, ckpt_dir: str, step: int = 0, name: str = "latest"):
        """Full training-state checkpoint (params + optimizer + step) —
        the resume capability the reference lacks (SURVEY.md 5.4)."""
        from gnn_tpu.train.checkpoint import save_checkpoint
        return save_checkpoint(ckpt_dir, self.params, step=step,
                               opt_state=self.opt_state, name=name)

    def restore(self, ckpt_dir: str, batch=None, name: str = "latest"):
        """Restore params/opt_state; returns the saved step. Parameters
        must have been initialized (pass a batch or train one step
        first)."""
        from gnn_tpu.train.checkpoint import load_checkpoint
        if self.params is None:
            if batch is None:
                raise ValueError("restore() needs initialized params; "
                                 "pass a DeviceBatch")
            self._init_params(batch)
        host_params = jax.tree_util.tree_map(np.asarray, self.params)
        host_opt = jax.tree_util.tree_map(np.asarray, self.opt_state)
        params, step, opt_state, best_val = load_checkpoint(
            ckpt_dir, host_params, host_opt, name=name)
        self.params = put_replicated(self.mesh, params)
        if opt_state is not None:
            self.opt_state = put_replicated(self.mesh, opt_state)
        if best_val > self.best_val:
            self.best_val = best_val
        return step
