"""Batch transport + grouped dispatch: the Trainer's host->device path.

Split out of `gnn_tpu.train.trainer` (round-4 refactor, zero behavior
change). Owns the typed/packed/per-leaf transports
(`gnn_tpu.parallel.packbuf`), the transfer-lookahead prep thread, and
the grouped multi-step epoch loop (G steps per dispatch through one
jitted `lax.scan`).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.sampling.ladies import to_device_batch
from gnn_tpu.train.metrics import EpochMetrics


class DispatchMixin:
    """Host->device transport + grouped-dispatch methods of `Trainer`
    (mixin: no state of its own — every attribute lives on `Trainer`)."""

    def _put_b(self, tree):
        """device_put a stacked [ws, ...] batch tree: leading axis over
        the replica axes (replicated over a part axis when present)."""
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, self._batch_sh), tree)

    def _put_gb(self, tree):
        """device_put a grouped [G, ws, ...] tree (group axis whole)."""
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, self._gbatch_sh), tree)

    def _put_pools(self, pools):
        """device_put each typed pool from a worker thread (parallel
        wire streams; see transport study in RESULTS.md)."""
        sh = self._batch_sh
        if len(pools) <= 1 or self._xfer is None:
            return jax.device_put(pools, sh)
        futs = {d: self._xfer.submit(jax.device_put, a, sh)
                for d, a in pools.items()}
        return {d: f.result() for d, f in futs.items()}

    def _typed_spec(self, tree, shard_axis: int):
        """TypedPackSpec for this tree, cached by pytree structure +
        shapes (a new nnz bucket => new spec, as with jit itself)."""
        from gnn_tpu.parallel import packbuf
        tspec = packbuf.TypedPackSpec(tree, shard_axis)
        cached = self._packed_fns.get(("tspec", tspec.key()))
        if cached is not None:
            return cached
        self._packed_fns[("tspec", tspec.key())] = tspec
        return tspec

    def _typed_fn(self, tspec, group: int = 0):
        key = ("typed", tspec.key(), group)
        fn = self._packed_fns.get(key)
        if fn is None:
            fn = (self.fns.make_typed_multi_step(tspec, group) if group
                  else self.fns.make_typed_step(tspec))
            self._packed_fns[key] = fn
        return fn

    def _packed_fn(self, spec, group: int = 0):
        """Jitted packed-transport step for this PackSpec (cached — a
        new nnz bucket means new shapes, hence a fresh compile, exactly
        as the unpacked path would recompile)."""
        key = (spec.key(), group)
        fn = self._packed_fns.get(key)
        if fn is None:
            fn = (self.fns.make_packed_multi_step(spec, group) if group
                  else self.fns.make_packed_step(spec))
            self._packed_fns[key] = fn
        return fn

    def _grouped_plan(self, mb, group: int):
        """Per-step feature gather plans stacked along the group axis.
        ``pooled=False``: all G plans must be live until the stack below
        copies them; the per-step pooled buffers would alias."""
        import types
        plans = []
        for g in range(group):
            shim = types.SimpleNamespace(input_nodes=mb.input_nodes[g],
                                         input_mask=mb.input_mask[g])
            plans.append(self.feature_source.plan(shim, pooled=False))
        from gnn_tpu.parallel.feature_cache import stack_gather_plans
        return stack_gather_plans(plans, mb.input_nodes.shape[-1])

    def _prep_group(self, mb, base_step: int, n_valid: int):
        """Host->device staging of one dispatch group: stack-view the
        batch, build the gather plans, pack, `device_put`. Runs on the
        transfer-lookahead thread when overlapping (the BufferPool's
        double buffering keeps the previous group's staging buffer
        untouched while its transfer drains; a single prep thread
        serializes pack+put so at most one buffer is ever being
        written)."""
        G = self.steps_per_dispatch
        batch = to_device_batch(mb)
        plan = self._grouped_plan(mb, G)
        if self.packed_transport == "typed":
            tspec = self._typed_spec((batch, plan), 1)
            pools = tspec.pack((batch, plan), base_step=base_step,
                               n_valid=n_valid, pool=self._buf_pool)
            return ("typed", tspec, self._put_pools(pools), batch, plan)
        if self.packed_transport:
            from gnn_tpu.parallel import packbuf
            spec = packbuf.PackSpec.from_tree((batch, plan), 1)
            buf = packbuf.pack(
                spec, (batch, plan), base_step=base_step,
                n_valid=n_valid,
                out=None if self._buf_pool is None else
                self._buf_pool.get(
                    spec.ws, spec.row_bytes + packbuf.TRAILER_BYTES))
            return ("blob", spec,
                    jax.device_put(buf, self._batch_sh), batch, plan)
        return ("raw", None,
                (self._put_gb(batch), self._put_gb(plan)), batch, plan)

    def _dispatch_group(self, prep, base_step: int, n_valid: int):
        """One jitted lax.scan of G optimizer steps from a staged group."""
        kind, spec, dev, batch, plan = prep
        G = self.steps_per_dispatch
        if self.params is None:
            self._init_params(jax.tree_util.tree_map(
                lambda a: a[0], batch))
        if kind == "typed":
            self.params, self.opt_state, losses = self._typed_fn(
                spec, group=G)(
                self.params, self.opt_state, self.feat_state,
                self.agg_state, self._epoch_key, dev)
            self._last_host_batch, self._last_host_plan = batch, plan
            self._last_dev_batch = None
        elif kind == "blob":
            self.params, self.opt_state, losses = self._packed_fn(
                spec, group=G)(
                self.params, self.opt_state, self.feat_state,
                self.agg_state, self._epoch_key, dev)
            self._last_host_batch, self._last_host_plan = batch, plan
            self._last_dev_batch = None
        else:
            dev_batch, dev_plan = dev
            # per-step keys: fold_in(epoch_key, global step index) —
            # identical to the packed path's on-device derivation
            rngs = jnp.stack([
                jax.random.fold_in(self.rng, base_step + g)
                for g in range(G)])
            valid = jnp.asarray(np.arange(G) < n_valid)
            self.params, self.opt_state, losses = \
                self.fns.train_multi_step(
                    self.params, self.opt_state, self.feat_state,
                    self.agg_state, dev_batch, dev_plan, rngs, valid)
            self._last_dev_batch, self._last_plan = dev_batch, dev_plan
        self._last_is_grouped = True
        return losses

    def _train_epoch_grouped(self, train_nodes, epoch: int,
                             rank_chunks=None) -> EpochMetrics:
        """`steps_per_dispatch` train steps per host dispatch: the
        pipeline ships ``[G, ws, ...]`` stacked batches, one `device_put`
        + one jitted `lax.scan` runs G optimizer steps. Numerically the
        per-step schedule (padded tail steps are masked); operationally
        ~1/G the host/relay round-trips.

        With transfer lookahead (default), pack+`device_put` of the
        next groups run on a dedicated thread while the current group
        dispatches and the sampler pool refills — the relay transfer
        time overlaps sampling instead of adding to it (the move bucket
        then measures only the UNHIDDEN transfer wait)."""
        G = self.steps_per_dispatch
        t_sample = t_move = t_exec = 0.0
        loss_chunks = []
        n_steps = 0        # dispatched steps
        sub_steps = 0      # submitted-to-prep steps (= dispatch order)
        pending = []       # [(future, base_step, n_valid), ...]
        look = self._transfer_lookahead
        t_start = t0 = time.perf_counter()

        def _drain_one():
            nonlocal n_steps, t_move, t_exec
            fut, base, nv = pending.pop(0)
            t1 = time.perf_counter()
            prep = fut.result() if hasattr(fut, "result") else fut
            t2 = time.perf_counter()
            losses = self._dispatch_group(prep, base, nv)
            t3 = time.perf_counter()
            t_move += t2 - t1
            t_exec += t3 - t2
            loss_chunks.append((losses, nv))
            n_steps += nv
            if self._step_log and n_steps % self._step_log < nv:
                print(f"  step {n_steps}: sample {t_sample:.1f}s "
                      f"move {t_move:.1f}s exec {t_exec:.1f}s",
                      file=sys.stderr, flush=True)

        for mb, n_valid in self.pipeline.train_epoch_grouped(
                train_nodes, rank_chunks, epoch=epoch, group=G):
            t_sample += time.perf_counter() - t0
            if self._prep_exec is not None:
                fut = self._prep_exec.submit(self._prep_group, mb,
                                             sub_steps, n_valid)
            else:
                fut = self._prep_group(mb, sub_steps, n_valid)
            pending.append((fut, sub_steps, n_valid))
            sub_steps += n_valid
            # dispatch order == submission order (the queue enforces it;
            # pack's base_step was fixed at submission, so the update
            # schedule and rng streams are exactly the unoverlapped ones)
            while len(pending) > look:
                _drain_one()
            t0 = time.perf_counter()
        while pending:
            _drain_one()
            t0 = time.perf_counter()
        self._last_epoch_steps = n_steps
        jax.block_until_ready(self.params)
        # ONE stacked readback for all loss vectors (vs one relay round
        # trip per dispatch)
        if loss_chunks:
            stacked = np.asarray(jnp.stack([l for l, _ in loss_chunks]))
            all_losses = [float(x) for (_, nv), row
                          in zip(loss_chunks, stacked) for x in row[:nv]]
        else:
            all_losses = []
        train_loss = float(np.mean(all_losses)) if all_losses \
            else float("nan")
        t_total = time.perf_counter() - t_start
        return EpochMetrics(epoch=epoch, train_loss=train_loss,
                            valid_loss=float("nan"),
                            valid_f1=float("nan"),
                            data_movement_time=t_move,
                            execution_time=t_exec,
                            sample_wait_time=t_sample,
                            total_time=t_total)
