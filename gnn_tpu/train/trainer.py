"""Training orchestration: jitted DP train/eval steps + the epoch loop.

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
"""
from __future__ import annotations

import dataclasses
import sys
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from gnn_tpu.parallel.feature_cache import ReplicatedFeatures
from gnn_tpu.parallel.mesh import (make_mesh, put_replicated,
                                   replicated as replicated_sharding)
from gnn_tpu.sampling.ladies import DeviceBatch, to_device_batch
from gnn_tpu.train.loss import calc_f1, masked_loss, predict_proba


def clip_by_global_norm(grads, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics (`main.py:146`)."""
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                        for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def _squeeze_batch(batch):
    """Inside shard_map each device sees leading axis 1; drop it."""
    return jax.tree_util.tree_map(lambda a: a[0], batch)


def bind_agg_state(adjs, agg_state):
    """Bind resident aggregation state (the hot-subgraph dense block,
    `gnn_tpu.ops.hotdense`) into the batch's adjacency list — done inside
    the jitted step so the block never rides the per-step H2D payload.
    ``agg_state`` is ``()`` (nothing resident), ``(D, D^T)`` (hot
    format), or ``(ResidentGraph,)`` (resident format)."""
    if agg_state:
        from gnn_tpu.ops.hotdense import bind_dense
        return bind_dense(list(adjs), agg_state[0], agg_state[1])
    return list(adjs)


def prepare_adjs(batch: "DeviceBatch", agg_state):
    """Materialize the batch's adjacency list inside the jitted step.

    In resident-graph mode (``agg_state = (ResidentGraph,)``) the
    layers arrive as tiny :class:`ResidentLayerRef` payloads and are
    rebuilt here from the HBM-resident CSR (nothing per-edge ever
    crossed the wire); otherwise this is `bind_agg_state`."""
    from gnn_tpu.ops.residentgraph import ResidentGraph, materialize_adjs
    from gnn_tpu.parallel.shardedresident import ShardedResidentGraph
    if agg_state and isinstance(agg_state[0],
                                (ResidentGraph, ShardedResidentGraph)):
        return materialize_adjs(agg_state[0], list(batch.adjs),
                                list(batch.sampled_nodes),
                                batch.input_nodes)
    return bind_agg_state(batch.adjs, agg_state)


def init_stub_adjs(adjs):
    """Shape-only adjacency stand-ins for parameter initialization.

    Flax ``init`` is eager, so running it through the real resident
    rebuild would materialize the full ``[k, k]`` hot blocks on the
    default device — at the very scale ``resident_parts`` exists for
    (resident state > one chip's HBM) that init would OOM. Parameters
    depend only on feature widths (every ``nn.Dense`` infers its fan-in
    from the input's trailing dim; LayerNorm widths come from
    ``orders``), never on adjacency *values*, so a 1-edge zero-valued
    COO of the same padded (nrows, ncols) yields bit-identical params
    (asserted against the replicated-path init in
    ``tests/test_sharded_resident.py``)."""
    from gnn_tpu.ops import sparse as sops
    from gnn_tpu.ops.residentgraph import ResidentLayerRef
    out = []
    for a in adjs:
        if isinstance(a, ResidentLayerRef):
            out.append(jax.tree_util.tree_map(jnp.asarray, sops.pack_coo(
                np.zeros(1, np.int64), np.zeros(1, np.int64),
                np.zeros(1, np.float32), int(np.asarray(a.n_valid_rows)),
                int(np.asarray(a.n_valid_cols)), a.nrows, a.ncols)))
        else:
            out.append(a)
    return out


@dataclasses.dataclass
class TrainStepFns:
    train_step: Callable
    eval_forward: Callable
    eval_step: Callable = None  # sharded eval over the mesh
    train_multi_step: Callable = None  # G steps per dispatch (lax.scan)
    # packed-transport factories: (PackSpec) -> jitted step taking ONE
    # shipped uint8 buffer instead of a 50+-leaf pytree (each leaf costs
    # a ~40 ms relay round trip here — see gnn_tpu/parallel/packbuf.py)
    make_packed_step: Callable = None
    make_packed_multi_step: Callable = None
    make_packed_eval_step: Callable = None
    make_packed_multi_step_chunked: Callable = None
    make_typed_step: Callable = None
    make_typed_multi_step: Callable = None
    make_typed_eval_step: Callable = None


def build_step_fns(net, optimizer, sigmoid_loss: bool, mesh,
                   feature_source, grad_clip: float = 5.0,
                   part_axis: str = None) -> TrainStepFns:
    """Build the jitted DP train step and single-replica eval forward.

    ``feature_source`` supplies input features on device — either a
    replicated HBM table or the placement-driven sharded cache with
    all-to-all halo exchange (`gnn_tpu.parallel.feature_cache`).

    ``part_axis``: name of a model-parallel mesh axis carrying SHARDED
    aggregation state (`gnn_tpu.parallel.shardedresident`). Batches are
    then data-parallel over the remaining axes only (replicated over
    ``part_axis``); the sharded hot matmul's psum makes every part's
    loss/grads identical, so the gradient psum spans only the replica
    axes. ``None`` (default): agg_state is replicated, every mesh axis
    is a data axis — the previous behavior, unchanged."""

    def per_device_loss(params, feat_state, agg_state, plan,
                        batch: DeviceBatch, rng):
        x = feature_source.gather(feat_state, plan, batch.input_nodes,
                                  batch.input_mask)
        adjs = prepare_adjs(batch, agg_state)
        out = net.apply(params, x, adjs,
                        list(batch.sampled_nodes),
                        deterministic=False, rngs={"dropout": rng})
        return masked_loss(out, batch.labels, batch.label_mask,
                           sigmoid_loss)

    axes = tuple(mesh.axis_names)
    # data-parallel (replica) axes: every axis except the model-parallel
    # part axis. With part_axis=None this is all of them (status quo).
    rep_axes = tuple(a for a in axes if a != part_axis)
    if part_axis is not None and part_axis not in axes:
        raise ValueError(f"part_axis {part_axis!r} not in mesh axes "
                         f"{axes}")
    # sharded agg_state (stacked [P, ...] leaves) splits over part_axis
    # and loses its length-1 leading axis inside shard_map; replicated
    # agg_state passes through untouched
    agg_spec = P(part_axis) if part_axis is not None else P()
    if part_axis is not None:
        def _local_agg(s):
            return jax.tree_util.tree_map(lambda a: a[0], s)
    else:
        def _local_agg(s):
            return s

    def _replica_index():
        # replica index across the data axes only (row-major): parts
        # within one replica share the batch AND the dropout key
        idx = jax.lax.axis_index(rep_axes[0])
        for ax in rep_axes[1:]:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        return idx

    def _sharded_step(params, opt_state, feat_state, agg_state, batch,
                      plan, rng):
        batch = _squeeze_batch(batch)
        agg_state = _local_agg(agg_state)
        idx = _replica_index()
        my_rng = jax.random.fold_in(rng, idx)
        loss, grads = jax.value_and_grad(per_device_loss)(
            params, feat_state, agg_state, plan, batch, my_rng)
        grads = clip_by_global_norm(grads, grad_clip)
        # reference sums gradients across replicas without dividing
        # (`main.py:159`); on a hybrid DPxcache mesh the sum spans both
        # axes (rep_axes == axes there); a sharded-agg part axis is
        # excluded — its grads are already identical across parts
        grads = jax.lax.psum(grads, rep_axes)
        mean_loss = jax.lax.pmean(loss, rep_axes)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mean_loss

    batch_spec = P(rep_axes)
    # donate params/opt_state: they are consumed and re-emitted every
    # step, so donation lets XLA update in place instead of holding two
    # copies of model + optimizer memory across the step boundary
    step = jax.jit(jax.shard_map(
        _sharded_step, mesh=mesh,
        in_specs=(P(), P(), feature_source.state_spec(), agg_spec,
                  batch_spec, batch_spec, P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ), donate_argnums=(0, 1))

    def _sharded_multi_step(params, opt_state, feat_state, agg_state,
                            batches, plans, rngs, valid):
        """``group`` train steps in ONE dispatch: a `lax.scan` over the
        leading group axis of the stacked batches/plans. Each iteration
        is exactly `_sharded_step`'s math; padded tail steps (``valid``
        False) compute but their parameter/optimizer updates are masked
        out, so a grouped epoch IS the per-step schedule. Amortizes the
        per-dispatch host+relay latency that floors small-step training
        (~35 ms/call through this environment's TPU relay)."""
        agg_state = _local_agg(agg_state)
        idx = _replica_index()

        def body(carry, xs):
            params, opt_state = carry
            batch, plan, rng, v = xs
            batch = _squeeze_batch(batch)
            my_rng = jax.random.fold_in(rng, idx)
            loss, grads = jax.value_and_grad(per_device_loss)(
                params, feat_state, agg_state, plan, batch, my_rng)
            grads = clip_by_global_norm(grads, grad_clip)
            grads = jax.lax.psum(grads, rep_axes)
            mean_loss = jax.lax.pmean(loss, rep_axes)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            keep = lambda n, o: jnp.where(v, n, o)
            params = jax.tree_util.tree_map(keep, new_params, params)
            opt_state = jax.tree_util.tree_map(keep, new_opt, opt_state)
            return (params, opt_state), mean_loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, plans, rngs, valid))
        return params, opt_state, losses

    group_spec = P(None, rep_axes)
    multi_step = jax.jit(jax.shard_map(
        _sharded_multi_step, mesh=mesh,
        in_specs=(P(), P(), feature_source.state_spec(), agg_spec,
                  group_spec, group_spec, P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ), donate_argnums=(0, 1))

    @jax.jit
    def eval_forward(params, x, agg_state, batch):
        batch = _squeeze_batch(batch)
        adjs = prepare_adjs(batch, agg_state)
        out = net.apply(params, x, adjs,
                        list(batch.sampled_nodes),
                        deterministic=True)
        return out, masked_loss(out, batch.labels, batch.label_mask,
                                sigmoid_loss)

    def _sharded_eval(params, feat_state, agg_state, batch, plan):
        b = _squeeze_batch(batch)
        agg_state = _local_agg(agg_state)
        x = feature_source.gather(feat_state, plan, b.input_nodes,
                                  b.input_mask)
        adjs = prepare_adjs(b, agg_state)
        out = net.apply(params, x, adjs, list(b.sampled_nodes),
                        deterministic=True)
        loss = masked_loss(out, b.labels, b.label_mask, sigmoid_loss)
        return out[None], loss[None]

    eval_step = jax.jit(jax.shard_map(
        _sharded_eval, mesh=mesh,
        in_specs=(P(), feature_source.state_spec(), agg_spec, batch_spec,
                  batch_spec),
        out_specs=(batch_spec, batch_spec),
        check_vma=False,
    ))

    from gnn_tpu.parallel.packbuf import unpack_local

    def make_packed_step(spec):
        """One-buffer variant of ``train_step``: the (batch, plan) pytree
        plus the step index ride a single uint8 array; the per-step
        dropout key derives on device as fold_in(epoch_key, step)."""

        def _packed(params, opt_state, feat_state, agg_state, epoch_key,
                    buf):
            (batch, plan), base_step, _ = unpack_local(spec, buf)
            rng = jax.random.fold_in(epoch_key, base_step)
            return _sharded_step(params, opt_state, feat_state, agg_state,
                                 batch, plan, rng)

        return jax.jit(jax.shard_map(
            _packed, mesh=mesh,
            in_specs=(P(), P(), feature_source.state_spec(), agg_spec,
                      P(), batch_spec),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ), donate_argnums=(0, 1))

    def make_packed_eval_step(spec):
        """One-buffer variant of ``eval_step`` (sharded full-sweep
        evaluation): batch + gather plan ride a single uint8 array."""

        def _packed(params, feat_state, agg_state, buf):
            (batch, plan), _, _ = unpack_local(spec, buf)
            return _sharded_eval(params, feat_state, agg_state, batch,
                                 plan)

        return jax.jit(jax.shard_map(
            _packed, mesh=mesh,
            in_specs=(P(), feature_source.state_spec(), agg_spec,
                      batch_spec),
            out_specs=(batch_spec, batch_spec),
            check_vma=False,
        ))

    def make_packed_multi_step(spec, group):
        """One-buffer variant of ``train_multi_step``: G stacked batches
        + plans + (base_step, n_valid) in one array; per-step keys and
        the valid mask are derived on device."""

        def _packed(params, opt_state, feat_state, agg_state, epoch_key,
                    buf):
            (batches, plans), base_step, n_valid = unpack_local(spec, buf)
            steps = base_step.astype(jnp.uint32) + jnp.arange(
                group, dtype=jnp.uint32)
            rngs = jax.vmap(
                lambda s: jax.random.fold_in(epoch_key, s))(steps)
            valid = jnp.arange(group, dtype=jnp.uint32) < n_valid
            return _sharded_multi_step(params, opt_state, feat_state,
                                       agg_state, batches, plans, rngs,
                                       valid)

        return jax.jit(jax.shard_map(
            _packed, mesh=mesh,
            in_specs=(P(), P(), feature_source.state_spec(), agg_spec,
                      P(), batch_spec),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ), donate_argnums=(0, 1))

    def make_typed_step(tspec):
        """Typed-pool transport (packbuf.TypedPackSpec): batch + plan
        arrive as one array per dtype — few H2D calls, dtype-aware wire
        encoding preserved, element-aligned device unpack."""

        def _typed(params, opt_state, feat_state, agg_state, epoch_key,
                   pools):
            (batch, plan), base_step, _ = tspec.unpack_local(pools)
            rng = jax.random.fold_in(epoch_key, base_step)
            return _sharded_step(params, opt_state, feat_state, agg_state,
                                 batch, plan, rng)

        return jax.jit(jax.shard_map(
            _typed, mesh=mesh,
            in_specs=(P(), P(), feature_source.state_spec(), agg_spec,
                      P(), batch_spec),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ), donate_argnums=(0, 1))

    def make_typed_multi_step(tspec, group):
        def _typed(params, opt_state, feat_state, agg_state, epoch_key,
                   pools):
            (batches, plans), base_step, n_valid = \
                tspec.unpack_local(pools)
            steps = base_step.astype(jnp.uint32) + jnp.arange(
                group, dtype=jnp.uint32)
            rngs = jax.vmap(
                lambda s: jax.random.fold_in(epoch_key, s))(steps)
            valid = jnp.arange(group, dtype=jnp.uint32) < \
                n_valid.astype(jnp.uint32)
            return _sharded_multi_step(params, opt_state, feat_state,
                                       agg_state, batches, plans, rngs,
                                       valid)

        return jax.jit(jax.shard_map(
            _typed, mesh=mesh,
            in_specs=(P(), P(), feature_source.state_spec(), agg_spec,
                      P(), batch_spec),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ), donate_argnums=(0, 1))

    def make_typed_eval_step(tspec):
        def _typed(params, feat_state, agg_state, pools):
            (batch, plan), _, _ = tspec.unpack_local(pools)
            return _sharded_eval(params, feat_state, agg_state, batch,
                                 plan)

        return jax.jit(jax.shard_map(
            _typed, mesh=mesh,
            in_specs=(P(), feature_source.state_spec(), agg_spec,
                      batch_spec),
            out_specs=(batch_spec, batch_spec),
            check_vma=False,
        ))

    def make_packed_multi_step_chunked(spec, group, chunk_widths):
        """Like ``make_packed_multi_step`` but the buffer arrives as
        column chunks (shipped concurrently — parallel streams through
        the relay run ~4x one large put); the device concatenates them
        (one HBM copy, ~50 us at minibatch sizes) before unpacking."""

        def _packed(params, opt_state, feat_state, agg_state, epoch_key,
                    *chunks):
            buf = jnp.concatenate(chunks, axis=1)
            (batches, plans), base_step, n_valid = unpack_local(spec, buf)
            steps = base_step.astype(jnp.uint32) + jnp.arange(
                group, dtype=jnp.uint32)
            rngs = jax.vmap(
                lambda s: jax.random.fold_in(epoch_key, s))(steps)
            valid = jnp.arange(group, dtype=jnp.uint32) < n_valid
            return _sharded_multi_step(params, opt_state, feat_state,
                                       agg_state, batches, plans, rngs,
                                       valid)

        return jax.jit(jax.shard_map(
            _packed, mesh=mesh,
            in_specs=(P(), P(), feature_source.state_spec(), agg_spec,
                      P())
            + tuple(batch_spec for _ in chunk_widths),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ), donate_argnums=(0, 1))

    return TrainStepFns(train_step=step, eval_forward=eval_forward,
                        eval_step=eval_step, train_multi_step=multi_step,
                        make_packed_step=make_packed_step,
                        make_packed_multi_step=make_packed_multi_step,
                        make_packed_eval_step=make_packed_eval_step,
                        make_packed_multi_step_chunked=(
                            make_packed_multi_step_chunked),
                        make_typed_step=make_typed_step,
                        make_typed_multi_step=make_typed_multi_step,
                        make_typed_eval_step=make_typed_eval_step)


@dataclasses.dataclass
class EpochMetrics:
    """The reference's per-epoch timing line (`main.py:196`), carrying all
    of its buckets: spmm fwd/bwd time (`custom_sparse_ops.py:11-12`),
    data-movement, communication, and execution time.

    ``spmm_*`` and ``communication_time`` are isolated-op estimates:
    everything inside one jitted program can't be bracketed the way the
    reference brackets eager torch calls, so the per-layer aggregation
    ops and the gradient psum / cache all_to_all are timed standalone on
    the epoch's final batch and scaled by the step count (XLA may overlap
    them in the real program, so these are upper bounds on their cost)."""

    epoch: int
    train_loss: float
    valid_loss: float
    valid_f1: float
    data_movement_time: float
    execution_time: float
    sample_wait_time: float
    spmm_fwd_time: float = float("nan")
    spmm_bwd_time: float = float("nan")
    communication_time: float = float("nan")
    # true wall time of the training loop INCLUDING the end-of-epoch
    # device sync (async dispatch means the per-step buckets alone
    # under-count queued device work)
    total_time: float = float("nan")

    def format(self, scale_factor: float = 1.0) -> str:
        ratio = (self.data_movement_time / self.execution_time
                 if self.execution_time else 0.0)
        buckets = ""
        if np.isfinite(self.total_time):
            buckets += f"(total {self.total_time:.2f}s)"
        if np.isfinite(self.spmm_fwd_time):
            buckets += (f"(spmm {self.spmm_fwd_time:.2f}s/"
                        f"{self.spmm_bwd_time:.2f}s)"
                        f"(comm {self.communication_time:.2f}s)")
        return (f"Epoch: {self.epoch} ({self.sample_wait_time:.2f}s)"
                f"({self.data_movement_time:.2f}s)"
                f"({self.execution_time:.2f}s) {buckets}"
                f"Train Loss: {self.train_loss:.2f}    "
                f"Valid Loss: {self.valid_loss:.2f} "
                f"Valid F1: {self.valid_f1:.3f}    "
                f"scale_factor: {scale_factor:.3f}     "
                f"ratio: {ratio:.3f}")


class Trainer:
    """End-to-end trainer mirroring `main.py`'s behavior on a TPU mesh."""

    def __init__(self, net, pipeline, feats: np.ndarray, mesh=None,
                 lr: float = 0.01, sigmoid_loss: bool = True,
                 seed: int = 0, feature_source=None, hot_dense=None,
                 steps_per_dispatch: int = 1, resident_graph=None,
                 resident_parts: int = 0,
                 resident_ship_cold: bool = True):
        self.net = net
        self.pipeline = pipeline
        self.mesh = mesh if mesh is not None else make_mesh(
            pipeline.world_size)
        self.feature_source = (feature_source if feature_source is not None
                               else ReplicatedFeatures(feats))
        self.optimizer = optax.adam(lr)
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
            # full-expansion mode (resident_ship_cold=False) reads the
            # CSR on device — ship row-range shards of it (per-chip
            # footprint E/P); lite mode ships no device CSR at all
            g_sh = shard_resident_state(dict(resident_graph),
                                        resident_parts,
                                        ship_csr=not resident_ship_cold)
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

    def _layer_widths(self):
        """Per-layer input feature widths of the encoder stack (for
        representative spmm operands)."""
        enc = self.net.encoder
        orders = list(getattr(enc, "orders", []))
        widths = [self.n_feats]
        for i in range(1, len(orders)):
            if type(enc).__name__ == "GraphSage":
                # reference `models.py:36`: layer i input width
                widths.append((1 + orders[i - 1]) * enc.nhid)
            else:
                widths.append(enc.nhid)
        return widths

    def measure_op_buckets(self):
        """Per-step spmm-fwd / spmm-bwd / communication seconds, estimated
        by timing the isolated jitted ops on the epoch's last batch (the
        reference brackets its eager calls the same way conceptually,
        `custom_sparse_ops.py:21-27`, `main.py:150-168`). Cached — static
        shapes make the cost epoch-invariant."""
        if getattr(self, "_op_buckets", None) is not None:
            return self._op_buckets
        if getattr(self, "_last_dev_batch", None) is None:
            # packed transport keeps the last batch host-side; ship it
            # once here for the isolated-op timing
            if getattr(self, "_last_host_batch", None) is None:
                return (float("nan"),) * 3
            put = (self._put_gb if
                   getattr(self, "_last_is_grouped", False) else
                   self._put_b)
            self._last_dev_batch = put(self._last_host_batch)
            self._last_plan = put(self._last_host_plan) \
                if self._last_host_plan != () else ()
        from gnn_tpu.ops.sparse import spmm, spmm_transpose

        last_batch, last_plan = self._last_dev_batch, self._last_plan
        if getattr(self, "_last_is_grouped", False):
            # grouped dispatch: drop the leading group axis first
            last_batch = jax.tree_util.tree_map(lambda a: a[0], last_batch)
            last_plan = jax.tree_util.tree_map(lambda a: a[0], last_plan)
        one = jax.tree_util.tree_map(lambda a: a[0], last_batch)
        widths = self._layer_widths()
        on_tpu = jax.default_backend() == "tpu"

        def timeit(fn, *args):
            if on_tpu:
                from benchmarks.timing import chain_time
                return chain_time(fn, args[0], n=8, args=args[1:])
            f = jax.jit(fn)
            jax.block_until_ready(f(*args))
            t0 = time.perf_counter()
            for _ in range(3):
                jax.block_until_ready(f(*args))
            return (time.perf_counter() - t0) / 3

        t_fwd = t_bwd = 0.0
        rng = np.random.default_rng(0)
        if self.part_axis is not None:
            # part-sharded aggregation state only exists inside
            # shard_map, so each layer's isolated op is timed as a
            # shard_mapped probe: the resident rebuild of layer l + one
            # spmm/spmm_transpose over the sharded hot blocks (incl.
            # their psum). Slightly wider scope than the replicated
            # branch (which times the op on a pre-materialized layer),
            # but that's the true per-step cost of the sharded path.
            from gnn_tpu.ops.residentgraph import ResidentLayerRef
            agg_spec = P(self.part_axis)
            batch_spec = P(self._rep_axes)

            def make_probe(l, transpose):
                def inner(x, agg_state, batch):
                    b = _squeeze_batch(batch)
                    agg = jax.tree_util.tree_map(lambda a: a[0],
                                                 agg_state)
                    adj = prepare_adjs(b, agg)[l]
                    return (spmm_transpose(adj, x) if transpose
                            else spmm(adj, x))
                return jax.shard_map(
                    inner, mesh=self.mesh,
                    in_specs=(P(), agg_spec, batch_spec),
                    out_specs=P(), check_vma=False)

            for l, a in enumerate(list(one.adjs)):
                if not isinstance(a, ResidentLayerRef):
                    continue
                w = widths[l] if l < len(widths) else widths[-1]
                x = jnp.asarray(rng.normal(size=(a.ncols, w)).astype(
                    np.float32))
                g = jnp.asarray(rng.normal(size=(a.nrows, w)).astype(
                    np.float32))
                t_fwd += timeit(make_probe(l, False), x,
                                self.agg_state, last_batch)
                t_bwd += timeit(make_probe(l, True), g,
                                self.agg_state, last_batch)
        else:
            from gnn_tpu.ops.sparse import PatternAdj
            adjs = prepare_adjs(one, self.agg_state)
            for l, adj in enumerate(adjs):
                if adj is None or isinstance(adj, PatternAdj):
                    # pattern layers (GAT) have no standalone spmm to
                    # time — their aggregation weights are computed
                    # inside the model from q.k scores
                    continue
                w = widths[l] if l < len(widths) else widths[-1]
                x = jnp.asarray(rng.normal(size=(adj.ncols, w)).astype(
                    np.float32))
                g = jnp.asarray(rng.normal(size=(adj.nrows, w)).astype(
                    np.float32))
                # the adjacency MUST ride as an argument, not a closure —
                # a closure would bake its arrays (including the GB-scale
                # resident hot blocks) into the timing jit as constants
                t_fwd += timeit(lambda u, a: spmm(a, u), x, adj)
                t_bwd += timeit(lambda u, a: spmm_transpose(a, u), g, adj)

        # communication: the gradient psum (`main.py:149-168`'s manual
        # all-reduce, which also flattens grads into one vector) + the
        # feature cache's all_to_all gather, if any. The psum spans the
        # replica axes — under part sharding grads are already identical
        # across parts, so the data axes are its real scope.
        t_comm = 0.0
        if self.params is not None:
            flat = jnp.concatenate(
                [jnp.ravel(p) for p in
                 jax.tree_util.tree_leaves(self.params)])
            axes = self._rep_axes
            psum_fn = jax.shard_map(
                lambda g: jax.lax.psum(g, axes), mesh=self.mesh,
                in_specs=P(), out_specs=P(), check_vma=False)
            t_comm = timeit(psum_fn, flat)
        if hasattr(self.feature_source, "plan") and \
                last_plan not in ((), None):
            b_spec = P(self._rep_axes)
            gather_fn = jax.jit(jax.shard_map(
                lambda fs, pl, bat: self.feature_source.gather(
                    fs, pl, bat.input_nodes[0], bat.input_mask[0]),
                mesh=self.mesh,
                in_specs=(self.feature_source.state_spec(), b_spec,
                          b_spec),
                out_specs=b_spec, check_vma=False))
            try:
                jax.block_until_ready(gather_fn(
                    self.feat_state, last_plan, last_batch))
                t0 = time.perf_counter()
                jax.block_until_ready(gather_fn(
                    self.feat_state, last_plan, last_batch))
                t_comm += time.perf_counter() - t0
            except Exception:
                pass
        self._op_buckets = (t_fwd, t_bwd, t_comm)
        return self._op_buckets

    def evaluate(self, target_nodes, batch_size: int = 128,
                 mode: str = "val"):
        """Micro-F1 + loss over eval batches (reference
        `main.py:178-199, 217-241`). Full-sweep test evaluation on a
        multi-device mesh runs sharded — ws batches per dispatch through
        the same feature-cache gather as training."""
        if mode == "test" and self.params is not None and (
                self.pipeline.world_size > 1 or self.packed_transport):
            # full sweeps run through the mesh (ws batches/dispatch,
            # device-side feature gather); with packed transport this
            # also collapses each dispatch's H2D to one array
            return self._evaluate_sharded(target_nodes, batch_size)
        if self.part_axis is not None and self.params is not None:
            # part-sharded aggregation state lives only inside the
            # shard_mapped step fns — run val batches through eval_step
            # with the batch repeated across the replica axes (every
            # replica computes the same batch; row 0 is the answer)
            ws = int(np.prod([self.mesh.shape[a]
                              for a in self._rep_axes]))
            total_f1 = total_n = 0
            total_loss = 0.0
            n_batches = 0
            rep = lambda a: np.repeat(np.asarray(a), ws, axis=0)
            for mb in self.pipeline.eval_batches(target_nodes,
                                                 batch_size, mode):
                batch = jax.tree_util.tree_map(rep, to_device_batch(mb))
                plan = jax.tree_util.tree_map(
                    rep, self.feature_source.plan(mb))
                outs, losses = self.fns.eval_step(
                    self.params, self.feat_state, self.agg_state,
                    self._put_b(batch), self._put_b(plan))
                labels = mb.labels[0]
                mask = mb.label_mask[0].astype(bool)
                proba = np.asarray(predict_proba(np.asarray(outs)[0],
                                                 self.sigmoid_loss))
                f1_mic, _ = calc_f1(labels[mask],
                                    proba[: labels.shape[0]][mask],
                                    self.sigmoid_loss)
                n = int(mask.sum())
                total_f1 += f1_mic * n
                total_n += n
                total_loss += float(np.asarray(losses)[0])
                n_batches += 1
            return (total_f1 / max(total_n, 1),
                    total_loss / max(n_batches, 1))
        total_f1 = 0.0
        total_n = 0
        total_loss = 0.0
        n_batches = 0
        for mb in self.pipeline.eval_batches(target_nodes, batch_size,
                                              mode):
            batch = to_device_batch(mb)
            x = self.feature_source.host_gather(mb.input_nodes[0],
                                                mb.input_mask[0])
            out, loss = self.fns.eval_forward(self.params, jnp.asarray(x),
                                              self.agg_state, batch)
            labels = mb.labels[0]
            mask = mb.label_mask[0].astype(bool)
            proba = np.asarray(predict_proba(out, self.sigmoid_loss))
            f1_mic, _ = calc_f1(labels[mask], proba[: labels.shape[0]][mask],
                                self.sigmoid_loss)
            n = int(mask.sum())
            total_f1 += f1_mic * n
            total_n += n
            total_loss += float(loss)
            n_batches += 1
        return (total_f1 / max(total_n, 1),
                total_loss / max(n_batches, 1))

    def _evaluate_sharded(self, target_nodes, batch_size: int):
        """Mesh-sharded full sweep: each dispatch evaluates world_size
        batches (cache gather + forward inside shard_map); F1 weighting
        matches the reference's per-batch weighted average
        (`main.py:226-241`)."""
        total_f1 = 0.0
        total_n = 0
        total_loss = 0.0
        n_batches = 0
        for mb in self.pipeline.eval_batches_sharded(target_nodes,
                                                     batch_size):
            batch = to_device_batch(mb)
            plan = self.feature_source.plan(mb)
            if self.packed_transport == "typed":
                tspec = self._typed_spec((batch, plan), 0)
                key = ("typed-eval", tspec.key())
                fn = self._packed_fns.get(key)
                if fn is None:
                    fn = self.fns.make_typed_eval_step(tspec)
                    self._packed_fns[key] = fn
                pools = tspec.pack((batch, plan), pool=self._buf_pool)
                dev_pools = self._put_pools(pools)
                outs, losses = fn(self.params, self.feat_state,
                                  self.agg_state, dev_pools)
            elif self.packed_transport:
                from gnn_tpu.parallel import packbuf
                spec = packbuf.PackSpec.from_tree((batch, plan), 0)
                key = ("eval", spec.key())
                fn = self._packed_fns.get(key)
                if fn is None:
                    fn = self.fns.make_packed_eval_step(spec)
                    self._packed_fns[key] = fn
                buf = packbuf.pack(
                    spec, (batch, plan),
                    out=None if self._buf_pool is None else
                    self._buf_pool.get(
                        spec.ws, spec.row_bytes + packbuf.TRAILER_BYTES))
                dev_buf = jax.device_put(buf, self._batch_sh)
                outs, losses = fn(self.params, self.feat_state,
                                  self.agg_state, dev_buf)
            else:
                dev_batch = self._put_b(batch)
                dev_plan = self._put_b(plan)
                outs, losses = self.fns.eval_step(
                    self.params, self.feat_state, self.agg_state,
                    dev_batch, dev_plan)
            outs = np.asarray(outs)
            losses = np.asarray(losses)
            for r in range(outs.shape[0]):
                labels = mb.labels[r]
                mask = mb.label_mask[r].astype(bool)
                if not mask.any():  # padded filler replica
                    continue
                proba = np.asarray(predict_proba(outs[r],
                                                 self.sigmoid_loss))
                f1_mic, _ = calc_f1(labels[mask],
                                    proba[: labels.shape[0]][mask],
                                    self.sigmoid_loss)
                n = int(mask.sum())
                total_f1 += f1_mic * n
                total_n += n
                total_loss += float(losses[r])
                n_batches += 1
        return (total_f1 / max(total_n, 1),
                total_loss / max(n_batches, 1))

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
            # commented out at `main.py:200-212`)
            if tuner is not None:
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

    def test(self, test_nodes, batch_size: int = 128,
             use_best: bool = True):
        """Full-sweep weighted micro-F1 (reference `main.py:217-241`) —
        evaluated with the *best* checkpoint (the reference intended this
        but had a latent bug running the last model, `main.py:235`)."""
        if use_best and self.best_params is not None:
            saved = self.params
            self.params = put_replicated(self.mesh, self.best_params)
            f1, _ = self.evaluate(test_nodes, batch_size, "test")
            self.params = saved
            return f1
        f1, _ = self.evaluate(test_nodes, batch_size, "test")
        return f1
