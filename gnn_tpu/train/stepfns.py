"""Jitted step builders: the DP/hybrid train, multi-step and eval
step functions plus their packed/typed-transport factories.

Split out of `gnn_tpu.train.trainer` (round-4 refactor, zero behavior
change): this module owns everything that runs INSIDE jit/shard_map —
the per-iteration recipe matching the reference exactly (forward,
masked BCE/CE loss `utils.py:129-140`, backward, per-replica
global-norm grad clip at 5 `main.py:146`, cross-replica gradient
**sum** — NOT average, `main.py:159` — Adam step `main.py:102`) as a
`shard_map` over the mesh with one `lax.psum` for the gradient
exchange. The host-side epoch loop lives in `trainer.py`; transports in
`dispatch.py`.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from gnn_tpu.sampling.ladies import DeviceBatch
from gnn_tpu.train.loss import masked_loss


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
