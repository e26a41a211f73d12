"""Per-step collective BYTES vs the analytic model (SURVEY §5.8 /
round-3 verdict Missing #3): lower the compiled train step, parse every
collective op out of the optimized HLO, and check the moved bytes
against what the sharding design says should move.

The analytic model (docs/ARCHITECTURE.md):
- DP / hybrid DP x cache: ONE gradient psum summing every param leaf
  (reference `main.py:159` semantics) + a scalar loss pmean — so
  all-reduce bytes ~= param bytes; the feature cache adds ONE
  all_to_all whose payload is the stacked per-device request block.
- Part-sharded resident (hybrid DP x part): adds, per resident layer,
  the hot partial-product psums ([rh_pad, F] fwd + [ch_pad, F] bwd)
  and the psum-gather lookups ([nrows]/[ncols]-sized, one per
  slot/rowval lookup).

The assertions are deliberately banded (not exact): XLA may fuse or
split all-reduces, cast widths, or add tiny scalar collectives — the
point is that the per-step collective volume is WITHIN A FACTOR of the
design's analytic count, i.e. no silent 10x communication blowup can
land unnoticed.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO result type like 'f32[128,32]' or a tuple
    '(f32[10]{0}, s32[20]{0})'."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str):
    """{op_kind: result bytes} summed over every collective in the
    optimized HLO (one entry per op; '-start' variants counted, their
    '-done' twins skipped)."""
    out = {}
    pat = re.compile(
        r"=\s*((?:\([^)]*\)|\S+))\s+"
        r"(all-reduce|all-to-all|all-gather|reduce-scatter|"
        r"collective-permute)(?:-start)?\(")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if not m:
            continue
        out[m.group(2)] = out.get(m.group(2), 0) + _shape_bytes(
            m.group(1))
    return out


def _param_bytes(params):
    return sum(np.prod(l.shape) * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(params))


def _lowered_text(fns, params, opt_state, feat_state, agg, batch, plan,
                  rng):
    lowered = fns.train_step.lower(params, opt_state, feat_state, agg,
                                   batch, plan, rng)
    return lowered.compile().as_text()


def _setup(graph, adj_format="coo", hot_k=256):
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense
    from gnn_tpu.placement.engine import compute_sample_prob
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, hot_k)
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                        num_nodes=lap.shape[0],
                        num_classes=graph.num_classes,
                        hot_spec=spec if adj_format != "coo" else None,
                        adj_format=adj_format, compress=False,
                        resident_ship_cold=True, resident_val_free=True)
    net = build_model("graphsage", nhid=32, orders=(1, 1),
                      num_classes=graph.num_classes)
    return lap, prob, spec, dense, dense_t, cfg, net


def test_dp_collective_bytes_match_grad_psum(small_graph):
    """Plain DP(4): the only non-trivial collectives are the gradient
    psum (= param bytes) + scalar loss pmean. Total all-reduce bytes
    must be within [1x, 1.3x] of param bytes, and no all-to-all /
    all-gather / reduce-scatter may appear."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    from gnn_tpu.parallel.mesh import make_mesh, put_replicated
    from gnn_tpu.sampling.ladies import ladies_sample, to_device_batch
    from gnn_tpu.sampling.pipeline import stack_minibatches
    from gnn_tpu.train.trainer import (ReplicatedFeatures, build_step_fns,
                                       prepare_adjs)

    lap, prob, spec, dense, dense_t, cfg, net = _setup(small_graph)
    mesh = make_mesh(4)
    feats = ReplicatedFeatures(small_graph.feats)
    opt = optax.adam(0.05)
    fns = build_step_fns(net, opt, False, mesh, feats)

    mbs = [ladies_sample(cfg, i, small_graph.train_nodes[:64], lap,
                         small_graph.labels) for i in range(4)]
    batch = to_device_batch(stack_minibatches(mbs))
    one = jax.tree_util.tree_map(lambda a: a[0], batch)
    x0 = jnp.zeros((one.input_nodes.shape[0],
                    small_graph.feats.shape[1]), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0, prepare_adjs(one, ()),
                      list(one.sampled_nodes))
    pb = _param_bytes(params)
    params = put_replicated(mesh, params)
    opt_state = put_replicated(mesh, opt.init(
        jax.tree_util.tree_map(np.asarray, params)))
    feat_state = put_replicated(mesh, feats.state())

    text = _lowered_text(fns, params, opt_state, feat_state, (), batch,
                         feats.plan(mbs[0]), jax.random.PRNGKey(1))
    got = collective_bytes(text)
    assert got, "no collectives found in the compiled DP step?"
    ar = got.get("all-reduce", 0)
    assert pb <= ar <= 1.3 * pb, (ar, pb, got)
    for k in ("all-to-all", "all-gather", "reduce-scatter"):
        assert got.get(k, 0) == 0, got


def test_cache_all_to_all_bytes_match_plan(small_graph):
    """DP(4) + placement cache: the feature gather adds all-to-all
    whose bytes match the stacked request block (ws x rows x F x 4,
    once per direction the compiler chooses), within [1x, 2.2x] of the
    one-way analytic payload. The gradient psum band still holds."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    from gnn_tpu.parallel.feature_cache import CachedFeatures
    from gnn_tpu.parallel.mesh import make_mesh, put_replicated
    from gnn_tpu.placement.engine import greedy_placement
    from gnn_tpu.sampling.ladies import ladies_sample, to_device_batch
    from gnn_tpu.sampling.pipeline import stack_minibatches
    from gnn_tpu.train.trainer import build_step_fns, prepare_adjs
    from jax.sharding import NamedSharding

    lap, prob, spec, dense, dense_t, cfg, net = _setup(small_graph)
    n = lap.shape[0]
    placement = greedy_placement(prob, per_dev=max(n // 8, 8),
                                 num_devs=4, alpha=1.0)
    cache = CachedFeatures(small_graph.feats, placement)
    mesh = make_mesh(4)
    opt = optax.adam(0.05)
    fns = build_step_fns(net, opt, False, mesh, cache)

    mbs = [ladies_sample(cfg, i, small_graph.train_nodes[:64], lap,
                         small_graph.labels) for i in range(4)]
    gmb = stack_minibatches(mbs)
    batch = to_device_batch(gmb)
    plan = cache.plan(gmb)
    one = jax.tree_util.tree_map(lambda a: a[0], batch)
    x0 = jnp.zeros((one.input_nodes.shape[0],
                    small_graph.feats.shape[1]), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0, prepare_adjs(one, ()),
                      list(one.sampled_nodes))
    pb = _param_bytes(params)
    params = put_replicated(mesh, params)
    opt_state = put_replicated(mesh, opt.init(
        jax.tree_util.tree_map(np.asarray, params)))
    feat_state = jax.device_put(
        cache.state(), NamedSharding(mesh, cache.state_spec()))

    text = _lowered_text(fns, params, opt_state, feat_state, (), batch,
                         plan, jax.random.PRNGKey(1))
    got = collective_bytes(text)
    a2a = got.get("all-to-all", 0) + got.get("all-gather", 0)
    # analytic one-way payload of the request block, per device view:
    # [ws, rows, F] f32 (the all_to_all exchanges it across the axis)
    req_rows = plan.req_ids.shape[-1] if hasattr(plan, "req_ids") else \
        None
    if req_rows is None:
        # fall back: find the [ws, rows, F]-shaped leaf in the plan
        leaves = [l for l in jax.tree_util.tree_leaves(plan)
                  if getattr(l, "ndim", 0) >= 2]
        assert leaves, "no request block in plan?"
        req_rows = max(l.shape[-1] if l.ndim == 2 else l.shape[-2]
                       for l in leaves)
    F = small_graph.feats.shape[1]
    one_way = 4 * req_rows * F * 4
    assert a2a > 0, got
    assert a2a <= 2.2 * one_way, (a2a, one_way, got)
    ar = got.get("all-reduce", 0)
    assert pb <= ar <= 1.3 * pb, (ar, pb, got)


def test_sharded_resident_collectives_match_model(small_graph):
    """Hybrid DP(2) x part(4) with the part-sharded resident graph: the
    extra all-reduce volume over the gradient psum must be within 2x of
    the analytic per-layer psum set (hot fwd [rh_pad, F] + bwd
    [ch_pad, F] partial products, [nrows]/[ncols]-sized psum-gather
    lookups) — i.e. the model-parallel collectives scale with the
    BATCH, not with N or K."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from gnn_tpu.ops.residentgraph import build_resident_graph
    from gnn_tpu.parallel.mesh import put_replicated
    from gnn_tpu.parallel.multihost import make_hybrid_mesh
    from gnn_tpu.parallel.shardedresident import shard_resident_state
    from gnn_tpu.sampling.ladies import ladies_sample, to_device_batch
    from gnn_tpu.sampling.pipeline import stack_minibatches
    from gnn_tpu.train.trainer import (ReplicatedFeatures, build_step_fns,
                                       init_stub_adjs)
    from jax.sharding import NamedSharding

    lap, prob, spec, dense, dense_t, cfg, net = _setup(
        small_graph, adj_format="resident")
    host = build_resident_graph(lap, spec, dense, dense_t)
    host.pop("val_free")
    g_sh = shard_resident_state(dict(host), 4)
    mesh = make_hybrid_mesh(dp=2, part=4)
    feats = ReplicatedFeatures(small_graph.feats)
    opt = optax.adam(0.05)
    fns = build_step_fns(net, opt, False, mesh, feats,
                         part_axis="part")

    mbs = [ladies_sample(cfg, i, small_graph.train_nodes[:64], lap,
                         small_graph.labels) for i in range(2)]
    batch = to_device_batch(stack_minibatches(mbs))
    one = jax.tree_util.tree_map(lambda a: a[0], batch)
    x0 = jnp.zeros((one.input_nodes.shape[0],
                    small_graph.feats.shape[1]), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0,
                      init_stub_adjs(list(one.adjs)),
                      list(one.sampled_nodes))
    pb = _param_bytes(params)
    params = put_replicated(mesh, params)
    opt_state = put_replicated(mesh, opt.init(
        jax.tree_util.tree_map(np.asarray, params)))
    feat_state = put_replicated(mesh, feats.state())
    agg = (jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, g_sh),
        NamedSharding(mesh, P("part"))),)

    text = _lowered_text(fns, params, opt_state, feat_state, agg, batch,
                         feats.plan(mbs[0]), jax.random.PRNGKey(1))
    got = collective_bytes(text)
    ar = got.get("all-reduce", 0)
    F = 32  # nhid
    extra = 0
    for a in one.adjs:
        if a is None:
            continue
        # hot partial-product psums: [rh_pad, F] fwd + [ch_pad, F] bwd
        # (f32) + their backward-pass twins
        extra += 2 * (a.rh_pad + a.ch_pad) * F * 4
        # psum-gather lookups over [nrows]/[ncols] (slot + rowval +
        # colval classes, int32/f32) — generous per-layer budget
        extra += 6 * (a.nrows + a.ncols) * 4
    lo, hi = pb, (pb * 1.3 + 2 * extra)
    assert lo <= ar <= hi, (ar, pb, extra, got)
    # the model-parallel traffic must NOT scale with N (the whole point
    # of the psum-gather design): nothing N-sized may move per step
    n_bytes = lap.shape[0] * 4
    assert ar - pb < 8 * n_bytes or ar - pb < 4 * extra, (ar, pb, extra)
