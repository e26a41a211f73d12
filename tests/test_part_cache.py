"""PartCachedFeatures: the placement-driven cache composed with the
part-sharded resident state (VERDICT item 4 — `--resident_parts` +
`--feature_cache` share the 'part' axis, so per-chip HBM for BOTH the
resident graph and the feature buffers divides by P; reference analogue:
the paper's placement cache `preprocess.py:311-407` deployed under
`main.py:129-134`, which the reference can only run replicated).

Covers: psum-gather == host gather on the hybrid mesh for every
placement strategy (with live host-fallback rows), pooled plan-buffer
reuse never aliasing grouped plans, PartGatherPlan stacking, and the
fully composed Trainer matching the replicated-everything run."""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gnn_tpu.parallel.feature_cache import (CachedFeatures,
                                            PartCachedFeatures,
                                            stack_gather_plans)
from gnn_tpu.parallel.multihost import make_hybrid_mesh
from gnn_tpu.placement.engine import (compute_sample_prob,
                                      greedy_placement, naive_placement,
                                      pagraph_placement)
from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
from gnn_tpu.sampling.pipeline import stack_minibatches
from gnn_tpu.utils.normalize import build_laplacian

DP, PARTS = 2, 4


def _placement(small_graph, lap, strategy, num_devs=PARTS):
    n = small_graph.adj_full.shape[0]
    per_dev = n // 10  # small buffers => host-fallback rows stay live
    if strategy == "naive":
        return naive_placement(n, per_dev=per_dev, num_devs=num_devs)
    if strategy == "pagraph":
        prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
        return pagraph_placement(small_graph.train_nodes, lap, prob,
                                 num_devs=num_devs, num_conv_layers=2,
                                 per_dev=per_dev)
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    return greedy_placement(prob, per_dev=per_dev, num_devs=num_devs)


def _stacked_mb(small_graph, lap, ws=DP):
    cfg = SamplerConfig(batch_size=32, samp_num=64, orders=(1, 1),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes)
    mbs = [ladies_sample(cfg, s, small_graph.train_nodes[s * 32:
                                                         (s + 1) * 32],
                         lap, small_graph.labels) for s in range(ws)]
    return stack_minibatches(mbs)


def _gather_hybrid(cache, mb, mesh):
    """Run cache.gather under shard_map exactly as the composed train
    step does: state sharded over 'part', plan/batch sharded over 'data'
    and replicated over 'part'."""
    plan = cache.plan(mb)
    state = jax.device_put(cache.state(),
                           NamedSharding(mesh, cache.state_spec()))
    dsh = NamedSharding(mesh, P("data"))
    dev_plan = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, dsh), plan)
    nodes = jax.device_put(np.asarray(mb.input_nodes), dsh)
    masks = jax.device_put(np.asarray(mb.input_mask), dsh)

    def f(state, plan, nodes, masks):
        return cache.gather(state, plan, nodes[0], masks[0])[None]

    g = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(cache.state_spec(), P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    return np.asarray(g(state, dev_plan, nodes, masks))


@pytest.mark.parametrize("strategy", ["greedy", "naive", "pagraph"])
def test_part_cached_gather_matches_host(small_graph, strategy):
    if jax.device_count() < DP * PARTS:
        pytest.skip("needs 8 virtual devices")
    mesh = make_hybrid_mesh(dp=DP, part=PARTS)
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    pl = _placement(small_graph, lap, strategy)
    cache = PartCachedFeatures(small_graph.feats, pl)
    # the composition's point: some inputs are buffered, some are not
    mb = _stacked_mb(small_graph, lap)
    owner = cache._owner_map[np.asarray(mb.input_nodes)]
    assert (owner >= 0).any(), "no buffered inputs — test is vacuous"
    assert (owner == -1).any(), "no host-fallback inputs — enlarge graph"

    got = _gather_hybrid(cache, mb, mesh)
    for r in range(DP):
        expected = (small_graph.feats[mb.input_nodes[r]]
                    * mb.input_mask[r][:, None])
        np.testing.assert_allclose(got[r], expected, rtol=1e-6,
                                   atol=1e-6, err_msg=f"rank {r}")


def test_part_cached_bf16_matches_f32(small_graph):
    if jax.device_count() < DP * PARTS:
        pytest.skip("needs 8 virtual devices")
    mesh = make_hybrid_mesh(dp=DP, part=PARTS)
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    pl = _placement(small_graph, lap, "greedy")
    cache = PartCachedFeatures(small_graph.feats, pl,
                               dtype=jnp.bfloat16)
    assert cache.state().dtype == jnp.bfloat16
    mb = _stacked_mb(small_graph, lap)
    got = _gather_hybrid(cache, mb, mesh)
    assert got.dtype == np.float32
    for r in range(DP):
        expected = (small_graph.feats[mb.input_nodes[r]]
                    * mb.input_mask[r][:, None])
        np.testing.assert_allclose(got[r], expected, rtol=8e-3,
                                   atol=8e-3)


def test_canonical_owner_map_single_owner(small_graph):
    """Every buffered node resolves to exactly one contributing part
    (the psum-gather's correctness hinges on this even when the greedy
    placement replicates its top block on every device)."""
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    for strategy in ("greedy", "naive", "pagraph"):
        pl = _placement(small_graph, lap, strategy)
        cache = PartCachedFeatures(small_graph.feats, pl)
        om, sm = cache._owner_map, cache._slot_map
        buffered = om >= 0
        # greedy replicates nodes: several devices may hold a node, the
        # canonical map must still pick ONE and a slot valid on it
        ids = np.flatnonzero(buffered)
        np.testing.assert_array_equal(
            pl.device_id_of_nodes[om[ids], ids], om[ids],
            err_msg=f"{strategy}: owner does not hold the node")
        rows = cache._buffer_stack[om[ids], sm[ids]]
        np.testing.assert_allclose(
            rows, np.asarray(small_graph.feats,
                             np.float32)[ids],
            err_msg=f"{strategy}: slot rows wrong")


def _plan_shim(mb, r0=0):
    return types.SimpleNamespace(input_nodes=np.asarray(mb.input_nodes),
                                 input_mask=np.asarray(mb.input_mask))


def test_pooled_plan_buffers_do_not_alias_grouped(small_graph,
                                                  monkeypatch):
    """Regression: pooled plan outputs are reused across steps on TPU;
    the grouped path keeps G plans live before stacking, so it must
    request fresh buffers (`pooled=False`) or step g's plan silently
    becomes step G-1's. Forces the pooled branch by faking the backend
    name (the pool gate is the only consumer)."""
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    mb = _stacked_mb(small_graph, lap)
    shim = _plan_shim(mb)
    for cache in (PartCachedFeatures(small_graph.feats,
                                     _placement(small_graph, lap,
                                                "greedy")),
                  CachedFeatures(small_graph.feats,
                                 _placement(small_graph, lap, "greedy",
                                            num_devs=DP))):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        p1 = cache.plan(shim)
        p2 = cache.plan(shim)
        assert np.asarray(p1.host_rows) is np.asarray(p2.host_rows), \
            "pooled plans should share buffers (that is the point)"
        q1 = cache.plan(shim, pooled=False)
        q2 = cache.plan(shim, pooled=False)
        assert np.asarray(q1.host_rows) is not np.asarray(q2.host_rows)
        monkeypatch.undo()


def test_stack_part_gather_plans_pads_host_bucket(small_graph):
    """Stacking PartGatherPlans with different host-bucket sizes pads to
    the max; padded host rows land past the input tensor (dropped)."""
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    pl = _placement(small_graph, lap, "greedy")
    cache = PartCachedFeatures(small_graph.feats, pl,
                               remote_bucket_min=4)
    mb = _stacked_mb(small_graph, lap)
    shim = _plan_shim(mb)
    # second step: all-buffered inputs -> tiny host bucket (same input
    # cap C as step 0 — static shapes, as in real training)
    C_in = mb.input_nodes.shape[1]
    top = pl.buffers[0]
    nodes2 = np.tile(top[np.arange(C_in) % len(top)], (DP, 1))
    shim2 = types.SimpleNamespace(
        input_nodes=nodes2,
        input_mask=np.ones_like(nodes2, np.float32))
    plans = [cache.plan(shim, pooled=False),
             cache.plan(shim2, pooled=False)]
    C = mb.input_nodes.shape[1]
    stacked = stack_gather_plans(plans, C)
    assert stacked.host_pos.shape == (2, DP,
                                      max(p.host_pos.shape[-1]
                                          for p in plans))
    # step 0's rows survived the stacking intact
    np.testing.assert_array_equal(stacked.owner[0], plans[0].owner)
    h0 = plans[0].host_pos.shape[-1]
    np.testing.assert_array_equal(stacked.host_pos[0, :, :h0],
                                  plans[0].host_pos)
    # padding points one past the end (dropped by the scatter)
    assert (stacked.host_pos[0, :, h0:] == C).all()


def _resident_setup(graph, orders=(1, 1)):
    from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense
    from gnn_tpu.ops.residentgraph import build_resident_graph
    lap = build_laplacian(graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, graph.train_nodes, sum(orders))
    spec = HotSpec.from_sample_prob(prob, 256)
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=orders,
                        num_nodes=graph.adj_full.shape[0],
                        num_classes=graph.num_classes, hot_spec=spec,
                        adj_format="resident", compress=False,
                        resident_ship_cold=True, resident_val_free=True)
    host = build_resident_graph(lap, spec, dense, dense_t)
    return lap, cfg, host


def _composed_trainer(graph, lap, cfg, host, group=1):
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    pl = _placement(graph, lap, "greedy")
    cache = PartCachedFeatures(graph.feats, pl)
    pipe = BatchPipeline(cfg, lap, graph.labels, world_size=DP,
                         pool_num=2)
    net = build_model("graphsage", nhid=32, orders=cfg.orders,
                      num_classes=graph.num_classes)
    return Trainer(net, pipe, graph.feats,
                   mesh=make_hybrid_mesh(dp=DP, part=PARTS), lr=0.05,
                   sigmoid_loss=False, seed=3, resident_graph=host,
                   resident_parts=PARTS, feature_source=cache,
                   steps_per_dispatch=group)


def test_composed_trainer_matches_replicated(small_graph):
    """The FULL composition — part-sharded resident state + placement
    cache sharded over the same 'part' axis, under DP — trains, evals
    and tests identically to the replicated-everything DP run (only
    state layout and collectives differ; the gather is exact)."""
    if jax.device_count() < DP * PARTS:
        pytest.skip("needs 8 virtual devices")
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap, cfg, host = _resident_setup(small_graph)

    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=DP,
                         pool_num=2)
    net = build_model("graphsage", nhid=32, orders=cfg.orders,
                      num_classes=small_graph.num_classes)
    tr_rep = Trainer(net, pipe, small_graph.feats, mesh=make_mesh(DP),
                     lr=0.05, sigmoid_loss=False, seed=3,
                     resident_graph=host)
    tr_cmp = _composed_trainer(small_graph, lap, cfg, host)

    res = {}
    for name, tr in (("rep", tr_rep), ("composed", tr_cmp)):
        m = tr.train_epoch(small_graph.train_nodes, epoch=0)
        f1, vloss = tr.evaluate(small_graph.valid_nodes, 128, "val")
        test_f1 = tr.test(small_graph.test_nodes, batch_size=128)
        res[name] = (m.train_loss, vloss, f1, test_f1)

    assert res["composed"][0] == pytest.approx(res["rep"][0], abs=2e-4)
    assert res["composed"][1] == pytest.approx(res["rep"][1], abs=2e-3)
    assert res["composed"][2] == pytest.approx(res["rep"][2], abs=2e-2)
    assert res["composed"][3] == pytest.approx(res["rep"][3], abs=2e-2)


def test_composed_grouped_matches_per_step(small_graph):
    """steps_per_dispatch=2 with the composed sources (PartGatherPlan
    stacking through the grouped lax.scan) reproduces the per-step run
    exactly — this is the path the pooled-alias fix protects."""
    if jax.device_count() < DP * PARTS:
        pytest.skip("needs 8 virtual devices")
    lap, cfg, host = _resident_setup(small_graph)
    losses = {}
    for g in (1, 2):
        tr = _composed_trainer(small_graph, lap, cfg, host, group=g)
        m = tr.train_epoch(small_graph.train_nodes, epoch=0)
        losses[g] = m.train_loss
    assert losses[2] == pytest.approx(losses[1], abs=2e-5)
