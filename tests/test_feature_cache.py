"""Feature-cache tests: the all-to-all gather must reproduce the plain
host gather exactly, for every placement strategy, on a virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gnn_tpu.parallel.feature_cache import CachedFeatures, ReplicatedFeatures
from gnn_tpu.parallel.mesh import DATA_AXIS, make_mesh, put_batch
from gnn_tpu.placement.engine import (compute_sample_prob, greedy_placement,
                                      naive_placement)
from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
from gnn_tpu.sampling.pipeline import stack_minibatches
from gnn_tpu.utils.normalize import build_laplacian


def _gather_via_mesh(cache, mb, mesh, ws):
    """Run cache.gather under shard_map exactly as the train step does."""
    plan = cache.plan(mb)
    state = jax.device_put(cache.state(),
                           NamedSharding(mesh, cache.state_spec()))
    dev_plan = put_batch(mesh, plan)
    nodes = put_batch(mesh, np.asarray(mb.input_nodes))
    masks = put_batch(mesh, np.asarray(mb.input_mask))

    def f(state, plan, nodes, masks):
        return cache.gather(state, plan, nodes[0], masks[0])[None]

    g = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(cache.state_spec(), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False))
    return np.asarray(g(state, dev_plan, nodes, masks))


@pytest.mark.parametrize("strategy", ["greedy", "naive", "greedy_alpha0"])
def test_cached_gather_matches_host_gather(small_graph, strategy):
    ws = 4
    mesh = make_mesh(ws)
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    n = small_graph.adj_full.shape[0]
    if strategy == "naive":
        pl = naive_placement(n, per_dev=n // 8, num_devs=ws)
    else:
        prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
        alpha = 0.0 if strategy.endswith("alpha0") else 1.0
        pl = greedy_placement(prob, per_dev=n // 8, num_devs=ws,
                              alpha=alpha)
    cache = CachedFeatures(small_graph.feats, pl)

    cfg = SamplerConfig(batch_size=32, samp_num=64, orders=(1, 1),
                        num_nodes=n, num_classes=small_graph.num_classes)
    mbs = [ladies_sample(cfg, seed, small_graph.train_nodes[r * 32:(r + 1) * 32],
                         lap, small_graph.labels)
           for seed, r in zip(range(ws), range(ws))]
    mb = stack_minibatches(mbs)

    got = _gather_via_mesh(cache, mb, mesh, ws)
    for r in range(ws):
        expected = (small_graph.feats[mb.input_nodes[r]]
                    * mb.input_mask[r][:, None])
        np.testing.assert_allclose(got[r], expected, rtol=1e-6, atol=1e-6)


def test_replicated_matches_host(small_graph):
    ws = 2
    mesh = make_mesh(ws)
    src = ReplicatedFeatures(small_graph.feats)
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=16, samp_num=32, orders=(1,),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes)
    mbs = [ladies_sample(cfg, s, small_graph.train_nodes[:16], lap,
                         small_graph.labels) for s in range(ws)]
    mb = stack_minibatches(mbs)
    x = src.gather(src.state(), (), jnp.asarray(mb.input_nodes[0]),
                   jnp.asarray(mb.input_mask[0]))
    np.testing.assert_allclose(
        np.asarray(x), src.host_gather(mb.input_nodes[0],
                                       mb.input_mask[0]), rtol=1e-6)


def test_e2e_training_with_cached_features(small_graph):
    """Full DP training with the placement-driven cache: the flagship
    integration (BASELINE.json config 3 analog, small scale)."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    ws = 4
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    n = small_graph.adj_full.shape[0]
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    pl = greedy_placement(prob, per_dev=n // 10, num_devs=ws, alpha=1.0)
    cache = CachedFeatures(small_graph.feats, pl)
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                        num_nodes=n, num_classes=small_graph.num_classes)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=ws,
                         pool_num=2)
    net = build_model("graphsage", nhid=32, orders=(1, 1),
                      num_classes=small_graph.num_classes)
    tr = Trainer(net, pipe, small_graph.feats, mesh=make_mesh(ws),
                 lr=0.01, sigmoid_loss=False, feature_source=cache)
    hist = tr.fit(small_graph.train_nodes, small_graph.valid_nodes,
                  epochs=3, log=False)
    assert hist[-1].train_loss < hist[0].train_loss
    assert hist[-1].valid_f1 > 0.4


def test_bf16_feature_table_matches_f32(small_graph):
    """dtype=bfloat16 sources return f32 rows equal to the f32 path up to
    one bf16 rounding of the features at rest (~3 decimal digits)."""
    ws = 2
    mesh = make_mesh(ws)
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    n = small_graph.adj_full.shape[0]
    cfg = SamplerConfig(batch_size=16, samp_num=32, orders=(1,),
                        num_nodes=n,
                        num_classes=small_graph.num_classes)
    mbs = [ladies_sample(cfg, s, small_graph.train_nodes[:16], lap,
                         small_graph.labels) for s in range(ws)]
    mb = stack_minibatches(mbs)

    # replicated table
    src = ReplicatedFeatures(small_graph.feats, dtype=jnp.bfloat16)
    assert src.state().dtype == jnp.bfloat16
    x = np.asarray(src.gather(src.state(), (),
                              jnp.asarray(mb.input_nodes[0]),
                              jnp.asarray(mb.input_mask[0])))
    assert x.dtype == np.float32
    expected = (small_graph.feats[mb.input_nodes[0]]
                * mb.input_mask[0][:, None])
    np.testing.assert_allclose(x, expected, rtol=8e-3, atol=8e-3)

    # sharded cache through the mesh all_to_all
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    pl = greedy_placement(prob, per_dev=n // 8, num_devs=ws, alpha=1.0)
    cache = CachedFeatures(small_graph.feats, pl, dtype=jnp.bfloat16)
    assert cache.state().dtype == jnp.bfloat16
    got = _gather_via_mesh(cache, mb, mesh, ws)
    assert got.dtype == np.float32
    for r in range(ws):
        expected = (small_graph.feats[mb.input_nodes[r]]
                    * mb.input_mask[r][:, None])
        np.testing.assert_allclose(got[r], expected, rtol=8e-3, atol=8e-3)
