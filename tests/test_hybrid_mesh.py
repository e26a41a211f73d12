"""2-D ('data', 'part') hybrid mesh: DP x feature-cache / graph-partition
composition (SURVEY.md §5.8 ICI/DCN axis mapping)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gnn_tpu.parallel.feature_cache import CachedFeatures
from gnn_tpu.parallel.multihost import DATA_AXIS, PART_AXIS, \
    make_hybrid_mesh
from gnn_tpu.placement.engine import compute_sample_prob, greedy_placement
from gnn_tpu.sampling.ladies import SamplerConfig
from gnn_tpu.sampling.pipeline import BatchPipeline
from gnn_tpu.utils.normalize import build_laplacian


def _mesh_2x4():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return make_hybrid_mesh(dp=2, part=4)


def test_hybrid_cache_gather_matches_host(small_graph):
    """On a 2x4 mesh, the part-axis all_to_all cache gather must equal a
    plain host feature lookup for every one of the 8 global ranks."""
    mesh = _mesh_2x4()
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    placement = greedy_placement(prob, per_dev=300, num_devs=4, alpha=1.0)
    cache = CachedFeatures(small_graph.feats, placement, axis=PART_AXIS,
                           world_size=8)

    cfg = SamplerConfig(batch_size=16, samp_num=64, orders=(1, 1),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=8,
                         pool_num=2)
    mb = next(iter(pipe.train_epoch(small_graph.train_nodes)))
    plan = cache.plan(mb)

    b_spec = P((DATA_AXIS, PART_AXIS))
    sh = NamedSharding(mesh, b_spec)
    feat_state = jax.device_put(cache.state(),
                                NamedSharding(mesh, cache.state_spec()))
    nodes = jax.device_put(jnp.asarray(mb.input_nodes), sh)
    masks = jax.device_put(jnp.asarray(mb.input_mask), sh)
    plan_dev = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), sh), plan)

    def f(fs, pl, nd, mk):
        return cache.gather(fs, pl, nd[0], mk[0])[None]

    gather = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(cache.state_spec(), b_spec, b_spec, b_spec),
        out_specs=b_spec, check_vma=False))
    got = np.asarray(gather(feat_state, plan_dev, nodes, masks))
    for r in range(8):
        want = small_graph.feats[np.asarray(mb.input_nodes)[r]] \
            * np.asarray(mb.input_mask)[r][:, None]
        np.testing.assert_allclose(got[r], want, rtol=1e-6, atol=1e-6)


def test_hybrid_dp_cache_training(small_graph):
    """Full DP(2) x cache-partition(4) training epoch through the Trainer:
    gradient psum spans both axes, cache all_to_all spans only 'part'."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.train.trainer import Trainer

    mesh = _mesh_2x4()
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    placement = greedy_placement(prob, per_dev=300, num_devs=4, alpha=1.0)
    cache = CachedFeatures(small_graph.feats, placement, axis=PART_AXIS,
                           world_size=8)
    cfg = SamplerConfig(batch_size=16, samp_num=64, orders=(1, 1),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=8,
                         pool_num=2)
    net = build_model("graphsage", 16, (1, 1), small_graph.num_classes)
    tr = Trainer(net, pipe, small_graph.feats, mesh=mesh, lr=0.05,
                 sigmoid_loss=False, feature_source=cache)
    m0 = tr.train_epoch(small_graph.train_nodes, 0)
    m1 = tr.train_epoch(small_graph.train_nodes, 1)
    assert np.isfinite(m0.train_loss) and np.isfinite(m1.train_loss)
    assert m1.train_loss < m0.train_loss + 0.5


def test_hybrid_fullgraph_matches_1d(small_graph):
    """FullGraphTrainer partitioned over the flattened 2x4 hybrid mesh
    computes the same losses as the 1-D 8-device partition (owner
    assignment is identical; only collective routing differs)."""
    from gnn_tpu.train.fullgraph import FullGraphTrainer

    mesh = _mesh_2x4()
    lap = build_laplacian(small_graph.adj_full, "gcn")
    labels = np.asarray(small_graph.labels.todense(), np.float32)
    mask = np.zeros(lap.shape[0], bool)
    mask[small_graph.train_nodes] = True
    kw = dict(adj=lap, feats=small_graph.feats, labels_dense=labels,
              train_mask=mask, orders=(1, 1), nhid=16,
              num_classes=small_graph.labels.shape[1], lr=0.05, seed=0)
    fg_2d = FullGraphTrainer(mesh=mesh, **kw)
    losses_2d = fg_2d.train_steps(3)
    fg_1d = FullGraphTrainer(n_devices=8, **kw)
    losses_1d = fg_1d.train_steps(3)
    np.testing.assert_allclose(losses_2d, losses_1d, rtol=2e-4, atol=1e-5)
