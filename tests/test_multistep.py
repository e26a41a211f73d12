"""Multi-step-per-dispatch training: G optimizer steps per host dispatch
via a jitted lax.scan over stacked batches (`Trainer(steps_per_dispatch=G)`).

Must be NUMERICALLY the per-step schedule — same rng stream, same update
order, padded tail steps masked out — so every test here compares against
the steps_per_dispatch=1 path on identical seeds.
"""
import dataclasses

import jax
import numpy as np
import pytest

from gnn_tpu.models.gnn import build_model
from gnn_tpu.parallel.mesh import make_mesh
from gnn_tpu.sampling.ladies import SamplerConfig
from gnn_tpu.sampling.pipeline import BatchPipeline
from gnn_tpu.train.trainer import Trainer
from gnn_tpu.utils.normalize import build_laplacian


def _make_trainer(graph, world_size, spd, adj_format="coo", seed=0,
                  feature_cache=False, batch_size=64,
                  stream_tiles=False):
    lap = build_laplacian(graph.adj_full, "graphsage")
    hot_spec = None
    hot_dense = None
    resident_graph = None
    if adj_format in ("hot", "resident"):
        from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense
        from gnn_tpu.placement.engine import compute_sample_prob
        prob = compute_sample_prob(lap, graph.train_nodes, 2)
        hot_spec = HotSpec.from_sample_prob(prob, 256)
        hot_dense = build_hot_dense(lap, hot_spec)
    if adj_format == "resident":
        from gnn_tpu.ops.residentgraph import build_resident_graph
        resident_graph = build_resident_graph(lap, hot_spec,
                                              hot_dense[0], hot_dense[1])
        hot_dense = None
    cfg = SamplerConfig(batch_size=batch_size, samp_num=128, orders=(1, 1),
                        num_nodes=graph.adj_full.shape[0],
                        num_classes=graph.num_classes,
                        adj_format=adj_format, hot_spec=hot_spec,
                        resident_ship_cold=True,
                        resident_val_free=adj_format == "resident",
                        resident_stream_tiles=stream_tiles)
    pipe = BatchPipeline(cfg, lap, graph.labels, world_size=world_size,
                         pool_num=2, seed=seed)
    net = build_model("graphsage", nhid=32, orders=(1, 1),
                      num_classes=graph.num_classes)
    source = None
    if feature_cache:
        from gnn_tpu.parallel.feature_cache import CachedFeatures
        from gnn_tpu.placement.engine import create_placement
        placement = create_placement(
            lap, graph.train_nodes, per_dev=400, num_devs=world_size,
            num_conv_layers=2, alpha=0.0, strategy="greedy")
        source = CachedFeatures(graph.feats, placement)
    return Trainer(net, pipe, graph.feats, mesh=make_mesh(world_size),
                   lr=0.05, sigmoid_loss=False, seed=seed,
                   feature_source=source, hot_dense=hot_dense,
                   resident_graph=resident_graph,
                   steps_per_dispatch=spd)


def _params_close(p1, p2, atol=2e-5):
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=2e-4)


def test_grouped_pipeline_layout(small_graph):
    """train_epoch_grouped yields [G, ws, ...] leaves whose per-step
    content equals the per-step pipeline's batches (same epoch seeds),
    and pads the final short group with n_valid < G."""
    tr = _make_trainer(small_graph, world_size=2, spd=1)
    pipe = tr.pipeline
    G = 3
    per_step = list(pipe.train_epoch(small_graph.train_nodes, epoch=0))
    grouped = list(pipe.train_epoch_grouped(small_graph.train_nodes,
                                            epoch=0, group=G))
    n_steps = len(per_step)
    assert sum(nv for _, nv in grouped) == n_steps
    assert grouped[-1][1] == (n_steps % G or G)
    i = 0
    for mb, nv in grouped:
        assert mb.labels.shape[0] == G
        assert mb.labels.shape[1] == 2  # world_size
        for g in range(nv):
            np.testing.assert_array_equal(mb.labels[g],
                                          per_step[i].labels)
            np.testing.assert_array_equal(mb.input_nodes[g],
                                          per_step[i].input_nodes)
            np.testing.assert_array_equal(mb.label_mask[g],
                                          per_step[i].label_mask)
            i += 1


@pytest.mark.parametrize("adj_format", ["coo", "hot"])
def test_multistep_matches_per_step(small_graph, adj_format):
    """G=4 grouped training reproduces per-step training: same losses,
    same final params (one epoch has a non-multiple-of-G step count, so
    the masked tail path is exercised)."""
    tr1 = _make_trainer(small_graph, 2, 1, adj_format=adj_format)
    trG = _make_trainer(small_graph, 2, 4, adj_format=adj_format)
    h1 = [tr1.train_epoch(small_graph.train_nodes, e) for e in range(2)]
    hG = [trG.train_epoch(small_graph.train_nodes, e) for e in range(2)]
    n_steps = tr1._last_epoch_steps
    assert n_steps % 4 != 0, "fixture should exercise the padded tail"
    assert trG._last_epoch_steps == n_steps
    for m1, mG in zip(h1, hG):
        assert abs(m1.train_loss - mG.train_loss) < 1e-4
    _params_close(tr1.params, trG.params)
    _params_close(tr1.opt_state, trG.opt_state)


def test_multistep_stream_tiles_matches_per_step(small_graph):
    """G=4 grouped training with the edge-stream cold payload (tile
    repadding across group members + the scan) matches per-step."""
    tr1 = _make_trainer(small_graph, 2, 1, adj_format="resident",
                        stream_tiles=True)
    trG = _make_trainer(small_graph, 2, 4, adj_format="resident",
                        stream_tiles=True)
    m1 = tr1.train_epoch(small_graph.train_nodes, 0)
    mG = trG.train_epoch(small_graph.train_nodes, 0)
    assert trG._last_epoch_steps == tr1._last_epoch_steps
    assert abs(m1.train_loss - mG.train_loss) < 1e-4
    _params_close(tr1.params, trG.params)


def test_multistep_with_feature_cache(small_graph):
    """Grouped dispatch composes with the sharded feature cache (stacked
    GatherPlans ride the scan) and matches the per-step cache path."""
    tr1 = _make_trainer(small_graph, 2, 1, feature_cache=True)
    trG = _make_trainer(small_graph, 2, 2, feature_cache=True)
    m1 = tr1.train_epoch(small_graph.train_nodes, 0)
    mG = trG.train_epoch(small_graph.train_nodes, 0)
    assert abs(m1.train_loss - mG.train_loss) < 1e-4
    _params_close(tr1.params, trG.params)


def test_multistep_fit_and_eval(small_graph):
    """fit() through the grouped path learns and evaluates normally."""
    tr = _make_trainer(small_graph, 2, 4)
    hist = tr.fit(small_graph.train_nodes, small_graph.valid_nodes,
                  epochs=3, log=False)
    assert hist[-1].train_loss < hist[0].train_loss
    assert hist[-1].valid_f1 > 0.4
