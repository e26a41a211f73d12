"""Placement-engine tests on tiny deterministic graphs (SURVEY.md §4)."""
import numpy as np
import pytest
import scipy.sparse as sp

from gnn_tpu.placement.engine import (compute_sample_prob, create_placement,
                                      get_skewed_sampled_nodes,
                                      greedy_placement, naive_placement,
                                      pagraph_placement)
from gnn_tpu.utils.normalize import build_laplacian


def test_sample_prob_matches_manual():
    """sample_prob = 1·lap[train]·lap^(L-1) (`preprocess.py:343-345`)."""
    adj = sp.csr_matrix(np.array([
        [0, 1, 1, 0],
        [1, 0, 1, 0],
        [1, 1, 0, 1],
        [0, 0, 1, 0]], np.float32))
    lap = build_laplacian(adj, "graphsage")
    train = np.array([0, 1])
    p = compute_sample_prob(lap, train, num_conv_layers=2)
    dense = lap.toarray()
    expected = np.ones(2) @ dense[train] @ dense
    np.testing.assert_allclose(p, expected, rtol=1e-6)


def test_greedy_top_nodes_replicated_everywhere():
    prob = np.linspace(1.0, 0.0, 100)  # node 0 hottest
    pl = greedy_placement(prob, per_dev=10, num_devs=4, alpha=1.0)
    # with alpha=1: candidate tail (prob < top) never beats replaced slots
    # exactly... cand probs strictly below -> depends; verify structure:
    for d in range(4):
        assert len(pl.buffers[d]) == 10
    # the very hottest node is buffered on all devices at slot 0
    for d in range(4):
        assert pl.buffers[d][0] == 0
        assert pl.device_id_of_nodes[d, 0] == d  # each rank reads locally


def test_greedy_alpha_zero_distributes_everything():
    prob = np.linspace(1.0, 0.01, 80)
    pl = greedy_placement(prob, per_dev=10, num_devs=4, alpha=0.0)
    # alpha=0 -> gate never fails -> all 40 buffered nodes placed;
    # union of buffers covers the top 40 nodes
    union = np.unique(np.concatenate(pl.buffers))
    np.testing.assert_array_equal(union, np.arange(40))
    # replaced tail nodes on each device are readable somewhere (<= ndev)
    for d in range(4):
        owners = pl.device_id_of_nodes[d, :40]
        assert np.all(owners >= 0), "all top-40 nodes must be on a device"


def test_greedy_single_device():
    prob = np.linspace(1.0, 0.0, 50)
    pl = greedy_placement(prob, per_dev=10, num_devs=1, alpha=1.0)
    np.testing.assert_array_equal(np.sort(pl.buffers[0]), np.arange(10))
    assert np.all(pl.device_id_of_nodes[0, 10:] == -1)


def test_naive_and_random_partition():
    pl = naive_placement(100, per_dev=20, num_devs=4)
    np.testing.assert_array_equal(pl.buffers[0], np.arange(20))
    np.testing.assert_array_equal(pl.buffers[3], np.arange(60, 80))
    assert np.all(pl.device_id_of_nodes[0, 80:] == -1)
    plr = naive_placement(100, per_dev=20, num_devs=4, random=True)
    assert len(np.unique(np.concatenate(plr.buffers))) == 80


def test_pagraph_structure(small_graph):
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    pl = pagraph_placement(small_graph.train_nodes, lap, prob, num_devs=2,
                           num_conv_layers=2, per_dev=100)
    assert pl.train_nodes_per_dev is not None
    covered = np.concatenate(pl.train_nodes_per_dev)
    assert len(covered) >= len(small_graph.train_nodes) * 0.9
    for d in range(2):
        assert len(pl.buffers[d]) <= 100
        # buffered nodes actually map to this device in its own view
        assert np.all(pl.device_id_of_nodes[d, pl.buffers[d]] == d)


def test_skewed_sampled_nodes(small_graph):
    adj = small_graph.adj_full + sp.eye(small_graph.adj_full.shape[0])
    buffers = [np.arange(50), np.arange(50, 100)]
    sets = get_skewed_sampled_nodes(adj, buffers, orders=(1, 1, 1),
                                    top_k=64)
    assert len(sets) == 3
    np.testing.assert_array_equal(sets[0], np.arange(100))
    assert len(sets[1]) == 64 and len(sets[2]) == 64


def test_placement_cache_roundtrip(tmp_path, small_graph):
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    p1 = create_placement(lap, small_graph.train_nodes, per_dev=50,
                          num_devs=2, num_conv_layers=2, alpha=1.0,
                          strategy="greedy", cache_dir=str(tmp_path),
                          dataset="tiny")
    p2 = create_placement(lap, small_graph.train_nodes, per_dev=50,
                          num_devs=2, num_conv_layers=2, alpha=1.0,
                          strategy="greedy", cache_dir=str(tmp_path),
                          dataset="tiny")
    np.testing.assert_array_equal(p1.device_id_of_nodes,
                                  p2.device_id_of_nodes)
    for b1, b2 in zip(p1.buffers, p2.buffers):
        np.testing.assert_array_equal(b1, b2)


def test_per_rank_skew_differs(small_graph):
    """Two ranks with disjoint buffers must skew sampling toward their
    OWN resident nodes (`sampler.py:23-25`): with a strong scale factor,
    each rank's sampled set overlaps its own buffer more than the other
    rank's buffer."""
    import scipy.sparse as sp

    from gnn_tpu.placement.engine import (Placement,
                                          get_per_rank_skewed_nodes)
    from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    n = lap.shape[0]
    # hand-built disjoint placement: rank 0 owns even nodes, rank 1 odd
    buffers = [np.arange(0, n, 2), np.arange(1, n, 2)]
    device_id = np.full((2, n), -1, np.int32)
    slot = np.zeros((2, n), np.int64)
    for d, b in enumerate(buffers):
        device_id[:, b] = d
        slot[:, b] = np.arange(len(b))
    placement = Placement(device_id, slot, [b.copy() for b in buffers])

    skews = get_per_rank_skewed_nodes(
        small_graph.adj_full + sp.eye(n), placement, (1, 1))
    np.testing.assert_array_equal(skews[0][0], buffers[0])
    np.testing.assert_array_equal(skews[1][0], buffers[1])

    cfg = SamplerConfig(batch_size=32, samp_num=128, orders=(1, 1),
                        num_nodes=n,
                        num_classes=small_graph.num_classes,
                        scale_factor=20.0)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                        pool_num=2, per_rank_skew=skews)
    batch = small_graph.train_nodes[:32]
    mb0 = pipe._sample_one(7, batch, rank=0)
    mb1 = pipe._sample_one(7, batch, rank=1)
    in0 = np.asarray(mb0.input_nodes[: mb0.n_input])
    in1 = np.asarray(mb1.input_nodes[: mb1.n_input])
    own0 = np.isin(in0, buffers[0]).mean()
    own1 = np.isin(in1, buffers[1]).mean()
    # same seed, different skew sets -> different samples, each biased
    # toward its own buffer
    assert not np.array_equal(np.sort(in0), np.sort(in1))
    assert own0 > 0.6 and own1 > 0.6


def test_hop_expand_matches_dense_reference(small_graph):
    """The frontier-limited span-gather hop expansion equals the dense
    v*lap formulation the reference uses (`preprocess.py:260-265`)."""
    import numpy as np
    from gnn_tpu.placement.engine import _hop_expand
    from gnn_tpu.utils.normalize import build_laplacian
    lap = build_laplacian(small_graph.adj_full, "graphsage").tocsr()
    rng = np.random.default_rng(0)
    for hops in (1, 2, 3):
        seeds = rng.choice(lap.shape[0], 25, replace=False)
        cur = np.asarray(seeds)
        for _ in range(hops):
            v = np.zeros(lap.shape[0])
            v[cur] = 1.0
            cur = np.union1d(np.flatnonzero((v * lap) != 0), cur)
        np.testing.assert_array_equal(
            _hop_expand(lap, seeds, hops), cur)
