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
