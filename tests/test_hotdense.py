"""Hot-subgraph dense aggregation: correctness vs the COO oracle."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu.ops import sparse as sparse_ops
from gnn_tpu.ops.hotdense import (HotSpec, bind_dense, build_hot_dense,
                                  pack_hotdense)
from gnn_tpu.placement.engine import compute_sample_prob
from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
from gnn_tpu.utils.normalize import build_laplacian


def _setup(small_graph, k=256, compress=False, orders=(1, 1)):
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, small_graph.train_nodes, sum(orders))
    spec = HotSpec.from_sample_prob(prob, k)
    d, dt = build_hot_dense(lap, spec)
    dense = (jnp.asarray(d), jnp.asarray(dt))
    kw = dict(batch_size=64, samp_num=256, orders=orders,
              num_nodes=small_graph.adj_full.shape[0],
              num_classes=small_graph.num_classes, compress=compress)
    cfg_hot = SamplerConfig(adj_format="hot", hot_spec=spec, **kw)
    cfg_coo = SamplerConfig(adj_format="coo", **kw)
    mb_hot = ladies_sample(cfg_hot, 3, small_graph.train_nodes[:64], lap,
                           small_graph.labels)
    mb_coo = ladies_sample(cfg_coo, 3, small_graph.train_nodes[:64], lap,
                           small_graph.labels)
    return lap, spec, dense, mb_hot, mb_coo


def test_hot_split_is_exact(small_graph):
    """to_dense(hot) == to_dense(coo): the hot/cold decomposition loses
    nothing and double-counts nothing."""
    _, spec, dense, mb_hot, mb_coo = _setup(small_graph)
    for ah, ac in zip(mb_hot.adjs, mb_coo.adjs):
        ah = dataclasses.replace(
            jax.tree_util.tree_map(jnp.asarray, ah), dense=dense[0],
            dense_t=dense[1])
        dh = np.asarray(sparse_ops.to_dense(ah))
        dc = np.asarray(sparse_ops.to_dense(
            jax.tree_util.tree_map(jnp.asarray, ac)))
        np.testing.assert_allclose(dh, dc, rtol=1e-6, atol=1e-7)


def test_hot_cold_residual_smaller(small_graph):
    """The shipped cold COO must hold strictly fewer edges than the full
    layer (the hot block absorbs the heavy hitters)."""
    _, spec, dense, mb_hot, mb_coo = _setup(small_graph)
    total_cold = sum(int((a.vals != 0).sum()) for a in mb_hot.adjs)
    total_full = sum(int((a.vals != 0).sum()) for a in mb_coo.adjs)
    assert 0 < total_cold < total_full
    # hot fraction should be substantial at K=256 on the 2000-node graph
    assert total_cold < 0.9 * total_full


def test_hot_forward_matches_coo(small_graph):
    _, spec, dense, mb_hot, mb_coo = _setup(small_graph)
    rng = np.random.default_rng(0)
    for ah, ac in zip(mb_hot.adjs, mb_coo.adjs):
        x = jnp.asarray(rng.normal(size=(ac.ncols, 16)).astype(np.float32))
        ah = dataclasses.replace(
            jax.tree_util.tree_map(jnp.asarray, ah), dense=dense[0],
            dense_t=dense[1])
        ac = jax.tree_util.tree_map(jnp.asarray, ac)
        y_hot = sparse_ops.spmm(ah, x)
        y_coo = sparse_ops.spmm(ac, x)
        np.testing.assert_allclose(np.asarray(y_hot), np.asarray(y_coo),
                                   rtol=1e-4, atol=1e-5)


def test_hot_backward_matches_coo(small_graph):
    _, spec, dense, mb_hot, mb_coo = _setup(small_graph)
    rng = np.random.default_rng(1)
    for ah, ac in zip(mb_hot.adjs, mb_coo.adjs):
        x = jnp.asarray(rng.normal(size=(ac.ncols, 8)).astype(np.float32))
        ah = dataclasses.replace(
            jax.tree_util.tree_map(jnp.asarray, ah), dense=dense[0],
            dense_t=dense[1])
        ac = jax.tree_util.tree_map(jnp.asarray, ac)

        def loss(fmt_adj, z):
            return jnp.sum(jnp.sin(sparse_ops.spmm(fmt_adj, z)))

        gh = jax.grad(loss, argnums=1)(ah, x)
        gc = jax.grad(loss, argnums=1)(ac, x)
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gc),
                                   rtol=1e-4, atol=1e-5)


def test_hot_e2e_training(small_graph):
    """Full Trainer epoch on adj_format='hot': loss finite and decreasing
    over a few epochs, matching the COO path's learning signal."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, 256)
    hot_dense = build_hot_dense(lap, spec)
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes,
                        adj_format="hot", hot_spec=spec)
    net = build_model("graphsage", 32, (1, 1),
                      small_graph.num_classes)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                         pool_num=2)
    tr = Trainer(net, pipe, small_graph.feats, lr=0.05,
                 sigmoid_loss=False, hot_dense=hot_dense)
    m0 = tr.train_epoch(small_graph.train_nodes, 0)
    m1 = tr.train_epoch(small_graph.train_nodes, 1)
    m2 = tr.train_epoch(small_graph.train_nodes, 2)
    assert np.isfinite(m0.train_loss)
    assert m2.train_loss < m0.train_loss
    f1, vloss = tr.evaluate(small_graph.valid_nodes, 64)
    assert np.isfinite(vloss)
    assert f1 > 0.2  # well above 1/7 chance


def test_hot_k_exceeding_n_clamps(small_graph):
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    n = lap.shape[0]
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, n + 999)
    assert len(spec.hot_nodes) == n
    d, dt = build_hot_dense(lap, spec)
    assert d.shape[0] % 128 == 0 and d.shape[0] >= n
    np.testing.assert_array_equal(dt, d.T)


def test_subgraph_sampler_hot_matches_coo(small_graph):
    """The hot decomposition is sampler-agnostic: subgraph-sampled layers
    split exactly like LADIES layers."""
    from gnn_tpu.sampling.ladies import subgraph_sample

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, 256)
    d, dt = build_hot_dense(lap, spec)
    kw = dict(batch_size=64, samp_num=256, orders=(1, 1),
              num_nodes=small_graph.adj_full.shape[0],
              num_classes=small_graph.num_classes, compress=False,
              sampler="subgraph")
    mb_hot = subgraph_sample(SamplerConfig(adj_format="hot",
                                           hot_spec=spec, **kw),
                             11, small_graph.train_nodes[:64], lap,
                             small_graph.labels)
    mb_coo = subgraph_sample(SamplerConfig(adj_format="coo", **kw),
                             11, small_graph.train_nodes[:64], lap,
                             small_graph.labels)
    rng = np.random.default_rng(0)
    for ah, ac in zip(mb_hot.adjs, mb_coo.adjs):
        x = jnp.asarray(rng.normal(size=(ac.ncols, 8)).astype(np.float32))
        ah = dataclasses.replace(
            jax.tree_util.tree_map(jnp.asarray, ah),
            dense=jnp.asarray(d), dense_t=jnp.asarray(dt))
        ac = jax.tree_util.tree_map(jnp.asarray, ac)
        yh = np.asarray(sparse_ops.spmm(ah, x))
        yc = np.asarray(sparse_ops.spmm(ac, x))
        # subgraph normfact debias can reach ~1e10, so outputs are huge;
        # tolerance must be relative to the output scale
        np.testing.assert_allclose(
            yh, yc, rtol=2e-4, atol=1e-5 * max(1.0, np.abs(yc).max()))


def test_native_hot_split_matches_numpy(small_graph):
    """The C hot_split must produce exactly the numpy fallback's cold
    set (row order preserved) and col-sorted transpose copy."""
    from gnn_tpu import native as native_mod

    lib = native_mod.get_lib()
    if lib is None:
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(0)
    n_rows, n_cols, nnz = 300, 400, 5000
    # row-sorted synthetic edges
    rows = np.sort(rng.integers(0, n_rows, nnz)).astype(np.int32)
    cols = rng.integers(0, n_cols, nnz).astype(np.int32)
    vals = rng.normal(size=nnz).astype(np.float32)
    hot_r = (rng.random(n_rows) < 0.5)
    hot_c = (rng.random(n_cols) < 0.5)

    cr, cc, cv, crt, cct, cvt = native_mod.hot_split_native(
        lib, rows, cols, vals, hot_r, hot_c, n_cols)

    cold = np.flatnonzero(~(hot_r[rows] & hot_c[cols]))
    np.testing.assert_array_equal(cr, rows[cold])
    np.testing.assert_array_equal(cc, cols[cold])
    np.testing.assert_array_equal(cv, vals[cold])
    # transpose copy: col-sorted permutation of the same cold edges
    o = np.argsort(cols[cold], kind="stable")
    np.testing.assert_array_equal(cct, cols[cold][o])
    assert np.all(np.diff(cct) >= 0)
    # same multiset of (row, col, val) triples
    key = lambda r, c, v: np.lexsort((v, r, c))
    k1, k2 = key(crt, cct, cvt), key(rows[cold], cols[cold], vals[cold])
    np.testing.assert_array_equal(crt[k1], rows[cold][k2])
    np.testing.assert_array_equal(cvt[k1], vals[cold][k2])


def test_hot_with_order0_layers(small_graph):
    """orders containing 0 (dense layers, adj=None — reference
    `sampler.py:107-111`) compose with adj_format='hot'."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, 256)
    hot_dense = build_hot_dense(lap, spec)
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 0, 1),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes,
                        adj_format="hot", hot_spec=spec)
    net = build_model("graphsage", 16, (1, 0, 1),
                      small_graph.num_classes)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=1,
                         pool_num=2)
    tr = Trainer(net, pipe, small_graph.feats, lr=0.05,
                 sigmoid_loss=False, hot_dense=hot_dense)
    m0 = tr.train_epoch(small_graph.train_nodes, 0)
    m1 = tr.train_epoch(small_graph.train_nodes, 1)
    assert np.isfinite(m0.train_loss)
    assert m1.train_loss < m0.train_loss + 0.2


def test_build_hot_dense_cached_roundtrip(small_graph, tmp_path):
    """The disk-cached hot-block build returns the exact same dense
    blocks on a cold build, a warm load, and after a hot-set change
    (which must invalidate)."""
    from gnn_tpu.ops.hotdense import build_hot_dense_cached

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, 256)
    path = str(tmp_path / "hot.npz")
    d_ref, dt_ref = build_hot_dense(lap, spec)
    d1, dt1 = build_hot_dense_cached(lap, spec, cache_path=path)
    np.testing.assert_array_equal(d1, d_ref)
    np.testing.assert_array_equal(dt1, dt_ref)
    import os
    assert os.path.exists(path)
    d2, dt2 = build_hot_dense_cached(lap, spec, cache_path=path)  # warm
    np.testing.assert_array_equal(d2, d_ref)
    np.testing.assert_array_equal(dt2, dt_ref)
    # different K -> different hot set -> cache must not be reused
    spec2 = HotSpec.from_sample_prob(prob, 128)
    d3, _ = build_hot_dense_cached(lap, spec2, cache_path=path)
    np.testing.assert_array_equal(d3, build_hot_dense(lap, spec2)[0])
