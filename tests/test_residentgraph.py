"""Resident-graph minibatching (gnn_tpu/ops/residentgraph.py): the
device-rebuilt HotDenseAdj must agree with the host pack_hotdense path
layer by layer, and end-to-end training must match the hot format."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense, bind_dense
from gnn_tpu.ops.residentgraph import (ResidentGraph, ResidentLayerRef,
                                       build_resident_graph,
                                       materialize_adjs)
from gnn_tpu.ops.sparse import spmm, spmm_transpose
from gnn_tpu.placement.engine import compute_sample_prob
from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
from gnn_tpu.utils.normalize import build_laplacian


def _setup(graph, hot_k=256, orders=(1, 1), samp=128, batch=64,
           sampler="ladies", ship_cold=False, val_free=False,
           stream_tiles=False, norm="row"):
    lap = build_laplacian(graph.adj_full, "graphsage", norm=norm)
    prob = compute_sample_prob(lap, graph.train_nodes, sum(orders))
    spec = HotSpec.from_sample_prob(prob, hot_k)
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    kw = dict(batch_size=batch, samp_num=samp, orders=orders,
              num_nodes=graph.adj_full.shape[0],
              num_classes=graph.num_classes, hot_spec=spec,
              sampler=sampler, compress=False,
              resident_ship_cold=ship_cold,
              resident_val_free=ship_cold and val_free,
              resident_stream_tiles=stream_tiles)
    cfg_hot = SamplerConfig(adj_format="hot", **kw)
    cfg_res = SamplerConfig(adj_format="resident", **kw)
    host = build_resident_graph(lap, spec, dense, dense_t)
    n, k = host.pop("n"), host.pop("k")
    ct = host.pop("col_trivial")
    assert host.pop("val_free") is True  # binary synthetic adjacency
    assert ct == (norm == "row")
    g = ResidentGraph(**{f: jnp.asarray(v) for f, v in host.items()},
                      n=n, k=k, col_trivial=ct)
    return lap, spec, dense, dense_t, cfg_hot, cfg_res, g


@pytest.mark.parametrize("orders", [(1, 1), (1, 0, 1)])
@pytest.mark.parametrize("ship_cold,val_free,stream",
                         [(False, False, False), (True, False, False),
                          (True, True, False), (True, True, True)])
def test_materialized_layer_matches_host_pack(small_graph, orders,
                                              ship_cold, val_free,
                                              stream):
    lap, spec, dense, dense_t, cfg_hot, cfg_res, g = _setup(
        small_graph, orders=orders, ship_cold=ship_cold,
        val_free=val_free, stream_tiles=stream)
    tgt = small_graph.train_nodes[:64]
    mb_hot = ladies_sample(cfg_hot, 5, tgt, lap, small_graph.labels)
    mb_res = ladies_sample(cfg_res, 5, tgt, lap, small_graph.labels)

    adjs_host = bind_dense(mb_hot.adjs, jnp.asarray(dense),
                           jnp.asarray(dense_t))
    adjs_dev = materialize_adjs(
        g, list(mb_res.adjs),
        [jnp.asarray(s) for s in mb_res.sampled_nodes],
        jnp.asarray(mb_res.input_nodes))

    rng = np.random.default_rng(0)
    for l, (ah, ad) in enumerate(zip(adjs_host, adjs_dev)):
        assert (ah is None) == (ad is None)
        if ah is None:
            continue
        assert ad.shape == ah.shape
        x = jnp.asarray(rng.normal(size=(ah.ncols, 8)).astype(np.float32))
        gout = jnp.asarray(rng.normal(size=(ah.nrows, 8)).astype(
            np.float32))
        np.testing.assert_allclose(np.asarray(spmm(ad, x)),
                                   np.asarray(spmm(ah, x)),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {l} fwd")
        np.testing.assert_allclose(np.asarray(spmm_transpose(ad, gout)),
                                   np.asarray(spmm_transpose(ah, gout)),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {l} bwd")


def test_resident_ref_payload_is_small(small_graph):
    lap, spec, dense, dense_t, cfg_hot, cfg_res, g = _setup(small_graph)
    tgt = small_graph.train_nodes[:64]
    # full-expansion mode: per-layer payload carries NO edges at all
    mb = ladies_sample(cfg_res, 7, tgt, lap, small_graph.labels)
    ref = mb.adjs[-1]
    assert isinstance(ref, ResidentLayerRef)
    payload = sum(np.asarray(a).nbytes
                  for a in jax.tree_util.tree_leaves(ref))
    assert payload <= 4 * ref.ncols + 16   # normfact + 2 scalars
    # and the buckets cover the true counts
    mb_hot = ladies_sample(cfg_hot, 7, tgt, lap, small_graph.labels)
    hot = mb_hot.adjs[-1]
    assert ref.nnz_cold >= int((np.asarray(hot.vals) != 0).sum())
    # lite mode: only the forward cold COO rides along — well under
    # half the hot format's per-layer bytes (no transpose copy, no
    # k-sized plumbing arrays)
    lap2, _, _, _, _, cfg_lite, _ = _setup(small_graph, ship_cold=True)
    mb_l = ladies_sample(cfg_lite, 7, tgt, lap2, small_graph.labels)
    lite = mb_l.adjs[-1]
    assert lite.cols is not None and lite.row_cnt is not None
    lite_bytes = sum(np.asarray(a).nbytes
                     for a in jax.tree_util.tree_leaves(lite))
    hot_bytes = sum(np.asarray(a).nbytes
                    for a in jax.tree_util.tree_leaves(hot))
    assert lite_bytes < hot_bytes / 2


@pytest.mark.parametrize("ship_cold", [False, True])
def test_resident_e2e_training_matches_hot(small_graph, ship_cold):
    """One epoch of DP training: resident == hot to float tolerance
    (identical sampling seeds; only the adjacency transport differs)."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap, spec, dense, dense_t, cfg_hot, cfg_res, g = _setup(
        small_graph, ship_cold=ship_cold)
    host = build_resident_graph(lap, spec, dense, dense_t)

    losses = {}
    for name, cfg, kw in [
            ("hot", cfg_hot, dict(hot_dense=(dense, dense_t))),
            ("res", cfg_res, dict(resident_graph=host))]:
        pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                             pool_num=2)
        net = build_model("graphsage", nhid=32, orders=cfg.orders,
                          num_classes=small_graph.num_classes)
        tr = Trainer(net, pipe, small_graph.feats, mesh=make_mesh(2),
                     lr=0.05, sigmoid_loss=False, seed=3, **kw)
        m = tr.train_epoch(small_graph.train_nodes, epoch=0)
        f1, vloss = tr.evaluate(small_graph.valid_nodes, 128, "val")
        losses[name] = (m.train_loss, vloss, f1)
    assert losses["res"][0] == pytest.approx(losses["hot"][0], abs=2e-4)
    assert losses["res"][1] == pytest.approx(losses["hot"][1], abs=2e-3)


def test_stream_tiles_e2e_training_matches_segsum(small_graph):
    """DP training with the edge-stream cold payload matches the
    segment-sum lite payload (same seeds; interpret-mode kernel on the
    CPU mesh runs exact f32, so losses agree to float tolerance)."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    losses = {}
    for name, stream in [("segsum", False), ("stream", True)]:
        lap, spec, dense, dense_t, _, cfg_res, g = _setup(
            small_graph, ship_cold=True, val_free=True,
            stream_tiles=stream)
        host = build_resident_graph(lap, spec, dense, dense_t)
        pipe = BatchPipeline(cfg_res, lap, small_graph.labels,
                             world_size=2, pool_num=2)
        net = build_model("graphsage", nhid=32, orders=cfg_res.orders,
                          num_classes=small_graph.num_classes)
        tr = Trainer(net, pipe, small_graph.feats, mesh=make_mesh(2),
                     lr=0.05, sigmoid_loss=False, seed=3,
                     resident_graph=host)
        m = tr.train_epoch(small_graph.train_nodes, epoch=0)
        f1, vloss = tr.evaluate(small_graph.valid_nodes, 128, "val")
        losses[name] = (m.train_loss, vloss, f1)
    assert losses["stream"][0] == pytest.approx(losses["segsum"][0],
                                                abs=2e-4)
    assert losses["stream"][1] == pytest.approx(losses["segsum"][1],
                                                abs=2e-3)


def test_stream_tiles_payload_replaces_cold_coo(small_graph):
    """Stream-tiles payload ships coords + entry tables and NO cold
    COO arrays (cols/row_cnt/vals are None)."""
    lap, spec, dense, dense_t, _, cfg_res, g = _setup(
        small_graph, ship_cold=True, val_free=True, stream_tiles=True)
    tgt = small_graph.train_nodes[:64]
    mb = ladies_sample(cfg_res, 11, tgt, lap, small_graph.labels)
    ref = mb.adjs[-1]
    assert ref.es_rc is not None and ref.es_coords is not None
    assert ref.cols is None and ref.row_cnt is None and ref.vals is None
    assert ref.es_coords.dtype == np.int16
    assert ref.es_bk in (128, 256)


def test_resident_subgraph_sampler(small_graph):
    """The subgraph sampler's square layers materialize correctly too."""
    from gnn_tpu.sampling.ladies import subgraph_sample
    lap, spec, dense, dense_t, cfg_hot, cfg_res, g = _setup(
        small_graph, sampler="subgraph")
    tgt = small_graph.train_nodes[:64]
    mb_hot = subgraph_sample(cfg_hot, 9, tgt, lap, small_graph.labels)
    mb_res = subgraph_sample(cfg_res, 9, tgt, lap, small_graph.labels)
    adjs_host = bind_dense(mb_hot.adjs, jnp.asarray(dense),
                           jnp.asarray(dense_t))
    adjs_dev = materialize_adjs(
        g, list(mb_res.adjs),
        [jnp.asarray(s) for s in mb_res.sampled_nodes],
        jnp.asarray(mb_res.input_nodes))
    rng = np.random.default_rng(1)
    for l, (ah, ad) in enumerate(zip(adjs_host, adjs_dev)):
        if ah is None:
            continue
        x = jnp.asarray(rng.normal(size=(ah.ncols, 4)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(spmm(ad, x)),
                                   np.asarray(spmm(ah, x)),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {l}")


def test_native_cold_slice_matches_masked_full(small_graph):
    """The native cold-only extraction (resident-lite fast path) equals
    masking the full native slice by hotness."""
    from gnn_tpu import native
    from gnn_tpu.native import NativeCSR, ladies_layer_native
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native lib")
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    lap = lap.tocsr()
    g = NativeCSR(lap)
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, 256)
    hot_node = (spec.slot_of_node >= 0).astype(np.uint8)
    prev = np.sort(small_graph.train_nodes[:64]).astype(np.int64)

    a1, nf1, r1, c1, v1 = ladies_layer_native(lib, g, prev, 128, 7)
    a2, nf2, r2, c2, v2 = ladies_layer_native(lib, g, prev, 128, 7,
                                              hot_node=hot_node)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(nf1, nf2)
    hot_r = spec.slot_of_node[prev] >= 0
    hot_c = spec.slot_of_node[a1] >= 0
    cold = ~(hot_r[r1] & hot_c[c1])
    # the split-CSR fast path reorders edges WITHIN a row (cold-col
    # prefix first) — compare as (row, col)-sorted sets
    o1 = np.lexsort((c1[cold], r1[cold]))
    o2 = np.lexsort((c2, r2))
    np.testing.assert_array_equal(r2[o2], r1[cold][o1])
    np.testing.assert_array_equal(c2[o2], c1[cold][o1])
    np.testing.assert_array_equal(v2[o2], v1[cold][o1])
    assert len(r2) < len(r1)  # something was actually hot-hot


def _resident_trainer(graph, tmp=None):
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    lap, spec, dense, dense_t, cfg_hot, cfg_res, g = _setup(
        graph, ship_cold=True, val_free=True)
    host = build_resident_graph(lap, spec, dense, dense_t)
    pipe = BatchPipeline(cfg_res, lap, graph.labels, world_size=2,
                         pool_num=2)
    net = build_model("graphsage", nhid=32, orders=cfg_res.orders,
                      num_classes=graph.num_classes)
    return Trainer(net, pipe, graph.feats, mesh=make_mesh(2), lr=0.05,
                   sigmoid_loss=False, seed=3, resident_graph=host)


def test_resident_resume_reproduces_loss_curve(small_graph, tmp_path):
    """Exact-replay resume holds with the resident device path (the
    materialized adjacency is a pure function of the shipped batch)."""
    tr_full = _resident_trainer(small_graph)
    hist_full = tr_full.fit(small_graph.train_nodes,
                            small_graph.valid_nodes, epochs=3, log=False)
    ck = str(tmp_path / "res_ck")
    tr_a = _resident_trainer(small_graph)
    tr_a.fit(small_graph.train_nodes, small_graph.valid_nodes, epochs=1,
             log=False, checkpoint_dir=ck)
    del tr_a
    tr_b = _resident_trainer(small_graph)
    hist_b = tr_b.fit(small_graph.train_nodes, small_graph.valid_nodes,
                      epochs=3, log=False, checkpoint_dir=ck,
                      resume=True)
    assert [m.epoch for m in hist_b] == [1, 2]
    for m_resumed in hist_b:
        np.testing.assert_allclose(
            m_resumed.train_loss, hist_full[m_resumed.epoch].train_loss,
            rtol=1e-5)


def test_resident_op_timing(small_graph):
    """measure_op_buckets materializes resident layers eagerly and
    returns finite spmm buckets."""
    tr = _resident_trainer(small_graph)
    hist = tr.fit(small_graph.train_nodes, small_graph.valid_nodes, 1,
                  log=False, op_timing=True)
    m = hist[0]
    assert np.isfinite(m.spmm_fwd_time) and m.spmm_fwd_time > 0
    assert np.isfinite(m.spmm_bwd_time) and m.spmm_bwd_time > 0


def test_resident_test_sweep(small_graph):
    """Full-sweep test evaluation through the packed sharded eval path
    with the resident format."""
    tr = _resident_trainer(small_graph)
    tr.fit(small_graph.train_nodes, small_graph.valid_nodes, epochs=2,
           log=False)
    f1 = tr.test(small_graph.test_nodes, batch_size=128)
    assert f1 > 0.3


def test_native_direct_tiles_match_two_step(small_graph):
    """The one-scan native cold-slice->tiles path emits bit-identical
    coords/counts to slicing the cold COO then counting-sorting it
    (threads own contiguous row ranges, so (tile, thread, visit) order
    equals the row-major input order pack_tiles preserves)."""
    from gnn_tpu import native
    from gnn_tpu.native import NativeCSR, ladies_layer_native
    from gnn_tpu.ops.pallas_edgestream import pack_edge_tiles, tile_dims
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native lib")
    lap = build_laplacian(small_graph.adj_full, "graphsage").tocsr()
    g = ResidentGraph  # noqa: F841 (import kept close to use)
    ncsr = NativeCSR(lap)
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, 256)
    hot_node = (spec.slot_of_node >= 0).astype(np.uint8)
    prev = np.sort(small_graph.train_nodes[:64]).astype(np.int64)
    r_cap, c_cap = 128, 384 * 2  # padded caps (row%128, col%256 mix)

    a1, nf1, cr, cc, cv = ladies_layer_native(lib, ncsr, prev, 128, 7,
                                              hot_node=hot_node)
    es_bm, es_bk = tile_dims(r_cap, c_cap)
    a2, nf2, coords, tile_cnt = ladies_layer_native(
        lib, ncsr, prev, 128, 7, hot_node=hot_node,
        tile_spec=(r_cap // es_bm, c_cap // es_bk,
                   es_bm.bit_length() - 1, es_bk.bit_length() - 1))
    np.testing.assert_array_equal(a1, a2)
    t2s = pack_edge_tiles(cr.astype(np.int64), cc.astype(np.int64),
                          r_cap, c_cap, bm=es_bm, bk=es_bk, ecap=256)
    assert len(coords) == len(cr)
    occ = np.flatnonzero(tile_cnt)
    from gnn_tpu.ops.pallas_edgestream import _build_tiles
    t1s = _build_tiles(np.asarray(coords).copy(), occ.astype(np.int64),
                       tile_cnt[occ].astype(np.int64), r_cap, c_cap,
                       es_bm, es_bk, 256, r_cap // es_bm,
                       c_cap // es_bk, None, None)
    for f in ("coords", "blk_rc", "off", "t_order"):
        np.testing.assert_array_equal(np.asarray(getattr(t1s, f)),
                                      np.asarray(getattr(t2s, f)),
                                      err_msg=f)


def test_rank1_values_forms(small_graph):
    """rank1_values: row-normalized -> col-trivial factors;
    sym-normalized -> degree-power factors; weighted -> not ok."""
    import scipy.sparse as sp
    from gnn_tpu.ops.residentgraph import rank1_values
    lap_r = build_laplacian(small_graph.adj_full, "graphsage")
    rv, cv, triv, ok = rank1_values(lap_r)
    assert ok and triv and np.all(cv == 1.0)
    coo = lap_r.tocoo()
    np.testing.assert_allclose(rv[coo.row] * cv[coo.col], coo.data,
                               rtol=1e-6)
    lap_s = build_laplacian(small_graph.adj_full, "graphsage",
                            norm="sym")
    rv, cv, triv, ok = rank1_values(lap_s)
    assert ok and not triv
    coo = lap_s.tocoo()
    # f32-factor product vs the once-rounded f64 product: last-bit only
    np.testing.assert_allclose(rv[coo.row] * cv[coo.col], coo.data,
                               rtol=1e-6)
    # weighted (non-rank-1) values must be rejected
    rng = np.random.default_rng(0)
    lap_w = lap_r.copy()
    lap_w.data = lap_w.data * rng.uniform(0.5, 2.0, len(lap_w.data)
                                          ).astype(np.float32)
    _, _, _, ok = rank1_values(lap_w)
    assert not ok


@pytest.mark.parametrize("stream", [False, True])
def test_sym_norm_resident_matches_host_pack(small_graph, stream):
    """Sym-normalized laplacians are val-free too (rank-1 with a
    nontrivial column factor): the device rebuild — segsum and
    edge-stream — must match the host pack, which ships FULL values
    and is therefore normalization-agnostic (the oracle)."""
    lap, spec, dense, dense_t, cfg_hot, cfg_res, g = _setup(
        small_graph, ship_cold=True, val_free=True,
        stream_tiles=stream, norm="sym")
    tgt = small_graph.train_nodes[:64]
    mb_hot = ladies_sample(cfg_hot, 5, tgt, lap, small_graph.labels)
    mb_res = ladies_sample(cfg_res, 5, tgt, lap, small_graph.labels)
    adjs_host = bind_dense(mb_hot.adjs, jnp.asarray(dense),
                           jnp.asarray(dense_t))
    adjs_dev = materialize_adjs(
        g, list(mb_res.adjs),
        [jnp.asarray(s) for s in mb_res.sampled_nodes],
        jnp.asarray(mb_res.input_nodes))
    rng = np.random.default_rng(0)
    for l, (ah, ad) in enumerate(zip(adjs_host, adjs_dev)):
        if ah is None:
            continue
        x = jnp.asarray(rng.normal(size=(ah.ncols, 8)).astype(np.float32))
        gy = jnp.asarray(rng.normal(size=(ah.nrows, 8)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(spmm(ad, x)),
                                   np.asarray(spmm(ah, x)),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {l} fwd")
        np.testing.assert_allclose(np.asarray(spmm_transpose(ad, gy)),
                                   np.asarray(spmm_transpose(ah, gy)),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {l} bwd")


@pytest.mark.parametrize("stream", [False, True])
def test_weighted_graph_resident_matches_host_pack(small_graph, stream):
    """NON-rank-1 (weighted) laplacians: the resident rebuild must ship
    per-edge values (stream mode: in tile order alongside the coords)
    and match the value-shipping host pack exactly."""
    import scipy.sparse as sp
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    rng0 = np.random.default_rng(3)
    lap = lap.copy()
    lap.data = (lap.data * rng0.uniform(0.5, 2.0, len(lap.data))
                ).astype(np.float32)
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, 256)
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    kw = dict(batch_size=64, samp_num=128, orders=(1, 1),
              num_nodes=small_graph.adj_full.shape[0],
              num_classes=small_graph.num_classes, hot_spec=spec,
              compress=False, resident_ship_cold=True,
              resident_val_free=False, resident_stream_tiles=stream)
    cfg_hot = SamplerConfig(adj_format="hot", **kw)
    cfg_res = SamplerConfig(adj_format="resident", **kw)
    host = build_resident_graph(lap, spec, dense, dense_t)
    assert host.pop("val_free") is False
    n, k = host.pop("n"), host.pop("k")
    ct = host.pop("col_trivial")
    g = ResidentGraph(**{f: jnp.asarray(v) for f, v in host.items()},
                      n=n, k=k, col_trivial=ct)
    tgt = small_graph.train_nodes[:64]
    mb_hot = ladies_sample(cfg_hot, 5, tgt, lap, small_graph.labels)
    mb_res = ladies_sample(cfg_res, 5, tgt, lap, small_graph.labels)
    if stream:
        assert mb_res.adjs[-1].es_vals is not None
        assert mb_res.adjs[-1].vals is None
    adjs_host = bind_dense(mb_hot.adjs, jnp.asarray(dense),
                           jnp.asarray(dense_t))
    adjs_dev = materialize_adjs(
        g, list(mb_res.adjs),
        [jnp.asarray(s) for s in mb_res.sampled_nodes],
        jnp.asarray(mb_res.input_nodes))
    rng = np.random.default_rng(0)
    for l, (ah, ad) in enumerate(zip(adjs_host, adjs_dev)):
        if ah is None:
            continue
        x = jnp.asarray(rng.normal(size=(ah.ncols, 8)).astype(np.float32))
        gy = jnp.asarray(rng.normal(size=(ah.nrows, 8)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(spmm(ad, x)),
                                   np.asarray(spmm(ah, x)),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {l} fwd")
        np.testing.assert_allclose(np.asarray(spmm_transpose(ad, gy)),
                                   np.asarray(spmm_transpose(ah, gy)),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {l} bwd")


def test_subgraph_sampler_stream_tiles(small_graph):
    """The subgraph sampler's square layers ride the stream-tiles
    payload too (no native direct-to-tiles there — the two-step pack
    path must kick in) and match the host pack."""
    from gnn_tpu.sampling.ladies import subgraph_sample
    lap, spec, dense, dense_t, cfg_hot, cfg_res, g = _setup(
        small_graph, sampler="subgraph", ship_cold=True, val_free=True,
        stream_tiles=True)
    tgt = small_graph.train_nodes[:64]
    mb_hot = subgraph_sample(cfg_hot, 9, tgt, lap, small_graph.labels)
    mb_res = subgraph_sample(cfg_res, 9, tgt, lap, small_graph.labels)
    assert mb_res.adjs[-1].es_rc is not None
    adjs_host = bind_dense(mb_hot.adjs, jnp.asarray(dense),
                           jnp.asarray(dense_t))
    adjs_dev = materialize_adjs(
        g, list(mb_res.adjs),
        [jnp.asarray(s) for s in mb_res.sampled_nodes],
        jnp.asarray(mb_res.input_nodes))
    rng = np.random.default_rng(1)
    for l, (ah, ad) in enumerate(zip(adjs_host, adjs_dev)):
        if ah is None:
            continue
        x = jnp.asarray(rng.normal(size=(ah.ncols, 4)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(spmm(ad, x)),
                                   np.asarray(spmm(ah, x)),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {l}")
