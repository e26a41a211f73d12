"""GAT-on-sampled-adjacency tests (dense softmax-attention oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from gnn_tpu.models.gat import GATConv, masked_tile_softmax, \
    _coo_to_tilewise
from gnn_tpu.ops import sparse as sops


def _adj(rng, nr, nc, density=0.1):
    m = sp.random(nr, nc, density=density, format="coo", random_state=rng,
                  dtype=np.float32)
    # ensure no empty rows in the valid region (softmax needs >=1 edge)
    rows = np.concatenate([m.row, np.arange(nr)])
    cols = np.concatenate([m.col, rng.randint(0, nc, nr)])
    vals = np.ones(len(rows), np.float32)
    return sops.pack_coo(rows.astype(np.int32), cols.astype(np.int32),
                         vals, nr, nc, nr, nc), rows, cols


def test_masked_tile_softmax_rows_sum_to_one():
    rng = np.random.RandomState(0)
    adj, rows, cols = _adj(rng, 128, 256)
    blk_rc, mask = _coo_to_tilewise(adj)
    scores = jnp.asarray(rng.randn(*mask.shape).astype(np.float32))
    att = np.asarray(masked_tile_softmax(jnp.asarray(blk_rc), scores,
                                         mask, 1))
    # reconstruct dense attention and check row sums over edges == 1
    dense = np.zeros((128, 256), np.float32)
    ct = np.asarray(blk_rc) & 0xFFFF
    for j in range(att.shape[0]):
        dense[:, ct[j] * 128:(ct[j] + 1) * 128] += att[j]
    np.testing.assert_allclose(dense.sum(1), np.ones(128), rtol=1e-5)
    # attention only on edges
    pattern = np.zeros((128, 256), np.float32)
    pattern[rows, cols] = 1
    assert np.all(dense[pattern == 0] == 0)


def test_gat_conv_matches_dense_attention():
    rng = np.random.RandomState(1)
    nr, nc, f, h = 128, 256, 12, 8
    adj, rows, cols = _adj(rng, nr, nc)
    x = jnp.asarray(rng.randn(nc, f).astype(np.float32))
    sampled = jnp.arange(nr, dtype=jnp.int32) % nc
    layer = GATConv(n_out=h)
    params = layer.init(jax.random.PRNGKey(0), x, adj, sampled)
    out = np.asarray(layer.apply(params, x, adj, sampled))

    p = params["params"]
    q = np.asarray(x) @ np.asarray(p["q"]["kernel"]) + np.asarray(
        p["q"]["bias"])
    k = np.asarray(x) @ np.asarray(p["k"]["kernel"]) + np.asarray(
        p["k"]["bias"])
    v = np.asarray(x) @ np.asarray(p["v"]["kernel"]) + np.asarray(
        p["v"]["bias"])
    qr = q[np.asarray(sampled)]
    logits = (qr @ k.T) / np.sqrt(h)
    pattern = np.zeros((nr, nc), bool)
    pattern[rows, cols] = True
    logits = np.where(pattern, logits, -np.inf)
    att = np.exp(logits - logits.max(1, keepdims=True))
    att = np.where(pattern, att, 0)
    att /= att.sum(1, keepdims=True)
    selfp = (np.asarray(x)[np.asarray(sampled)]
             @ np.asarray(p["self"]["kernel"])
             + np.asarray(p["self"]["bias"]))
    pre = att @ v + selfp
    expected = np.where(pre > 0, pre, np.expm1(pre))
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_gat_trains_end_to_end(small_graph):
    import jax
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(small_graph.adj_full, "gcn")
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                         pool_num=2)
    net = build_model("gat", nhid=16, orders=(1, 1),
                      num_classes=small_graph.num_classes)
    tr = Trainer(net, pipe, small_graph.feats, mesh=make_mesh(2), lr=0.01,
                 sigmoid_loss=False)
    hist = tr.fit(small_graph.train_nodes, small_graph.valid_nodes,
                  epochs=2, log=False)
    assert hist[-1].train_loss < hist[0].train_loss
    assert hist[-1].valid_f1 > 0.3


def test_multihead_matches_manual_two_head():
    rng = np.random.RandomState(3)
    nr, nc, f, h = 128, 128, 10, 8
    adj, rows, cols = _adj(rng, nr, nc)
    x = jnp.asarray(rng.randn(nc, f).astype(np.float32))
    sampled = jnp.arange(nr, dtype=jnp.int32)
    layer = GATConv(n_out=h, n_heads=2)
    params = layer.init(jax.random.PRNGKey(0), x, adj, sampled)
    out = np.asarray(layer.apply(params, x, adj, sampled))

    p = params["params"]
    q = np.asarray(x) @ np.asarray(p["q"]["kernel"]) + np.asarray(p["q"]["bias"])
    k = np.asarray(x) @ np.asarray(p["k"]["kernel"]) + np.asarray(p["k"]["bias"])
    v = np.asarray(x) @ np.asarray(p["v"]["kernel"]) + np.asarray(p["v"]["bias"])
    pattern = np.zeros((nr, nc), bool)
    pattern[rows, cols] = True
    d = h // 2
    aggs = []
    for hd in range(2):
        qh, kh, vh = (a[:, hd * d:(hd + 1) * d] for a in (q, k, v))
        logits = (qh @ kh.T) / np.sqrt(d)
        logits = np.where(pattern, logits, -np.inf)
        att = np.exp(logits - logits.max(1, keepdims=True))
        att = np.where(pattern, att, 0)
        att /= att.sum(1, keepdims=True)
        aggs.append(att @ vh)
    agg = np.concatenate(aggs, axis=1)
    selfp = (np.asarray(x) @ np.asarray(p["self"]["kernel"])
             + np.asarray(p["self"]["bias"]))
    pre = agg + selfp
    expected = np.where(pre > 0, pre, np.expm1(pre))
    np.testing.assert_allclose(out, expected, rtol=3e-4, atol=3e-4)


def test_edge_impl_matches_tile_impl():
    """The scalable per-edge attention path must agree with the tile-wise
    MXU path (same math, different device strategy)."""
    rng = np.random.RandomState(3)
    nr, nc, n_out, heads = 128, 256, 32, 4
    _, rows, cols = _adj(rng, nr, nc)
    # coalesce duplicates: sampler-produced COO is always deduplicated,
    # and the two impls count duplicate edges differently by design
    m = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                      shape=(nr, nc)).tocsr().tocoo()
    adj = sops.pack_coo(m.row.astype(np.int32), m.col.astype(np.int32),
                        np.ones(len(m.row), np.float32), nr, nc, nr, nc)
    x = jnp.asarray(rng.randn(nc, 16).astype(np.float32))
    sampled = jnp.asarray(np.arange(nr, dtype=np.int32))
    variables = None
    outs = {}
    for impl in ("tile", "edge"):
        conv = GATConv(n_out=n_out, n_heads=heads, impl=impl)
        if variables is None:
            variables = conv.init(jax.random.PRNGKey(0), x, adj, sampled)
        outs[impl] = np.asarray(conv.apply(variables, x, adj, sampled))
    np.testing.assert_allclose(outs["edge"], outs["tile"], rtol=2e-4,
                               atol=2e-5)


def test_edge_impl_scales_past_tile_limit(small_graph):
    """GAT trains end-to-end at a size where the tile route's dense mask
    would be refused (auto-selection picks 'edge'); loss decreases."""
    from gnn_tpu.models import gat as gat_mod
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian

    old = gat_mod._TILE_MASK_LIMIT
    gat_mod._TILE_MASK_LIMIT = 1  # force every layer onto the edge path
    try:
        lap = build_laplacian(small_graph.adj_full, "graphsage")
        cfg = SamplerConfig(batch_size=64, samp_num=256, orders=(1, 1),
                            num_nodes=small_graph.adj_full.shape[0],
                            num_classes=small_graph.num_classes)
        net = build_model("gat", 32, (1, 1), small_graph.num_classes)
        pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=1,
                             pool_num=2)
        tr = Trainer(net, pipe, small_graph.feats, lr=0.05,
                     sigmoid_loss=False)
        m0 = tr.train_epoch(small_graph.train_nodes, 0)
        m1 = tr.train_epoch(small_graph.train_nodes, 1)
        assert np.isfinite(m0.train_loss)
        assert m1.train_loss < m0.train_loss + 0.2
    finally:
        gat_mod._TILE_MASK_LIMIT = old


def test_pattern_adj_expand_matches_coo():
    """PatternAdj (pattern-only transport) re-expands to the same
    (rows, cols, live) as the value-carrying COO it compresses."""
    rng = np.random.RandomState(5)
    adj, rows, cols = _adj(rng, 128, 256)
    m = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                      shape=(128, 256)).tocsr().tocoo()  # row-sorted
    pat = sops.pack_pattern(m.row.astype(np.int32),
                            m.col.astype(np.int32), 128, 256, 128, 256)
    r, c, live = jax.tree_util.tree_map(
        np.asarray,
        jax.tree_util.tree_map(jnp.asarray, pat).expand())
    n = int(np.asarray(pat.n_edges))
    np.testing.assert_array_equal(r[:n], m.row)
    np.testing.assert_array_equal(c[:n], m.col)
    assert live[:n].all() and not live[n:].any()
    assert (r[n:] == 127).all()


def test_gat_pattern_transport_matches_coo(small_graph):
    """GAT trained through the pattern-only transport reproduces the
    COO-transport run exactly (same seeds; values are device-computed
    either way), at a fraction of the payload bytes."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(small_graph.adj_full, "gcn")
    losses = {}
    payload = {}
    for fmt in ("coo", "pattern"):
        cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                            num_nodes=small_graph.adj_full.shape[0],
                            num_classes=small_graph.num_classes,
                            adj_format=fmt, compress=True)
        mb = ladies_sample(cfg, 13, small_graph.train_nodes[:64], lap,
                           small_graph.labels)
        payload[fmt] = sum(
            np.asarray(a).nbytes
            for adj in mb.adjs if adj is not None
            for a in jax.tree_util.tree_leaves(adj))
        pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                             pool_num=2)
        net = build_model("gat", nhid=16, orders=(1, 1),
                          num_classes=small_graph.num_classes)
        tr = Trainer(net, pipe, small_graph.feats, mesh=make_mesh(2),
                     lr=0.01, sigmoid_loss=False, seed=7)
        m = tr.train_epoch(small_graph.train_nodes, epoch=0)
        f1, vloss = tr.evaluate(small_graph.valid_nodes, 128, "val")
        losses[fmt] = (m.train_loss, vloss, f1)
    assert losses["pattern"][0] == pytest.approx(losses["coo"][0],
                                                 abs=1e-5)
    assert losses["pattern"][1] == pytest.approx(losses["coo"][1],
                                                 abs=1e-4)
    # the pattern payload drops the values AND the int16 row ids in
    # favor of per-row counts: well under half the compressed COO bytes
    assert payload["pattern"] < payload["coo"] / 2


def _resident_setup(small_graph, hot_k=256, orders=(1, 1),
                    stream=False):
    from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense
    from gnn_tpu.ops.residentgraph import (ResidentGraph,
                                           build_resident_graph)
    from gnn_tpu.placement.engine import compute_sample_prob
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(small_graph.adj_full, "gcn")
    prob = compute_sample_prob(lap, small_graph.train_nodes, sum(orders))
    spec = HotSpec.from_sample_prob(prob, hot_k)
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    host = build_resident_graph(lap, spec, dense, dense_t)
    n, k = host.pop("n"), host.pop("k")
    host.pop("val_free")
    g = ResidentGraph(**{f: jnp.asarray(v) for f, v in host.items()},
                      n=n, k=k)
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=orders,
                        num_nodes=lap.shape[0],
                        num_classes=small_graph.num_classes,
                        hot_spec=spec, adj_format="resident",
                        compress=False, resident_ship_cold=True,
                        resident_val_free=True,
                        resident_stream_tiles=stream)
    return lap, spec, cfg, g, host


@pytest.mark.parametrize("heads,stream", [(1, False), (4, False),
                                          (1, True), (4, True)])
def test_hot_block_attention_matches_edge_route(small_graph, heads,
                                                stream):
    """GATConv on a materialized HotDenseAdj (hot-block attention: MXU
    scores over the resident block's present slots + cold residual via
    the per-edge route or — ``stream=True`` — the SDDMM-direction
    edge-stream kernels, one shared softmax) equals the per-edge route
    on the value-carrying COO of the SAME sampled batch."""
    from gnn_tpu.ops.residentgraph import materialize_adjs
    from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
    import dataclasses as dc

    lap, spec, cfg, g, _ = _resident_setup(small_graph, stream=stream)
    mb_r = ladies_sample(cfg, 11, small_graph.train_nodes[:64], lap,
                         small_graph.labels)
    cfg_coo = dc.replace(cfg, adj_format="coo", hot_spec=None)
    mb_c = ladies_sample(cfg_coo, 11, small_graph.train_nodes[:64], lap,
                         small_graph.labels)

    adjs_r = materialize_adjs(g, list(mb_r.adjs),
                              [jnp.asarray(s) for s in mb_r.sampled_nodes],
                              jnp.asarray(mb_r.input_nodes))
    a_hot, a_coo = adjs_r[0], mb_c.adjs[0]
    assert (a_hot.nrows, a_hot.ncols) == (a_coo.nrows, a_coo.ncols)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(a_coo.ncols, 24).astype(np.float32))
    sampled = jnp.asarray(mb_c.sampled_nodes[0])
    conv_edge = GATConv(n_out=32, n_heads=heads, impl="edge")
    variables = conv_edge.init(jax.random.PRNGKey(0), x, a_coo, sampled)
    want = np.asarray(conv_edge.apply(variables, x, a_coo, sampled))
    got = np.asarray(GATConv(n_out=32, n_heads=heads).apply(
        variables, x, a_hot, sampled))
    n_rows = int(np.asarray(a_coo.n_valid_rows))
    np.testing.assert_allclose(got[:n_rows], want[:n_rows], rtol=2e-4,
                               atol=2e-4)

    # gradients flow through both parts identically
    def loss(vars_, adj):
        conv = GATConv(n_out=32, n_heads=heads, impl="edge")
        return jnp.sum(conv.apply(vars_, x, adj, sampled)[:n_rows] ** 2)

    g_hot = jax.grad(loss)(variables, a_hot)
    g_coo = jax.grad(loss)(variables, a_coo)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=5e-3,
                                                atol=5e-4),
        g_hot, g_coo)


@pytest.mark.parametrize("stream", [False, True])
def test_hot_attention_grads_finite_at_large_magnitudes(small_graph,
                                                        stream):
    """Gradients through hot-block attention must stay finite when raw
    scores exceed the f32 exp range: masked score entries are not
    bounded by the row max, and an unmasked exp(s - rm) overflows to
    inf in the VJP where the cotangent is 0 — 0 * inf = NaN (regression
    from a canonical-scale chip run; small magnitudes never trip it).
    The stream variant covers the edge-stream attention kernels' NaN
    discipline too (NEG_SENTINEL masking + select-not-multiply VJP)."""
    from gnn_tpu.ops.residentgraph import materialize_adjs
    from gnn_tpu.sampling.ladies import ladies_sample

    lap, spec, cfg, g, _ = _resident_setup(small_graph, stream=stream)
    mb = ladies_sample(cfg, 11, small_graph.train_nodes[:64], lap,
                       small_graph.labels)
    adjs = materialize_adjs(g, list(mb.adjs),
                            [jnp.asarray(s) for s in mb.sampled_nodes],
                            jnp.asarray(mb.input_nodes))
    a_hot = adjs[0]
    rng = np.random.RandomState(2)
    # 50x features push q.k far past exp's f32 range (s ~ thousands)
    x = jnp.asarray(50.0 * rng.randn(a_hot.ncols, 24).astype(np.float32))
    sampled = jnp.asarray(mb.sampled_nodes[0])
    conv = GATConv(n_out=32, n_heads=2)
    variables = conv.init(jax.random.PRNGKey(0), x, a_hot, sampled)

    def loss(vars_):
        return jnp.sum(conv.apply(vars_, x, a_hot, sampled) ** 2)

    val, grads = jax.value_and_grad(loss)(variables)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("stream", [False, True])
def test_gat_resident_e2e_matches_coo(small_graph, stream):
    """GAT trained through resident transport (hot-block attention)
    reproduces the COO-transport run (same seeds; the softmax spans
    hot+cold exactly). ``stream=True`` trains through the
    SDDMM-direction edge-stream cold attention."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    import dataclasses as dc

    lap, spec, cfg, g, host = _resident_setup(small_graph,
                                              stream=stream)
    host = dict(host)
    host.update(n=g.n, k=g.k, val_free=True)
    losses = {}
    for fmt in ("coo", "resident"):
        cfg_f = (cfg if fmt == "resident"
                 else dc.replace(cfg, adj_format="coo", hot_spec=None))
        pipe = BatchPipeline(cfg_f, lap, small_graph.labels, world_size=2,
                             pool_num=2)
        net = build_model("gat", nhid=16, orders=(1, 1),
                          num_classes=small_graph.num_classes)
        tr = Trainer(net, pipe, small_graph.feats, mesh=make_mesh(2),
                     lr=0.01, sigmoid_loss=False, seed=7,
                     resident_graph=(host if fmt == "resident" else None))
        m = tr.train_epoch(small_graph.train_nodes, epoch=0)
        f1, vloss = tr.evaluate(small_graph.valid_nodes, 128, "val")
        losses[fmt] = (m.train_loss, vloss, f1)
    assert losses["resident"][0] == pytest.approx(losses["coo"][0],
                                                  abs=2e-4)
    assert losses["resident"][1] == pytest.approx(losses["coo"][1],
                                                  abs=2e-3)


def test_gat_op_timing_skips_pattern_layers(small_graph):
    """--op_timing with GAT's pattern transport must not crash (pattern
    layers have no standalone spmm op; buckets come back NaN-free for
    comm, NaN or 0 for spmm is fine)."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(small_graph.adj_full, "gcn")
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes,
                        adj_format="pattern")
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                         pool_num=2)
    net = build_model("gat", nhid=16, orders=(1, 1),
                      num_classes=small_graph.num_classes)
    tr = Trainer(net, pipe, small_graph.feats, mesh=make_mesh(2),
                 lr=0.01, sigmoid_loss=False, seed=7)
    tr.train_epoch(small_graph.train_nodes, epoch=0)
    fwd, bwd, comm = tr.measure_op_buckets()
    assert np.isfinite(comm)


def test_hot_attention_fully_hot_layer_runs(small_graph):
    """A resident layer whose cold residual is EMPTY (every sampled edge
    hot-hot) must run hot-block attention with the cold terms skipped,
    not crash (round-4 advice: zero cold capacity raised ValueError)."""
    import dataclasses as dc
    from gnn_tpu.ops.residentgraph import materialize_adjs
    from gnn_tpu.sampling.ladies import ladies_sample

    # hot_k >= num_nodes: every node is hot, so no cold edges exist
    lap, spec, cfg, g, _ = _resident_setup(
        small_graph, hot_k=small_graph.adj_full.shape[0])
    mb = ladies_sample(cfg, 11, small_graph.train_nodes[:64], lap,
                       small_graph.labels)
    adjs = materialize_adjs(g, list(mb.adjs),
                            [jnp.asarray(s) for s in mb.sampled_nodes],
                            jnp.asarray(mb.input_nodes))
    a = adjs[0]
    assert int(np.asarray(mb.adjs[0].n_cold)) == 0
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(a.ncols, 24).astype(np.float32))
    sampled = jnp.asarray(mb.sampled_nodes[0])
    conv = GATConv(n_out=32, n_heads=2)
    variables = conv.init(jax.random.PRNGKey(0), x, a, sampled)

    def loss(vars_):
        return jnp.sum(conv.apply(vars_, x, a, sampled) ** 2)

    val, grads = jax.value_and_grad(loss)(variables)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_hot_score_einsum_runs_once_in_replicated_path(small_graph):
    """The replicated hot-block path computes the [H, rh, ch] score
    matmul exactly ONCE (row max via stop_gradient of the same scores)
    — not once for the max and once for the terms with XLA CSE hoped to
    merge them (round-4 advice: CSE does not fire across custom_vjp
    boundaries in the part-sharded variant of this code)."""
    from gnn_tpu.models.gat import hot_attention_aggregate
    from gnn_tpu.ops.residentgraph import materialize_adjs
    from gnn_tpu.sampling.ladies import ladies_sample

    lap, spec, cfg, g, _ = _resident_setup(small_graph)
    mb = ladies_sample(cfg, 11, small_graph.train_nodes[:64], lap,
                       small_graph.labels)
    adjs = materialize_adjs(g, list(mb.adjs),
                            [jnp.asarray(s) for s in mb.sampled_nodes],
                            jnp.asarray(mb.input_nodes))
    a = adjs[0]
    H = 2
    n_out = 32
    rh = a.present_row_slots.shape[0]
    ch = a.present_col_slots.shape[0]
    q = jnp.zeros((a.nrows, n_out))
    k = jnp.zeros((a.ncols, n_out))
    v = jnp.zeros((a.ncols, n_out))
    jaxpr = jax.make_jaxpr(
        lambda q_, k_, v_: hot_attention_aggregate(a, q_, k_, v_, H))(
            q, k, v)

    def count_score_dots(jxp):
        n = 0
        for eqn in jxp.eqns:
            if eqn.primitive.name == "dot_general" and \
                    tuple(eqn.outvars[0].aval.shape) == (H, rh, ch):
                n += 1
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    n += count_score_dots(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            n += count_score_dots(s.jaxpr)
        return n

    assert count_score_dots(jaxpr.jaxpr) == 1


def test_scale_factor_tuner_bisects_within_visited_range():
    """Bisection from an initial factor > 1 must stay within the
    visited [initial, current] range, not halve toward 0 (round-4
    advice: _before initialized to 0.0)."""
    from gnn_tpu.train.metrics import ScaleFactorTuner

    t = ScaleFactorTuner(initial=4.0)
    # first steady epoch reads ratio < 0.1: bisect DOWN but not below
    # the initial factor
    sf = t.update(movement_time=0.01, execution_time=1.0)
    assert sf >= 4.0 / 1.0 - 1e-9 and sf <= 4.0
