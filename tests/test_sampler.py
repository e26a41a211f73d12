"""Sampler tests: LADIES math (probabilities, debias weights, self-loop
union), padding invariants, subgraph sampler, and the pipeline."""
import numpy as np
import pytest
import scipy.sparse as sp

from gnn_tpu.ops import sparse as sops
from gnn_tpu.sampling.ladies import (SamplerConfig, bucket_size,
                                     ladies_sample, subgraph_sample)
from gnn_tpu.utils.normalize import build_laplacian


def _cfg(graph, **kw):
    defaults = dict(batch_size=32, samp_num=64,
                    orders=(1, 1), num_nodes=graph.adj_full.shape[0],
                    num_classes=graph.num_classes)
    defaults.update(kw)
    return SamplerConfig(**defaults)


def test_layer_caps():
    cfg = SamplerConfig(batch_size=512, samp_num=8192, orders=(1, 1, 1),
                        num_nodes=10**6, num_classes=41)
    caps = cfg.layer_caps()
    assert caps[-1] == 512
    assert caps[2] == 512 + 8192
    assert caps[1] == 512 + 2 * 8192
    assert caps[0] == ((512 + 3 * 8192 + 127) // 128) * 128
    cfg0 = SamplerConfig(batch_size=512, samp_num=8192, orders=(0, 1, 1),
                         num_nodes=10**6, num_classes=41)
    caps0 = cfg0.layer_caps()
    assert caps0[0] == caps0[1]  # order-0 bottom layer adds no nodes


def test_ladies_structure(small_graph):
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = _cfg(small_graph)
    batch = small_graph.train_nodes[:32]
    mb = ladies_sample(cfg, seed=0, batch_nodes=batch, lap_matrix=lap,
                       labels_full=small_graph.labels)
    caps = cfg.layer_caps()
    assert len(mb.adjs) == 2
    # chained static shapes: layer l output rows == layer l+1 input cols
    assert mb.adjs[0].shape == (caps[1], caps[0])
    assert mb.adjs[1].shape == (caps[2], caps[1])
    assert mb.labels.shape == (caps[2], small_graph.num_classes)
    assert mb.label_mask.sum() == 32
    assert mb.input_mask.sum() == mb.n_input
    # input node ids are valid and unique in the valid region
    valid = mb.input_nodes[: mb.n_input]
    assert len(np.unique(valid)) == mb.n_input


def test_ladies_debias_weights(small_graph):
    """Edge weights must equal lap_value(row_full_deg) * normfact[col]
    (reference `sampler.py:137` + `cuda_spmm.cu:800`): verify E[A_sampled
    @ 1] ~= row sums preserved in expectation — here structurally: each
    stored edge value = lap.data * 1/clip(s_num*p,1e-10,1) <= lap.data *
    1e10, and rows that kept all their neighbors reproduce exact row sums
    when normfact==1."""
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = _cfg(small_graph, samp_num=small_graph.adj_full.shape[0])
    batch = small_graph.train_nodes[:32]
    mb = ladies_sample(cfg, seed=1, batch_nodes=batch, lap_matrix=lap,
                       labels_full=small_graph.labels)
    # with samp_num == N every nonzero-prob node is sampled -> normfact
    # = 1/clip(s_num * p, _, 1); high-degree cols clip to 1. Check the
    # top adjacency's row sums: rows = batch nodes, each row keeps its
    # full neighborhood, values = (1/deg) * normfact >= 1/deg.
    adj = mb.adjs[-1]
    import jax.numpy as jnp
    dense = np.asarray(sops.to_dense(adj))
    row_sums = dense.sum(axis=1)[: len(batch)]
    assert np.all(row_sums >= 0.999)  # >= original row sum of 1


def test_ladies_determinism(small_graph):
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = _cfg(small_graph)
    batch = small_graph.train_nodes[:32]
    mb1 = ladies_sample(cfg, 7, batch, lap, small_graph.labels)
    mb2 = ladies_sample(cfg, 7, batch, lap, small_graph.labels)
    np.testing.assert_array_equal(mb1.input_nodes, mb2.input_nodes)
    np.testing.assert_array_equal(np.asarray(mb1.adjs[0].vals),
                                  np.asarray(mb2.adjs[0].vals))


def test_order0_layers_get_none_adj(small_graph):
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = _cfg(small_graph, orders=(1, 0, 1))
    mb = ladies_sample(cfg, 0, small_graph.train_nodes[:32], lap,
                       small_graph.labels)
    assert mb.adjs[1] is None
    assert mb.adjs[0] is not None and mb.adjs[2] is not None


def test_subgraph_sampler(small_graph):
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = _cfg(small_graph, sampler="subgraph", orders=(1, 1))
    mb = subgraph_sample(cfg, 0, small_graph.train_nodes[:32], lap,
                         small_graph.labels)
    caps = cfg.layer_caps()
    assert caps[0] == caps[1] == caps[2]
    assert mb.adjs[0].shape == (caps[0], caps[0])
    assert mb.adjs[1].shape == (caps[0], caps[0])


def test_locality_skew_changes_distribution(small_graph):
    """scale_factor > 1 must skew sampling toward the skew set
    (`sampler.py:119-121`)."""
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    n = small_graph.adj_full.shape[0]
    skew_set = np.arange(n // 2)  # first half "buffered"
    cfgs = [_cfg(small_graph, scale_factor=s, samp_num=128)
            for s in (1.0, 50.0)]
    frac = []
    for cfg in cfgs:
        hits, tot = 0, 0
        for seed in range(5):
            mb = ladies_sample(cfg, seed, small_graph.train_nodes[:32], lap,
                               small_graph.labels,
                               skewed_sampling_nodes=[skew_set, skew_set])
            valid = mb.input_nodes[: mb.n_input]
            hits += np.sum(valid < n // 2)
            tot += len(valid)
        frac.append(hits / tot)
    assert frac[1] > frac[0] + 0.05


def test_bucket_size_monotone():
    assert bucket_size(1) == 1024
    assert bucket_size(1024) == 1024
    b1, b2 = bucket_size(3000), bucket_size(3001)
    assert b1 >= 3000 and b2 >= 3001 and b2 >= b1


def test_compressed_payload_half(small_graph):
    """compress=True ships int16 indices + bf16 values -> COO payload
    bytes halve vs the uncompressed format, with identical edge sets."""
    import dataclasses
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    kw = dict(batch_size=64, samp_num=256, orders=(1, 1),
              num_nodes=small_graph.adj_full.shape[0],
              num_classes=small_graph.num_classes)
    cfg_c = SamplerConfig(compress=True, **kw)
    cfg_u = SamplerConfig(compress=False, **kw)
    mb_c = ladies_sample(cfg_c, 7, small_graph.train_nodes[:64], lap,
                         small_graph.labels)
    mb_u = ladies_sample(cfg_u, 7, small_graph.train_nodes[:64], lap,
                         small_graph.labels)

    def payload(mb):
        return sum(a.rows.nbytes + a.cols.nbytes + a.vals.nbytes
                   for a in mb.adjs if a is not None)

    assert payload(mb_c) * 2 == payload(mb_u)
    for ac, au in zip(mb_c.adjs, mb_u.adjs):
        assert ac.rows.dtype == np.int16 and ac.cols.dtype == np.int16
        np.testing.assert_array_equal(ac.rows.astype(np.int32), au.rows)
        np.testing.assert_array_equal(ac.cols.astype(np.int32), au.cols)
        np.testing.assert_allclose(ac.vals.astype(np.float32), au.vals,
                                   rtol=5e-3)


def test_subgraph_native_slice_matches_numpy(small_graph):
    """The subgraph sampler's native row-set slice (`slice_rows_native`,
    shared with the LADIES layers) equals the scipy slice for BOTH row
    sets it uses: the batch rows (first layer) and the square
    after x after re-slice (deeper layers)."""
    import pytest
    from gnn_tpu import native as native_mod
    from gnn_tpu.sampling.ladies import _slice_cols_to_coo

    lib = native_mod.get_lib()
    if lib is None:
        pytest.skip("native core unavailable")
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    n = lap.shape[0]
    rng = np.random.RandomState(0)
    prev = np.sort(rng.choice(n, 48, replace=False)).astype(np.int64)
    extra = rng.choice(n, 300, replace=False)
    after = np.unique(np.concatenate([prev, extra]))
    normfact = rng.uniform(0.1, 1.0, len(after)).astype(np.float32)
    pos = np.full(n, -1, np.int32)
    pos[after] = np.arange(len(after), dtype=np.int32)
    graph = native_mod.NativeCSR(lap)
    for row_set in (prev, after):
        want = _slice_cols_to_coo(lap[row_set, :].tocsr(), after, normfact)
        got = native_mod.slice_rows_native(lib, graph, row_set, pos,
                                           normfact)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-6)


def test_subgraph_resident_stream_trains(small_graph):
    """`--sampler subgraph` composes with the deployed resident +
    edge-stream transport (native direct-to-tiles slice): deeper layers
    share ONE packed square adjacency and training converges."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense
    from gnn_tpu.ops.residentgraph import build_resident_graph
    from gnn_tpu.placement.engine import compute_sample_prob
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, small_graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, 256)
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    host = build_resident_graph(lap, spec, dense, dense_t)
    host.update(n=lap.shape[0], k=spec.k)
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1, 1),
                        num_nodes=lap.shape[0],
                        num_classes=small_graph.num_classes,
                        sampler="subgraph", hot_spec=spec,
                        adj_format="resident",
                        resident_val_free=host["val_free"],
                        resident_stream_tiles=True)
    mb = subgraph_sample(cfg, 3, small_graph.train_nodes[:64], lap,
                         small_graph.labels)
    # the two deeper layers share ONE packed object (identical square
    # adj; the top layer's rows are the batch, so it differs)
    assert mb.adjs[0] is mb.adjs[1]
    assert mb.adjs[2] is not mb.adjs[0]
    if host["val_free"]:
        assert mb.adjs[0].es_rc is not None
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=1,
                         pool_num=2)
    net = build_model("graphsage", 32, (1, 1, 1),
                      small_graph.num_classes)
    tr = Trainer(net, pipe, small_graph.feats, lr=0.05,
                 sigmoid_loss=False, resident_graph=dict(host))
    m0 = tr.train_epoch(small_graph.train_nodes, 0)
    m1 = tr.train_epoch(small_graph.train_nodes, 1)
    assert np.isfinite(m0.train_loss)
    assert m1.train_loss < m0.train_loss + 0.2
