"""Packed single-buffer batch transport (gnn_tpu/parallel/packbuf.py):
byte-exact pack/unpack roundtrips and end-to-end equivalence between
packed and per-leaf device_put training on the virtual CPU mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from gnn_tpu.parallel import packbuf
from gnn_tpu.parallel.packbuf import PackSpec


def _rand_tree(rng, ws, group=None):
    lead = (group, ws) if group else (ws,)
    return {
        "f32": rng.normal(size=lead + (5, 3)).astype(np.float32),
        "i32": rng.integers(-9, 9, lead + (7,)).astype(np.int32),
        "i16": rng.integers(-9, 9, lead + (4, 2)).astype(np.int16),
        "bf16": rng.normal(size=lead + (6,)).astype(ml_dtypes.bfloat16),
        "u8": rng.integers(0, 255, lead + (3,)).astype(np.uint8),
        "flag": rng.integers(0, 2, lead + (2,)).astype(bool),
    }


@pytest.mark.parametrize("shard_axis,group", [(0, None), (1, 3)])
def test_roundtrip_bytes_exact(shard_axis, group):
    rng = np.random.default_rng(0)
    ws = 4
    tree = _rand_tree(rng, ws, group)
    spec = PackSpec.from_tree(tree, shard_axis)
    buf = packbuf.pack(spec, tree, base_step=1234, n_valid=2)
    assert buf.shape == (ws, spec.row_bytes + packbuf.TRAILER_BYTES)

    unpack = jax.jit(lambda b: packbuf.unpack_local(spec, b))
    for r in range(ws):
        out, base, nv = unpack(buf[r: r + 1])
        assert int(base) == 1234 and int(nv) == 2
        for k, host in tree.items():
            want = np.take(host, [r], axis=shard_axis)
            got = np.asarray(out[k])
            assert got.dtype == want.dtype, k
            np.testing.assert_array_equal(
                got.view(np.uint8), want.view(np.uint8), err_msg=k)


def test_flax_struct_tree_and_empty_plan():
    """The real payload: (DeviceBatch-like flax structs, ()) — statics
    ride the treedef, () contributes no leaves."""
    from gnn_tpu.ops.sparse import COOAdj
    rng = np.random.default_rng(1)
    adj = COOAdj(rows=rng.integers(0, 8, (2, 16)).astype(np.int32),
                 cols=rng.integers(0, 8, (2, 16)).astype(np.int32),
                 vals=rng.normal(size=(2, 16)).astype(np.float32),
                 n_valid_rows=np.array([8, 8], np.int32),
                 n_valid_cols=np.array([8, 8], np.int32),
                 nrows=8, ncols=8)
    tree = ((adj, rng.normal(size=(2, 8, 4)).astype(np.float32)), ())
    spec = PackSpec.from_tree(tree, 0)
    buf = packbuf.pack(spec, tree)
    (out, ()), _, _ = jax.jit(
        lambda b: packbuf.unpack_local(spec, b))(buf[0:1])
    out_adj, x = out
    assert out_adj.nrows == 8 and out_adj.ncols == 8
    np.testing.assert_array_equal(np.asarray(out_adj.rows),
                                  adj.rows[0:1])
    np.testing.assert_allclose(np.asarray(x), tree[0][1][0:1])


def test_spec_rejects_missing_shard_axis():
    with pytest.raises(ValueError):
        PackSpec.from_tree({"a": np.zeros(3)}, shard_axis=1)
    with pytest.raises(ValueError):
        PackSpec.from_tree({"a": np.zeros((2, 3)),
                            "b": np.zeros((4, 3))}, shard_axis=0)


def _fit_params(graph, packed, world_size=2, steps_per_dispatch=1):
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian
    lap = build_laplacian(graph.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                        num_nodes=graph.adj_full.shape[0],
                        num_classes=graph.num_classes)
    pipe = BatchPipeline(cfg, lap, graph.labels, world_size=world_size,
                         pool_num=2)
    net = build_model("graphsage", nhid=32, orders=(1, 1),
                      num_classes=graph.num_classes)
    tr = Trainer(net, pipe, graph.feats, mesh=make_mesh(world_size),
                 lr=0.05, sigmoid_loss=False, seed=3,
                 steps_per_dispatch=steps_per_dispatch)
    tr.packed_transport = packed
    m = tr.train_epoch(graph.train_nodes, epoch=0)
    return (jax.tree_util.tree_map(np.asarray, tr.params), m.train_loss)


@pytest.mark.parametrize("group", [1, 3])
def test_packed_equals_unpacked_training(small_graph, group):
    """One DP epoch with packed transport lands on bit-identical
    parameters and loss vs the per-leaf device_put path (same seeds,
    same on-device math — only the transport differs)."""
    p_packed, l_packed = _fit_params(small_graph, True,
                                     steps_per_dispatch=group)
    p_plain, l_plain = _fit_params(small_graph, False,
                                   steps_per_dispatch=group)
    assert l_packed == pytest.approx(l_plain, abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_packed),
                    jax.tree_util.tree_leaves(p_plain)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_buffer_pool_double_buffers_and_evicts():
    pool = packbuf.BufferPool(max_buffers=4)
    a = pool.get(1, 100)
    b = pool.get(1, 100)
    assert a is not b                       # double buffering
    assert pool.get(1, 100) is a            # rotation
    assert pool.get(1, 100) is b
    pool.get(1, 200); pool.get(1, 200)      # second size fills the cap
    pool.get(1, 300)                        # third size evicts LRU (100)
    assert (1, 100) not in pool._pools
    # pack() writes into the pooled buffer in place
    tree = {"x": np.arange(6, dtype=np.int32).reshape(1, 6)}
    spec = PackSpec.from_tree(tree, 0)
    out = pool.get(spec.ws, spec.row_bytes + packbuf.TRAILER_BYTES)
    got = packbuf.pack(spec, tree, out=out)
    assert got is out
    np.testing.assert_array_equal(
        got[0, : spec.row_bytes].view(np.int32), np.arange(6))


@pytest.mark.parametrize("shard_axis,group", [(0, None), (1, 3)])
def test_typed_roundtrip(shard_axis, group):
    rng = np.random.default_rng(5)
    ws = 4
    tree = _rand_tree(rng, ws, group)
    tspec = packbuf.TypedPackSpec(tree, shard_axis)
    pools = tspec.pack(tree, base_step=77, n_valid=2)
    assert set(pools) == set(tspec.pool_counts)
    unpack = jax.jit(lambda p: tspec.unpack_local(p))
    for r in range(ws):
        out, base, nv = unpack({d: p[r: r + 1] for d, p in pools.items()})
        assert int(base) == 77 and int(nv) == 2
        for k, host in tree.items():
            want = np.take(host, [r], axis=shard_axis)
            got = np.asarray(out[k])
            assert got.dtype == want.dtype, k
            np.testing.assert_array_equal(
                got.view(np.uint8), want.view(np.uint8), err_msg=k)


def _fit_params_mode(graph, mode, steps_per_dispatch=1):
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian
    lap = build_laplacian(graph.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                        num_nodes=graph.adj_full.shape[0],
                        num_classes=graph.num_classes)
    pipe = BatchPipeline(cfg, lap, graph.labels, world_size=2,
                         pool_num=2)
    net = build_model("graphsage", nhid=32, orders=(1, 1),
                      num_classes=graph.num_classes)
    tr = Trainer(net, pipe, graph.feats, mesh=make_mesh(2),
                 lr=0.05, sigmoid_loss=False, seed=3,
                 steps_per_dispatch=steps_per_dispatch)
    tr.packed_transport = mode
    m = tr.train_epoch(graph.train_nodes, epoch=0)
    return (jax.tree_util.tree_map(np.asarray, tr.params), m.train_loss)


@pytest.mark.parametrize("group", [1, 3])
def test_typed_equals_unpacked_training(small_graph, group):
    """Typed-pool transport is bit-identical to per-leaf transport."""
    p_t, l_t = _fit_params_mode(small_graph, "typed",
                                steps_per_dispatch=group)
    p_p, l_p = _fit_params_mode(small_graph, False,
                                steps_per_dispatch=group)
    assert l_t == pytest.approx(l_p, abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_t),
                    jax.tree_util.tree_leaves(p_p)):
        np.testing.assert_allclose(a, b, atol=1e-6)
