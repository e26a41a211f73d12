"""Edge-stream SpMM kernel tests (gnn_tpu/ops/pallas_edgestream).

The kernel densifies each occupied tile on the MXU from packed edge
coords (one-hot compare matmuls — no scatter) with the rank-1
``rv[r] * nf[c]`` value factorization of val-free laplacians. On CPU
these run in interpreter mode; the oracle is the dense rank-1-masked
matmul (the reference authors' own validation trick,
`custom_sparse_ops.py:25`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from jax.experimental.pallas import tpu as pltpu

from gnn_tpu.ops.pallas_edgestream import (EdgeTiles, edge_stream_spmm,
                                           pack_edge_tiles)


def _dense_oracle(rows, cols, rv, nf, nr, nc):
    d = np.zeros((nr, nc), np.float32)
    d[rows, cols] = rv[rows] * nf[cols]
    return d


def _run(tiles, x, rv, nf, transpose=False):
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(edge_stream_spmm(
            jax.tree_util.tree_map(jnp.asarray, tiles), jnp.asarray(x),
            jnp.asarray(rv), jnp.asarray(nf), transpose=transpose,
            interpret=True))


@pytest.mark.parametrize("nr,nc,f,dens,ecap,bm,bk", [
    (128, 256, 128, 0.05, 64, 128, 128),
    (256, 384, 256, 0.01, 256, 128, 128),
    (384, 128, 160, 0.30, 128, 128, 128),  # heavy tiles -> splitting
    (256, 512, 96, 0.04, 256, 256, 256),   # 16-bit coord pack (sign)
    (512, 256, 96, 0.10, 256, 128, 256),
])
def test_edge_stream_matches_dense(nr, nc, f, dens, ecap, bm, bk):
    rng = np.random.RandomState(0)
    m = sp.random(nr, nc, density=dens, format="coo", random_state=rng,
                  dtype=np.float32)
    rows = m.row.astype(np.int64)
    cols = m.col.astype(np.int64)
    # drop accidental duplicates (graphs have none; the one-hot matmul
    # would sum them, the dense assignment would not)
    _, ui = np.unique(rows * nc + cols, return_index=True)
    rows, cols = rows[ui], cols[ui]
    rv = rng.rand(nr).astype(np.float32) + 0.5
    nf = rng.rand(nc).astype(np.float32) + 0.5
    tiles = pack_edge_tiles(rows, cols, nr, nc, bm=bm, bk=bk,
                            ecap=ecap)
    x = rng.randn(nc, f).astype(np.float32)
    g = rng.randn(nr, f).astype(np.float32)
    dense = _dense_oracle(rows, cols, rv, nf, nr, nc)

    y = _run(tiles, x, rv, nf)
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)
    dx = _run(tiles, g, rv, nf, transpose=True)
    np.testing.assert_allclose(dx, dense.T @ g, rtol=1e-4, atol=1e-4)


def test_edge_stream_empty_and_sparse_tiles():
    rng = np.random.RandomState(1)
    nr, nc, f = 256, 384, 128
    # edges only in row-tile 0 and col-tile 2: every other row/col tile
    # is covered by sentinels (zeroed, not garbage)
    rows = rng.randint(0, 128, 40).astype(np.int64)
    cols = (256 + rng.randint(0, 128, 40)).astype(np.int64)
    _, ui = np.unique(rows * nc + cols, return_index=True)
    rows, cols = rows[ui], cols[ui]
    rv = np.ones(nr, np.float32)
    nf = np.ones(nc, np.float32)
    tiles = pack_edge_tiles(rows, cols, nr, nc)
    x = rng.randn(nc, f).astype(np.float32)
    dense = _dense_oracle(rows, cols, rv, nf, nr, nc)
    y = _run(tiles, x, rv, nf)
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)
    dx = _run(tiles, rng.randn(nr, f).astype(np.float32), rv, nf,
              transpose=True)
    assert np.all(np.isfinite(dx))

    # fully empty edge set: all-zero outputs, both directions
    t0 = pack_edge_tiles(np.zeros(0, np.int64), np.zeros(0, np.int64),
                         128, 128)
    y0 = _run(t0, x[:128], rv[:128], nf[:128])
    np.testing.assert_array_equal(y0, 0)


def test_edge_stream_bucketed_shapes_and_padding():
    """nb_pad / e_pad bucketing (shape-stable jits across steps): padded
    entries must not corrupt any output block."""
    rng = np.random.RandomState(2)
    nr, nc, f = 256, 256, 128
    m = sp.random(nr, nc, density=0.02, format="coo", random_state=rng,
                  dtype=np.float32)
    rows, cols = m.row.astype(np.int64), m.col.astype(np.int64)
    _, ui = np.unique(rows * nc + cols, return_index=True)
    rows, cols = rows[ui], cols[ui]
    rv = rng.rand(nr).astype(np.float32)
    nf = rng.rand(nc).astype(np.float32)
    tight = pack_edge_tiles(rows, cols, nr, nc)
    padded = pack_edge_tiles(rows, cols, nr, nc,
                             nb_pad=tight.blk_rc.shape[0] + 37,
                             e_pad=len(rows) + 300)
    x = rng.randn(nc, f).astype(np.float32)
    dense = _dense_oracle(rows, cols, rv, nf, nr, nc)
    np.testing.assert_allclose(_run(padded, x, rv, nf), dense @ x,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        _run(padded, x, rv, nf, transpose=True), dense.T @ x,
        rtol=1e-4, atol=1e-4)


def test_edge_stream_per_edge_values():
    """Weighted payload: per-edge values ride a second streamed grid
    and multiply into the one-hot (A = vals_e * rv[r] * nf[c])."""
    rng = np.random.RandomState(7)
    nr, nc, f = 256, 512, 96
    m = sp.random(nr, nc, density=0.03, format="coo", random_state=rng,
                  dtype=np.float32)
    rows, cols = m.row.astype(np.int64), m.col.astype(np.int64)
    _, ui = np.unique(rows * nc + cols, return_index=True)
    rows, cols = rows[ui], cols[ui]
    vals = (rng.rand(len(rows)) + 0.5).astype(np.float32)
    tiles = pack_edge_tiles(rows, cols, nr, nc, bm=256, bk=256,
                            vals=vals, val_dtype=np.float32)
    assert tiles.vals is not None
    ones_r = np.ones(nr, np.float32)
    ones_c = np.ones(nc, np.float32)
    dense = np.zeros((nr, nc), np.float32)
    dense[rows, cols] = vals
    x = rng.randn(nc, f).astype(np.float32)
    g = rng.randn(nr, f).astype(np.float32)
    y = _run(tiles, x, ones_r, ones_c)
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)
    dx = _run(tiles, g, ones_r, ones_c, transpose=True)
    np.testing.assert_allclose(dx, dense.T @ g, rtol=1e-4, atol=1e-4)
    # rank-1 factors still compose on top of the per-edge values
    rv = (rng.rand(nr) + 0.5).astype(np.float32)
    nf = (rng.rand(nc) + 0.5).astype(np.float32)
    y2 = _run(tiles, x, rv, nf)
    dense2 = dense * rv[:, None] * nf[None, :]
    np.testing.assert_allclose(y2, dense2 @ x, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", range(4))
def test_segment_kernel_matches_dense(seed):
    """Segment-grid kernel (one grid step per row-tile segment) must
    match the dense oracle; the transpose runs the SAME kernel on a
    (cols, rows)-swapped pack with swapped factors."""
    from gnn_tpu.ops.pallas_edgestream import (edge_stream_spmm_seg,
                                               segment_tiles)
    rng = np.random.RandomState(50 + seed)
    bm = int(rng.choice([128, 256]))
    bk = int(rng.choice([128, 256]))
    n_rt = rng.randint(1, 5)
    n_ct = rng.randint(1, 5)
    nr, nc = n_rt * bm, n_ct * bk
    nnz = rng.randint(0, max(nr * nc // 25, 2))
    key = rng.choice(nr * nc, size=nnz, replace=False) if nnz else \
        np.zeros(0, np.int64)
    rows = np.sort(key) // nc
    cols = np.sort(key) % nc
    rv = rng.rand(nr).astype(np.float32) + 0.5
    nf = rng.rand(nc).astype(np.float32) + 0.5
    dense = np.zeros((nr, nc), np.float32)
    dense[rows, cols] = rv[rows] * nf[cols]
    f = int(rng.choice([8, 96]))
    x = rng.randn(nc, f).astype(np.float32)
    g = rng.randn(nr, f).astype(np.float32)

    tiles = pack_edge_tiles(rows, cols, nr, nc, bm=bm, bk=bk)
    segp = segment_tiles(np.asarray(tiles.blk_rc), np.asarray(tiles.off))
    tj = jax.tree_util.tree_map(jnp.asarray, tiles)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(edge_stream_spmm_seg(
            tj, jnp.asarray(segp), jnp.asarray(x), jnp.asarray(rv),
            jnp.asarray(nf), interpret=True))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)

    # transpose: swapped pack, swapped factors
    o = np.argsort(cols * nr + rows, kind="stable")
    tiles_t = pack_edge_tiles(cols[o], rows[o], nc, nr, bm=bk, bk=bm)
    segp_t = segment_tiles(np.asarray(tiles_t.blk_rc),
                           np.asarray(tiles_t.off))
    ttj = jax.tree_util.tree_map(jnp.asarray, tiles_t)
    with pltpu.force_tpu_interpret_mode():
        dx = np.asarray(edge_stream_spmm_seg(
            ttj, jnp.asarray(segp_t), jnp.asarray(g), jnp.asarray(nf),
            jnp.asarray(rv), interpret=True))
    np.testing.assert_allclose(dx, dense.T @ g, rtol=1e-4, atol=1e-4)
