"""Pallas streaming SpMM kernel tests.

On CPU these run the kernel in interpreter mode (`force_tpu_interpret_mode`)
— the same kernel logic Mosaic compiles on TPU, so grid/indexing/
accumulation bugs surface without hardware. The dense-matmul oracle is the
reference authors' own (commented-out) validation trick
(`custom_sparse_ops.py:25`), as real asserts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from jax.experimental.pallas import tpu as pltpu

from gnn_tpu.ops.pallas_spmm import (MAX_STREAM_BLOCKS, StreamBlocks,
                                     pack_stream, stream_spmm)


def _run(stream, x):
    with pltpu.force_tpu_interpret_mode():
        return stream_spmm(jax.tree_util.tree_map(jnp.asarray, stream),
                           jnp.asarray(x))


@pytest.mark.parametrize("bm", [8, 128])
@pytest.mark.parametrize("nr,nc,f,dens", [
    (128, 256, 128, 0.05),
    (256, 384, 256, 0.01),
    (384, 128, 128, 0.30),
])
def test_stream_kernel_matches_dense(bm, nr, nc, f, dens):
    rng = np.random.RandomState(0)
    m = sp.random(nr, nc, density=dens, format="coo", random_state=rng,
                  dtype=np.float32)
    stream = pack_stream(m.row, m.col, m.data, nr, nc, bm=bm, bk=128)
    x = rng.randn(nc, f).astype(np.float32)
    y = _run(stream, x)
    dense = np.zeros((nr, nc), np.float32)
    dense[m.row, m.col] = m.data
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-4,
                               atol=1e-4)


def test_stream_kernel_empty_rows_and_matrix():
    rng = np.random.RandomState(1)
    # only rows 0-7 populated; row-tiles 1.. are empty -> sentinel tiles
    rows = rng.randint(0, 8, 50).astype(np.int64)
    cols = rng.randint(0, 256, 50).astype(np.int64)
    vals = rng.rand(50).astype(np.float32)
    stream = pack_stream(rows, cols, vals, 128, 256, bm=8)
    x = rng.randn(256, 128).astype(np.float32)
    y = np.asarray(_run(stream, x))
    dense = np.zeros((128, 256), np.float32)
    np.add.at(dense, (rows, cols), vals)
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-4)
    # fully empty
    stream0 = pack_stream(np.zeros(0, np.int64), np.zeros(0, np.int64),
                          np.zeros(0, np.float32), 64, 128, bm=8)
    y0 = np.asarray(_run(stream0, x[:128]))
    assert np.all(y0 == 0)


def test_pack_stream_block_contents():
    """Packing places every edge in the right tile at the right offset."""
    rows = np.array([0, 1, 7, 130, 130])
    cols = np.array([0, 130, 127, 5, 250])
    vals = np.array([1., 2., 3., 4., 5.], np.float32)
    stream = pack_stream(rows, cols, vals, 256, 384, bm=128, bk=128)
    rc = np.asarray(stream.blk_rc)
    tiles = np.asarray(stream.vals)
    # expected occupied tiles: (0,0), (0,1), (1,0), (1,1)
    got = {(int(r) >> 16, int(r) & 0xFFFF) for r in rc[:4]}
    assert got == {(0, 0), (0, 1), (1, 0), (1, 1)}
    # dense reconstruction
    dense = np.zeros((256, 384), np.float32)
    for t in range(len(rc)):
        r, c = int(rc[t]) >> 16, int(rc[t]) & 0xFFFF
        dense[r * 128:(r + 1) * 128, c * 128:(c + 1) * 128] += tiles[t]
    expected = np.zeros((256, 384), np.float32)
    expected[rows, cols] = vals
    np.testing.assert_array_equal(dense, expected)


def test_stream_too_long_raises():
    stream = StreamBlocks(
        blk_rc=jnp.zeros(MAX_STREAM_BLOCKS + 8, jnp.int32),
        vals=jnp.zeros((MAX_STREAM_BLOCKS + 8, 8, 128), jnp.float32),
        nrows=8, ncols=128, bm=8, bk=128)
    with pytest.raises(ValueError, match="SMEM"):
        stream_spmm(stream, jnp.zeros((128, 128), jnp.float32))
