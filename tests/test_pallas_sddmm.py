"""SDDMM kernel tests (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from jax.experimental.pallas import tpu as pltpu

from gnn_tpu.ops.pallas_sddmm import (masked_edge_scores, sddmm_reference,
                                      stream_sddmm)
from gnn_tpu.ops.pallas_spmm import pack_stream, stream_spmm


def test_sddmm_matches_dense_oracle():
    rng = np.random.RandomState(0)
    R, C, F = 256, 384, 64
    m = sp.random(R, C, density=0.05, format="coo", random_state=rng,
                  dtype=np.float32)
    st = pack_stream(m.row, m.col, m.data, R, C, bm=128, bk=128)
    x = jnp.asarray(rng.randn(R, F).astype(np.float32))
    y = jnp.asarray(rng.randn(C, F).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        tiles = np.asarray(stream_sddmm(jnp.asarray(st.blk_rc), x, y))
    full = np.asarray(x) @ np.asarray(y).T
    rc = np.asarray(st.blk_rc)
    for j in range(len(rc)):
        r, c = int(rc[j]) >> 16, int(rc[j]) & 0xFFFF
        np.testing.assert_allclose(
            tiles[j], full[r * 128:(r + 1) * 128, c * 128:(c + 1) * 128],
            rtol=1e-4, atol=1e-4)


def test_masked_scores_feed_spmm():
    """attention-style pipeline: SDDMM scores masked to the pattern, then
    aggregated with the SpMM stream kernel == dense (mask * X@Y^T) @ V."""
    rng = np.random.RandomState(1)
    R, C, F, FV = 128, 256, 32, 16
    m = sp.random(R, C, density=0.08, format="coo", random_state=rng,
                  dtype=np.float32)
    st = pack_stream(m.row, m.col, m.data, R, C, bm=128, bk=128)
    st = jax.tree_util.tree_map(jnp.asarray, st)
    x = jnp.asarray(rng.randn(R, F).astype(np.float32))
    y = jnp.asarray(rng.randn(C, F).astype(np.float32))
    v = jnp.asarray(rng.randn(C, FV).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        scored = masked_edge_scores(st, x, y)
        out = np.asarray(stream_spmm(scored, v))
    pattern = np.zeros((R, C), np.float32)
    pattern[m.row, m.col] = 1.0
    dense_scores = (np.asarray(x) @ np.asarray(y).T) * pattern
    np.testing.assert_allclose(out, dense_scores @ np.asarray(v),
                               rtol=1e-3, atol=1e-3)


def test_sddmm_reference_consistency():
    rng = np.random.RandomState(2)
    R, C, F = 256, 256, 16
    m = sp.random(R, C, density=0.03, format="coo", random_state=rng,
                  dtype=np.float32)
    st = pack_stream(m.row, m.col, m.data, R, C, bm=128, bk=128)
    x = jnp.asarray(rng.randn(R, F).astype(np.float32))
    y = jnp.asarray(rng.randn(C, F).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(stream_sddmm(jnp.asarray(st.blk_rc), x, y))
    b = np.asarray(sddmm_reference(jnp.asarray(st.blk_rc), x, y))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
