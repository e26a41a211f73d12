"""Unit tests for the sparse aggregation ops.

Oracle strategy: dense matmul, the same cross-check the reference authors
kept commented out in `custom_sparse_ops.py:25` (``mat1.mm(mat2)``) — here
as real asserts (SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from gnn_tpu.ops import sparse as sops


def _random_coo(rng, nr, nc, density):
    m = sp.random(nr, nc, density=density, format="coo", random_state=rng,
                  dtype=np.float32)
    return m.row.astype(np.int32), m.col.astype(np.int32), m.data, m


@pytest.mark.parametrize("fmt", ["coo", "blocked"])
@pytest.mark.parametrize("nr,nc,f", [(64, 96, 24), (256, 384, 130)])
def test_spmm_matches_dense(fmt, nr, nc, f):
    rng = np.random.RandomState(0)
    rows, cols, vals, m = _random_coo(rng, nr, nc, 0.05)
    nr_pad, nc_pad = sops._round_up(nr, 128), sops._round_up(nc, 128)
    if fmt == "coo":
        adj = sops.pack_coo(rows, cols, vals, nr, nc, nr_pad, nc_pad)
    else:
        adj = sops.pack_blocked(rows, cols, vals, nr, nc, nr_pad, nc_pad)
    x = rng.randn(nc_pad, f).astype(np.float32)
    y = sops.spmm(adj, jnp.asarray(x))
    assert y.shape == (nr_pad, f)
    dense = np.zeros((nr_pad, nc_pad), np.float32)
    dense[rows, cols] = vals
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("fmt", ["coo", "blocked"])
def test_spmm_transpose_matches_dense(fmt):
    rng = np.random.RandomState(1)
    rows, cols, vals, _ = _random_coo(rng, 200, 140, 0.08)
    if fmt == "coo":
        adj = sops.pack_coo(rows, cols, vals, 200, 140, 256, 256)
    else:
        adj = sops.pack_blocked(rows, cols, vals, 200, 140, 256, 256)
    g = rng.randn(256, 33).astype(np.float32)
    out = sops.spmm_transpose(adj, jnp.asarray(g))
    dense = np.zeros((256, 256), np.float32)
    dense[rows, cols] = vals
    np.testing.assert_allclose(np.asarray(out), dense.T @ g, rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("fmt", ["coo", "blocked"])
def test_spmm_vjp_is_transpose_and_no_adj_grad(fmt):
    """Gradient flows to x as A^T g; adjacency grad is zero — the JAX analog
    of the reference returning None for the sparse operand
    (`custom_sparse_ops.py:37`)."""
    rng = np.random.RandomState(2)
    rows, cols, vals, _ = _random_coo(rng, 96, 96, 0.1)
    if fmt == "coo":
        adj = sops.pack_coo(rows, cols, vals, 96, 96, 128, 128)
    else:
        adj = sops.pack_blocked(rows, cols, vals, 96, 96, 128, 128)
    x = jnp.asarray(rng.randn(128, 16).astype(np.float32))

    def f(a, xx):
        return jnp.sum(sops.spmm(a, xx) ** 2)

    ga, gx = jax.grad(f, argnums=(0, 1), allow_int=True)(adj, x)
    y = sops.spmm(adj, x)
    expected_gx = sops.spmm_transpose(adj, 2.0 * y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(expected_gx),
                               rtol=2e-5, atol=2e-5)
    for leaf in jax.tree_util.tree_leaves(ga):
        assert not np.any(np.asarray(leaf))


def test_blocked_matches_coo_under_jit():
    rng = np.random.RandomState(3)
    rows, cols, vals, _ = _random_coo(rng, 250, 250, 0.03)
    coo = sops.pack_coo(rows, cols, vals, 250, 250, 256, 256)
    blk = sops.pack_blocked(rows, cols, vals, 250, 250, 256, 256)
    x = jnp.asarray(rng.randn(256, 64).astype(np.float32))
    y1 = jax.jit(sops.spmm)(coo, x)
    y2 = jax.jit(sops.spmm)(blk, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5,
                               atol=2e-5)


def test_to_dense_consistency():
    rng = np.random.RandomState(4)
    rows, cols, vals, _ = _random_coo(rng, 100, 130, 0.05)
    coo = sops.pack_coo(rows, cols, vals, 100, 130, 128, 256)
    blk = sops.pack_blocked(rows, cols, vals, 100, 130, 128, 256)
    d1 = np.asarray(sops.to_dense(coo))
    d2 = np.asarray(sops.to_dense(blk))
    expected = np.zeros((128, 256), np.float32)
    expected[rows, cols] = vals
    np.testing.assert_allclose(d1, expected, atol=1e-6)
    np.testing.assert_allclose(d2, expected, atol=1e-6)


def test_empty_adjacency():
    adj = sops.pack_coo(np.zeros(0, np.int32), np.zeros(0, np.int32),
                        np.zeros(0, np.float32), 10, 10, 128, 128)
    x = jnp.ones((128, 8), jnp.float32)
    assert np.all(np.asarray(sops.spmm(adj, x)) == 0)
    blk = sops.pack_blocked(np.zeros(0, np.int32), np.zeros(0, np.int32),
                            np.zeros(0, np.float32), 10, 10, 128, 128)
    assert np.all(np.asarray(sops.spmm(blk, x)) == 0)
