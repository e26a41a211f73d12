"""Kernel-level tests for the SDDMM-direction edge-stream attention
(gnn_tpu/ops/pallas_esattn) — GAT's cold residual as tile-dense masked
flash attention over packed int16 tile coords.

The GAT e2e test (`test_gat.py::test_gat_resident_e2e_matches_coo
[stream=True]`) covers the composed path; these pin the KERNEL contract
directly against a dense masked-attention oracle: row max, softmax
terms (den + att@V), and all three gradients (dQ via the rt-major
pass, dK/dV via the transposed ct-major pass), across head counts,
tile sizes, and empty-row/tile layouts. Interpreter mode (CPU); the
real-chip bit-exactness of the same passes is recorded in
benchmarks/RESULTS.md round 5.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from gnn_tpu.ops import pallas_esattn as esat
from gnn_tpu.ops.pallas_edgestream import pack_edge_tiles


def _rand_edges(rng, nr, nc, nnz):
    rows = rng.randint(0, nr, nnz).astype(np.int64)
    cols = rng.randint(0, nc, nnz).astype(np.int64)
    _, ui = np.unique(rows * nc + cols, return_index=True)
    return rows[ui], cols[ui]


def _dense_oracle(rows, cols, nr, nc, H):
    """mask [nr, nc]; returns closures computing rowmax / terms with
    plain jnp ops (differentiable)."""
    mask = np.zeros((nr, nc), bool)
    mask[rows, cols] = True
    mask = jnp.asarray(mask)

    def scores(q, k):
        d = q.shape[1] // H
        qh = q.reshape(nr, H, d)
        kh = k.reshape(nc, H, d)
        s = jnp.einsum("rhd,chd->hrc", qh, kh)  # [H, nr, nc]
        return jnp.where(mask[None], s, -jnp.inf)

    def rowmax(q, k):
        return jnp.max(scores(q, k), axis=2).T  # [nr, H]

    def terms(q, k, v, rm):
        d = q.shape[1] // H
        s = scores(q, k)                         # [H, nr, nc]
        e = jnp.where(mask[None], jnp.exp(s - rm.T[:, :, None]), 0.0)
        den = jnp.sum(e, axis=2).T               # [nr, H]
        vh = v.reshape(nc, H, d)
        num = jnp.einsum("hrc,chd->rhd", e, vh).reshape(nr, H * d)
        return den, num

    return rowmax, terms


def _kernel_rowmax(tiles, q, k, H):
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(esat.cold_attention_rowmax(
            tiles.coords, tiles.blk_rc, tiles.off,
            jnp.asarray(q), jnp.asarray(k), n_heads=H,
            bm=tiles.bm, bk=tiles.bk, interpret=True))


def _kernel_terms(tiles, q, k, v, rm, H):
    with pltpu.force_tpu_interpret_mode():
        den, num = esat.cold_attention_terms(
            tiles.coords, tiles.blk_rc, tiles.off, tiles.t_order,
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(rm), n_heads=H, bm=tiles.bm, bk=tiles.bk,
            interpret=True)
    return np.asarray(den), np.asarray(num)


@pytest.mark.parametrize("nr,nc,n_out,H,nnz,bm,bk", [
    (128, 256, 64, 1, 400, 128, 128),
    (256, 384, 64, 4, 900, 128, 128),
    (256, 256, 96, 8, 600, 256, 256),   # d=12, 8 heads
    (384, 128, 32, 2, 2000, 128, 128),  # dense tiles -> entry splits
])
def test_rowmax_and_terms_match_dense_oracle(nr, nc, n_out, H, nnz,
                                             bm, bk):
    rng = np.random.RandomState(0)
    rows, cols = _rand_edges(rng, nr, nc, nnz)
    tiles = pack_edge_tiles(rows, cols, nr, nc, bm=bm, bk=bk, ecap=128)
    q = rng.randn(nr, n_out).astype(np.float32)
    k = rng.randn(nc, n_out).astype(np.float32)
    v = rng.randn(nc, n_out).astype(np.float32)
    o_rowmax, o_terms = _dense_oracle(rows, cols, nr, nc, H)

    rm_k = _kernel_rowmax(tiles, q, k, H)
    rm_o = np.asarray(o_rowmax(jnp.asarray(q), jnp.asarray(k)))
    has_edge = np.zeros(nr, bool)
    has_edge[rows] = True
    np.testing.assert_allclose(rm_k[has_edge], rm_o[has_edge],
                               rtol=1e-5, atol=1e-5)
    # rows with no cold edges read the -inf stand-in, not garbage
    assert (rm_k[~has_edge] <= esat.NEG_SENTINEL / 2).all()

    # the caller contract: row_max finite everywhere (hot side / 0.0
    # coercion), here the oracle max with empty rows zeroed
    rm = np.where(np.isfinite(rm_o), rm_o, 0.0).astype(np.float32)
    den_k, num_k = _kernel_terms(tiles, q, k, v, rm, H)
    den_o, num_o = o_terms(jnp.asarray(q), jnp.asarray(k),
                           jnp.asarray(v), jnp.asarray(rm))
    np.testing.assert_allclose(den_k, np.asarray(den_o),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(num_k, np.asarray(num_o),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("H", [1, 4])
def test_terms_gradients_match_dense_oracle(H):
    nr, nc, n_out = 128, 256, 64
    rng = np.random.RandomState(1)
    rows, cols = _rand_edges(rng, nr, nc, 500)
    tiles = pack_edge_tiles(rows, cols, nr, nc, bm=128, bk=128,
                            ecap=128)
    q = rng.randn(nr, n_out).astype(np.float32)
    k = rng.randn(nc, n_out).astype(np.float32)
    v = rng.randn(nc, n_out).astype(np.float32)
    o_rowmax, o_terms = _dense_oracle(rows, cols, nr, nc, H)
    rm_o = np.asarray(o_rowmax(jnp.asarray(q), jnp.asarray(k)))
    rm = jnp.asarray(np.where(np.isfinite(rm_o), rm_o, 0.0),
                     jnp.float32)
    wd = jnp.asarray(rng.randn(nr, H).astype(np.float32))
    wn = jnp.asarray(rng.randn(nr, n_out).astype(np.float32))

    def loss_kernel(q, k, v):
        den, num = esat.cold_attention_terms(
            tiles.coords, tiles.blk_rc, tiles.off, tiles.t_order,
            q, k, v, rm, n_heads=H, bm=tiles.bm, bk=tiles.bk,
            interpret=True)
        return jnp.sum(den * wd) + jnp.sum(num * wn)

    def loss_oracle(q, k, v):
        den, num = o_terms(q, k, v, rm)
        return jnp.sum(den * wd) + jnp.sum(num * wn)

    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(gk, go, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"d{name}")


def test_empty_tile_rows_and_cols_are_inert():
    """Edges confined to one (rt, ct) tile: every other row/col tile is
    reached only through sentinel entries — outputs there must be the
    empty-row sentinel (max) / exact zero (terms), not garbage."""
    nr, nc, n_out, H = 256, 384, 32, 2
    rng = np.random.RandomState(2)
    rows = rng.randint(0, 128, 40).astype(np.int64)
    cols = (256 + rng.randint(0, 128, 40)).astype(np.int64)
    _, ui = np.unique(rows * nc + cols, return_index=True)
    rows, cols = rows[ui], cols[ui]
    tiles = pack_edge_tiles(rows, cols, nr, nc, bm=128, bk=128)
    q = rng.randn(nr, n_out).astype(np.float32)
    k = rng.randn(nc, n_out).astype(np.float32)
    v = rng.randn(nc, n_out).astype(np.float32)
    o_rowmax, o_terms = _dense_oracle(rows, cols, nr, nc, H)

    rm_k = _kernel_rowmax(tiles, q, k, H)
    assert (rm_k[128:] <= esat.NEG_SENTINEL / 2).all()
    rm_o = np.asarray(o_rowmax(jnp.asarray(q), jnp.asarray(k)))
    rm = np.where(np.isfinite(rm_o), rm_o, 0.0).astype(np.float32)
    den_k, num_k = _kernel_terms(tiles, q, k, v, rm, H)
    assert np.all(den_k[128:] == 0.0)
    assert np.all(num_k[128:] == 0.0)
    den_o, num_o = o_terms(jnp.asarray(q), jnp.asarray(k),
                           jnp.asarray(v), jnp.asarray(rm))
    np.testing.assert_allclose(den_k, np.asarray(den_o),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(num_k, np.asarray(num_o),
                               rtol=2e-4, atol=2e-4)
