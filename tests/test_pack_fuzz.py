"""Randomized packing fuzz tests: every pack format must reproduce the
dense matrix exactly across random shapes/densities/tile sizes."""
import numpy as np
import pytest
import scipy.sparse as sp

from gnn_tpu.ops import sparse as sops
from gnn_tpu.ops.pallas_spmm import pack_stream


def _dense_of(rows, cols, vals, shape):
    d = np.zeros(shape, np.float32)
    np.add.at(d, (rows, cols), vals)
    return d


@pytest.mark.parametrize("seed", range(8))
def test_pack_stream_fuzz(seed):
    rng = np.random.RandomState(seed)
    bm = int(rng.choice([8, 16, 128, 256]))
    bk = int(rng.choice([128, 256, 512]))
    n_rt = rng.randint(1, 6)
    n_ct = rng.randint(1, 6)
    R, C = n_rt * bm, n_ct * bk
    nnz = rng.randint(0, max(R * C // 20, 2))
    rows = rng.randint(0, R, nnz)
    cols = rng.randint(0, C, nnz)
    vals = rng.rand(nnz).astype(np.float32) + 0.1
    st = pack_stream(rows, cols, vals, R, C, bm=bm, bk=bk)
    rc = np.asarray(st.blk_rc)
    tiles = np.asarray(st.vals)
    # invariant: sorted by row-tile
    assert np.all(np.diff(rc >> 16) >= 0)
    # every row-tile appears at least once
    assert set(range(n_rt)) <= set((rc >> 16).tolist())
    # dense reconstruction (duplicates: pack overwrites, oracle should
    # match the LAST duplicate — regenerate without duplicates instead)
    uniq = {}
    for r, c, v in zip(rows, cols, vals):
        uniq[(r, c)] = v
    recon = np.zeros((R, C), np.float32)
    for t in range(len(rc)):
        r0, c0 = (int(rc[t]) >> 16) * bm, (int(rc[t]) & 0xFFFF) * bk
        recon[r0:r0 + bm, c0:c0 + bk] += tiles[t]
    expected = np.zeros((R, C), np.float32)
    for (r, c), v in uniq.items():
        expected[r, c] = v
    np.testing.assert_allclose(recon, expected, atol=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_pack_blocked_transpose_fuzz(seed):
    rng = np.random.RandomState(100 + seed)
    R = 128 * rng.randint(1, 4)
    C = 128 * rng.randint(1, 4)
    m = sp.random(R, C, density=float(rng.uniform(0.001, 0.1)),
                  format="coo", random_state=rng, dtype=np.float32)
    adj = sops.pack_blocked(m.row.astype(np.int64), m.col.astype(np.int64),
                            m.data, R, C, R, C)
    d = np.asarray(sops.to_dense(adj))
    expected = np.zeros((R, C), np.float32)
    expected[m.row, m.col] = m.data
    np.testing.assert_allclose(d, expected, atol=1e-6)
    # transpose tiling reconstructs the transpose
    import jax.numpy as jnp
    x = np.eye(R, dtype=np.float32)
    yt = np.asarray(sops.spmm_transpose(adj, jnp.asarray(x)))
    np.testing.assert_allclose(yt, expected.T, atol=1e-5)


@pytest.mark.parametrize("seed", range(6))
def test_pack_coo_bucket_fuzz(seed):
    rng = np.random.RandomState(200 + seed)
    R = 128 * rng.randint(1, 4)
    C = 128 * rng.randint(1, 4)
    nnz = rng.randint(1, 4000)
    rows = rng.randint(0, R, nnz).astype(np.int32)
    cols = rng.randint(0, C, nnz).astype(np.int32)
    vals = rng.rand(nnz).astype(np.float32)
    adj = sops.pack_coo(rows, cols, vals, R, C, R, C)
    assert adj.rows.shape[0] >= nnz
    assert adj.rows.shape[0] % 512 == 0
    import jax.numpy as jnp
    x = rng.randn(C, 8).astype(np.float32)
    y = np.asarray(sops.spmm(adj, jnp.asarray(x)))
    np.testing.assert_allclose(y, _dense_of(rows, cols, vals, (R, C)) @ x,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", range(8))
def test_pack_edge_tiles_fuzz(seed):
    """Edge-stream packing across random shapes/tile sizes: the native
    counting sort must be bit-identical to the numpy argsort path, and
    the interpreted kernel must reproduce the dense rank-1 (or
    weighted) matrix in both directions."""
    import jax
    import jax.numpy as jnp
    from gnn_tpu.ops.pallas_edgestream import (edge_stream_spmm,
                                               pack_edge_tiles)
    rng = np.random.RandomState(100 + seed)
    bm = int(rng.choice([128, 256]))
    bk = int(rng.choice([128, 256]))
    n_rt = rng.randint(1, 5)
    n_ct = rng.randint(1, 5)
    R, C = n_rt * bm, n_ct * bk
    nnz = rng.randint(0, max(R * C // 30, 2))
    key = rng.choice(R * C, size=nnz, replace=False) if nnz else \
        np.zeros(0, np.int64)
    rows = np.sort(key) // C
    cols = np.sort(key) % C
    weighted = bool(rng.randint(2))
    vals = (rng.rand(nnz).astype(np.float32) + 0.1) if weighted else None
    ecap = int(rng.choice([64, 256]))
    kw = dict(bm=bm, bk=bk, ecap=ecap, vals=vals, val_dtype=np.float32)
    t_np = pack_edge_tiles(rows, cols, R, C, use_native=False, **kw)
    t_nat = pack_edge_tiles(rows, cols, R, C, use_native=True, **kw)
    for f in ("coords", "blk_rc", "off", "t_order", "vals"):
        a, b = getattr(t_np, f), getattr(t_nat, f)
        if a is None:
            assert b is None
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f)

    rv = rng.rand(R).astype(np.float32) + 0.5
    nf = rng.rand(C).astype(np.float32) + 0.5
    dense = np.zeros((R, C), np.float32)
    dense[rows, cols] = (vals if weighted else 1.0)
    dense = dense * rv[:, None] * nf[None, :]
    F = int(rng.choice([8, 128]))
    x = rng.randn(C, F).astype(np.float32)
    g = rng.randn(R, F).astype(np.float32)
    tj = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, t_nat)
    y = np.asarray(edge_stream_spmm(tj, jnp.asarray(x), jnp.asarray(rv),
                                    jnp.asarray(nf), interpret=True))
    np.testing.assert_allclose(y, dense @ x, rtol=2e-4, atol=2e-4)
    dx = np.asarray(edge_stream_spmm(tj, jnp.asarray(g), jnp.asarray(rv),
                                     jnp.asarray(nf), transpose=True,
                                     interpret=True))
    np.testing.assert_allclose(dx, dense.T @ g, rtol=2e-4, atol=2e-4)
