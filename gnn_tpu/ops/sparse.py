"""TPU-native sparse neighborhood-aggregation ops.

This module is the TPU replacement for the reference's CUDA SpMM extension
(`/root/reference/spmm_cpp/cuda_spmm.cu` + `custom_sparse_ops.py`): a
sparse(adjacency) x dense(features) matmul with a custom VJP whose backward
pass multiplies by the transpose (reference: `custom_sparse_ops.py:31-37`),
and an adjacency "build" step that attaches LADIES debias edge weights
(reference: `cuda_spmm.cu:787-803` computes ``w = 1/deg_full(row) *
normfact[col]`` on the fly; here the host packs the weights once).

Design (TPU-first, not a port):

* Minibatch adjacencies are *padded, static-shape* structures so everything
  works under ``jax.jit`` — XLA requires static shapes. Two formats:

  - :class:`COOAdj` — padded COO edge list. Aggregation is
    ``segment_sum(vals * x[cols], rows)`` which XLA lowers to native TPU
    gather + scatter-add. This is the portable path (CPU + TPU) and the
    reference implementation used as the test oracle's subject.

  - :class:`BlockedAdj` — 2D-tiled block-sparse (BCSR-like) layout: the
    adjacency is cut into ``(bm, bk)`` dense tiles and only tiles containing
    at least one edge are stored, padded per row-tile. Aggregation runs on
    the MXU (one small matmul per occupied tile) via a Pallas kernel
    (`gnn_tpu.ops.pallas_spmm`) with a jnp fallback. For LADIES-sampled
    minibatches (density commonly 0.5-5%) this is the speed-of-light format
    on TPU: the MXU is ~50x faster than any gather path, so skipping only
    *empty* tiles and running dense tiles on the MXU beats fine-grained
    sparsity tricks designed for GPUs (the reference's virtual-row
    load-balanced CUDA kernel, `cuda_spmm.cu:163-212`, solves a GPU problem
    that does not exist on a systolic array).

* ``spmm`` is a ``jax.custom_vjp``: gradient flows to the dense operand
  only (adjacency is non-differentiable), exactly like the reference's
  ``SparseDenseMM`` (`custom_sparse_ops.py:16-40`). The backward transpose
  is *precomputed on the host* into the adjacency structure (``*_t``
  fields) instead of transposed+coalesced on device per step
  (`custom_sparse_ops.py:34`) — device-side sorting is expensive on TPU and
  free on the host.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class COOAdj:
    """Padded COO adjacency for one sampled layer.

    Edges are padded with (row=0, col=0, val=0) — zero values make padding a
    no-op under segment-sum. ``nrows``/``ncols`` are the *padded* static
    sizes; ``n_valid_rows``/``n_valid_cols`` (traced scalars) carry the true
    sizes for masking.
    """

    rows: jnp.ndarray  # int32 [nnz_pad]
    cols: jnp.ndarray  # int32 [nnz_pad]
    vals: jnp.ndarray  # float32 [nnz_pad]
    n_valid_rows: jnp.ndarray  # int32 scalar
    n_valid_cols: jnp.ndarray  # int32 scalar
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)
    # row-major-sorted edges let the TPU segment-sum skip its scatter
    # path (~1.6x faster, measured); detected at pack time
    rows_sorted: bool = struct.field(pytree_node=False, default=False)

    @property
    def shape(self):
        return (self.nrows, self.ncols)


@struct.dataclass
class BlockedAdj:
    """Tiled block-sparse adjacency (both A and A^T tilings).

    The ``(nrows, ncols)`` matrix is cut into ``(bm, bk)`` tiles; only tiles
    containing an edge are stored. Per row-tile the occupied tiles are
    padded to the max count with all-zero tiles pointing at col-tile 0.

    ``block_cols[i, b]`` = col-tile index of the b-th stored tile in
    row-tile i. ``block_vals[i, b]`` = its dense ``(bm, bk)`` contents.
    ``*_t`` fields hold the same structure for A^T (for the VJP).
    """

    block_cols: jnp.ndarray  # int32 [n_row_tiles, max_blk]
    block_vals: jnp.ndarray  # f32 [n_row_tiles, max_blk, bm, bk]
    block_cols_t: jnp.ndarray  # int32 [n_col_tiles, max_blk_t]
    block_vals_t: jnp.ndarray  # f32 [n_col_tiles, max_blk_t, bk, bm]
    n_valid_rows: jnp.ndarray  # int32 scalar
    n_valid_cols: jnp.ndarray  # int32 scalar
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)
    bm: int = struct.field(pytree_node=False)
    bk: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.nrows, self.ncols)


@struct.dataclass
class PatternAdj:
    """Pattern-only compressed adjacency for attention models (GAT).

    Attention computes its edge VALUES on device (per-edge softmax of
    q.k scores), so only the sampled PATTERN needs to cross the wire:
    int16 cols + per-row counts (edges are row-sorted; the device
    re-expands row ids with a cumsum — the same trick the resident-lite
    payload uses). ~2 bytes/edge vs the 6-12 of a value-carrying COO
    with its transpose copy. No transpose structure ships at all:
    attention layers differentiate straight through the segment ops, so
    no custom-VJP transpose aggregation exists.
    """

    cols: jnp.ndarray     # int16/int32 [nnz_pad]
    row_cnt: jnp.ndarray  # int32 [nrows]: edges per output row
    n_edges: jnp.ndarray  # int32 scalar (valid edge count)
    n_valid_rows: jnp.ndarray  # int32 scalar
    n_valid_cols: jnp.ndarray  # int32 scalar
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def nnz_pad(self) -> int:
        return self.cols.shape[0]

    def expand(self):
        """Device-side: ``(rows int32 [nnz_pad], cols int32, live
        bool)`` — rows re-expand from the per-row counts (pad edges sit
        at the last row), exactly `residentgraph.materialize_layer`'s
        count expansion."""
        nnz_pad = self.cols.shape[0]
        live = jnp.arange(nnz_pad) < self.n_edges
        cnt = self.row_cnt
        starts = jnp.cumsum(cnt) - cnt
        seg = jnp.zeros(nnz_pad + 1, jnp.int32).at[starts].add(
            1, mode="drop")
        rows = jnp.cumsum(seg[:nnz_pad]) - 1
        rows = jnp.where(live, jnp.clip(rows, 0, self.nrows - 1),
                         self.nrows - 1)
        return rows, self.cols.astype(jnp.int32), live


def pack_pattern(rows: np.ndarray, cols: np.ndarray, n_valid_rows: int,
                 n_valid_cols: int, nrows_pad: int, ncols_pad: int,
                 nnz_pad: Optional[int] = None,
                 compress: bool = True) -> PatternAdj:
    """Pack a row-sorted edge pattern into a :class:`PatternAdj`."""
    nnz = len(rows)
    assert nnz == 0 or np.all(np.diff(rows) >= 0), \
        "pack_pattern expects row-sorted edges"
    if nnz_pad is None:
        nnz_pad = max(_round_up(max(nnz, 1), 512), 512)
    if nnz > nnz_pad:
        raise ValueError(f"nnz {nnz} exceeds pad {nnz_pad}")
    cidx = np.int16 if (compress and ncols_pad <= 32768) else np.int32
    c = np.zeros(nnz_pad, cidx)
    c[:nnz] = cols
    row_cnt = np.bincount(np.asarray(rows, np.int64),
                          minlength=nrows_pad).astype(np.int32) if nnz \
        else np.zeros(nrows_pad, np.int32)
    return PatternAdj(cols=c, row_cnt=row_cnt,
                      n_edges=np.asarray(nnz, np.int32),
                      n_valid_rows=np.int32(n_valid_rows),
                      n_valid_cols=np.int32(n_valid_cols),
                      nrows=int(nrows_pad), ncols=int(ncols_pad))


Adj = COOAdj  # default public alias for typing


# ---------------------------------------------------------------------------
# Host-side packing (numpy) — the analog of the reference's adjacency
# construction path (`sampler.py:133-139` + `cuda_spmm.cu:806-827`).
# ---------------------------------------------------------------------------

def pack_coo(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_valid_rows: int,
    n_valid_cols: int,
    nrows_pad: int,
    ncols_pad: int,
    nnz_pad: Optional[int] = None,
    compress: bool = False,
) -> COOAdj:
    """Pack host COO arrays into a padded :class:`COOAdj` (numpy, no jax).

    ``compress=True`` ships int16 indices (when the padded shape fits) and
    bfloat16 values, halving the per-step host->device payload — the
    static-pad generalization of the reference's int16 colidx trick
    (`sampler.py:136`), minus its hard 32767-node cap (larger pads simply
    fall back to int32). The device side upcasts before aggregating.
    """
    nnz = len(rows)
    if nnz_pad is None:
        nnz_pad = max(_round_up(max(nnz, 1), 512), 512)
    if nnz > nnz_pad:
        raise ValueError(f"nnz {nnz} exceeds pad {nnz_pad}")
    ridx = np.int16 if (compress and nrows_pad <= 32768) else np.int32
    cidx = np.int16 if (compress and ncols_pad <= 32768) else np.int32
    vdt = jnp.bfloat16 if compress else np.float32
    r = np.empty(nnz_pad, ridx)
    c = np.empty(nnz_pad, cidx)
    v = np.empty(nnz_pad, vdt)
    r[:nnz] = rows
    c[:nnz] = cols
    v[:nnz] = vals
    # pad tail: zero vals => no-op edges; pad rows sit at the LAST row so
    # row-sorted inputs (the sampler's CSR-sliced layers) stay sorted
    r[nnz:] = nrows_pad - 1
    c[nnz:] = 0
    v[nnz:] = 0
    rows_sorted = bool(nnz == 0 or np.all(np.diff(rows) >= 0))
    return COOAdj(
        rows=r, cols=c, vals=v,
        n_valid_rows=np.int32(n_valid_rows),
        n_valid_cols=np.int32(n_valid_cols),
        nrows=int(nrows_pad), ncols=int(ncols_pad),
        rows_sorted=rows_sorted,
    )


def _pack_blocks_one_side(rows, cols, vals, n_tiles_r, n_tiles_c, bm, bk,
                          max_blk=None):
    """Group COO edges into (bm, bk) dense tiles. Returns (block_cols
    [n_tiles_r, max_blk] int32, block_vals [n_tiles_r, max_blk, bm, bk] f32).
    """
    tr = rows // bm
    tc = cols // bk
    tile_key = tr.astype(np.int64) * n_tiles_c + tc
    order = np.argsort(tile_key, kind="stable")
    tile_key = tile_key[order]
    rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]
    uniq, start_idx, counts = np.unique(tile_key, return_index=True,
                                        return_counts=True)
    n_occ = len(uniq)
    occ_tr = (uniq // n_tiles_c).astype(np.int32)
    occ_tc = (uniq % n_tiles_c).astype(np.int32)
    # occupied blocks per row-tile
    blk_per_rt = np.bincount(occ_tr, minlength=n_tiles_r)
    need = int(blk_per_rt.max()) if n_occ else 1
    if max_blk is None:
        max_blk = max(need, 1)
    elif need > max_blk:
        raise ValueError(f"row tile needs {need} blocks > pad {max_blk}")
    block_cols = np.zeros((n_tiles_r, max_blk), np.int32)
    block_vals = np.zeros((n_tiles_r, max_blk, bm, bk), np.float32)
    # slot of each occupied block within its row-tile (uniq is sorted by
    # (tr, tc) so slots are consecutive per row-tile)
    first_of_rt = np.searchsorted(occ_tr, occ_tr)  # index of first occ in rt
    slot = np.arange(n_occ) - first_of_rt
    block_cols[occ_tr, slot] = occ_tc
    # scatter edge values into their block
    blk_of_edge = np.repeat(np.arange(n_occ), counts)
    lr = rows_s - occ_tr[blk_of_edge] * bm
    lc = cols_s - occ_tc[blk_of_edge] * bk
    block_vals[occ_tr[blk_of_edge], slot[blk_of_edge], lr, lc] = vals_s
    return block_cols, block_vals


def pack_blocked(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_valid_rows: int,
    n_valid_cols: int,
    nrows_pad: int,
    ncols_pad: int,
    bm: int = 128,
    bk: int = 128,
    max_blk: Optional[int] = None,
    max_blk_t: Optional[int] = None,
) -> BlockedAdj:
    """Pack host COO into the tiled block-sparse layout (plus transpose)."""
    assert nrows_pad % bm == 0 and ncols_pad % bk == 0
    n_tr, n_tc = nrows_pad // bm, ncols_pad // bk
    bc, bv = _pack_blocks_one_side(rows, cols, vals, n_tr, n_tc, bm, bk,
                                   max_blk)
    bct, bvt = _pack_blocks_one_side(cols, rows, vals, n_tc, n_tr, bk, bm,
                                     max_blk_t)
    return BlockedAdj(
        block_cols=bc, block_vals=bv, block_cols_t=bct, block_vals_t=bvt,
        n_valid_rows=np.int32(n_valid_rows),
        n_valid_cols=np.int32(n_valid_cols),
        nrows=int(nrows_pad), ncols=int(ncols_pad), bm=bm, bk=bk,
    )


# ---------------------------------------------------------------------------
# Device-side aggregation implementations
# ---------------------------------------------------------------------------

# Edge-chunk size for the COO path: bounds the [chunk, F] gather/scatter
# temporaries (the naive single-pass form materializes [nnz, F] — ~6 GB
# per layer at Reddit scale, which OOMs a 16 GB chip once forward +
# backward temporaries coexist).
_COO_CHUNK = 262_144


def _coo_aggregate(rows, cols, vals, x, nrows, sorted_rows=False):
    """y[r] = sum_e vals[e] * x[cols[e]] for edges with rows[e]==r.

    Edges are processed in fixed-size chunks under ``lax.scan`` so peak
    memory is [chunk, F] regardless of nnz. Compressed (int16/bf16)
    operands are upcast on device — a fused elementwise op, so the H2D
    savings are free. ``sorted_rows`` (host-guaranteed nondecreasing
    segment ids; each scan chunk of a sorted stream is itself sorted)
    lets XLA use its sorted-segment path instead of generic scatter —
    measured ~1.6x faster on v5e.
    """
    rows = rows.astype(jnp.int32)
    cols = cols.astype(jnp.int32)
    nnz = rows.shape[0]
    if nnz <= _COO_CHUNK:
        gathered = jnp.take(x, cols, axis=0)  # [nnz, F]
        contrib = gathered * vals[:, None].astype(x.dtype)
        return jax.ops.segment_sum(contrib, rows, num_segments=nrows,
                                   indices_are_sorted=sorted_rows)
    n_chunks = -(-nnz // _COO_CHUNK)
    pad = n_chunks * _COO_CHUNK - nnz
    # pad with the last row id to preserve per-chunk sortedness (vals
    # pad to zero, so the target row is unaffected)
    rows_c = jnp.pad(rows, (0, pad),
                     constant_values=nrows - 1).reshape(n_chunks,
                                                        _COO_CHUNK)
    cols_c = jnp.pad(cols, (0, pad)).reshape(n_chunks, _COO_CHUNK)
    vals_c = jnp.pad(vals, (0, pad)).reshape(n_chunks, _COO_CHUNK)

    def body(acc, chunk):
        r, c, v = chunk
        contrib = jnp.take(x, c, axis=0) * v[:, None].astype(x.dtype)
        return acc + jax.ops.segment_sum(
            contrib, r, num_segments=nrows,
            indices_are_sorted=sorted_rows), None

    y0 = jnp.zeros((nrows, x.shape[1]), x.dtype)
    y, _ = jax.lax.scan(body, y0, (rows_c, cols_c, vals_c))
    return y


def _blocked_aggregate_jnp(block_cols, block_vals, x, bm, bk):
    """jnp fallback for the blocked format (used on CPU / for testing).

    y row-tile i = sum_b block_vals[i, b] @ x[block_cols[i, b]*bk : +bk].
    """
    n_rt, max_blk = block_cols.shape
    xt = x.reshape(-1, bk, x.shape[-1])  # [n_col_tiles, bk, F]
    gathered = jnp.take(xt, block_cols.reshape(-1), axis=0)
    gathered = gathered.reshape(n_rt, max_blk, bk, x.shape[-1])
    # [n_rt, max_blk, bm, bk] @ [n_rt, max_blk, bk, F] -> sum over (blk, bk)
    y = jnp.einsum("ibmk,ibkf->imf", block_vals.astype(x.dtype), gathered,
                   preferred_element_type=jnp.float32)
    return y.reshape(n_rt * bm, x.shape[-1]).astype(x.dtype)


def to_dense(adj) -> jnp.ndarray:
    """Materialize the padded adjacency densely (tests / small problems)."""
    from gnn_tpu.ops import hotdense as _hot
    if isinstance(adj, _hot.HotDenseAdj):
        assert adj.dense is not None, "bind_dense first"
        d = jnp.zeros((adj.nrows, adj.ncols), jnp.float32)
        d = d.at[adj.rows.astype(jnp.int32),
                 adj.cols.astype(jnp.int32)].add(
                     adj.vals.astype(jnp.float32))
        hot = adj.dense.astype(jnp.float32) * adj.nfh[None, :]
        return d.at[adj.rowpos[:, None], adj.colpos[None, :]].add(
            hot, mode="drop")
    if isinstance(adj, COOAdj):
        d = jnp.zeros((adj.nrows, adj.ncols), jnp.float32)
        return d.at[adj.rows.astype(jnp.int32),
                    adj.cols.astype(jnp.int32)].add(
                        adj.vals.astype(jnp.float32))
    n_rt = adj.block_cols.shape[0]
    n_tc = adj.ncols // adj.bk
    d = jnp.zeros((n_rt, n_tc, adj.bm, adj.bk), jnp.float32)
    rt = jnp.arange(n_rt)[:, None] + jnp.zeros_like(adj.block_cols)
    d = d.at[rt, adj.block_cols].add(adj.block_vals)
    return d.transpose(0, 2, 1, 3).reshape(adj.nrows, adj.ncols)


# ---------------------------------------------------------------------------
# Public op: spmm with custom VJP (reference: custom_sparse_ops.py:16-40)
# ---------------------------------------------------------------------------

_PALLAS_ENABLED = True


def set_pallas_enabled(flag: bool) -> None:
    """Globally enable/disable the Pallas kernel path (e.g. for CPU tests)."""
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(flag)


def _use_pallas() -> bool:
    if not _PALLAS_ENABLED:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _forward(adj, x):
    from gnn_tpu.ops import hotdense as _hot
    if isinstance(adj, _hot.HotDenseAdj):
        return _hot.hot_forward(adj, x)
    if isinstance(adj, COOAdj):
        return _coo_aggregate(adj.rows, adj.cols, adj.vals, x, adj.nrows,
                              sorted_rows=adj.rows_sorted)
    if isinstance(adj, BlockedAdj):
        if _use_pallas():
            from gnn_tpu.ops.pallas_spmm import blocked_spmm_pallas
            return blocked_spmm_pallas(adj.block_cols, adj.block_vals, x,
                                       adj.bm, adj.bk)
        return _blocked_aggregate_jnp(adj.block_cols, adj.block_vals, x,
                                      adj.bm, adj.bk)
    raise TypeError(f"unknown adjacency type {type(adj)}")


def _transpose_forward(adj, g):
    from gnn_tpu.ops import hotdense as _hot
    if isinstance(adj, _hot.HotDenseAdj):
        return _hot.hot_transpose(adj, g)
    if isinstance(adj, COOAdj):
        # A^T aggregation reuses the same COO with roles swapped.
        return _coo_aggregate(adj.cols, adj.rows, adj.vals, g, adj.ncols)
    if isinstance(adj, BlockedAdj):
        if _use_pallas():
            from gnn_tpu.ops.pallas_spmm import blocked_spmm_pallas
            return blocked_spmm_pallas(adj.block_cols_t, adj.block_vals_t, g,
                                       adj.bk, adj.bm)
        return _blocked_aggregate_jnp(adj.block_cols_t, adj.block_vals_t, g,
                                      adj.bk, adj.bm)
    raise TypeError(f"unknown adjacency type {type(adj)}")


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def spmm(adj, x):
    """``y = A @ x`` — sparse adjacency times dense features.

    Gradient flows to ``x`` only (``dx = A^T @ dy``); the adjacency gets no
    gradient, matching the reference autograd op
    (`custom_sparse_ops.py:31-37` returns ``None`` for the sparse operand).
    """
    return _forward(adj, x)


def _spmm_fwd(adj, x):
    return _forward(adj, x), adj


def _spmm_bwd(adj, g):
    dx = _transpose_forward(adj, g)

    def _zero(t):
        if jnp.issubdtype(t.dtype, jnp.integer):
            return np.zeros(t.shape, dtype=jax.dtypes.float0)
        return jnp.zeros_like(t)

    zero_adj = jax.tree_util.tree_map(_zero, adj)
    return zero_adj, dx


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_transpose(adj, g):
    """``A^T @ g`` exposed directly (no VJP) for tests and inference."""
    return _transpose_forward(adj, g)
