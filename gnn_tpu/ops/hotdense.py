"""Persistent hot-subgraph dense aggregation for LADIES minibatches.

The TPU-native answer to the minibatch SpMM problem, exploiting the same
heavy-hitter structure the reference paper exploits for feature placement
(`/root/reference/preprocess.py:343-347`: node access probability is
extremely skewed), applied to the *adjacency*:

* At LADIES minibatch densities (0.4–1%) random fine-grained sparsity
  gives block-sparse kernels nothing to skip — 128-wide tiles are 84–100%
  occupied — so a densified MXU matmul is the per-op speed of light
  (measured 93% of bf16 peak, benchmarks/RESULTS.md). But the dense
  operand can neither be shipped per step (~850 MB/layer) nor scattered
  on device (XLA scatter measured ~13 ns/edge).

* LADIES samples nodes by probability, so edges concentrate on the hot
  nodes: the top-K nodes by ``sample_prob`` cover ~70-85% of minibatch
  edges at K = 16K (measured on the canonical Reddit-scale config). So
  keep ``D = lap[H][:, H]`` — the dense adjacency among the K hottest
  nodes — **resident in HBM** (plus its transpose for the backward),
  refreshed never (it depends only on the graph), and decompose each
  sampled layer as::

      y  = D-part + cold-part
      D-part: xh[s] = x[colpos[s]] * nf[colpos[s]]     (gather to slots)
              yh_c  = D[present_row_slots] @ xh        (row-compacted MXU
                                                        matmul: only hot
                                                        rows present in
                                                        this batch)
              y[r] += yh_c[row_cmp_idx[r]]             (gather back)
      cold:   row-sorted COO segment-sum over the residual edges
              (sorted indices measured ~1.6x faster than unsorted
              scatter on v5e; the transpose direction ships its own
              col-sorted copy so the backward is sorted too)

  Only ~30-40%% of hot slots appear in a given batch, so row compaction
  cuts the matmul FLOPs ~3x below the naive [K, K] product. The
  per-batch LADIES edge weight ``lap_val(row, col) * normfact[col]``
  factorizes exactly as ``D[sr, sc] * nf[sc]`` because the row factor
  (1/deg_full, `cuda_spmm.cu:800`) lives in the laplacian data already.

* Backward is symmetric with roles swapped: ``dx[c] = nf_col[c] *
  (D^T[present_col_slots] @ gh)[col_cmp_idx[c]] + cold^T-part``.

The resident blocks are NOT leaves of the shipped batch: they are bound
into the adjacency pytree *inside* the jitted step (:func:`bind_dense`),
so ``device_put`` of a minibatch never touches them.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from gnn_tpu.ops import sparse as sparse_ops


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class HotSpec:
    """Host-side description of the hot node set.

    ``hot_nodes[s]`` = global id of hot slot ``s`` (descending
    ``sample_prob``); ``slot_of_node[v]`` = slot of node ``v`` or -1.
    ``k`` is the padded slot count (multiple of 128; tail slots map to no
    node and stay zero in ``D``).
    """

    hot_nodes: np.ndarray      # int64 [k_used]
    slot_of_node: np.ndarray   # int32 [N], -1 = cold
    k: int                     # padded slot count

    @staticmethod
    def from_sample_prob(sample_prob: np.ndarray, k: int) -> "HotSpec":
        k_used = min(k, len(sample_prob))
        hot = np.argsort(-sample_prob, kind="stable")[:k_used]
        slot = np.full(len(sample_prob), -1, np.int32)
        slot[hot] = np.arange(k_used, dtype=np.int32)
        return HotSpec(hot_nodes=hot.astype(np.int64), slot_of_node=slot,
                       k=_round_up(max(k_used, 1), 128))


def build_hot_dense(lap: sp.csr_matrix, spec: HotSpec,
                    dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Materialize the resident ``[k, k]`` dense block ``lap[H][:, H]``
    and its transpose (for the backward's compacted row gather).

    Computed once at setup (the laplacian never changes); 2 x ~512 MB
    bf16 at K = 16384 — well within a v5e's 16 GB HBM next to the model.
    """
    sub = lap[spec.hot_nodes, :][:, spec.hot_nodes].tocoo()
    return _densify(spec.k, sub.row, sub.col, sub.data, dtype)


def _densify(k, rows, cols, vals, dtype):
    d = np.zeros((k, k), dtype)
    d[rows, cols] = vals.astype(dtype)
    return d, np.ascontiguousarray(d.T)


def build_hot_dense_cached(lap: sp.csr_matrix, spec: HotSpec,
                           dtype=np.float32,
                           cache_path: Optional[str] = None
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """`build_hot_dense` with the expensive part — the CSR double slice
    ``lap[H][:, H]`` over the full edge set — cached on disk as COO
    (same convention as the reference's pickled placement cache,
    `preprocess.py:317,386-395`). Densify-on-load runs in seconds, so a
    warm cache cuts hot-path setup from minutes to seconds at Reddit
    scale. The cache validates the exact hot node set, so a changed
    graph/prob/K falls back to recompute."""
    import os

    if cache_path and os.path.exists(cache_path):
        try:
            z = np.load(cache_path)
            if np.array_equal(z["hot_nodes"], spec.hot_nodes):
                return _densify(spec.k, z["rows"], z["cols"], z["vals"],
                                dtype)
        except Exception as e:  # corrupt/partial cache: rebuild
            print(f"hot cache {cache_path} unusable ({e}); rebuilding",
                  flush=True)
    sub = lap[spec.hot_nodes, :][:, spec.hot_nodes].tocoo()
    if cache_path:
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:  # keep np.savez from appending .npz
            np.savez(f, hot_nodes=spec.hot_nodes,
                     rows=sub.row.astype(np.int32),
                     cols=sub.col.astype(np.int32),
                     vals=sub.data.astype(np.float32))
        os.replace(tmp, cache_path)
    return _densify(spec.k, sub.row, sub.col, sub.data, dtype)


@struct.dataclass
class HotDenseAdj:
    """One sampled layer split into resident-hot + shipped-cold parts.

    Local index spaces match :class:`~gnn_tpu.ops.sparse.COOAdj`: rows
    index the layer's output set (``prev``), cols its input set
    (``after``). ``dense``/``dense_t`` are ``None`` on the host and
    bound to the resident blocks inside the jitted step
    (:func:`bind_dense`).
    """

    # cold residual, row-sorted (fwd) and col-sorted (bwd) copies —
    # sorted segment ids are measurably faster than scatter on TPU
    rows: jnp.ndarray          # int16/int32 [nnz_pad] (sorted)
    cols: jnp.ndarray          # int16/int32 [nnz_pad]
    vals: jnp.ndarray          # bf16/f32 [nnz_pad]
    rows_t: jnp.ndarray        # int16/int32 [nnz_pad]
    cols_t: jnp.ndarray        # int16/int32 [nnz_pad] (sorted)
    vals_t: jnp.ndarray        # bf16/f32 [nnz_pad]
    # hot-slot plumbing
    colpos: jnp.ndarray        # int32 [k]; local col of slot, ncols if absent
    nfh: jnp.ndarray           # f32 [k]; normfact at that col (0 if absent)
    rowpos: jnp.ndarray        # int32 [k]; local row of slot, nrows if absent
    nf_col: jnp.ndarray        # f32 [ncols]; normfact where col is hot else 0
    # batch-present compaction (only hot slots actually sampled)
    present_row_slots: jnp.ndarray  # int32 [rh_pad]
    row_cmp_idx: jnp.ndarray        # int32 [nrows]; OOB sentinel = absent
    present_col_slots: jnp.ndarray  # int32 [ch_pad]
    col_cmp_idx: jnp.ndarray        # int32 [ncols]; OOB sentinel = absent
    n_valid_rows: jnp.ndarray  # int32 scalar
    n_valid_cols: jnp.ndarray  # int32 scalar
    dense: Optional[jnp.ndarray]    # [k, k] resident block (bound)
    dense_t: Optional[jnp.ndarray]  # [k, k] resident transpose (bound)
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)
    k: int = struct.field(pytree_node=False)
    # False when rows_t/cols_t/vals_t are just the forward arrays (no
    # col-sorted copy was built — resident-lite mode skips it: at cold
    # residuals of ~1e5 edges the unsorted-scatter penalty (~1.6x of a
    # ~2 ms op) is far cheaper than a device sort or shipping a
    # second copy)
    t_sorted: bool = struct.field(pytree_node=False, default=True)
    # mesh axis name when the resident blocks are SHARDED over a model-
    # parallel axis (gnn_tpu.parallel.shardedresident): dense/dense_t
    # are then the local [k, k/P] slot-COLUMN shards and the hot matmul
    # computes a 1/P partial summed with one psum over this axis. None
    # (default) = replicated full blocks.
    part_axis: Optional[str] = struct.field(pytree_node=False,
                                            default=None)
    # True when rows/cols/vals hold only THIS part's cold edges (sharded
    # full-expansion mode: each part expands the CSR rows it owns) — the
    # cold aggregation output is then psum-med over ``part_axis``. False
    # (default) = the cold COO is replicated across parts.
    cold_partial: bool = struct.field(pytree_node=False, default=False)
    # edge-stream tile payload for the cold residual (val-free resident
    # mode, gnn_tpu.ops.pallas_edgestream): when ``es_rc`` is not None
    # the cold aggregation runs through the tile-densify Pallas kernel
    # instead of the segment-sum — the packed coords replace
    # rows/cols/vals entirely (those ship as zero-length arrays).
    # Measured on-chip at canonical shapes: 1.5x fwd / 3.4x bwd.
    # GAT consumes the same tiles through the SDDMM-direction attention
    # kernels (gnn_tpu.ops.pallas_esattn).
    es_coords: Optional[jnp.ndarray] = None  # int16 [n_cr, EC=256]
    es_rc: Optional[jnp.ndarray] = None      # int32 [nb]
    es_off: Optional[jnp.ndarray] = None     # int32 [2, nb+1]
    es_ord: Optional[jnp.ndarray] = None     # int32 [nb]
    es_vals: Optional[jnp.ndarray] = None    # bf16/f32 [n_cr, EC=256]
    es_rv: Optional[jnp.ndarray] = None      # f32 [nrows] row factors
    es_nf: Optional[jnp.ndarray] = None      # f32 [ncols] col factors
    es_bm: int = struct.field(pytree_node=False, default=128)
    es_bk: int = struct.field(pytree_node=False, default=0)

    @property
    def shape(self):
        return (self.nrows, self.ncols)


def _pad_sorted_coo(r, c, v, nnz_pad, pad_row, ridx, cidx, vdt):
    rr = np.full(nnz_pad, pad_row, ridx)
    cc = np.zeros(nnz_pad, cidx)
    vv = np.zeros(nnz_pad, vdt)
    rr[: len(r)] = r
    cc[: len(c)] = c
    vv[: len(v)] = v
    return rr, cc, vv


def pack_hotdense(
    spec: HotSpec,
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    prev: np.ndarray,
    after: np.ndarray,
    normfact: np.ndarray,
    n_valid_rows: int,
    n_valid_cols: int,
    nrows_pad: int,
    ncols_pad: int,
    nnz_pad: Optional[int] = None,
    compress: bool = True,
) -> HotDenseAdj:
    """Split a sampled layer's COO into hot-block metadata + cold COO.

    ``rows``/``cols`` are local indices into ``prev``/``after``; ``vals``
    already carry ``lap_val * normfact[col]`` (the full edge weight).
    """
    from gnn_tpu.sampling.ladies import bucket_size

    prev_slots = spec.slot_of_node[prev]            # [n_rows], -1 cold
    after_slots = spec.slot_of_node[after]          # [n_cols]

    colpos = np.full(spec.k, ncols_pad, np.int32)
    nfh = np.zeros(spec.k, np.float32)
    hot_c = np.flatnonzero(after_slots >= 0)
    colpos[after_slots[hot_c]] = hot_c
    nfh[after_slots[hot_c]] = normfact[hot_c]
    nf_col = np.zeros(ncols_pad, np.float32)
    nf_col[hot_c] = normfact[hot_c]

    rowpos = np.full(spec.k, nrows_pad, np.int32)
    hot_r = np.flatnonzero(prev_slots >= 0)
    rowpos[prev_slots[hot_r]] = hot_r

    # batch-present compaction maps (hot_r/hot_c are ascending local
    # ids). The absent-sentinel is a fixed far-out-of-bounds constant —
    # NOT the pad length — so stacking/re-bucketing across replicas
    # can widen the present arrays without invalidating the maps
    # (jnp.take mode='fill' drops any OOB index).
    sentinel = np.int32(1 << 30)
    rh_pad = bucket_size(max(len(hot_r), 1), 128)
    present_row_slots = np.zeros(rh_pad, np.int32)
    present_row_slots[: len(hot_r)] = prev_slots[hot_r]
    row_cmp_idx = np.full(nrows_pad, sentinel, np.int32)
    row_cmp_idx[hot_r] = np.arange(len(hot_r), dtype=np.int32)
    ch_pad = bucket_size(max(len(hot_c), 1), 128)
    present_col_slots = np.zeros(ch_pad, np.int32)
    present_col_slots[: len(hot_c)] = after_slots[hot_c]
    col_cmp_idx = np.full(ncols_pad, sentinel, np.int32)
    col_cmp_idx[hot_c] = np.arange(len(hot_c), dtype=np.int32)

    # The sampler emits CSR-ordered (row-sorted) edges and subsetting
    # preserves order, so the cold extraction never sorts rows; the
    # col-sorted transpose copy is a counting sort. The native core does
    # both in one OpenMP pass (`sampler_core.cpp::hot_split`); the numpy
    # fallback uses byte-wide hotness lookups + scipy's COO->CSC
    # conversion (also a C counting sort).
    hot_r_flag = prev_slots >= 0
    hot_c_flag = after_slots >= 0
    lib = None
    if np.asarray(vals).dtype == np.float32:
        from gnn_tpu import native as _native
        lib = _native.get_lib()
    if lib is not None:
        from gnn_tpu.native import hot_split_native
        cr, cc, cv, cr_s, cc_s, cv_s = hot_split_native(
            lib, rows, cols, vals, hot_r_flag, hot_c_flag, ncols_pad)
    else:
        hot_edge = hot_r_flag[rows] & hot_c_flag[cols]
        cold = np.flatnonzero(~hot_edge)
        cr, cc, cv = rows[cold], cols[cold], vals[cold]
        if len(cr):
            csc = sp.csc_matrix(
                (cv, (cr.astype(np.int64), cc.astype(np.int64))),
                shape=(nrows_pad, ncols_pad))
            cc_s = np.repeat(np.arange(ncols_pad, dtype=np.int64),
                             np.diff(csc.indptr))
            cr_s, cv_s = csc.indices, csc.data
        else:
            cc_s = cr_s = cv_s = np.zeros(0, np.int64)
    assert len(cr) == 0 or np.all(np.diff(cr) >= 0), \
        "pack_hotdense expects row-sorted input edges"
    if nnz_pad is None:
        nnz_pad = bucket_size(max(len(cr), 1))
    ridx = np.int16 if (compress and nrows_pad <= 32768) else np.int32
    cidx = np.int16 if (compress and ncols_pad <= 32768) else np.int32
    vdt = jnp.bfloat16 if compress else np.float32
    rr, ccol, vv = _pad_sorted_coo(cr, cc, cv, nnz_pad,
                                   nrows_pad - 1, ridx, cidx, vdt)
    # pad the transpose copy's segment ids (cols) at the top end too
    ct, rt, vt = _pad_sorted_coo(cc_s, cr_s, cv_s, nnz_pad,
                                 ncols_pad - 1, cidx, ridx, vdt)

    return HotDenseAdj(
        rows=rr, cols=ccol, vals=vv,
        rows_t=rt, cols_t=ct, vals_t=vt,
        colpos=colpos, nfh=nfh, rowpos=rowpos, nf_col=nf_col,
        present_row_slots=present_row_slots, row_cmp_idx=row_cmp_idx,
        present_col_slots=present_col_slots, col_cmp_idx=col_cmp_idx,
        n_valid_rows=np.int32(n_valid_rows),
        n_valid_cols=np.int32(n_valid_cols),
        dense=None, dense_t=None,
        nrows=int(nrows_pad), ncols=int(ncols_pad), k=spec.k)


def bind_dense(adjs: List[object], dense, dense_t) -> List[object]:
    """Bind the resident blocks into every hot layer of a batch's adj list
    (called *inside* the jitted step so the blocks never ship)."""
    out = []
    for a in adjs:
        if isinstance(a, HotDenseAdj):
            out.append(dataclasses.replace(a, dense=dense,
                                           dense_t=dense_t))
        else:
            out.append(a)
    return out


def hot_block_forward(adj: HotDenseAdj, dense, x: jnp.ndarray
                      ) -> jnp.ndarray:
    """The resident-block half of ``A @ x`` (no cold residual): gather
    cols to slot space, row-compacted MXU matmul, gather back through
    the compaction map. ``dense`` is passed explicitly so callers that
    compose their own cold path (edge-stream kernel, bench candidates)
    need no bound adj."""
    if adj.part_axis is not None:
        # sharded blocks (1/P of the slot columns each): every part
        # contributes D[:, lo:hi][prs] @ xh[lo:hi] and ONE psum over
        # the part axis restores the full row-compacted product —
        # flops, block HBM and the xh gather all shrink by P, the
        # cold residual is computed replicated (it is ~2 ms) and
        # added once outside the psum
        ksh = dense.shape[1]
        lo = jax.lax.axis_index(adj.part_axis) * ksh
        colpos = jax.lax.dynamic_slice(adj.colpos, (lo,), (ksh,))
        nfh = jax.lax.dynamic_slice(adj.nfh, (lo,), (ksh,))
    else:
        colpos, nfh = adj.colpos, adj.nfh
    xh = jnp.take(x, colpos, axis=0, mode="fill", fill_value=0)
    xh = xh * nfh[:, None].astype(x.dtype)
    d_rows = jnp.take(dense, adj.present_row_slots, axis=0)
    yh_c = jnp.dot(d_rows, xh.astype(dense.dtype),
                   preferred_element_type=jnp.float32)
    if adj.part_axis is not None:
        yh_c = jax.lax.psum(yh_c, adj.part_axis)
    return jnp.take(yh_c, adj.row_cmp_idx, axis=0, mode="fill",
                    fill_value=0).astype(x.dtype)


def hot_block_transpose(adj: HotDenseAdj, dense_t, g: jnp.ndarray
                        ) -> jnp.ndarray:
    """The resident-block half of ``A^T @ g`` (no cold residual),
    symmetric to :func:`hot_block_forward` with roles swapped."""
    if adj.part_axis is not None:
        # symmetric to the forward: part p holds D^T[:, lo:hi]
        # (= D[lo:hi, :]^T), gathers only its slot range of g, and the
        # psum restores the full compacted transpose product
        ksh = dense_t.shape[1]
        lo = jax.lax.axis_index(adj.part_axis) * ksh
        rowpos = jax.lax.dynamic_slice(adj.rowpos, (lo,), (ksh,))
    else:
        rowpos = adj.rowpos
    gh = jnp.take(g, rowpos, axis=0, mode="fill", fill_value=0)
    dt_rows = jnp.take(dense_t, adj.present_col_slots, axis=0)
    dh_c = jnp.dot(dt_rows, gh.astype(dense_t.dtype),
                   preferred_element_type=jnp.float32)
    if adj.part_axis is not None:
        dh_c = jax.lax.psum(dh_c, adj.part_axis)
    dx_hot = jnp.take(dh_c, adj.col_cmp_idx, axis=0, mode="fill",
                      fill_value=0)
    return (dx_hot * adj.nf_col[:, None]).astype(g.dtype)


def _cold_edge_stream(adj: HotDenseAdj, u: jnp.ndarray,
                      transpose: bool) -> jnp.ndarray:
    """Cold residual via the edge-stream tile-densify kernel (one packed
    coord buffer serves both directions). Interpreter mode off-TPU so
    the CPU test mesh runs the identical math. (The segment-grid kernel
    variant is quarantined to benchmarks/ — measured 1.04-1.09x at
    canonical shapes, not worth its tables; RESULTS.md.)"""
    from gnn_tpu.ops.pallas_edgestream import (ECAP, EdgeTiles,
                                               edge_stream_spmm)
    interp = jax.default_backend() != "tpu"
    tiles = EdgeTiles(coords=adj.es_coords, blk_rc=adj.es_rc,
                      off=adj.es_off, t_order=adj.es_ord,
                      nrows=adj.nrows, ncols=adj.ncols,
                      bm=adj.es_bm, bk=adj.es_bk, ecap=ECAP,
                      vals=adj.es_vals)
    return edge_stream_spmm(tiles, u, adj.es_rv, adj.es_nf,
                            transpose=transpose, interpret=interp)


def hot_forward(adj: HotDenseAdj, x: jnp.ndarray) -> jnp.ndarray:
    """``y = A @ x`` with A = resident hot block + cold residual."""
    assert adj.dense is not None, (
        "HotDenseAdj.dense unbound — wrap the adj list with bind_dense() "
        "inside the jitted step")
    if adj.es_rc is not None:
        y = _cold_edge_stream(adj, x, transpose=False)
    else:
        # cold residual (row-sorted segment-sum)
        y = sparse_ops._coo_aggregate(adj.rows, adj.cols, adj.vals, x,
                                      adj.nrows, sorted_rows=True)
    if adj.cold_partial:
        # sharded full expansion: each part aggregated only its owned
        # rows' cold edges — sum the partials (exact: one owner/edge)
        y = jax.lax.psum(y, adj.part_axis)
    return y + hot_block_forward(adj, adj.dense, x)


def hot_transpose(adj: HotDenseAdj, g: jnp.ndarray) -> jnp.ndarray:
    """``dx = A^T @ g`` — the VJP's backward aggregation (symmetric,
    using the resident transpose block and the col-sorted cold copy)."""
    assert adj.dense_t is not None
    if adj.es_rc is not None:
        dx = _cold_edge_stream(adj, g, transpose=True)
    else:
        dx = sparse_ops._coo_aggregate(adj.cols_t, adj.rows_t, adj.vals_t,
                                       g, adj.ncols,
                                       sorted_rows=adj.t_sorted)
    if adj.cold_partial:
        dx = jax.lax.psum(dx, adj.part_axis)
    return dx + hot_block_transpose(adj, adj.dense_t, g)
