"""Resident-graph minibatching: ship node IDs, not edges.

The transport study (benchmarks/RESULTS.md) showed this environment's
host->device wire sustains ~9 MiB/s per stream (~20 MiB/s with parallel
chunk streams) while the device executes a full train step in ~66 ms —
shipping the sampled subgraph's edges (~10.5 MiB/step) is the wall.

But the graph is STATIC. So the hot-slot table and (optionally) the
whole normalized CSR live in HBM (Reddit scale: ~94 MB int32 cols +
~47 MB bf16 values — noise next to the 4 GB hot blocks), and per step
only what changes ships. Two modes:

* **lite** (default): node sets (already in the batch), each layer's
  LADIES debias vector ``normfact`` (~100 KB f32), and the row-sorted
  FORWARD cold COO (int16+bf16, the ~30% of edges outside the hot
  block). The device derives the transpose copy and every k-sized
  hot-plumbing array (colpos/nfh/rowpos/present/cmp maps) from the
  resident slot table. Payload: 10.5 MiB/step (hot format) -> ~2 MiB.
* **full expansion** (``resident_ship_cold=False``): nothing per-edge
  ships; the cold COO too is rebuilt from the resident CSR by
  vectorized span expansion + filter + compaction. Zero per-edge
  payload, but at average degree ~100 the spans yield ~30x more
  candidates than survive the sampled-column filter, and TPU gathers
  cost 20-40 ns/element — measured 4x slower end-to-end than lite.
  Kept for low-degree graphs.

This replaces the reference's device-side adjacency build
(`cuda_spmm.cu:787-803` rebuilds the sampled CSR on the GPU from
shipped indices) with a form where at most the small cold residual
crosses the wire.

Numerics are IDENTICAL to the host `pack_hotdense` path: the expansion
enumerates each row's CSR span in order (row-major, ascending column),
exactly the edge order `_slice_cols_to_coo` emits, and the same
``lap_val * normfact[col]`` weights are applied.

Scale limits: the resident state is O(N + E) HBM — slot table 4N B,
CSR ~(4+2)E B bf16. Reddit-class graphs (N~2e5, E~1e8) are noise; at
MAG240M scale (N=244M, E=1.7B) the CSR alone is ~10 GB, so use
``adj_format='hot'`` (shipped edges, resident dense block only) or
shard the CSR over the mesh (round-3 work) there.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from gnn_tpu.ops.hotdense import HotDenseAdj, HotSpec


@struct.dataclass
class ResidentGraph:
    """Device-resident graph state (replicated once at setup; never
    ships per step). Rides in the trainer's ``agg_state``."""

    row_ptr: jnp.ndarray       # int32 [n + 1]
    col_idx: jnp.ndarray       # int32 [e]
    val: jnp.ndarray           # f32/bf16 [e] (laplacian data)
    slot_of_node: jnp.ndarray  # int32 [n], hot slot or -1
    # rank-1 value factorization ``lap[r, c] = row_val[r] * col_val[c]``
    # on the support — lets the device recompute cold edge weights as
    # ``row_val[r] * col_val[c] * normfact[c]`` so no per-edge values
    # ever ship. Row-normalized binary laplacians: row_val = 1/deg,
    # col_val = 1 (``col_trivial``); sym-normalized binary:
    # row_val = 1/sqrt(deg_r), col_val = 1/sqrt(deg_c).
    row_val: jnp.ndarray       # f32 [n] (zeros when not rank-1)
    col_val: jnp.ndarray       # f32 [n]
    dense: jnp.ndarray         # [k, k] hot block
    dense_t: jnp.ndarray       # [k, k] hot block transpose
    n: int = struct.field(pytree_node=False)
    k: int = struct.field(pytree_node=False)
    # True when col_val == 1 everywhere (row-normalized laplacians):
    # the rebuild then skips the column-factor lookup entirely
    col_trivial: bool = struct.field(pytree_node=False, default=True)

    # `materialize_layer` reads per-node resident state only through
    # these lookups (and `part_axis`), so a mesh-sharded resident
    # graph (gnn_tpu.parallel.shardedresident.ShardedResidentGraph) can
    # swap in psum-gather implementations without touching the rebuild.
    part_axis = None           # replicated: no model-parallel axis

    def slot_lookup(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Hot slot of each global node id (-1 = cold / out of range)."""
        return jnp.take(self.slot_of_node, ids, mode="fill",
                        fill_value=-1)

    def rowval_lookup(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Rank-1 row factor of each global node id."""
        return jnp.take(self.row_val, ids, mode="clip")

    def colval_lookup(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Rank-1 column factor of each global node id."""
        return jnp.take(self.col_val, ids, mode="clip")


def row_constant_values(lap: sp.csr_matrix):
    """``(row_val f32[N], True)`` when every row of ``lap`` holds one
    constant value on its support (row-normalized binary adjacency:
    1/deg), else ``(zeros, False)``."""
    lap = lap.tocsr()
    n = lap.shape[0]
    rv = np.zeros(n, np.float32)
    lens = np.diff(lap.indptr)
    nz = lens > 0
    first = np.zeros(n, np.float32)
    first[nz] = lap.data[lap.indptr[:-1][nz]]
    # constant iff every value equals its row's first value
    expanded = np.repeat(first, lens)
    if not np.array_equal(expanded, lap.data.astype(np.float32)):
        return rv, False
    rv[nz] = first[nz]
    return rv, True


def rank1_values(lap: sp.csr_matrix):
    """Rank-1 factorization of a laplacian's values over its support:
    ``(row_val f32[N], col_val f32[N], col_trivial, ok)`` with
    ``lap[r, c] == row_val[r] * col_val[c]`` exactly (f32). Covers the
    two normalizations in use: row-normalized binary adjacencies
    (row-constant, col_val = 1 — the reference's only normalization,
    `utils.py:56-64`) and sym-normalized binary adjacencies
    (D_r^-1/2 A D_c^-1/2: both factors are support-degree powers,
    closed-form checkable in O(E))."""
    lap = lap.tocsr()
    n, m = lap.shape
    rv, const = row_constant_values(lap)
    if const:
        return rv, np.ones(m, np.float32), True, True
    # sym form: factors from the SUPPORT degrees
    deg_r = np.diff(lap.indptr).astype(np.float64)
    deg_c = np.bincount(lap.indices, minlength=m).astype(np.float64)
    with np.errstate(divide="ignore"):
        rf = np.where(deg_r > 0, 1.0 / np.sqrt(deg_r), 0.0)
    cf = np.where(deg_c > 0, 1.0 / np.sqrt(deg_c), 0.0)
    row_of = np.repeat(np.arange(n), np.diff(lap.indptr))
    # compare in f64 with a tight tolerance: sym_normalize rounds its
    # f64 product to f32 ONCE, so an f32xf32 reconstruction differs in
    # the last bit; the device recomputation (f32 factors) stays within
    # float tolerance of the shipped-value path either way
    recon = rf[row_of] * cf[lap.indices]
    if np.allclose(recon, lap.data.astype(np.float64), rtol=1e-6,
                   atol=0.0):
        return rf.astype(np.float32), cf.astype(np.float32), False, True
    return np.zeros(n, np.float32), np.ones(m, np.float32), True, False


def build_resident_graph(lap: sp.csr_matrix, spec: HotSpec, dense,
                         dense_t, val_dtype=np.float32):
    """Host-side numpy pieces of :class:`ResidentGraph` (device_put by
    the trainer). ``dense``/``dense_t`` come from ``build_hot_dense``.
    The returned dict carries ``val_free`` (host-only flag, popped by
    the trainer): True when cold edge weights are device-derivable
    (rank-1 value factorization — row- OR sym-normalized binary
    adjacencies)."""
    lap = lap.tocsr()
    lap.sort_indices()
    rv, cv, col_trivial, ok = rank1_values(lap)
    return dict(
        row_ptr=lap.indptr.astype(np.int32),
        col_idx=lap.indices.astype(np.int32),
        val=lap.data.astype(val_dtype),
        slot_of_node=spec.slot_of_node.astype(np.int32),
        row_val=rv, col_val=cv,
        dense=dense, dense_t=dense_t,
        n=int(lap.shape[0]), k=int(spec.k),
        col_trivial=col_trivial, val_free=ok)


@struct.dataclass
class ResidentLayerRef:
    """The per-layer minibatch payload in resident mode: everything the
    device needs to rebuild the layer's HotDenseAdj except the node
    sets themselves (those already ship as input_nodes/sampled_nodes).

    Static bucket sizes (host-counted, bucketed) fix all device shapes;
    a new bucket combination recompiles exactly like a new nnz bucket
    does in the shipped-edge formats.
    """

    normfact: jnp.ndarray      # f32 [ncols]
    n_valid_rows: jnp.ndarray  # int32 scalar
    n_valid_cols: jnp.ndarray  # int32 scalar
    # "lite" mode (default): the host ships the row-sorted FORWARD cold
    # COO (int16 + bf16, ~6 bytes/edge — cold edges are ~10-30% of the
    # layer). The device derives the transpose copy (stable argsort)
    # and all k-sized hot plumbing, which the hot format used to ship.
    # None in full-expansion mode, where even the cold edges are
    # rebuilt from the resident CSR (measured gather-bound: the row
    # spans yield ~30x more candidates than survive the sampled-column
    # filter — see benchmarks/RESULTS.md).
    rows: Optional[jnp.ndarray] = None   # int16/int32 [nnz_cold]
    cols: Optional[jnp.ndarray] = None   # int16/int32 [nnz_cold]
    vals: Optional[jnp.ndarray] = None   # bf16/f32 [nnz_cold]; None when
    #                                      the trainer's ResidentGraph
    #                                      carries row_val (val-free)
    row_cnt: Optional[jnp.ndarray] = None  # int32 [nrows]: cold edges
    #                                        per row (replaces `rows` —
    #                                        the device re-expands the
    #                                        row-sorted ids from counts)
    n_cold: Optional[jnp.ndarray] = None  # int32 scalar
    # edge-stream tile payload (val-free lite mode with
    # ``stream_tiles``): REPLACES cols/row_cnt — the cold residual ships
    # as tile-grouped packed int16 coords + entry tables and aggregates
    # through the Pallas tile-densify kernel
    # (gnn_tpu.ops.pallas_edgestream) instead of the segment-sum
    es_coords: Optional[jnp.ndarray] = None  # int16 [n_cr, EC=256]
    es_rc: Optional[jnp.ndarray] = None      # int32 [nb]
    es_off: Optional[jnp.ndarray] = None     # int32 [2, nb+1]
    es_ord: Optional[jnp.ndarray] = None     # int32 [nb]
    # per-edge values in tile order (weighted / non-rank-1 graphs:
    # the full lap_val * normfact weight ships; None when val-free)
    es_vals: Optional[jnp.ndarray] = None    # bf16/f32 [n_cr, EC=256]
    # NOTE: the SEGMENT-grid variant of the stream kernel (one grid step
    # per row-tile segment) measured only 1.04-1.09x over the per-entry
    # kernel at canonical shapes (benchmarks/RESULTS.md — the cold cost
    # is the occupied-tile AREA's dense MXU cost, invariant under grid
    # reshaping), so it is quarantined to benchmarks/: the kernel lives
    # on in gnn_tpu.ops.pallas_edgestream (edge_stream_spmm_seg +
    # segment_tiles, kernel-tested) but ships no production tables.
    nrows: int = struct.field(pytree_node=False, default=0)
    ncols: int = struct.field(pytree_node=False, default=0)
    e_cap: int = struct.field(pytree_node=False, default=0)
    nnz_cold: int = struct.field(pytree_node=False, default=0)
    rh_pad: int = struct.field(pytree_node=False, default=0)
    ch_pad: int = struct.field(pytree_node=False, default=0)
    es_bm: int = struct.field(pytree_node=False, default=128)
    es_bk: int = struct.field(pytree_node=False, default=0)

    @property
    def shape(self):
        return (self.nrows, self.ncols)



def pack_resident_ref(spec: HotSpec, lap_indptr, prev, after, normfact,
                      rows, cols, n_rows, n_cols, r_cap, c_cap,
                      vals=None, ship_cold: bool = True,
                      compress: bool = True,
                      cold_precomputed: bool = False,
                      val_free: bool = False,
                      stream_tiles: bool = False,
                      tiles_pre=None) -> ResidentLayerRef:
    """Host-side companion of the device rebuild.

    ``ship_cold=True`` (default, "lite"): ship the row-sorted forward
    cold COO (the only per-edge payload; ~6 bytes/edge compressed) and
    let the device derive the transpose copy and hot plumbing.
    ``ship_cold=False`` ("full expansion"): ship nothing per-edge; the
    device rebuilds the cold COO from the resident CSR (gather-bound —
    kept for low-degree graphs and as the zero-payload reference).
    """
    from gnn_tpu.sampling.ladies import bucket_size

    hot_r_flag = spec.slot_of_node[np.asarray(prev)] >= 0
    hot_c_flag = spec.slot_of_node[np.asarray(after)] >= 0
    if cold_precomputed:
        # the native slice already emitted cold-only edges
        cr, cc, cv = rows, cols, vals
        n_cold = len(rows)
    elif len(rows):
        cold = ~(hot_r_flag[rows] & hot_c_flag[cols])
        n_cold = int(np.count_nonzero(cold))
        cr, cc, cv = rows[cold], cols[cold], vals[cold]
    else:
        cr = cc = np.zeros(0, np.int32)
        cv = np.zeros(0, np.float32)
        n_cold = 0
    nf = np.zeros(c_cap, np.float32)
    nf[: len(normfact)] = normfact
    kw = {}
    if ship_cold and stream_tiles:
        # tile-grouped packed coords for the edge-stream cold kernel:
        # same 2 bytes/edge as the int16 cols it replaces, plus ~16
        # bytes/occupied-tile of entry tables — and the backward comes
        # free (the transpose visit order reuses the same buffer).
        # Val-free (rank-1) graphs ship ONLY coords; weighted graphs
        # additionally ship the full per-edge weights in tile order.
        from gnn_tpu.ops.pallas_edgestream import (EC, ECAP,
                                                   _build_tiles,
                                                   pack_edge_tiles,
                                                   repad_tiles,
                                                   tile_dims)
        es_bm, es_bk = tile_dims(r_cap, c_cap)
        if tiles_pre is not None:
            # the native cold slice already emitted tile-grouped coords
            # (one scan, no COO — val-free only) — only the O(n_tiles)
            # entry tables remain to build
            coords_s, tile_cnt, pre_bm, pre_bk = tiles_pre
            assert val_free
            assert (pre_bm, pre_bk) == (es_bm, es_bk)
            n_cold = len(coords_s)
            e_pad = bucket_size(max(n_cold, 1))
            occ = np.flatnonzero(tile_cnt)
            t = _build_tiles(coords_s, occ.astype(np.int64),
                             tile_cnt[occ].astype(np.int64), r_cap,
                             c_cap, es_bm, es_bk, ECAP, r_cap // es_bm,
                             c_cap // es_bk, None, e_pad)
        else:
            e_pad = bucket_size(max(n_cold, 1))
            assert e_pad % EC == 0, e_pad
            t = pack_edge_tiles(
                np.asarray(cr, np.int32), np.asarray(cc, np.int32),
                r_cap, c_cap, bm=es_bm, bk=es_bk, ecap=ECAP,
                e_pad=e_pad,
                vals=None if val_free else np.asarray(cv, np.float32),
                val_dtype=jnp.bfloat16 if compress else np.float32)
        nb_pad = bucket_size(t.blk_rc.shape[0], 512)
        c2, rc2, off2, ord2, v2 = repad_tiles(
            np.asarray(t.coords), np.asarray(t.blk_rc),
            np.asarray(t.off), np.asarray(t.t_order), nb_pad,
            t.coords.shape[0], r_cap // es_bm, c_cap // es_bk,
            vals=None if t.vals is None else np.asarray(t.vals))
        return ResidentLayerRef(
            normfact=nf,
            n_valid_rows=np.int32(n_rows), n_valid_cols=np.int32(n_cols),
            nrows=int(r_cap), ncols=int(c_cap),
            e_cap=0, nnz_cold=e_pad,
            rh_pad=bucket_size(max(int(hot_r_flag.sum()), 1), 128),
            ch_pad=bucket_size(max(int(hot_c_flag.sum()), 1), 128),
            es_coords=c2, es_rc=rc2, es_off=off2, es_ord=ord2,
            es_vals=v2, es_bm=es_bm, es_bk=es_bk)
    if ship_cold:
        nnz_pad = bucket_size(max(n_cold, 1))
        cidx = np.int16 if (compress and c_cap <= 32768) else np.int32
        ccol = np.zeros(nnz_pad, cidx)
        ccol[: n_cold] = cc
        # rows ship as per-row COUNTS (the COO is row-sorted): [nrows]
        # int32 instead of [nnz] indices; the device re-expands
        if n_cold:
            row_cnt = np.bincount(cr, minlength=r_cap).astype(np.int32)
        else:
            row_cnt = np.zeros(r_cap, np.int32)
        # 0-d ndarray (not np scalar) so the generic stack/expand paths
        # in stack_minibatches treat it as an array leaf
        kw = dict(cols=ccol, row_cnt=row_cnt,
                  n_cold=np.asarray(n_cold, np.int32))
        if not val_free:
            vdt = jnp.bfloat16 if compress else np.float32
            vv = np.zeros(nnz_pad, vdt)
            vv[: n_cold] = cv.astype(vdt) if n_cold else cv
            kw["vals"] = vv
        e_cap = 0
    else:
        deg_sum = int(np.sum(lap_indptr[np.asarray(prev) + 1]
                             - lap_indptr[np.asarray(prev)]))
        e_cap = bucket_size(max(deg_sum, 1))
        nnz_pad = bucket_size(max(n_cold, 1))
    return ResidentLayerRef(
        normfact=nf,
        n_valid_rows=np.int32(n_rows), n_valid_cols=np.int32(n_cols),
        nrows=int(r_cap), ncols=int(c_cap),
        e_cap=e_cap, nnz_cold=nnz_pad,
        rh_pad=bucket_size(max(int(hot_r_flag.sum()), 1), 128),
        ch_pad=bucket_size(max(int(hot_c_flag.sum()), 1), 128), **kw)


def materialize_layer(g: ResidentGraph, ref: ResidentLayerRef,
                      row_ids: jnp.ndarray, col_ids: jnp.ndarray
                      ) -> HotDenseAdj:
    """Rebuild one layer's :class:`HotDenseAdj` on device.

    ``row_ids``/``col_ids``: GLOBAL node ids of the layer's output/input
    sets, padded to ``ref.nrows``/``ref.ncols`` (garbage past the valid
    counts). All shapes are static; everything is gathers, cumsums and
    (monotone-position) scatters over ``ref.e_cap`` edge slots.
    """
    nrows, ncols = ref.nrows, ref.ncols
    n = g.n
    valid_r = jnp.arange(nrows) < ref.n_valid_rows
    valid_c = jnp.arange(ncols) < ref.n_valid_cols
    rows_g = jnp.where(valid_r, row_ids, n)          # n -> deg 0 below
    cols_g = jnp.where(valid_c, col_ids, n)

    # effective per-local-column factor for rank-1 cold values:
    # normfact alone for row-normalized laplacians (col_val == 1), else
    # normfact * col_val[global col] (sym-normalized)
    def _nf_eff():
        if getattr(g, "col_trivial", True):
            return ref.normfact
        return ref.normfact * g.colval_lookup(cols_g)

    if ref.es_rc is not None:
        # edge-stream tile payload: no per-edge COO on device at all —
        # the cold aggregation runs the packed coords through the
        # Pallas tile-densify kernel. Val-free graphs recompute values
        # as rv[r] * nf_eff[c]; weighted graphs shipped the full
        # weights in tile order (es_vals), so the factors are ones.
        z_i = jnp.zeros(0, jnp.int32)
        z_f = jnp.zeros(0, jnp.float32)
        if ref.es_vals is not None:
            es_rv = jnp.ones(ref.nrows, jnp.float32)
            es_nf = jnp.ones(ref.ncols, jnp.float32)
        else:
            es_rv = g.rowval_lookup(rows_g)
            es_nf = _nf_eff()
        return _finish_layer(g, ref, rows_g, cols_g, z_i, z_i, z_f,
                             jnp.int32(0), es_rv=es_rv, es_nf=es_nf)

    if ref.cols is not None:
        # lite mode: only the forward cold cols (+ optionally values)
        # shipped; local row ids re-expand from per-row counts and, in
        # val-free mode, edge weights recompute as row_val * normfact
        cc = ref.cols.astype(jnp.int32)
        n_cold = ref.n_cold
        cold_valid = jnp.arange(ref.nnz_cold) < n_cold
        if ref.row_cnt is not None:
            cnt = ref.row_cnt
            starts = jnp.cumsum(cnt) - cnt
            seg = jnp.zeros(ref.nnz_cold + 1, jnp.int32).at[starts].add(
                1, mode="drop")
            rr = jnp.cumsum(seg[: ref.nnz_cold]) - 1
            rr = jnp.where(cold_valid,
                           jnp.clip(rr, 0, nrows - 1), nrows - 1)
        else:
            rr = ref.rows.astype(jnp.int32)
        if ref.vals is not None:
            vv = ref.vals.astype(jnp.float32)
        else:
            rowv = g.rowval_lookup(rows_g)
            vv = jnp.where(
                cold_valid,
                jnp.take(rowv, rr) * jnp.take(_nf_eff(), cc), 0.0)
        return _finish_layer(g, ref, rows_g, cols_g, rr, cc, vv, n_cold)

    # --- expand the rows' CSR spans into ref.e_cap edge slots ---
    cold_partial = False
    if g.part_axis is not None:
        # row-range-sharded CSR: this part expands ONLY the rows it
        # owns (others read degree 0), builds a PARTIAL cold COO, and
        # the cold aggregation output is psum-med over the part axis
        # (cold_partial below) — each edge is owned by exactly one
        # part, so the sum is exact.
        if getattr(g, "row_ptr_shard", None) is None:
            raise ValueError(
                "full-expansion resident mode on a part-sharded mesh "
                "needs the row-range CSR shards: build the state with "
                "ship_csr=True (shard_resident_state / "
                "build_sharded_resident)")
        rp_lo, deg = g.csr_spans(rows_g)
        col_src, val_src = g.col_idx_shard, g.val_shard
        cold_partial = True
    else:
        # rows_g == n is the pad row: row_ptr[n] == E and the clipped
        # row_ptr[n+1] read also lands on E, so its degree is 0
        rp_lo = jnp.take(g.row_ptr, rows_g, mode="clip")
        rp_hi = jnp.take(g.row_ptr, rows_g + 1, mode="clip")
        deg = rp_hi - rp_lo
        col_src, val_src = g.col_idx, g.val
    starts = jnp.cumsum(deg) - deg                    # exclusive cumsum
    e_used = starts[-1] + deg[-1]
    seg = jnp.zeros(ref.e_cap + 1, jnp.int32).at[starts].add(
        1, mode="drop")
    lr = jnp.cumsum(seg[: ref.e_cap]) - 1             # local row per edge
    lr = jnp.clip(lr, 0, nrows - 1)
    e_valid = jnp.arange(ref.e_cap) < e_used
    eptr = jnp.take(rp_lo, lr) + (jnp.arange(ref.e_cap)
                                  - jnp.take(starts, lr))
    gcol = jnp.take(col_src, eptr, mode="fill", fill_value=0)
    ev = jnp.take(val_src, eptr, mode="fill",
                  fill_value=0).astype(jnp.float32)

    # --- map global cols to layer-local ids (drop cols not sampled) ---
    tab = jnp.full(n + 1, -1, jnp.int32).at[cols_g].set(
        jnp.arange(ncols, dtype=jnp.int32), mode="drop")
    lc = jnp.take(tab, gcol)
    keep = e_valid & (lc >= 0)
    lc_safe = jnp.where(keep, lc, 0)
    w = ev * jnp.take(ref.normfact, lc_safe)

    # --- hot / cold split (hot-hot edges live in the resident block) ---
    r_slot = g.slot_lookup(rows_g)
    c_slot = g.slot_lookup(cols_g)
    r_hot = r_slot >= 0
    c_hot = c_slot >= 0
    edge_hot = jnp.take(r_hot, lr) & jnp.take(c_hot, lc_safe) & keep
    cold = keep & ~edge_hot

    # --- compact cold edges (positions are monotone -> sorted scatter);
    #     pad convention matches pack_hotdense: rows at nrows-1, val 0 ---
    pos = jnp.cumsum(cold.astype(jnp.int32)) - 1
    pos = jnp.where(cold, pos, ref.nnz_cold)          # drop non-cold
    n_cold = jnp.sum(cold.astype(jnp.int32))
    rr = jnp.full(ref.nnz_cold, nrows - 1, jnp.int32).at[pos].set(
        lr, mode="drop")
    cc = jnp.zeros(ref.nnz_cold, jnp.int32).at[pos].set(
        lc_safe, mode="drop")
    vv = jnp.zeros(ref.nnz_cold, jnp.float32).at[pos].set(w, mode="drop")
    return _finish_layer(g, ref, rows_g, cols_g, rr, cc, vv, n_cold,
                         cold_partial=cold_partial)


def _finish_layer(g: ResidentGraph, ref: ResidentLayerRef, rows_g,
                  cols_g, rr, cc, vv, n_cold,
                  es_rv=None, es_nf=None,
                  cold_partial: bool = False) -> HotDenseAdj:
    """Shared tail of the device rebuild: transpose copy + all hot-slot
    plumbing (the arrays the hot format used to ship per step)."""
    nrows, ncols = ref.nrows, ref.ncols

    # --- backward direction: NO col-sorted copy. The host path ships
    #     one because sorted segment-sum is ~1.6x faster than scatter,
    #     but at the cold residual's size (~1e5 edges) that saves ~1 ms
    #     while a device sort costs tens of ms and shipping a second
    #     copy doubles the per-edge payload; the transpose aggregation
    #     just runs the forward arrays through the scatter path
    #     (t_sorted=False below) ---
    ct, rt, vt = cc, rr, vv

    # --- hot-slot plumbing (colpos/nfh/rowpos/nf_col) ---
    k = g.k
    r_slot = g.slot_lookup(rows_g)
    c_slot = g.slot_lookup(cols_g)
    r_hot = r_slot >= 0
    c_hot = c_slot >= 0
    c_slot_safe = jnp.where(c_hot, c_slot, k)
    colpos = jnp.full(k, ncols, jnp.int32).at[c_slot_safe].set(
        jnp.arange(ncols, dtype=jnp.int32), mode="drop")
    nfh = jnp.zeros(k, jnp.float32).at[c_slot_safe].set(
        ref.normfact, mode="drop")
    r_slot_safe = jnp.where(r_hot, r_slot, k)
    rowpos = jnp.full(k, nrows, jnp.int32).at[r_slot_safe].set(
        jnp.arange(nrows, dtype=jnp.int32), mode="drop")
    nf_col = jnp.where(c_hot, ref.normfact, 0.0)

    # --- batch-present compaction (only hot slots actually sampled) ---
    sentinel = jnp.int32(1 << 30)
    rpos = jnp.cumsum(r_hot.astype(jnp.int32)) - 1
    row_cmp_idx = jnp.where(r_hot, rpos, sentinel)
    present_row_slots = jnp.zeros(ref.rh_pad, jnp.int32).at[
        jnp.where(r_hot, rpos, ref.rh_pad)].set(r_slot, mode="drop")
    cpos = jnp.cumsum(c_hot.astype(jnp.int32)) - 1
    col_cmp_idx = jnp.where(c_hot, cpos, sentinel)
    present_col_slots = jnp.zeros(ref.ch_pad, jnp.int32).at[
        jnp.where(c_hot, cpos, ref.ch_pad)].set(c_slot, mode="drop")

    es_kw = {}
    if es_rv is not None:
        es_kw = dict(es_coords=ref.es_coords, es_rc=ref.es_rc,
                     es_off=ref.es_off, es_ord=ref.es_ord,
                     es_vals=ref.es_vals, es_rv=es_rv,
                     es_nf=ref.normfact if es_nf is None else es_nf,
                     es_bm=ref.es_bm, es_bk=ref.es_bk)
    return HotDenseAdj(
        rows=rr, cols=cc, vals=vv, rows_t=rt, cols_t=ct, vals_t=vt,
        colpos=colpos, nfh=nfh, rowpos=rowpos, nf_col=nf_col,
        present_row_slots=present_row_slots, row_cmp_idx=row_cmp_idx,
        present_col_slots=present_col_slots, col_cmp_idx=col_cmp_idx,
        n_valid_rows=ref.n_valid_rows, n_valid_cols=ref.n_valid_cols,
        dense=g.dense, dense_t=g.dense_t,
        nrows=nrows, ncols=ncols, k=k, t_sorted=False,
        part_axis=g.part_axis, cold_partial=cold_partial, **es_kw)


def materialize_adjs(g: ResidentGraph, adjs, sampled_nodes,
                     input_nodes) -> List[Optional[HotDenseAdj]]:
    """Rebuild every resident layer of a batch inside the jitted step.

    Level sets chain upward from the global ``input_nodes``: layer l's
    rows are ``level_l[sampled_nodes[l]]`` (``sampled_nodes`` are local
    indices into the layer's column set, `sampler.py:141`)."""
    out = []
    level = input_nodes.astype(jnp.int32)
    for l, a in enumerate(adjs):
        if isinstance(a, ResidentLayerRef):
            row_ids = jnp.take(level, sampled_nodes[l], mode="clip")
            out.append(materialize_layer(g, a, row_ids, level))
            level = row_ids
        else:
            # order-0 layer (None): the node set is unchanged
            # (`sampler.py:107-111`), so `level` carries through
            out.append(a)
    return out
