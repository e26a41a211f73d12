"""Edge-stream SpMM: build each occupied adjacency tile ON THE MXU from
packed edge coordinates, then matmul it — no scatter, no shipped tiles.

The cold-residual aggregation of the resident hot-block path
(`gnn_tpu.ops.hotdense`) was gather/scatter-bound at 20-50 ns/edge in
every XLA formulation tried (benchmarks/RESULTS.md: sorted segment-sum,
ELL, densify-matmul all land there, because TPU has no gather hardware
— the reference's per-edge CUDA kernel `cuda_spmm.cu:163-212` has no
TPU analog). XLA's scatter-densify costs 27 ms for 2.1 M edges, which
killed on-device densification in round 1.

This kernel removes the per-edge work entirely. For one (row-tile,
col-tile) tile with edges e = (lr_e, lc_e):

    R[bm, E]  = (iota_r == lr_e) * rv[lr_e]      one VPU compare
    C[bk, E]  = (iota_c == lc_e) * nf[lc_e]      one VPU compare
    A[bm, bk] = R @ C^T                          one small MXU pass
    y_tile   += A @ x_tile                       the dense matmul

so tile densification is two broadcast compares and an [bm, E] x
[E, bk] matmul — cost independent of which positions the edges hit.
Per-edge values never materialize: row-normalized (and sym-normalized)
laplacians on binary adjacencies factor RANK-1 over a tile,
``val(r, c) = rv[r] * nf[c]`` (the val-free resident mode,
`gnn_tpu/ops/residentgraph.py`), and the factors fold into the one-hot
operands. The edge payload is 4 bytes/edge (packed coords), and the
aggregation cost collapses to ~the dense MXU cost of the occupied
tiles — at LADIES cold-residual densities every tile is occupied, so
this is the dense-matmul speed of light for the layer shape, with no
per-step densification and no resident [R, C] operand.

Memory plan (v5e: ~120 MB usable VMEM measured):
  * x (the dense operand) fully VMEM-resident, like
    `pallas_spmm.stream_spmm` — read once from HBM;
  * coords SHIP as int16 (2 bytes/edge — same as the lite format's
    int16 cols) and are cast to an int32 [n_rows, 128] grid by one XLA
    elementwise pass outside the kernel (Mosaic cannot issue dynamic
    single-sublane loads of packed 16-bit types). The kernel reads the
    grid through TWO consecutive (16, 128)-row block views whose
    indices derive from the prefetched entry offsets — Pallas manages
    their DMA pipeline, and because entries visit edges in packed
    order, CONSECUTIVE ENTRIES USUALLY MAP TO THE SAME BLOCKS (one
    16-row block holds ~2048 edges ≈ dozens of entries), so block
    fetches amortize across entries instead of paying per-entry DMA
    latency (a manual per-entry double-buffered DMA measured ~630 ns
    of stall per entry — the latency, not the bytes);
  * rv / nf ride as [n, 1] VMEM columns sliced per tile;
  * entry tables (packed tile ids + edge offsets/counts + transpose
    visit order) ride in SMEM via scalar prefetch.

The transpose direction reuses the SAME edge buffer and tables: a
col-tile-major visit permutation (``t_order``) drives the grid and the
one-hot roles swap. One shipped copy serves forward and backward.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# edges per coord row and coord rows per block view. An entry's edges
# live in [off, off + cnt); the two consecutive block views cover rows
# [b*BLK_ROWS, (b+2)*BLK_ROWS) with b = off's block, so
# ecap <= BLK_ROWS * EC keeps every entry inside the pair. EC=256
# (two native lane rows) halves the w_body iterations per entry vs 128
# — the per-entry cost is select/compare/grid-bound, not matmul-bound.
EC = 256
BLK_ROWS = 8
# deployed per-entry edge cap (heavier tiles split across entries).
# ONE constant so pack_resident_ref, the HotDenseAdj rebuild and
# bench.py can never disagree; must stay <= BLK_ROWS * EC.
ECAP = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class EdgeTiles:
    """Tile-grouped edge stream for one sampled layer (both directions).

    ``coords`` flattens to ``(lr << log2(bk)) | lc`` per edge — row AND
    column LOCAL TO THEIR TILE (the one-hots need no base subtraction),
    int16 (bit pattern; the kernel masks after the int32 cast, so
    bm * bk <= 2^16 — e.g. 128x256 or 256x256; powers of two only).
    Entry i owns flat edges ``[off[0, i], off[0, i] + off[1, i])`` with
    at most ``ecap`` edges (heavier tiles split across entries).
    ``blk_rc`` is (rt << 16) | ct sorted rt-major (forward visit order);
    ``t_order`` permutes entries into ct-major order for the transpose.
    Sentinel zero-edge entries guarantee every row-tile AND col-tile is
    visited at least once (output blocks zero-initialize on first
    visit); pad entries point at tile (n_rt-1, n_ct-1), which sorts
    last in both orders."""

    coords: jnp.ndarray   # int16 [n_coord_rows, EC]
    blk_rc: jnp.ndarray   # int32 [NB]
    off: jnp.ndarray      # int32 [2, NB + 1]: row 0 = offset, 1 = count
    t_order: jnp.ndarray  # int32 [NB]
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)
    bm: int = struct.field(pytree_node=False)
    bk: int = struct.field(pytree_node=False)
    ecap: int = struct.field(pytree_node=False)
    # per-edge VALUES in tile order, same grid layout as coords (the
    # weighted / non-rank-1 payload: A[r, c] = vals_e * rv[r] * nf[c];
    # None = rank-1 values only). bf16/f32 [n_coord_rows, EC].
    vals: Optional[jnp.ndarray] = None


def pack_edge_tiles(rows: np.ndarray, cols: np.ndarray,
                    nrows_pad: int, ncols_pad: int, bm: int = 128,
                    bk: int = 128, ecap: int = 256,
                    nb_pad: Optional[int] = None,
                    e_pad: Optional[int] = None,
                    use_native: bool = True,
                    vals: Optional[np.ndarray] = None,
                    val_dtype=None) -> EdgeTiles:
    """Host-side packing: COO pattern -> tile-grouped edge stream.

    Values do NOT ship — the kernel applies the rank-1 ``rv[r] * nf[c]``
    factorization (val-free laplacians); weighted graphs keep the
    segment-sum path. ``nb_pad``/``e_pad`` bucket the array sizes for
    shape-stable jits across steps. The E-sized tile sort runs in the
    native core when available (~2 ms vs ~75 ms numpy argsort at
    canonical cold-layer scale — this sits in the per-step path)."""
    assert nrows_pad % bm == 0 and ncols_pad % bk == 0
    assert ecap <= BLK_ROWS * EC, (ecap, BLK_ROWS)
    assert (bm & (bm - 1)) == 0 and (bk & (bk - 1)) == 0, (bm, bk)
    assert bm * bk <= (1 << 16), (bm, bk)  # int16 coord pack
    n_rt, n_ct = nrows_pad // bm, ncols_pad // bk
    assert n_rt < (1 << 15) and n_ct < (1 << 16), (n_rt, n_ct)
    shift = bk.bit_length() - 1
    lib = None
    if use_native:
        from gnn_tpu import native as _native
        lib = _native.get_lib()
    vals_s = None
    if lib is not None:
        if vals is not None:
            from gnn_tpu.native import pack_tiles_perm_native
            coords_s, tile_cnt, perm = pack_tiles_perm_native(
                lib, np.asarray(rows, np.int32),
                np.asarray(cols, np.int32), n_rt, n_ct,
                bm.bit_length() - 1, shift)
            vals_s = np.asarray(vals)[perm]
        else:
            from gnn_tpu.native import pack_tiles_native
            coords_s, tile_cnt = pack_tiles_native(
                lib, np.asarray(rows, np.int32),
                np.asarray(cols, np.int32), n_rt, n_ct,
                bm.bit_length() - 1, shift)
        occ = np.flatnonzero(tile_cnt)
        uniq = occ.astype(np.int64)
        counts = tile_cnt[occ].astype(np.int64)
    else:
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        key = (rows // bm) * n_ct + cols // bk
        order = np.argsort(key, kind="stable")
        rows_s, cols_s = rows[order], cols[order]
        if vals is not None:
            vals_s = np.asarray(vals)[order]
        uniq, counts = np.unique(key[order], return_counts=True)
        lr = rows_s - (rows_s // bm) * bm
        lc = cols_s - (cols_s // bk) * bk
        coords_s = (((lr << shift) | lc) & 0xFFFF).astype(
            np.uint16).view(np.int16)
    return _build_tiles(coords_s, uniq, counts, nrows_pad, ncols_pad,
                        bm, bk, ecap, n_rt, n_ct, nb_pad, e_pad,
                        vals_s=vals_s, val_dtype=val_dtype)


def _build_tiles(coords_s: np.ndarray, uniq: np.ndarray,
                 counts: np.ndarray, nrows_pad: int, ncols_pad: int,
                 bm: int, bk: int, ecap: int, n_rt: int, n_ct: int,
                 nb_pad: Optional[int], e_pad: Optional[int],
                 vals_s: Optional[np.ndarray] = None,
                 val_dtype=None) -> EdgeTiles:
    """Entry tables + padding from tile-sorted coords and per-tile
    counts (everything here is O(n_tiles), not O(E))."""
    # split heavy tiles into ceil(cnt/ecap) entries
    n_ent = np.maximum(-(-counts // ecap), 1)
    ent_tile = np.repeat(np.arange(len(uniq)), n_ent)
    within = (np.arange(len(ent_tile))
              - np.repeat(np.cumsum(n_ent) - n_ent, n_ent))
    tile_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
    ent_off = (tile_start[ent_tile] + within * ecap).astype(np.int64)
    ent_cnt = np.minimum(counts[ent_tile] - within * ecap, ecap)
    ent_rc = ((uniq[ent_tile] // n_ct).astype(np.int64) << 16) \
        | (uniq[ent_tile] % n_ct).astype(np.int64)

    # sentinel zero-edge entries for unvisited row-tiles / col-tiles so
    # their output blocks are zeroed on the respective pass
    miss_rt = np.setdiff1d(np.arange(n_rt), np.unique(uniq // n_ct))
    miss_ct = np.setdiff1d(np.arange(n_ct), np.unique(uniq % n_ct))
    sent_rc = np.concatenate([miss_rt.astype(np.int64) << 16,
                              miss_ct.astype(np.int64)])
    if len(sent_rc):
        ent_rc = np.concatenate([ent_rc, sent_rc])
        ent_off = np.concatenate(
            [ent_off, np.zeros(len(sent_rc), np.int64)])
        ent_cnt = np.concatenate(
            [ent_cnt, np.zeros(len(sent_rc), np.int64)])

    # forward visit order: (rt, ct); entries of one tile stay adjacent
    fwd = np.argsort(ent_rc, kind="stable")
    ent_rc, ent_off, ent_cnt = ent_rc[fwd], ent_off[fwd], ent_cnt[fwd]
    nb = len(ent_rc)
    if nb_pad is None:
        nb_pad = max(_round_up(nb, 8), 8)
    if nb > nb_pad:
        raise ValueError(f"{nb} entries > nb_pad {nb_pad}")

    e_used = len(coords_s)
    if e_pad is None:
        e_pad = max(_round_up(e_used, EC), EC)
    if e_used > e_pad:
        raise ValueError(f"{e_used} edges > e_pad {e_pad}")
    # +2*BLK_ROWS coord rows of tail pad: the b+1 block view of an
    # entry near the end must stay in bounds
    n_cr = e_pad // EC + 2 * BLK_ROWS
    coords = np.zeros(n_cr * EC, np.int16)
    coords[:e_used] = coords_s
    coords = coords.reshape(n_cr, EC)
    vgrid = None
    if vals_s is not None:
        import jax.numpy as _jnp
        vdt = val_dtype if val_dtype is not None else _jnp.bfloat16
        vgrid = np.zeros(n_cr * EC, vdt)
        vgrid[:e_used] = vals_s.astype(vdt)
        vgrid = vgrid.reshape(n_cr, EC)

    # pad entries carry zero edges and point at tile (n_rt-1, n_ct-1):
    # the sentinels above guarantee that tile id occurs, and it sorts
    # LAST in both visit orders, so a pad entry can never be the first
    # visit of an output block (which would re-zero written results)
    pad_rc = ((n_rt - 1) << 16) | (n_ct - 1)
    blk_rc = np.full(nb_pad, pad_rc, np.int32)
    blk_rc[:nb] = ent_rc.astype(np.int32)
    offcnt = np.zeros((2, nb_pad + 1), np.int32)
    offcnt[0, :nb] = ent_off
    offcnt[1, :nb] = ent_cnt

    # transpose order: (ct, rt) over ALL nb_pad entries (pads sort last)
    t_key = ((blk_rc.astype(np.int64) & 0xFFFF) << 16) | \
        (blk_rc.astype(np.int64) >> 16)
    t_ord = np.argsort(t_key, kind="stable").astype(np.int32)

    return EdgeTiles(coords=coords, blk_rc=blk_rc, off=offcnt,
                     t_order=t_ord,
                     nrows=int(nrows_pad), ncols=int(ncols_pad),
                     bm=bm, bk=bk, ecap=ecap, vals=vgrid)


def segment_tiles(blk_rc: np.ndarray, off: np.ndarray,
                  ns_pad: Optional[int] = None) -> np.ndarray:
    """Group a tile set's entries into SEGMENTS for the segment-grid
    kernel: one grid step per segment instead of per entry (the
    per-entry grid harness cost — index maps, block bookkeeping, DMA
    sync — measured ~0.3 us/step, a third of the kernel's non-matmul
    time). A segment is a maximal run of consecutive entries that (a)
    share one row-tile (they accumulate into one output block) and (b)
    whose edges fit the kernel's fixed 2-block coord window
    ``[base, base + 2*BLK_ROWS*EC)`` anchored at the first entry.
    Zero-count entries (sentinels/pads, off may be 0) never force a
    split — the kernel's cnt>0 guard makes them inert wherever they
    land. Returns ``seg_ptr`` int32 [NS_pad + 1] (entry-index
    boundaries; trailing padding segments are empty)."""
    nb = blk_rc.shape[0]
    win = BLK_ROWS * EC
    rt = (blk_rc.astype(np.int64) >> 16)
    o = off[0, :nb].astype(np.int64)
    c = off[1, :nb].astype(np.int64)
    starts = [0]
    cur_base = (o[0] // win) if nb else 0
    for j in range(1, nb):
        if rt[j] != rt[starts[-1]]:
            # ALWAYS split on a row-tile change — even for zero-count
            # sentinels: an rt whose only entry is its sentinel must
            # still get a segment, or its output block is never
            # written (Pallas outputs are uninitialized until stored)
            starts.append(j)
            cur_base = o[j] // win
        elif c[j] == 0:
            continue          # inert within its rt; never forces a split
        elif o[j] + c[j] > (cur_base + 2) * win:
            starts.append(j)
            cur_base = o[j] // win
    ns = len(starts)
    if ns_pad is None:
        ns_pad = max(_round_up(ns, 8), 8)
    if ns > ns_pad:
        raise ValueError(f"{ns} segments > ns_pad {ns_pad}")
    seg_ptr = np.full(ns_pad + 1, nb, np.int32)
    seg_ptr[:ns] = starts
    return seg_ptr


def _edge_stream_seg_kernel(segp_ref, rc_ref, offcnt_ref, ca_ref,
                            cb_ref, x_ref, out_ref, *, bm: int, bk: int,
                            shift: int, nb: int):
    """Segment-grid forward kernel (one grid step per row-tile-segment;
    the transpose runs THIS kernel on a (cols, rows)-swapped pack).
    Rank-1 factors are folded outside, per-edge values not yet
    supported here (the deployed per-entry kernel covers those)."""
    j = pl.program_id(1)
    e_lo = segp_ref[j]
    e_hi = segp_ref[j + 1]

    def seg_tile(jj):
        return rc_ref[jnp.minimum(segp_ref[jj], nb - 1)] >> 16

    first = jnp.logical_or(j == 0,
                           seg_tile(j) != seg_tile(jnp.maximum(j - 1, 0)))

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base_edge = (offcnt_ref[0, jnp.minimum(e_lo, nb - 1)]
                 // (BLK_ROWS * EC)) * (BLK_ROWS * EC)
    dt = x_ref.dtype
    io_r = jax.lax.broadcasted_iota(jnp.int32, (bm, EC), 0)
    io_c = jax.lax.broadcasted_iota(jnp.int32, (bk, EC), 0)
    io_e = jax.lax.broadcasted_iota(jnp.int32, (1, EC), 1)

    def ent_body(e, carry):
        ct = rc_ref[e] & 0xFFFF
        off = offcnt_ref[0, e]
        cnt = offcnt_ref[1, e]

        def w_body(w, acc):
            wa = jnp.minimum(w, BLK_ROWS - 1)
            wb = jnp.clip(w - BLK_ROWS, 0, BLK_ROWS - 1)
            ca = ca_ref[pl.ds(wa, 1), :]
            cb = cb_ref[pl.ds(wb, 1), :]
            cw = jnp.where(w < BLK_ROWS, ca, cb)
            eidx = base_edge + w * EC + io_e
            valid = jnp.logical_and(eidx >= off, eidx < off + cnt)
            lr = jnp.where(valid,
                           (cw >> shift) & ((1 << (16 - shift)) - 1), bm)
            lc = jnp.where(valid, cw & ((1 << shift) - 1), bk)
            R = (io_r == lr).astype(dt)
            C = (io_c == lc).astype(dt)
            return acc + jax.lax.dot_general(
                R, C, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        d0 = off - base_edge
        w_lo = d0 // EC
        w_hi = (d0 + cnt + EC - 1) // EC
        a = jax.lax.fori_loop(w_lo, jnp.where(cnt > 0, w_hi, w_lo),
                              w_body, jnp.zeros((bm, bk), jnp.float32))
        start = pl.multiple_of(ct * bk, bk)
        xb = x_ref[pl.ds(start, bk), :]
        out_ref[:] += jnp.dot(a.astype(dt), xb,
                              preferred_element_type=jnp.float32
                              ).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(e_lo, e_hi, ent_body, 0)


@functools.partial(jax.jit, static_argnames=("f_tile", "interpret"))
def edge_stream_spmm_seg(tiles: EdgeTiles, seg_ptr: jnp.ndarray,
                         x: jnp.ndarray, rv: jnp.ndarray,
                         nf: jnp.ndarray, f_tile: int = 0,
                         interpret: bool = False) -> jnp.ndarray:
    """Forward ``y = A @ x`` on the SEGMENT grid (see `segment_tiles`).
    For the transpose, pack a second EdgeTiles with (rows, cols)
    swapped and call this with (nf, rv). Rank-1 values only."""
    assert tiles.vals is None, "per-edge values: use edge_stream_spmm"
    bm, bk = tiles.bm, tiles.bk
    nb = tiles.blk_rc.shape[0]
    ns = seg_ptr.shape[0] - 1
    C_, F = x.shape
    assert C_ == tiles.ncols, (C_, tiles.ncols)
    out_dtype = jnp.float32
    if not interpret and jax.default_backend() == "tpu":
        x = x.astype(jnp.bfloat16)
    x = x * nf.astype(x.dtype)[:, None]
    out_fac = jnp.asarray(rv, jnp.float32)
    if f_tile == 0:
        budget = 72 * 1024 * 1024 // max(C_ * x.dtype.itemsize, 1)
        f_tile = min(_round_up(F, 128), max(128, (budget // 128) * 128))
    n_ft = pl.cdiv(F, f_tile)
    kernel = functools.partial(_edge_stream_seg_kernel, bm=bm, bk=bk,
                               shift=bk.bit_length() - 1, nb=nb)

    def win_a(f, j, sp, r, oc):
        return (oc[0, jnp.minimum(sp[j], nb - 1)] // (BLK_ROWS * EC), 0)

    def win_b(f, j, sp, r, oc):
        return (oc[0, jnp.minimum(sp[j], nb - 1)] // (BLK_ROWS * EC) + 1,
                0)

    def out_map(f, j, sp, r, oc):
        return (r[jnp.minimum(sp[j], nb - 1)] >> 16, f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # seg_ptr, blk_rc, off/cnt
        grid=(n_ft, ns),
        in_specs=[
            pl.BlockSpec((BLK_ROWS, EC), win_a),
            pl.BlockSpec((BLK_ROWS, EC), win_b),
            pl.BlockSpec((C_, f_tile), lambda f, j, sp, r, oc: (0, f)),
        ],
        out_specs=pl.BlockSpec((bm, f_tile), out_map),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles.nrows, F), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    c32 = tiles.coords.astype(jnp.int32)
    y = call(seg_ptr, tiles.blk_rc, tiles.off, c32, c32, x)
    return y * out_fac[:, None]


def tile_dims(nrows_pad: int, ncols_pad: int):
    """The deployed (bm, bk) choice for a layer's padded caps: 256
    where the cap aligns (quarter the entry count; measured 1.9x/4.2x
    over segsum vs 1.5x/3.4x at 128x256), else 128. ONE place so the
    sampler's direct-to-tiles native slice and `pack_resident_ref`
    always agree."""
    return (256 if nrows_pad % 256 == 0 else 128,
            256 if ncols_pad % 256 == 0 else 128)


def repad_tiles(coords: np.ndarray, blk_rc: np.ndarray, off: np.ndarray,
                t_order: np.ndarray, nb_pad: int, n_cr: int,
                n_rt: int, n_ct: int, vals: Optional[np.ndarray] = None):
    """Extend a packed tile set to (nb_pad entries, n_cr coord rows) —
    the re-bucketing the pipeline's stack/group paths need to unify
    shapes across steps. Pad entries carry zero edges at tile
    (n_rt-1, n_ct-1), which sorts last in BOTH visit orders (the same
    convention `pack_edge_tiles` uses), so they can never be the first
    visit of an output block. Returns a 5-tuple; the last member is the
    (optionally extended) per-edge val grid or None."""
    nb = blk_rc.shape[0]
    if nb == nb_pad and coords.shape[0] == n_cr:
        return coords, blk_rc, off, t_order, vals
    assert nb_pad >= nb and n_cr >= coords.shape[0], \
        ((nb, nb_pad), (coords.shape[0], n_cr))
    pad_rc = ((n_rt - 1) << 16) | (n_ct - 1)
    blk2 = np.concatenate(
        [blk_rc, np.full(nb_pad - nb, pad_rc, np.int32)])
    off2 = np.zeros((2, nb_pad + 1), np.int32)
    off2[:, : nb + 1] = off
    t2 = np.concatenate(
        [t_order, np.arange(nb, nb_pad, dtype=np.int32)])
    c2 = np.zeros((n_cr, coords.shape[1]), coords.dtype)
    c2[: coords.shape[0]] = coords
    v2 = None
    if vals is not None:
        v2 = np.zeros((n_cr, vals.shape[1]), vals.dtype)
        v2[: vals.shape[0]] = vals
    return c2, blk2, off2, t2, v2


def _edge_stream_kernel(ord_ref, rc_ref, offcnt_ref, ca_ref, cb_ref,
                        *rest, bm: int, bk: int, ecap: int,
                        transpose: bool, shift: int, has_vals: bool):
    """The rank-1 factors do NOT enter the kernel: the caller folds
    ``nf`` into x and ``rv`` into the output (y = rv . (A01 @ (nf . x))
    — exact, since the factors are diagonal scalings), so the one-hot
    operands here are pure 0/1 casts. That removes two [b, EC]
    broadcast-multiplies per w iteration — the VPU one-hot builds are
    the kernel's dominant non-matmul cost (measured: bare grid harness
    is ~0.28 us/entry, A@x matmul 0.4 us, the rest is mask building)."""
    if has_vals:
        va_ref, vb_ref, x_ref, out_ref = rest
    else:
        va_ref = vb_ref = None
        x_ref, out_ref = rest
    j = pl.program_id(1)

    def ent(i):
        return ord_ref[i]

    def out_tile(i):
        rc = rc_ref[ent(i)]
        return (rc & 0xFFFF) if transpose else (rc >> 16)

    # zero the output block on its first visit (visit order is sorted by
    # the output tile id, so revisits are consecutive)
    first = jnp.logical_or(j == 0, out_tile(j) != out_tile(
        jnp.maximum(j - 1, 0)))

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rc = rc_ref[ent(j)]
    rt = rc >> 16
    ct = rc & 0xFFFF
    off = offcnt_ref[0, ent(j)]
    cnt = offcnt_ref[1, ent(j)]
    base_edge = (off // (BLK_ROWS * EC)) * (BLK_ROWS * EC)

    dt = x_ref.dtype
    io_r = jax.lax.broadcasted_iota(jnp.int32, (bm, EC), 0)
    io_c = jax.lax.broadcasted_iota(jnp.int32, (bk, EC), 0)
    io_e = jax.lax.broadcasted_iota(jnp.int32, (1, EC), 1)

    def w_body(w, acc):
        # coord row w of the entry's 2-block window (Pallas pipelines
        # the two 16-row block views; consecutive entries usually share
        # them, so no per-entry DMA latency is paid)
        wa = jnp.minimum(w, BLK_ROWS - 1)
        wb = jnp.clip(w - BLK_ROWS, 0, BLK_ROWS - 1)
        ca = ca_ref[pl.ds(wa, 1), :]
        cb = cb_ref[pl.ds(wb, 1), :]
        cw = jnp.where(w < BLK_ROWS, ca, cb)             # [1, EC] int32
        eidx = base_edge + w * EC + io_e
        valid = jnp.logical_and(eidx >= off, eidx < off + cnt)
        # cw is sign-extended int16 bits; mask each field after shift
        lr = jnp.where(valid, (cw >> shift) & ((1 << (16 - shift)) - 1),
                       bm)                               # [1, EC]
        lc = jnp.where(valid, cw & ((1 << shift) - 1), bk)
        # pure 0/1 one-hot operands (values live outside the kernel;
        # mask-multiply/cast, not select: Mosaic cannot relayout an i1
        # select against sublane-broadcast bf16 operands)
        R = (io_r == lr).astype(dt)                      # [bm, EC]
        if has_vals:
            # per-edge values fold into the row one-hot
            vaw = va_ref[pl.ds(wa, 1), :]
            vbw = vb_ref[pl.ds(wb, 1), :]
            vw = jnp.where(w < BLK_ROWS, vaw, vbw)       # [1, EC]
            R = R * vw.astype(dt)
        C = (io_c == lc).astype(dt)                      # [bk, EC]
        if transpose:
            d = jax.lax.dot_general(
                C, R, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [bk, bm]
        else:
            d = jax.lax.dot_general(
                R, C, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [bm, bk]
        return acc + d

    d0 = off - base_edge
    w_lo = d0 // EC
    w_hi = (d0 + cnt + EC - 1) // EC
    a_shape = (bk, bm) if transpose else (bm, bk)
    a = jax.lax.fori_loop(w_lo, jnp.where(cnt > 0, w_hi, w_lo), w_body,
                          jnp.zeros(a_shape, jnp.float32))

    if transpose:
        start = pl.multiple_of(rt * bm, bm)
        xb = x_ref[pl.ds(start, bm), :]
    else:
        start = pl.multiple_of(ct * bk, bk)
        xb = x_ref[pl.ds(start, bk), :]
    out_ref[:] += jnp.dot(a.astype(xb.dtype), xb,
                          preferred_element_type=jnp.float32
                          ).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("transpose", "f_tile", "interpret"))
def edge_stream_spmm(tiles: EdgeTiles, x: jnp.ndarray,
                     rv: jnp.ndarray, nf: jnp.ndarray,
                     transpose: bool = False, f_tile: int = 0,
                     interpret: bool = False) -> jnp.ndarray:
    """``y = A @ x`` (or ``A^T @ x``) where ``A[r, c] = rv[r] * nf[c]``
    on the packed edge set and 0 elsewhere. Output is float32.

    ``rv``: [nrows] row factors (the row-constant laplacian values);
    ``nf``: [ncols] column factors (normfact). For the transpose
    direction pass the same tiles and factors — ``x`` then has nrows
    rows and the result ncols.

    On real TPU the operands are cast to bfloat16: measured time-
    neutral on this rig (its --xla_allow_excess_precision already ran
    f32 matmuls as single-pass bf16 — identical rel err confirms it)
    but it HALVES the VMEM-resident x block, doubling the feature width
    that fits, and guarantees single-pass MXU on rigs without that
    flag. f32 accumulation throughout — the same precision class as
    the resident hot block. Interpreter mode keeps the input dtype so
    CPU tests validate the exact math."""
    bm, bk, ecap = tiles.bm, tiles.bk, tiles.ecap
    nb = tiles.blk_rc.shape[0]
    n_out = tiles.ncols if transpose else tiles.nrows
    n_in = tiles.nrows if transpose else tiles.ncols
    C_, F = x.shape
    assert C_ == n_in, (C_, n_in)
    assert rv.shape == (tiles.nrows,), rv.shape
    assert nf.shape == (tiles.ncols,), nf.shape
    out_dtype = jnp.float32
    if not interpret and jax.default_backend() == "tpu":
        x = x.astype(jnp.bfloat16)
    # the rank-1 factors are diagonal scalings, so they fold OUTSIDE
    # the kernel (y = rv . (A01 @ (nf . x)); swapped for the
    # transpose) — the kernel's one-hots stay pure 0/1, removing two
    # [b, EC] broadcast-multiplies per iteration (the dominant VPU
    # cost; the fused XLA elementwise scalings here are ~0.05 ms)
    in_fac = (rv if transpose else nf).astype(x.dtype)
    out_fac = jnp.asarray(nf if transpose else rv, jnp.float32)
    x = x * in_fac[:, None]
    if f_tile == 0:
        budget = 72 * 1024 * 1024 // max(C_ * x.dtype.itemsize, 1)
        f_tile = min(_round_up(F, 128), max(128, (budget // 128) * 128))
    if C_ * f_tile * x.dtype.itemsize > 100 * 1024 * 1024:
        raise ValueError(
            f"edge_stream_spmm: x block ({C_}x{f_tile}) exceeds VMEM; "
            f"shard the layer or fall back to the COO path")
    n_ft = pl.cdiv(F, f_tile)

    ord_arr = (tiles.t_order if transpose
               else jnp.arange(nb, dtype=jnp.int32))
    out_blk = bk if transpose else bm

    def out_map(f, j, ord_, rc, offcnt):
        rcj = rc[ord_[j]]
        t = (rcj & 0xFFFF) if transpose else (rcj >> 16)
        return (t, f)

    has_vals = tiles.vals is not None
    kernel = functools.partial(_edge_stream_kernel, bm=bm, bk=bk,
                               ecap=ecap, transpose=transpose,
                               shift=bk.bit_length() - 1,
                               has_vals=has_vals)
    # two consecutive block views of the coord grid (and, when per-edge
    # values ride along, of the val grid — same index maps): Pallas
    # pipelines their DMA and skips refetch when consecutive entries
    # map to the same blocks (the common case — one block holds
    # BLK_ROWS*EC = 2048 edges)
    blk_a = pl.BlockSpec((BLK_ROWS, EC),
                         lambda f, j, o, r, oc:
                         (oc[0, o[j]] // (BLK_ROWS * EC), 0))
    blk_b = pl.BlockSpec((BLK_ROWS, EC),
                         lambda f, j, o, r, oc:
                         (oc[0, o[j]] // (BLK_ROWS * EC) + 1, 0))
    in_specs = [blk_a, blk_b]
    if has_vals:
        in_specs += [blk_a, blk_b]
    in_specs += [
        pl.BlockSpec((C_, f_tile),
                     lambda f, j, o, r, oc: (0, f)),  # x resident
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # ord, blk_rc, off/cnt
        grid=(n_ft, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_blk, f_tile), out_map),
    )
    flops = 2 * nb * (bm * 2 * EC * bk + bm * bk * F)
    bytes_accessed = (tiles.coords.size * 4
                      + C_ * F * x.dtype.itemsize
                      + n_out * F * 4)
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, F), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )
    c32 = tiles.coords.astype(jnp.int32)
    args = [ord_arr, tiles.blk_rc, tiles.off, c32, c32]
    if has_vals:
        args += [tiles.vals, tiles.vals]
    return call(*args, x) * out_fac[:, None]
