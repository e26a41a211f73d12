"""Pallas TPU SpMM kernels.

TPU-native replacement for the reference's CUDA SpMM
(`/root/reference/spmm_cpp/cuda_spmm.cu`). The reference's load-balanced
kernel (`_spmm_cuda_v2_kernel`, `cuda_spmm.cu:163-212`) solves a GPU
problem — warp imbalance across variable-degree rows — that does not
exist on a systolic array. On TPU the constraints are different:

* the MXU wants dense (bm, bk) x (bk, F) tiles;
* HBM traffic, not FLOPs, bounds sparse aggregation;
* fine-grained (per-edge) gathers are VPU-serial and slow.

So the kernel streams the *occupied tiles* of the adjacency (a flattened
BCSR: tiles sorted by row-tile, empty tiles skipped entirely), keeps a
column-tile of the dense operand resident in VMEM across the whole
stream, and does one MXU matmul per occupied tile, accumulating the
output row-tile in VMEM. Block row/col ids ride in via scalar prefetch
(`PrefetchScalarGridSpec`), so the x-slice address is known before the
body runs.

Layout invariants (prepared host-side by :func:`pack_stream`):
  - every row-tile owns >= 1 tile (empty row-tiles get a zero tile) so
    every output block gets zeroed;
  - tiles are sorted by row-tile; the output block revisits consecutive
    grid steps only (grid = (F_tiles, n_tiles), f outermost), which is
    the Pallas-legal accumulation pattern;
  - padding tiles point at (last row-tile, col 0) with zero values.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class StreamBlocks:
    """Flattened occupied-tile stream for one adjacency (one direction).

    ``blk_rc`` packs (row-tile << 16) | col-tile into one int32 per tile —
    the array lives in SMEM via scalar prefetch (1 MiB limit), so packing
    doubles the supported stream length (~260K tiles)."""

    blk_rc: jnp.ndarray    # int32 [NB] (row_tile << 16) | col_tile, sorted
    vals: jnp.ndarray      # f32 [NB, bm, bk] dense tile contents
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)
    bm: int = struct.field(pytree_node=False)
    bk: int = struct.field(pytree_node=False)


MAX_STREAM_BLOCKS = 240_000  # SMEM holds ~1MiB of prefetched scalars


def pack_stream(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                nrows_pad: int, ncols_pad: int, bm: int = 8,
                bk: int = 128, nb_pad: Optional[int] = None,
                dtype=np.float32) -> StreamBlocks:
    """Host-side packing of COO edges into the sorted occupied-tile stream."""
    assert nrows_pad % bm == 0 and ncols_pad % bk == 0
    n_rt, n_ct = nrows_pad // bm, ncols_pad // bk
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    # sentinel zero-value edge at (rt*bm, 0) for every empty row-tile so
    # each output block is visited (and zeroed) at least once
    missing = np.setdiff1d(np.arange(n_rt, dtype=np.int64),
                           np.unique(rows // bm))
    if len(missing):
        rows = np.concatenate([rows, missing * bm])
        cols = np.concatenate([cols, np.zeros(len(missing), np.int64)])
        vals = np.concatenate([vals, np.zeros(len(missing), vals.dtype)])

    tr, tc = rows // bm, cols // bk
    key = tr * n_ct + tc
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, counts = np.unique(key_s, return_counts=True)
    occ_tr = (uniq // n_ct).astype(np.int32)
    occ_tc = (uniq % n_ct).astype(np.int32)
    nb = len(uniq)
    if nb_pad is None:
        nb_pad = max(_round_up(nb, 8), 8)
    if nb > nb_pad:
        raise ValueError(f"{nb} blocks > pad {nb_pad}")

    assert n_rt < (1 << 15) and n_ct < (1 << 16), (n_rt, n_ct)
    blk_rc = np.full(nb_pad, max(n_rt - 1, 0) << 16, np.int32)
    blk_rc[:nb] = (occ_tr.astype(np.int32) << 16) | occ_tc
    tiles = np.zeros((nb_pad, bm, bk), dtype)

    edge_tile = np.repeat(np.arange(nb), counts)
    r_s, c_s, v_s = rows[order], cols[order], vals[order]
    tiles[edge_tile, r_s - (r_s // bm) * bm, c_s - (c_s // bk) * bk] = \
        v_s.astype(dtype)
    return StreamBlocks(
        blk_rc=blk_rc, vals=tiles,
        nrows=int(nrows_pad), ncols=int(ncols_pad), bm=bm, bk=bk)


def _stream_kernel(blk_rc_ref, vals_ref, x_ref, out_ref, *,
                   bk: int, precision):
    j = pl.program_id(1)
    row_j = blk_rc_ref[j] >> 16
    prev = blk_rc_ref[jnp.maximum(j - 1, 0)] >> 16
    first = jnp.logical_or(j == 0, row_j != prev)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    col = blk_rc_ref[j] & 0xFFFF
    start = pl.multiple_of(col * bk, bk)
    xb = x_ref[pl.ds(start, bk), :]
    out_ref[:] += jnp.dot(vals_ref[0], xb,
                          preferred_element_type=jnp.float32,
                          precision=precision).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("f_tile", "precision"))
def stream_spmm(stream: StreamBlocks, x: jnp.ndarray,
                f_tile: int = 0,
                precision: str = "highest") -> jnp.ndarray:
    """``y[nrows, F] = A @ x`` with A given as an occupied-tile stream."""
    nb = stream.blk_rc.shape[0]
    if nb > MAX_STREAM_BLOCKS:
        raise ValueError(
            f"stream of {nb} tiles exceeds the scalar-prefetch SMEM "
            f"capacity ({MAX_STREAM_BLOCKS}); use a larger bm or the "
            f"padded blocked path")
    bm, bk = stream.bm, stream.bk
    C, F = x.shape
    assert C == stream.ncols, (C, stream.ncols)
    if f_tile == 0:
        # keep the resident x column-tile within VMEM (v5e: ~128MiB;
        # leave headroom for the vals stream + out accumulators)
        budget = 64 * 1024 * 1024 // max(C * x.dtype.itemsize, 1)
        f_tile = min(_round_up(F, 128), max(128, (budget // 128) * 128))
    # the kernel keeps the whole (C, f_tile) x-block resident; past ~200K
    # f32 rows even the minimum f_tile of 128 exceeds the VMEM limit and
    # the failure would otherwise surface as an opaque Mosaic compile
    # error deep in the stack — fail early with a recipe instead
    if C * f_tile * x.dtype.itemsize > 100 * 1024 * 1024:
        raise ValueError(
            f"stream_spmm: x block ({C} rows x f_tile {f_tile}, "
            f"{C * f_tile * x.dtype.itemsize / 2**20:.0f} MiB) exceeds the "
            f"100 MiB VMEM budget; shard the graph over a mesh "
            f"(gnn_tpu.parallel.halo) or fall back to the chunked COO "
            f"path (COOAdj) for C this large")
    n_ft = pl.cdiv(F, f_tile)
    grid = (n_ft, nb)

    kernel = functools.partial(_stream_kernel, bk=bk,
                               precision=jax.lax.Precision(precision))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda f, j, rc: (j, 0, 0)),
            pl.BlockSpec((C, f_tile), lambda f, j, rc: (0, f)),
        ],
        out_specs=pl.BlockSpec(
            (bm, f_tile), lambda f, j, rc: (rc[j] >> 16, f)),
    )
    flops = 2 * nb * bm * bk * F
    bytes_accessed = (stream.vals.size * stream.vals.dtype.itemsize * n_ft
                      + C * F * x.dtype.itemsize
                      + stream.nrows * F * 4)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((stream.nrows, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
    )(stream.blk_rc, stream.vals, x)


# ---------------------------------------------------------------------------
# Adapter for gnn_tpu.ops.sparse.BlockedAdj (padded per-row-tile layout)
# ---------------------------------------------------------------------------

def _blocked_to_stream_arrays(block_cols: jnp.ndarray,
                              block_vals: jnp.ndarray):
    """Flatten a [n_rt, max_blk] per-row-tile layout into stream arrays
    (device-side, cheap reshapes only)."""
    n_rt, max_blk = block_cols.shape
    blk_row = jnp.repeat(jnp.arange(n_rt, dtype=jnp.int32), max_blk)
    blk_rc = (blk_row << 16) | block_cols.reshape(-1).astype(jnp.int32)
    vals = block_vals.reshape((-1,) + block_vals.shape[2:])
    return blk_rc, vals


def blocked_spmm_pallas(block_cols, block_vals, x, bm: int, bk: int):
    """SpMM over the BlockedAdj layout via the streaming kernel.

    Padding tiles in the per-row-tile layout have zero values, so they
    contribute nothing; every row-tile has max_blk >= 1 entries so every
    output block is zero-initialized.
    """
    n_rt = block_cols.shape[0]
    blk_rc, vals = _blocked_to_stream_arrays(block_cols, block_vals)
    stream = StreamBlocks(blk_rc=blk_rc, vals=vals,
                          nrows=n_rt * bm, ncols=x.shape[0], bm=bm, bk=bk)
    return stream_spmm(stream, x, precision="highest")
