"""Pallas TPU SDDMM: sampled dense-dense matrix multiplication.

``out[r, c] = (X @ Y^T)[r, c]`` evaluated only on the occupied tiles of a
sparsity pattern — the companion op to the streaming SpMM
(`gnn_tpu.ops.pallas_spmm`) for edge-score models (attention-style GNNs,
link scoring): edge logits are dot products of endpoint embeddings, and
materializing the full R x C score matrix is exactly what a sampled
pattern avoids.

Same layout contract as the SpMM stream: tiles sorted by row-tile, packed
``(row_tile << 16) | col_tile`` ids via scalar prefetch, one MXU matmul
per occupied tile. Output is the tile stream ``[NB, bm, bk]`` (mask it
with the pattern's value tiles to zero non-edges — kept separate so the
dense tile can also feed a tile-local softmax).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnn_tpu.ops.pallas_spmm import MAX_STREAM_BLOCKS, StreamBlocks


def _sddmm_kernel(blk_rc_ref, x_ref, yt_ref, out_ref, *, precision):
    out_ref[0] = jnp.dot(x_ref[:], yt_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=precision).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bk", "precision"))
def stream_sddmm(blk_rc: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                 bm: int = 128, bk: int = 128,
                 precision: str = "highest") -> jnp.ndarray:
    """Per-tile scores ``[NB, bm, bk]`` of ``X @ Y^T`` on occupied tiles.

    ``x``: [R, F] row embeddings; ``y``: [C, F] col embeddings;
    ``blk_rc``: int32 [NB] packed tile ids (same format as
    :class:`~gnn_tpu.ops.pallas_spmm.StreamBlocks`).
    """
    nb = blk_rc.shape[0]
    if nb > MAX_STREAM_BLOCKS:
        raise ValueError(f"stream of {nb} tiles exceeds SMEM capacity")
    R, F = x.shape
    C, F2 = y.shape
    assert F == F2
    yt = y.T  # [F, C]

    kernel = functools.partial(_sddmm_kernel,
                               precision=jax.lax.Precision(precision))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bm, F), lambda j, rc: (rc[j] >> 16, 0)),
            pl.BlockSpec((F, bk), lambda j, rc: (0, rc[j] & 0xFFFF)),
        ],
        out_specs=pl.BlockSpec((1, bm, bk), lambda j, rc: (j, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bm, bk), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * bm * bk * F,
            bytes_accessed=(nb * (bm + bk) * F * x.dtype.itemsize
                            + nb * bm * bk * x.dtype.itemsize),
            transcendentals=0),
    )(blk_rc, x, yt)


def sddmm_reference(blk_rc, x, y, bm: int = 128, bk: int = 128):
    """jnp oracle: gather tiles of X @ Y^T (for tests / CPU)."""
    rt = blk_rc >> 16
    ct = blk_rc & 0xFFFF
    xt = x.reshape(-1, bm, x.shape[-1])
    yt = y.reshape(-1, bk, y.shape[-1])
    xs = jnp.take(xt, rt, axis=0)          # [NB, bm, F]
    ys = jnp.take(yt, ct, axis=0)          # [NB, bk, F]
    return jnp.einsum("nmf,nkf->nmk", xs, ys,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def masked_edge_scores(stream: StreamBlocks, x, y,
                       precision: str = "highest"):
    """Edge scores on the pattern of an existing SpMM stream: dense tile
    scores multiplied by the pattern's 0/1 occupancy, returned in the
    same StreamBlocks layout (drop-in A for :func:`stream_spmm` — an
    attention-weighted aggregation is ``spmm(scores, v)``)."""
    scores = stream_sddmm(stream.blk_rc, x, y, stream.bm, stream.bk,
                          precision)
    mask = (stream.vals != 0).astype(scores.dtype)
    return StreamBlocks(blk_rc=stream.blk_rc, vals=scores * mask,
                        nrows=stream.nrows, ncols=stream.ncols,
                        bm=stream.bm, bk=stream.bk)
