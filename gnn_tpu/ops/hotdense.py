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
  on device (XLA scatter measured 10x too slow).

* LADIES samples nodes by probability, so edges concentrate on the hot
  nodes: the top-K nodes by ``sample_prob`` cover 73/82/88% of minibatch
  edges at K = 8K/16K/32K (measured). So keep ``D = lap[H][:, H]`` — the
  dense adjacency among the K hottest nodes — **resident in HBM**,
  refreshed never (it depends only on the graph), and decompose each
  sampled layer as::

      y = D-part + cold-part
      D-part:  xh[s]  = x[colpos[s]] * nf[colpos[s]]   (gather to hot slots)
               yh     = D @ xh                          (one MXU matmul)
               y     += yh[row_slot[r]] for hot rows r  (gather back)
      cold:    COO segment-sum over the 12-27% residual edges

  The per-step H2D payload is only the cold COO + four tiny index/weight
  vectors; the LADIES edge weight ``lap_val(row, col) * normfact[col]``
  factorizes exactly as ``D[sr, sc] * nfh[sc]`` because the row factor
  (1/deg_full, `cuda_spmm.cu:800`) lives in the laplacian data already.

* Backward is symmetric: ``dx = D^T-part + cold^T-part`` with the roles
  of ``rowpos``/``colpos`` swapped — no transpose of D is materialized
  (``dot_general`` contracts the other dimension).

The resident block is NOT a leaf of the shipped batch: it is bound into
the adjacency pytree *inside* the jitted step (:func:`bind_dense`), so
``device_put`` of a minibatch never touches it.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

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
                    dtype=np.float32) -> np.ndarray:
    """Materialize the resident ``[k, k]`` dense block ``lap[H][:, H]``.

    Computed once at setup (the laplacian never changes); ~1 GB f32 at
    K = 16384 — well within a v5e's 16 GB HBM next to the model.
    """
    sub = lap[spec.hot_nodes, :][:, spec.hot_nodes].tocoo()
    d = np.zeros((spec.k, spec.k), dtype)
    d[sub.row, sub.col] = sub.data.astype(dtype)
    return d


@struct.dataclass
class HotDenseAdj:
    """One sampled layer split into resident-hot + shipped-cold parts.

    Local index spaces match :class:`~gnn_tpu.ops.sparse.COOAdj`: rows
    index the layer's output set (``prev``), cols its input set
    (``after``). ``dense`` is ``None`` on the host and bound to the
    resident block inside the jitted step (:func:`bind_dense`).
    """

    # cold residual COO (compressed dtypes; zero-val padding)
    rows: jnp.ndarray          # int16/int32 [nnz_pad]
    cols: jnp.ndarray          # int16/int32 [nnz_pad]
    vals: jnp.ndarray          # bf16/f32 [nnz_pad]
    # hot-slot plumbing
    colpos: jnp.ndarray        # int32 [k]; local col of slot, ncols if absent
    nfh: jnp.ndarray           # f32 [k]; normfact at that col (0 if absent)
    rowpos: jnp.ndarray        # int32 [k]; local row of slot, nrows if absent
    row_slot: jnp.ndarray      # int32 [nrows]; slot of local row (0 pad)
    row_hot: jnp.ndarray       # f32 [nrows]; 1 where local row is hot
    n_valid_rows: jnp.ndarray  # int32 scalar
    n_valid_cols: jnp.ndarray  # int32 scalar
    dense: Optional[jnp.ndarray]  # f32/bf16 [k, k] resident block (bound)
    nrows: int = struct.field(pytree_node=False)
    ncols: int = struct.field(pytree_node=False)
    k: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.nrows, self.ncols)


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
    prev_slots = spec.slot_of_node[prev]            # [n_rows], -1 cold
    after_slots = spec.slot_of_node[after]          # [n_cols]

    colpos = np.full(spec.k, ncols_pad, np.int32)
    nfh = np.zeros(spec.k, np.float32)
    hot_c = np.flatnonzero(after_slots >= 0)
    colpos[after_slots[hot_c]] = hot_c
    nfh[after_slots[hot_c]] = normfact[hot_c]

    rowpos = np.full(spec.k, nrows_pad, np.int32)
    hot_r = np.flatnonzero(prev_slots >= 0)
    rowpos[prev_slots[hot_r]] = hot_r
    row_slot = np.zeros(nrows_pad, np.int32)
    row_hot = np.zeros(nrows_pad, np.float32)
    row_slot[hot_r] = prev_slots[hot_r]
    row_hot[hot_r] = 1.0

    hot_edge = (prev_slots[rows] >= 0) & (after_slots[cols] >= 0)
    cold = ~hot_edge
    cold_coo = sparse_ops.pack_coo(
        rows[cold], cols[cold], vals[cold], n_valid_rows, n_valid_cols,
        nrows_pad, ncols_pad, nnz_pad, compress=compress)

    return HotDenseAdj(
        rows=cold_coo.rows, cols=cold_coo.cols, vals=cold_coo.vals,
        colpos=colpos, nfh=nfh, rowpos=rowpos,
        row_slot=row_slot, row_hot=row_hot,
        n_valid_rows=np.int32(n_valid_rows),
        n_valid_cols=np.int32(n_valid_cols),
        dense=None, nrows=int(nrows_pad), ncols=int(ncols_pad),
        k=spec.k)


def bind_dense(adjs: List[object], dense) -> List[object]:
    """Bind the resident block into every hot layer of a batch's adj list
    (called *inside* the jitted step so the block never ships)."""
    out = []
    for a in adjs:
        if isinstance(a, HotDenseAdj):
            out.append(dataclasses.replace(a, dense=dense))
        else:
            out.append(a)
    return out


def _hot_matmul(dense, xh, precision=None):
    return jnp.dot(dense, xh.astype(dense.dtype),
                   preferred_element_type=jnp.float32,
                   precision=precision)


def hot_forward(adj: HotDenseAdj, x: jnp.ndarray) -> jnp.ndarray:
    """``y = A @ x`` with A = resident hot block + cold COO residual."""
    assert adj.dense is not None, (
        "HotDenseAdj.dense unbound — wrap the adj list with bind_dense() "
        "inside the jitted step")
    # cold residual (chunked segment-sum, bounded memory)
    y = sparse_ops._coo_aggregate(adj.rows, adj.cols, adj.vals, x,
                                  adj.nrows)
    # hot block: gather cols into slot space, one MXU matmul, gather back
    xh = jnp.take(x, adj.colpos, axis=0, mode="fill", fill_value=0)
    xh = xh * adj.nfh[:, None].astype(x.dtype)
    yh = _hot_matmul(adj.dense, xh)
    return y + jnp.take(yh, adj.row_slot, axis=0).astype(x.dtype) \
        * adj.row_hot[:, None].astype(x.dtype)


def hot_transpose(adj: HotDenseAdj, g: jnp.ndarray) -> jnp.ndarray:
    """``dx = A^T @ g`` — the VJP's backward aggregation."""
    assert adj.dense is not None
    dx = sparse_ops._coo_aggregate(adj.cols, adj.rows, adj.vals, g,
                                   adj.ncols)
    gh = jnp.take(g, adj.rowpos, axis=0, mode="fill", fill_value=0)
    # D^T @ gh without materializing the transpose
    dh = jax.lax.dot_general(
        adj.dense, gh.astype(adj.dense.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = dh * adj.nfh[:, None]
    return dx.at[adj.colpos].add(dh.astype(g.dtype), mode="drop")
