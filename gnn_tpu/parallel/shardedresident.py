"""Mesh-sharded resident graph: the lite minibatch path at scales where
one chip cannot hold the resident state.

The resident-lite format (`gnn_tpu.ops.residentgraph`) keeps the hot
dense blocks, the slot table, and the row-value vector in HBM and ships
~2 MB/step. Replicated, that state is O(N + K^2) per chip: fine at
Reddit scale, impossible at MAG240M scale (slot table + row_val alone
are ~1.2 GB, and a K=131072 bf16 hot block is 32 GB — past a single
v5e's 16 GB). This module shards that state over the hybrid mesh's
``part`` axis (`gnn_tpu.parallel.multihost.make_hybrid_mesh`) so the
per-chip footprint divides by P while the batch stays data-parallel
over the ``data`` axis:

* ``slot_of_node`` / ``row_val`` shard by NODE RANGES (node v lives on
  part ``v // nsh``). Lookups become a local masked gather + one
  ``psum`` of the [nrows]-sized result over ``part`` — each id is owned
  by exactly one part, so the sum IS the lookup (the classic sharded-
  embedding gather; rides ICI).
* The hot blocks shard by SLOT COLUMNS: part p holds
  ``D[:, lo:hi]`` and ``D^T[:, lo:hi]`` (= ``D[lo:hi, :]^T``), each
  ``[k, k/P]``. The row-compacted hot matmul
  (`gnn_tpu.ops.hotdense.hot_forward`) then contracts only the local
  slot range — ``D[:, lo:hi][prs] @ (x[colpos[lo:hi]] * nf[lo:hi])`` —
  and ONE psum of the ``[rh_pad, F]`` partial restores the full
  product: FLOPs, block HBM and the slot-space gather all divide by P.
  The backward is symmetric through ``D^T``'s shards.
* The cold COO residual (~2 ms of segment-sum) and all k-sized
  plumbing are computed replicated across ``part`` — they are noise
  next to the matmul and replicating them avoids a second collective.

Gradients stay correct with NO trainer math changes beyond axis scope:
the hot psum makes every part's layer output (and hence loss and
grads) bit-identical across ``part``, so the gradient psum spans only
the data axis (`train/trainer.py:build_step_fns(part_axis=...)`).

This is the minibatch analog of the full-graph halo partitioning
(`gnn_tpu/parallel/halo.py`), playing the role multi-GPU feature/graph
partitioning plays in the reference (`/root/reference/main.py:291-297`
spreads state across ranks because one GPU cannot hold it) — but over
a compiled SPMD mesh with XLA collectives instead of NCCL peer copies.

Full-expansion mode (``resident_ship_cold=False`` — zero per-edge
payload, the right mode for low-degree graphs) additionally shards the
CSR BY ROW RANGES: part p holds the indptr/indices/data of its owned
node range, rebased to local offsets and padded to the max shard nnz.
Each part expands only the spans of rows it owns (others get degree 0),
builds its partial cold COO, and the cold aggregation output is summed
with one psum over ``part`` — every edge is owned by exactly one part
(its row's owner), so the sum is exact. Per-chip CSR HBM divides by P.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from gnn_tpu.ops.hotdense import HotSpec
from gnn_tpu.ops.residentgraph import rank1_values
from gnn_tpu.parallel.multihost import PART_AXIS


@struct.dataclass
class ShardedResidentGraph:
    """Per-device view (inside shard_map) of the part-sharded resident
    state. Drop-in for :class:`~gnn_tpu.ops.residentgraph.ResidentGraph`
    in `materialize_adjs`: it exposes the same lookup interface, and the
    :class:`HotDenseAdj` it yields carries ``part_axis`` so the hot
    matmuls run the partial-psum path."""

    slot_shard: jnp.ndarray     # int32 [nsh]: slots of nodes in my range
    row_val_shard: jnp.ndarray  # f32 [nsh]
    col_val_shard: jnp.ndarray  # f32 [nsh] (rank-1 column factors)
    dense: jnp.ndarray          # [k, ksh] slot-column shard of D
    dense_t: jnp.ndarray        # [k, ksh] slot-column shard of D^T
    n: int = struct.field(pytree_node=False)
    k: int = struct.field(pytree_node=False)
    nsh: int = struct.field(pytree_node=False)
    part_axis: str = struct.field(pytree_node=False, default=PART_AXIS)
    col_trivial: bool = struct.field(pytree_node=False, default=True)
    # row-range CSR shards for full-expansion mode (None in lite mode —
    # the measured-fastest path needs no device CSR at all). Local
    # offsets: ``row_ptr_shard[i]`` indexes into ``col_idx_shard``.
    row_ptr_shard: Optional[jnp.ndarray] = None  # int32 [nsh + 1]
    col_idx_shard: Optional[jnp.ndarray] = None  # int32 [esh_pad]
    val_shard: Optional[jnp.ndarray] = None      # f32/bf16 [esh_pad]

    def _owned(self, ids: jnp.ndarray):
        lo = jax.lax.axis_index(self.part_axis) * self.nsh
        loc = ids.astype(jnp.int32) - lo
        ok = (loc >= 0) & (loc < self.nsh)
        return ok, jnp.clip(loc, 0, self.nsh - 1)

    def slot_lookup(self, ids: jnp.ndarray) -> jnp.ndarray:
        """psum-gather of hot slots (-1 = cold or out of range). The
        owner contributes slot+1 (>= 0), everyone else 0; ids past
        every shard (the pad id ``n``) sum to 0 -> -1, matching the
        replicated table's mode='fill' semantics."""
        ok, loc = self._owned(ids)
        v = jnp.where(ok, jnp.take(self.slot_shard, loc) + 1, 0)
        return jax.lax.psum(v, self.part_axis) - 1

    def rowval_lookup(self, ids: jnp.ndarray) -> jnp.ndarray:
        ok, loc = self._owned(ids)
        v = jnp.where(ok, jnp.take(self.row_val_shard, loc), 0.0)
        return jax.lax.psum(v, self.part_axis)

    def colval_lookup(self, ids: jnp.ndarray) -> jnp.ndarray:
        ok, loc = self._owned(ids)
        v = jnp.where(ok, jnp.take(self.col_val_shard, loc), 0.0)
        return jax.lax.psum(v, self.part_axis)

    def csr_spans(self, ids: jnp.ndarray):
        """Per-id ``(start, degree)`` into this part's LOCAL CSR shard
        (full-expansion mode). Degree 0 for every id this part does not
        own — including the pad id ``n`` — so the span expansion visits
        each graph row on exactly one part."""
        ok, loc = self._owned(ids)
        lo = jnp.take(self.row_ptr_shard, loc, mode="clip")
        hi = jnp.take(self.row_ptr_shard, loc + 1, mode="clip")
        return jnp.where(ok, lo, 0), jnp.where(ok, hi - lo, 0)


def local_shard(g_stacked) -> "ShardedResidentGraph":
    """Strip the leading length-1 axis shard_map leaves on every array
    leaf (the host stacks shards on axis 0; in_spec P(part) splits it)."""
    return jax.tree_util.tree_map(lambda a: a[0], g_stacked)


def _csr_row_shards(indptr, indices, data, n_parts: int, nsh: int):
    """Row-range CSR shards, stacked on a leading part axis: per-part
    LOCAL indptr ([nsh+1] int32, rebased to 0, constant past the owned
    range so padded-tail node ids read degree 0) + indices/data padded
    to the max shard nnz (multiple of 128)."""
    n = len(indptr) - 1
    indptr = np.asarray(indptr, np.int64)
    rp = np.zeros((n_parts, nsh + 1), np.int32)
    nnzs = []
    for p in range(n_parts):
        lo, hi = p * nsh, min((p + 1) * nsh, n)
        seg = (indptr[lo:hi + 1] - indptr[lo] if hi > lo
               else np.zeros(1, np.int64))
        rp[p, : len(seg)] = seg
        rp[p, len(seg):] = seg[-1]
        nnzs.append(int(seg[-1]))
    esh = ((max(max(nnzs), 1) + 127) // 128) * 128
    ci = np.zeros((n_parts, esh), np.int32)
    vv = np.zeros((n_parts, esh), np.asarray(data).dtype)
    for p in range(n_parts):
        lo, hi = p * nsh, min((p + 1) * nsh, n)
        if hi > lo:
            a, b = int(indptr[lo]), int(indptr[hi])
            ci[p, : b - a] = indices[a:b]
            vv[p, : b - a] = data[a:b]
    return rp, ci, vv


def shard_resident_state(rg: dict, n_parts: int, axis: str = PART_AXIS,
                         ship_csr: bool = False
                         ) -> "ShardedResidentGraph":
    """Convert a `build_resident_graph` host dict into stacked part
    shards (the Trainer-facing entry: the dict already carries the slot
    table, row values and dense blocks). The CSR members (row_ptr/
    col_idx/val) are dropped unless ``ship_csr`` — lite mode (the
    measured-fastest path) needs no device CSR; full-expansion mode
    (``resident_ship_cold=False``) reads row-range shards of it."""
    n, k = int(rg["n"]), int(rg["k"])
    if k % n_parts:
        raise ValueError(f"hot slot count k={k} (a multiple of 128) "
                         f"must divide by n_parts={n_parts}")
    ksh = k // n_parts
    nsh = -(-n // n_parts)
    slot = np.full(n_parts * nsh, -1, np.int32)
    slot[:n] = np.asarray(rg["slot_of_node"], np.int32)
    rvp = np.zeros(n_parts * nsh, np.float32)
    rvp[:n] = np.asarray(rg["row_val"], np.float32)
    cvp = np.zeros(n_parts * nsh, np.float32)
    cvp[:n] = np.asarray(rg.get("col_val", np.ones(n)), np.float32)
    d = np.asarray(rg["dense"])
    dt = np.asarray(rg["dense_t"])
    csr_kw = {}
    if ship_csr:
        rp, ci, vv = _csr_row_shards(rg["row_ptr"], rg["col_idx"],
                                     rg["val"], n_parts, nsh)
        csr_kw = dict(row_ptr_shard=rp, col_idx_shard=ci, val_shard=vv)
    return ShardedResidentGraph(
        slot_shard=slot.reshape(n_parts, nsh),
        row_val_shard=rvp.reshape(n_parts, nsh),
        col_val_shard=cvp.reshape(n_parts, nsh),
        dense=np.stack([d[:, p * ksh:(p + 1) * ksh]
                        for p in range(n_parts)]),
        dense_t=np.stack([dt[:, p * ksh:(p + 1) * ksh]
                          for p in range(n_parts)]),
        n=n, k=k, nsh=nsh, part_axis=axis,
        col_trivial=bool(rg.get("col_trivial", True)), **csr_kw)


def build_sharded_resident(lap: sp.csr_matrix, spec: HotSpec, dense,
                           dense_t, n_parts: int, axis: str = PART_AXIS,
                           ship_csr: bool = False):
    """Host-side stacked shards (leading axis = part, for in_spec
    ``P(axis)``) + the statics. ``dense``/``dense_t`` from
    ``build_hot_dense``. Returns a :class:`ShardedResidentGraph` whose
    array leaves are the stacked ``[P, ...]`` numpy arrays — pass it
    through ``jax.device_put`` with a ``P(axis)`` sharding (or straight
    into a jitted shard_map) and call :func:`local_shard` inside."""
    n = int(lap.shape[0])
    k = int(spec.k)
    if k % n_parts:
        raise ValueError(f"hot slot count k={k} (a multiple of 128) "
                         f"must divide by n_parts={n_parts}")
    ksh = k // n_parts
    nsh = -(-n // n_parts)
    slot = np.full(n_parts * nsh, -1, np.int32)
    slot[:n] = spec.slot_of_node
    rv, cv, col_trivial, ok = rank1_values(lap.tocsr())
    rvp = np.zeros(n_parts * nsh, np.float32)
    rvp[:n] = rv
    cvp = np.zeros(n_parts * nsh, np.float32)
    cvp[:n] = cv
    d = np.asarray(dense)
    dt = np.asarray(dense_t)
    csr_kw = {}
    if ship_csr:
        csr = lap.tocsr()
        csr.sort_indices()
        rp, ci, vv = _csr_row_shards(csr.indptr, csr.indices,
                                     csr.data.astype(np.float32),
                                     n_parts, nsh)
        csr_kw = dict(row_ptr_shard=rp, col_idx_shard=ci, val_shard=vv)
    return ShardedResidentGraph(
        slot_shard=slot.reshape(n_parts, nsh),
        row_val_shard=rvp.reshape(n_parts, nsh),
        col_val_shard=cvp.reshape(n_parts, nsh),
        dense=np.stack([d[:, p * ksh:(p + 1) * ksh]
                        for p in range(n_parts)]),
        dense_t=np.stack([dt[:, p * ksh:(p + 1) * ksh]
                          for p in range(n_parts)]),
        n=n, k=k, nsh=nsh, part_axis=axis,
        col_trivial=col_trivial, **csr_kw), ok
