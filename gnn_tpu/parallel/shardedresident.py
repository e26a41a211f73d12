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

Round-3 scope note: full-expansion mode (rebuilding cold edges from a
device CSR) would additionally need the CSR sharded by row ranges; the
lite path — the measured-fastest path — needs no device CSR at all.
"""
from __future__ import annotations

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


def local_shard(g_stacked) -> "ShardedResidentGraph":
    """Strip the leading length-1 axis shard_map leaves on every array
    leaf (the host stacks shards on axis 0; in_spec P(part) splits it)."""
    return jax.tree_util.tree_map(lambda a: a[0], g_stacked)


def shard_resident_state(rg: dict, n_parts: int,
                         axis: str = PART_AXIS) -> "ShardedResidentGraph":
    """Convert a `build_resident_graph` host dict into stacked part
    shards (the Trainer-facing entry: the dict already carries the slot
    table, row values and dense blocks). The CSR members (row_ptr/
    col_idx/val) are dropped — the sharded path is lite-mode only and
    needs no device CSR (see module docstring)."""
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
    return ShardedResidentGraph(
        slot_shard=slot.reshape(n_parts, nsh),
        row_val_shard=rvp.reshape(n_parts, nsh),
        col_val_shard=cvp.reshape(n_parts, nsh),
        dense=np.stack([d[:, p * ksh:(p + 1) * ksh]
                        for p in range(n_parts)]),
        dense_t=np.stack([dt[:, p * ksh:(p + 1) * ksh]
                          for p in range(n_parts)]),
        n=n, k=k, nsh=nsh, part_axis=axis,
        col_trivial=bool(rg.get("col_trivial", True)))


def build_sharded_resident(lap: sp.csr_matrix, spec: HotSpec, dense,
                           dense_t, n_parts: int, axis: str = PART_AXIS):
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
    return ShardedResidentGraph(
        slot_shard=slot.reshape(n_parts, nsh),
        row_val_shard=rvp.reshape(n_parts, nsh),
        col_val_shard=cvp.reshape(n_parts, nsh),
        dense=np.stack([d[:, p * ksh:(p + 1) * ksh]
                        for p in range(n_parts)]),
        dense_t=np.stack([dt[:, p * ksh:(p + 1) * ksh]
                          for p in range(n_parts)]),
        n=n, k=k, nsh=nsh, part_axis=axis,
        col_trivial=col_trivial), ok
