"""Edge-partitioned distributed aggregation with halo exchange.

The multi-chip scale-out layer (SURVEY.md §5.7/§7-step-8, BASELINE
configs 4-5): the graph's rows are partitioned across the mesh, each chip
owns its nodes' features/activations, and a layer's aggregation
``y = A @ x`` runs as

    y_local = A_intra @ x_local  +  A_halo @ x_halo

where ``x_halo`` (rows owned by other chips that this chip's edges touch
— the *boundary/halo* set) arrives via ONE ``jax.lax.all_to_all`` over
ICI. The local term is issued after the collective so XLA overlaps the
exchange with the intra-partition matmul.

This is the structural analog of the reference paper's feature-cache
remote reads (`/root/reference/main.py:131-132`) lifted from minibatch
gathers to full-graph layer aggregation. The host precomputes the halo
plan once per partition (it depends only on graph structure).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from gnn_tpu.parallel.mesh import DATA_AXIS


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class HaloPlan:
    """Device-resident halo-exchange plan + partitioned adjacency.

    All leaves carry a leading ``[D]`` device axis (shard with
    ``P('data')``). For each chip d:

    - ``intra`` — COO of edges whose source is local, cols indexing the
      local x slab.
    - ``halo`` — COO of edges whose source is remote, cols indexing the
      received halo buffer (concatenated per-owner segments).
    - ``send_idx[d, o, j]`` — local row j that chip d must send to chip o.
    - ``n_local`` — rows per chip (padded, same everywhere).
    """

    intra_rows: jnp.ndarray   # int32 [D, nnz_i]
    intra_cols: jnp.ndarray   # int32 [D, nnz_i]
    intra_vals: jnp.ndarray   # f32 [D, nnz_i]
    halo_rows: jnp.ndarray    # int32 [D, nnz_h]
    halo_cols: jnp.ndarray    # int32 [D, nnz_h]
    halo_vals: jnp.ndarray    # f32 [D, nnz_h]
    send_idx: jnp.ndarray     # int32 [D, D, H] rows to send to each peer
    send_mask: jnp.ndarray    # f32 [D, D, H]
    n_local: int = struct.field(pytree_node=False)
    halo_width: int = struct.field(pytree_node=False)


def build_halo_plan(adj: sp.csr_matrix, num_devs: int,
                    pad_multiple: int = 8) -> Tuple[HaloPlan, np.ndarray]:
    """Partition rows contiguously across ``num_devs`` chips and build the
    exchange plan. Returns (plan, owner_of_node)."""
    n = adj.shape[0]
    n_local = _round_up((n + num_devs - 1) // num_devs, pad_multiple)
    owner = np.minimum(np.arange(n) // n_local, num_devs - 1)

    coo = adj.tocoo()
    e_owner = owner[coo.row]
    intra: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    halo_parts = []
    # per (dest d, owner o): which of o's local rows d needs
    need: List[List[np.ndarray]] = [[None] * num_devs
                                    for _ in range(num_devs)]
    for d in range(num_devs):
        mine = e_owner == d
        r = coo.row[mine] - d * n_local
        c = coo.col[mine]
        v = coo.data[mine].astype(np.float32)
        c_owner = owner[c]
        local = c_owner == d
        intra.append((r[local].astype(np.int32),
                      (c[local] - d * n_local).astype(np.int32),
                      v[local]))
        rem_r, rem_c, rem_v, rem_o = (r[~local], c[~local], v[~local],
                                      c_owner[~local])
        # halo columns: unique remote nodes, grouped by owner
        halo_parts.append((rem_r, rem_c, rem_v, rem_o))
        for o in range(num_devs):
            sel = rem_c[rem_o == o]
            need[d][o] = np.unique(sel) - o * n_local

    H = max(1, max((len(need[d][o]) for d in range(num_devs)
                    for o in range(num_devs)), default=1))
    H = _round_up(H, 8)
    send_idx = np.zeros((num_devs, num_devs, H), np.int32)
    send_mask = np.zeros((num_devs, num_devs, H), np.float32)
    for d in range(num_devs):
        for o in range(num_devs):
            ids = need[d][o]
            # chip o sends these local rows to chip d
            send_idx[o, d, : len(ids)] = ids
            send_mask[o, d, : len(ids)] = 1.0

    # remap halo edge columns into the received buffer layout:
    # recv buffer on chip d = [owner 0 segment | owner 1 segment | ...],
    # each segment H wide
    halo = []
    for d in range(num_devs):
        rem_r, rem_c, rem_v, rem_o = halo_parts[d]
        new_c = np.empty(len(rem_c), np.int64)
        for o in range(num_devs):
            sel = rem_o == o
            lut_ids = need[d][o]
            pos = np.searchsorted(lut_ids, rem_c[sel] - o * n_local)
            new_c[sel] = o * H + pos
        halo.append((rem_r.astype(np.int32), new_c.astype(np.int32),
                     rem_v))

    nnz_i = _round_up(max(1, max(len(t[0]) for t in intra)), 8)
    nnz_h = _round_up(max(1, max(len(t[0]) for t in halo)), 8)

    def pad_stack(parts, width):
        rr = np.zeros((num_devs, width), np.int32)
        cc = np.zeros((num_devs, width), np.int32)
        vv = np.zeros((num_devs, width), np.float32)
        for d, (r, c, v) in enumerate(parts):
            rr[d, : len(r)] = r
            cc[d, : len(c)] = c
            vv[d, : len(v)] = v
        return rr, cc, vv

    ir, ic, iv = pad_stack(intra, nnz_i)
    hr, hc, hv = pad_stack(halo, nnz_h)
    plan = HaloPlan(intra_rows=ir, intra_cols=ic, intra_vals=iv,
                    halo_rows=hr, halo_cols=hc, halo_vals=hv,
                    send_idx=send_idx, send_mask=send_mask,
                    n_local=int(n_local), halo_width=int(H))
    return plan, owner


def halo_spmm_local(plan_local, x_local: jnp.ndarray,
                    axis=DATA_AXIS) -> jnp.ndarray:
    """One chip's view (inside shard_map): exchange halo rows, then
    aggregate. ``plan_local`` leaves are the [1, ...] shards.

    The all-to-all is issued before the intra matmul so XLA can overlap
    the ICI transfer with local compute. ``axis`` may be a tuple of mesh
    axis names — on a hybrid ('data', 'part') mesh the partition spans
    both (row-major), so intra-host peers exchange over ICI and only the
    partition boundary that crosses hosts touches DCN.
    """
    send_idx = plan_local.send_idx[0]           # [D, H]
    send_mask = plan_local.send_mask[0]         # [D, H]
    served = jnp.take(x_local, send_idx.reshape(-1), axis=0)
    served = served.reshape(send_idx.shape[0], send_idx.shape[1], -1)
    served = served * send_mask[..., None]
    # recv[o] = rows owner o sent to me
    halo_x = jax.lax.all_to_all(served, axis, split_axis=0,
                                concat_axis=0, tiled=True)
    halo_x = halo_x.reshape(-1, x_local.shape[-1])   # [D*H, F]

    n_local = x_local.shape[0]
    y_intra = jax.ops.segment_sum(
        jnp.take(x_local, plan_local.intra_cols[0], axis=0)
        * plan_local.intra_vals[0][:, None],
        plan_local.intra_rows[0], num_segments=n_local)
    y_halo = jax.ops.segment_sum(
        jnp.take(halo_x, plan_local.halo_cols[0], axis=0)
        * plan_local.halo_vals[0][:, None],
        plan_local.halo_rows[0], num_segments=n_local)
    return y_intra + y_halo


def make_distributed_spmm(mesh, plan: HaloPlan):
    """jit-ready ``y = A @ x`` over the mesh: x, y sharded [D, n_local, F]."""
    from jax.sharding import PartitionSpec as P

    def f(plan_dev, x):
        return halo_spmm_local(plan_dev, x[0])[None]

    return jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False))


def partition_features(feats: np.ndarray, owner: np.ndarray,
                       num_devs: int, n_local: int) -> np.ndarray:
    """Stack node features into the [D, n_local, F] sharded layout."""
    out = np.zeros((num_devs, n_local, feats.shape[1]), feats.dtype)
    for d in range(num_devs):
        mine = np.flatnonzero(owner == d)
        out[d, : len(mine)] = feats[mine]
    return out
