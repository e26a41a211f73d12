"""Device-resident feature cache with all-to-all halo exchange.

TPU-native replacement for the reference's input-assembly loop
(`/root/reference/main.py:129-134`), which reads rows from every GPU's
buffer peer-to-peer (`gpu_buffers[i][idx].to(device)`) plus host RAM.

Design:

* Each device holds its placement-assigned feature buffer in HBM: the
  stacked ``[num_devs, per_dev, F]`` array is sharded on its leading axis
  over the ``data`` mesh (one slice per chip). This is the analog of
  `preprocess.py:397-399`'s per-GPU buffers.

* Per minibatch, the **host** builds a gather plan from the placement maps
  (`Placement.device_id_of_nodes` / ``idx_of_nodes_on_device``): for every
  (requesting rank r, owning device o) pair, the buffer slots o must read
  and the positions in r's input tensor they land in; host-resident rows
  (owner == -1) are gathered from host RAM into a padded block.

* On device (inside ``shard_map``), each chip gathers the rows *all* peers
  requested from its local buffer slice and a single
  ``jax.lax.all_to_all`` over ICI delivers them — replacing the
  reference's num_devs² point-to-point copies with one XLA collective
  that the compiler can overlap with compute. Host rows ride in with the
  sharded plan (one `device_put` per step, like `main.py:134`'s
  non-blocking H2D copy).

A `ReplicatedFeatures` source (whole table in HBM on every chip, gather by
node id) is the fast path when the feature table fits per-chip.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gnn_tpu.parallel.mesh import DATA_AXIS
from gnn_tpu.placement.engine import Placement
from gnn_tpu.sampling.ladies import MiniBatch, bucket_size


class ReplicatedFeatures:
    """Whole feature table resident (replicated) in every chip's HBM.

    ``dtype=jnp.bfloat16`` stores the table compressed: halves HBM
    residency and the gather's HBM read bytes (the gather is
    bandwidth-bound); rows are cast back to f32 right after the gather
    (a register-level op XLA fuses), so downstream math is unchanged
    apart from one rounding of the features at rest."""

    def __init__(self, feats: np.ndarray, dtype=np.float32):
        self.dtype = np.dtype(dtype)
        self.feats = np.asarray(feats, self.dtype)

    def state(self):
        return jnp.asarray(self.feats)

    def state_spec(self):
        from jax.sharding import PartitionSpec as P
        return P()

    def plan(self, mb: MiniBatch, pooled: bool = True):
        return ()

    def gather(self, state, plan, input_nodes, input_mask):
        x = jnp.take(state, input_nodes, axis=0).astype(jnp.float32)
        return x * input_mask[:, None]

    def host_gather(self, input_nodes, input_mask):
        """Host-side gather for (single-replica) evaluation."""
        x = self.feats[input_nodes].astype(np.float32)
        return x * input_mask[:, None]


class PartShardedFeatures:
    """Feature table sharded by NODE RANGES over the hybrid mesh's
    ``part`` axis — the feature-side companion of the part-sharded
    resident graph (`gnn_tpu.parallel.shardedresident`), for tables
    that do not fit one chip (MAG240M: 244M x 768 f16 is ~350 GB).

    Each part holds rows ``[p*nsh, (p+1)*nsh)``; with the batch
    replicated over ``part`` (``Trainer(resident_parts=N)``), a gather
    is a local masked take + one psum over ``part`` — every row has
    exactly one owner, so the sum IS the gather, and per-chip feature
    HBM and gather read-bytes divide by P. Unlike
    :class:`CachedFeatures` this needs no placement, no plan and no
    host fallback rows — the whole table is on the mesh.

    ICI cost note (unmeasurable on this 1-chip rig): the psum moves the
    full ``[C, F]`` gather result over the ring even though each chip
    contributes mostly zeros — per layer-0 gather that is C*F*4 bytes
    * 2(P-1)/P per hop-direction (canonical shapes: 25088 x 602 f32 ~
    60 MB, ~0.9 ms at 2*45 GB/s v5e ICI twice per step incl. the VJP).
    An `all_to_all` that ships only owned rows plus an index shuffle
    would move ~1/P of that; it needs a per-step routing plan like
    :class:`CachedFeatures.plan`. Switch if profiles on real multi-chip
    hardware show this psum on the critical path — below ~8 chips the
    simplicity is worth ~1-2 ms/step of hideable ICI time."""

    def __init__(self, feats: np.ndarray, n_parts: int,
                 axis: str = "part", dtype=np.float32):
        self.dtype = np.dtype(dtype)
        self.feats = np.asarray(feats, self.dtype)  # host copy (eval)
        n, f = self.feats.shape
        self.n_parts = int(n_parts)
        self.axis = axis
        self.nsh = -(-n // self.n_parts)
        stack = np.zeros((self.n_parts, self.nsh, f), self.dtype)
        stack.reshape(-1, f)[:n] = self.feats
        self._stack = stack

    def state(self):
        return jnp.asarray(self._stack)

    def state_spec(self):
        from jax.sharding import PartitionSpec as P
        return P(self.axis)

    def plan(self, mb: MiniBatch, pooled: bool = True):
        return ()

    def gather(self, state, plan, input_nodes, input_mask):
        shard = state[0]  # in_spec P(part) leaves a length-1 lead axis
        lo = jax.lax.axis_index(self.axis) * self.nsh
        loc = input_nodes.astype(jnp.int32) - lo
        ok = (loc >= 0) & (loc < self.nsh)
        rows = jnp.take(shard, jnp.clip(loc, 0, self.nsh - 1), axis=0)
        x = jnp.where(ok[:, None], rows.astype(jnp.float32), 0.0)
        x = jax.lax.psum(x, self.axis)
        return x * input_mask[:, None]

    def host_gather(self, input_nodes, input_mask):
        x = self.feats[input_nodes].astype(np.float32)
        return x * input_mask[:, None]


@struct.dataclass
class PartGatherPlan:
    """Per-step plan for :class:`PartCachedFeatures`: canonical owner +
    buffer slot per input id (host-built from the placement maps) and
    the host-fallback rows. Leaves carry a leading data-parallel rank
    axis, sharded like the batch (replicated over ``part``)."""

    owner: jnp.ndarray      # int32 [ws, C]; owning part, -1 = host
    slot: jnp.ndarray       # int32 [ws, C]; buffer slot on that part
    host_rows: jnp.ndarray  # [ws, H, F]
    host_pos: jnp.ndarray   # int32 [ws, H]; C == dropped


class PartCachedFeatures:
    """Placement-driven feature cache composed with the part-sharded
    resident state (``Trainer(resident_parts=P)``): the two memory
    scalings share the ``part`` axis — the resident slot/row tables and
    hot blocks shard one set of arrays, this class shards the feature
    buffers, so per-chip HBM for BOTH divides by P.

    Layout: the placement's per-device buffers (``preprocess.py:397-399``)
    stack to ``[P, per_dev, F]``, sharded over ``part`` and replicated
    over ``data``. The batch is replicated over ``part`` in this mode, so
    the all_to_all formulation of :class:`CachedFeatures` (which needs a
    distinct request per mesh rank) degenerates; instead each part
    gathers the rows it owns from its local buffer and ONE psum over
    ``part`` assembles the input block — ownership comes from a
    canonical combined map built at setup (the first device whose own
    view holds the node locally), under which every buffered node
    resolves to exactly ONE part, so the sum IS the gather even for
    nodes the placement replicated on several devices. Host-resident
    rows (owner -1) ride in the plan exactly like
    :class:`CachedFeatures`.

    ICI cost note: the psum moves the full ``[C, F]`` block per hop
    (C*F*4 bytes; ~60 MB at canonical shapes) where a slot-exchange
    all_to_all would move only owned rows (~C*F*4/P). That is the price
    of batch replication over ``part``; at v5e ICI bandwidth (~400 GB/s
    per link) the psum is ~0.15 ms/hop — noise next to the sharded hot
    matmul it composes with. A request-sharded formulation would need
    per-part batches, i.e. a 2-D sampler, which the minibatch pipeline
    does not have."""

    def __init__(self, feats: np.ndarray, placement: Placement,
                 axis: str = "part", dtype=np.float32,
                 remote_bucket_min: int = 256):
        self.dtype = np.dtype(dtype)
        self.feats = np.asarray(feats, self.dtype)
        self.placement = placement
        self.axis = axis
        self.num_devs = placement.num_devs
        per_dev = max(len(b) for b in placement.buffers)
        self.per_dev = per_dev
        stack = np.zeros((self.num_devs, per_dev, self.feats.shape[1]),
                         self.dtype)
        for d, b in enumerate(placement.buffers):
            stack[d, : len(b)] = self.feats[b]
        self._buffer_stack = stack
        self.remote_bucket_min = remote_bucket_min
        self._plan_bufs = {}
        # canonical single-owner map: the first device whose OWN view
        # holds the node locally (``device_id_of_nodes[d, n] == d``).
        # Placement may replicate a node on several devices (greedy's
        # top block) or record it only in its owner's view (pagraph) —
        # this resolves every buffered node to exactly one contributing
        # part, which the psum-gather requires
        did = placement.device_id_of_nodes
        n = did.shape[1]
        local = did == np.arange(self.num_devs)[:, None]
        has = local.any(axis=0)
        self._owner_map = np.where(
            has, np.argmax(local, axis=0), -1).astype(np.int32)
        self._slot_map = placement.idx_of_nodes_on_device[
            np.maximum(self._owner_map, 0), np.arange(n)].astype(np.int32)

    def state(self):
        return jnp.asarray(self._buffer_stack)

    def state_spec(self):
        from jax.sharding import PartitionSpec as P
        return P(self.axis)

    def plan(self, mb: MiniBatch, pooled: bool = True) -> PartGatherPlan:
        """Canonical owner/slot per input id + host rows. Rows are
        independent per DP rank (no cross-rank coupling), so any leading
        width works (training ships ws=dp rows; eval may ship 1).
        ``pooled=False``: fresh output arrays, for callers that keep
        several plans live (grouped dispatch stacks G of them)."""
        import jax
        nodes = np.asarray(mb.input_nodes)
        masks = np.asarray(mb.input_mask)
        ws, C = nodes.shape
        owner = np.where(masks > 0, self._owner_map[nodes], -2)
        slot = np.where(owner >= 0, self._slot_map[nodes],
                        0).astype(np.int32)
        H = bucket_size(max(int((owner == -1).sum(axis=1).max()), 1),
                        self.remote_bucket_min)
        key = (ws, H, self.feats.shape[1])
        bufs = None if not pooled or jax.default_backend() == "cpu" \
            else self._plan_bufs.get(key)
        if bufs is None:
            bufs = (np.empty((ws, H, self.feats.shape[1]), self.dtype),
                    np.empty((ws, H), np.int32))
            bufs[0].fill(0)  # pre-fault once (70 us/page on this host)
            if pooled and jax.default_backend() != "cpu":
                self._plan_bufs[key] = bufs
        host_rows, host_pos = bufs
        host_pos.fill(C)
        for r in range(ws):
            hsel = np.flatnonzero(owner[r] == -1)
            if len(hsel):
                np.take(self.feats, nodes[r, hsel], axis=0,
                        out=host_rows[r, : len(hsel)])
            host_pos[r, : len(hsel)] = hsel
        return PartGatherPlan(owner=owner.astype(np.int32), slot=slot,
                              host_rows=host_rows, host_pos=host_pos)

    def gather(self, state, plan: PartGatherPlan, input_nodes,
               input_mask):
        """Inside shard_map: local buffer shard [1, per_dev, F]; plan
        leaves squeezed to their per-rank row. One psum over ``part``."""
        buf = state[0]
        owner = plan.owner[0]
        slotv = plan.slot[0]
        p = jax.lax.axis_index(self.axis)
        mine = owner == p
        rows = jnp.take(buf, jnp.where(mine, slotv, 0), axis=0)
        x = jnp.where(mine[:, None], rows.astype(jnp.float32), 0.0)
        x = jax.lax.psum(x, self.axis)
        x = x.at[plan.host_pos[0]].set(
            plan.host_rows[0].astype(jnp.float32), mode="drop")
        return x * input_mask[:, None]

    def host_gather(self, input_nodes, input_mask):
        x = self.feats[input_nodes].astype(np.float32)
        return x * input_mask[:, None]


@struct.dataclass
class GatherPlan:
    """Device-facing gather plan for one stacked minibatch.

    ``slot_by_owner[o, r, j]``: the j-th buffer slot device o must read on
    behalf of rank r. ``pos_by_rank[r, o, j]``: where that row lands in
    rank r's input tensor (padded entries point past the end and are
    dropped by XLA scatter semantics). ``host_rows``/``host_pos``: rows
    gathered from host RAM per rank.
    """

    slot_by_owner: jnp.ndarray   # int32 [D, D, R]
    pos_by_rank: jnp.ndarray     # int32 [D, D, R]
    host_rows: jnp.ndarray       # f32 [D, H, F]
    host_pos: jnp.ndarray        # int32 [D, H]


def stack_gather_plans(plans, input_cap: int):
    """Stack per-step :class:`GatherPlan`s (or :class:`PartGatherPlan`s)
    along a new leading (group) axis for multi-step-per-dispatch
    training. Steps may have landed in different remote/host buckets;
    pad to the group max first (pad slots read buffer row 0 and land at
    position ``input_cap`` — one past the input tensor's end, dropped by
    XLA scatter, exactly like the in-plan padding). Callers must build
    the per-step plans with ``pooled=False`` — pooled plan outputs are
    overwritten by the next ``plan()`` call, and the copy here happens
    only after ALL G plans exist."""
    if not plans or plans[0] == ():
        return ()
    if isinstance(plans[0], PartGatherPlan):
        H = max(p.host_pos.shape[-1] for p in plans)

        def pad_h(a, fill):
            if a.shape[1] == H:
                return a
            widths = [(0, 0), (0, H - a.shape[1])] + \
                [(0, 0)] * (a.ndim - 2)
            return np.pad(a, widths, constant_values=fill)

        return PartGatherPlan(
            owner=np.stack([np.asarray(p.owner) for p in plans]),
            slot=np.stack([np.asarray(p.slot) for p in plans]),
            host_rows=np.stack(
                [pad_h(np.asarray(p.host_rows), 0) for p in plans]),
            host_pos=np.stack(
                [pad_h(np.asarray(p.host_pos), input_cap)
                 for p in plans]),
        )

    def pad_last(a, m, fill):
        if a.shape[-1] == m:
            return a
        widths = [(0, 0)] * (a.ndim - 1) + [(0, m - a.shape[-1])]
        return np.pad(a, widths, constant_values=fill)

    R = max(p.slot_by_owner.shape[-1] for p in plans)
    H = max(p.host_pos.shape[-1] for p in plans)

    def pad_rows(hr, m):
        if hr.shape[1] == m:
            return hr
        return np.pad(hr, [(0, 0), (0, m - hr.shape[1]), (0, 0)])

    return GatherPlan(
        slot_by_owner=np.stack(
            [pad_last(np.asarray(p.slot_by_owner), R, 0) for p in plans]),
        pos_by_rank=np.stack(
            [pad_last(np.asarray(p.pos_by_rank), R, input_cap)
             for p in plans]),
        host_rows=np.stack(
            [pad_rows(np.asarray(p.host_rows), H) for p in plans]),
        host_pos=np.stack(
            [pad_last(np.asarray(p.host_pos), H, input_cap) for p in plans]),
    )


class CachedFeatures:
    """Placement-driven sharded HBM cache + host fallback.

    2-D composition (the reference's actual deployment shape — feature
    placement *under* data-parallel training, `main.py:291-297` +
    `preprocess.py:397-399`): on a ``('data', 'part')`` hybrid mesh the
    buffer stack is sharded over ``axis='part'`` (one placement shard per
    chip within an ICI domain) and *replicated* over ``data`` (each DP
    group holds a full copy of the sharded cache), so the heavy per-step
    all_to_all rides ICI and never crosses the DCN data axis. Pass the
    total ``world_size`` (= dp * part ranks); placement ``num_devs``
    must equal the part-axis size, and global rank r maps to part index
    ``r % num_devs`` (row-major mesh order, matching ``put_batch``)."""

    def __init__(self, feats: np.ndarray, placement: Placement,
                 remote_bucket_min: int = 256, axis: str = DATA_AXIS,
                 world_size: Optional[int] = None, dtype=np.float32):
        # dtype=bfloat16 compresses the whole path: the sharded HBM
        # buffers, the all_to_all payload over ICI, and the host-row
        # H2D block all halve; rows are cast to f32 at the scatter
        self.dtype = np.dtype(dtype)
        self.feats = np.asarray(feats, self.dtype)
        self.placement = placement
        self.num_devs = placement.num_devs
        self.axis = axis
        self.world_size = world_size or self.num_devs
        assert self.world_size % self.num_devs == 0, \
            (self.world_size, self.num_devs)
        per_dev = max(len(b) for b in placement.buffers)
        self.per_dev = per_dev
        stack = np.zeros((self.num_devs, per_dev, self.feats.shape[1]),
                         self.dtype)
        for d, b in enumerate(placement.buffers):
            stack[d, : len(b)] = self.feats[b]
        self._buffer_stack = stack
        self.remote_bucket_min = remote_bucket_min
        # padded plan-output buffers, reused across steps (fresh numpy
        # allocations pay ~70 us/page first-touch faults on this host —
        # ~50 ms/step at canonical shapes). Reuse is only safe when
        # device_put COPIES host memory (TPU); the CPU backend can alias
        # numpy buffers zero-copy, so there we allocate fresh.
        self._plan_bufs = {}

    def state(self):
        return jnp.asarray(self._buffer_stack)

    def state_spec(self):
        from jax.sharding import PartitionSpec as P
        return P(self.axis)

    def _get_plan_bufs(self, ws: int, D: int, R: int, H: int,
                       pooled: bool = True):
        """Pooled padded plan outputs (TPU: device_put copies, reuse is
        safe and skips first-touch page faults; CPU: fresh arrays, since
        device_put there can alias numpy memory zero-copy).
        ``pooled=False`` forces fresh arrays — required whenever several
        plans must be live at once (grouped multi-step dispatch stacks G
        plans before shipping; pooling there would alias steps)."""
        import jax
        F = self.feats.shape[1]
        shape_key = (ws, D, R, H, F)
        if not pooled or jax.default_backend() == "cpu":
            return (np.zeros((ws, D, R), np.int32),
                    np.empty((ws, D, R), np.int32),
                    np.empty((ws, H, F), self.dtype),
                    np.empty((ws, H), np.int32))
        bufs = self._plan_bufs.get(shape_key)
        if bufs is None:
            bufs = (np.zeros((ws, D, R), np.int32),
                    np.empty((ws, D, R), np.int32),
                    np.empty((ws, H, F), self.dtype),
                    np.empty((ws, H), np.int32))
            # pre-fault every page once so the steady-state fill never
            # stalls on the kernel (gnn_tpu.parallel.packbuf.BufferPool
            # does the same for the transport staging buffers)
            for b in bufs[1:]:
                b.fill(0)
            self._plan_bufs[shape_key] = bufs
        return bufs

    def plan(self, mb: MiniBatch, pooled: bool = True) -> GatherPlan:
        """Build the padded gather plan on the host (numpy, vectorized).

        Plan leaves carry a leading ``world_size`` axis (sharded like the
        batch); rank ``r = d * part + p`` serves/receives only within its
        DP group ``d``, so each group's sub-plan is an independent copy
        of the 1-D construction.

        One stable argsort per rank groups input positions by owner
        (-2 invalid, -1 host, 0..D-1 devices) — O(ws*C log C) instead of
        the old O(ws*D*C) flatnonzero scans — and the padded outputs are
        pooled + pre-faulted. Measured at D=8 canonical shapes
        (C=25088, F=602): plan machinery ~10 ms per stacked 8-rank
        minibatch (was 56 ms at F=64, far worse at F=602); the host-row
        feature copy adds ~2 ms per % of host-resident inputs — that
        part is the actual data movement (`main.py:134`'s CPU gather),
        not plan overhead. Details in benchmarks/RESULTS.md."""
        D = self.num_devs
        nodes = np.asarray(mb.input_nodes)      # [ws, C]
        masks = np.asarray(mb.input_mask)       # [ws, C]
        ws, C = nodes.shape
        assert ws == self.world_size, (ws, self.world_size)

        p_req = np.arange(ws) % D
        owner = self.placement.device_id_of_nodes[p_req[:, None], nodes]
        owner = np.where(masks > 0, owner, -2)          # [ws, C]
        slot = self.placement.idx_of_nodes_on_device[p_req[:, None],
                                                     nodes]
        order = np.argsort(owner, axis=1, kind="stable")
        # slots in owner-grouped order, one vectorized gather (the
        # per-(rank, owner) groups below are then contiguous slices)
        slot_sorted = np.take_along_axis(slot, order, axis=1)
        flat = (owner + 2) + (np.arange(ws) * (D + 2))[:, None]
        counts = np.bincount(flat.ravel(),
                             minlength=ws * (D + 2)).reshape(ws, D + 2)
        bounds = np.concatenate(
            [np.zeros((ws, 1), np.int64), np.cumsum(counts, axis=1)],
            axis=1)
        R = bucket_size(max(int(counts[:, 2:].max()), 1),
                        self.remote_bucket_min)
        H = bucket_size(max(int(counts[:, 1].max()), 1),
                        self.remote_bucket_min)

        slot_by_owner, pos_by_rank, host_rows, host_pos = \
            self._get_plan_bufs(ws, D, R, H, pooled=pooled)
        # pad semantics: pos_by_rank/host_pos == C -> dropped by the XLA
        # scatter; slot_by_owner pads (zeros, or stale in-range slots
        # from a pooled buffer) are read but their rows land at C and
        # are dropped; host_rows pads are never read (their target is C)
        pos_by_rank.fill(C)
        host_pos.fill(C)
        for r in range(ws):
            d_grp, p = r // D, r % D
            for o in range(D):
                lo, hi = bounds[r, o + 2], bounds[r, o + 3]
                # rank (d_grp, o) serves rank (d_grp, p)'s request
                slot_by_owner[d_grp * D + o, p, : hi - lo] = \
                    slot_sorted[r, lo: hi]
                pos_by_rank[r, o, : hi - lo] = order[r, lo: hi]
            hsel = order[r, bounds[r, 1]: bounds[r, 2]]
            if len(hsel):
                np.take(self.feats, nodes[r, hsel], axis=0,
                        out=host_rows[r, : len(hsel)])
            host_pos[r, : len(hsel)] = hsel
        return GatherPlan(slot_by_owner=slot_by_owner,
                          pos_by_rank=pos_by_rank,
                          host_rows=host_rows, host_pos=host_pos)

    def gather(self, state, plan: GatherPlan, input_nodes, input_mask):
        """Inside shard_map: state [1, per_dev, F] local slice; plan leaves
        squeezed to [D, R] / [H, F] locals. Returns x [C, F]. The
        all_to_all spans only ``self.axis`` (the part group)."""
        local_buf = state[0]                       # [per_dev, F]
        slot_req = plan.slot_by_owner[0]           # [D, R] others' requests
        served = jnp.take(local_buf, slot_req.reshape(-1), axis=0)
        served = served.reshape(slot_req.shape[0], slot_req.shape[1], -1)
        # deliver: after all_to_all, recv[o] = rows owner o fetched for me
        recv = jax.lax.all_to_all(served, self.axis, split_axis=0,
                                  concat_axis=0, tiled=True)
        C = input_nodes.shape[0]
        F = recv.shape[-1]
        x = jnp.zeros((C, F), jnp.float32)
        pos = plan.pos_by_rank[0]                  # [D, R]
        x = x.at[pos.reshape(-1)].set(
            recv.reshape(-1, F).astype(jnp.float32), mode="drop")
        x = x.at[plan.host_pos[0]].set(
            plan.host_rows[0].astype(jnp.float32), mode="drop")
        return x * input_mask[:, None]

    def host_gather(self, input_nodes, input_mask):
        x = self.feats[input_nodes].astype(np.float32)
        return x * input_mask[:, None]
