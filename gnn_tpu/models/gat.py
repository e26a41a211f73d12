"""Graph attention on sampled minibatches (beyond-reference model family).

Built from this framework's kernel pair: edge logits via SDDMM
(`gnn_tpu.ops.pallas_sddmm`) on the sampled adjacency's occupied tiles,
row-wise masked softmax computed tile-wise (segment max/sum over each
row-tile's tile stream — cheap jnp on [NB, bm, bk]), then aggregation via
the streaming SpMM. A dot-product-attention GAT variant: per head,
``score(r, c) = (q_r . k_c) / sqrt(d)`` restricted to sampled edges.

The reference has no attention model; this demonstrates the framework's
op surface extends past its model family.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_tpu.ops.pallas_spmm import StreamBlocks, stream_spmm
from gnn_tpu.ops import sparse as sparse_ops
from gnn_tpu.ops.pallas_sddmm import sddmm_reference


def _edges_of(adj):
    """``(rows int32, cols int32, live bool)`` of a sampled layer —
    value-carrying :class:`~gnn_tpu.ops.sparse.COOAdj` (live = nonzero
    val) or the pattern-only :class:`~gnn_tpu.ops.sparse.PatternAdj`
    (GAT's resident-class transport: ~2 bytes/edge, rows re-expanded
    from per-row counts on device)."""
    if isinstance(adj, sparse_ops.PatternAdj):
        return adj.expand()
    return (adj.rows.astype(jnp.int32), adj.cols.astype(jnp.int32),
            adj.vals != 0)


def _coo_to_tilewise(adj, bm: int = 128, bk: int = 128):
    """Device-side: occupied-tile ids + per-tile 0/1 masks from a padded
    COO/pattern layer (tile set derived statically is not possible for
    traced edges, so this uses ALL tiles — fine at minibatch scale for
    the jnp path)."""
    n_rt = adj.nrows // bm
    n_ct = adj.ncols // bk
    rt = jnp.repeat(jnp.arange(n_rt, dtype=jnp.int32), n_ct)
    ct = jnp.tile(jnp.arange(n_ct, dtype=jnp.int32), n_rt)
    blk_rc = (rt << 16) | ct
    mask = jnp.zeros((n_rt * n_ct, bm, bk), jnp.float32)
    rows, cols, live = _edges_of(adj)
    tile = (rows // bm) * n_ct + (cols // bk)
    lr = rows % bm
    lc = cols % bk
    mask = mask.at[tile, lr, lc].add(live.astype(jnp.float32))
    return blk_rc, jnp.minimum(mask, 1.0)


def masked_tile_softmax(blk_rc, scores, mask, n_rt):
    """Row-wise softmax over the edge scores of a tile stream.

    ``scores``/``mask``: [NB, bm, bk]; rows are grouped by row-tile
    (``blk_rc >> 16``), so per-row max/sum reduce across each group's
    tiles via segment ops over the (small) NB axis.
    """
    rt = blk_rc >> 16
    neg = jnp.where(mask > 0, scores, -jnp.inf)
    row_max = jax.ops.segment_max(neg.max(axis=2), rt,
                                  num_segments=n_rt)       # [n_rt, bm]
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    shifted = jnp.exp(neg - row_max[rt][:, :, None])
    shifted = jnp.where(mask > 0, shifted, 0.0)
    row_sum = jax.ops.segment_sum(shifted.sum(axis=2), rt,
                                  num_segments=n_rt)       # [n_rt, bm]
    denom = jnp.maximum(row_sum[rt][:, :, None], 1e-20)
    return shifted / denom


# Per-edge chunk width for the scalable attention path: bounds the
# [chunk, n_out] gather temporaries exactly like ops.sparse._COO_CHUNK.
_EDGE_CHUNK = 131_072

# Above this many dense-mask floats per layer, the tile-wise route's
# [n_rt*n_ct, bm, bk] materialization is refused in favor of the
# O(nnz)-memory per-edge route (~256 MB of f32).
_TILE_MASK_LIMIT = 64 * 1024 * 1024


def edge_attention_aggregate(adj, q_pad, k, v, n_heads: int):
    """Scalable multi-head edge-softmax attention over a padded COO or
    pattern-only layer — O(nnz) memory, so GAT trains at samp_num 8192+
    where the tile-mask route would materialize gigabytes.

    Three passes, each chunked under ``lax.scan`` so peak memory is
    [chunk, n_out]:
      1. edge logits  s[e, h] = (q[row_e, h] . k[col_e, h]) / sqrt(d)
      2. numerically-stable segment softmax over each output row
         (segment max/sum on the [nnz, H] score table — cheap)
      3. aggregation  y[r, h] = sum_e att[e, h] * v[col_e, h]
    """
    H = n_heads
    n_out = k.shape[1]
    d = n_out // H
    rows, cols, live = _edges_of(adj)
    nnz = rows.shape[0]
    n_chunks = max(-(-nnz // _EDGE_CHUNK), 1)
    pad = n_chunks * _EDGE_CHUNK - nnz
    pr = jnp.pad(rows, (0, pad), constant_values=adj.nrows - 1)
    pc = jnp.pad(cols, (0, pad))
    pl = jnp.pad(live, (0, pad))
    rc = pr.reshape(n_chunks, -1)
    cc = pc.reshape(n_chunks, -1)
    lc = pl.reshape(n_chunks, -1)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))

    def score_chunk(_, chunk):
        r, c, msk = chunk
        qe = jnp.take(q_pad, r, axis=0).reshape(-1, H, d)
        ke = jnp.take(k, c, axis=0).reshape(-1, H, d)
        s = jnp.einsum("ehd,ehd->eh", qe, ke) * scale
        return None, jnp.where(msk[:, None], s, -jnp.inf)

    _, scores = jax.lax.scan(score_chunk, None, (rc, cc, lc))
    scores = scores.reshape(-1, H)[:nnz]                 # [nnz, H]

    row_max = jax.ops.segment_max(scores, rows, num_segments=adj.nrows)
    # softmax shift: gradient cancels analytically — drop it from the
    # autodiff graph (identical grads, less backward work)
    row_max = jax.lax.stop_gradient(
        jnp.where(jnp.isfinite(row_max), row_max, 0.0))
    att = jnp.exp(scores - row_max[rows]) * live[:, None]
    denom = jax.ops.segment_sum(att, rows, num_segments=adj.nrows)
    att = att / jnp.maximum(denom[rows], 1e-20)          # [nnz, H]

    att_p = jnp.pad(att, ((0, pad), (0, 0))).reshape(n_chunks, -1, H)

    def agg_chunk(acc, chunk):
        r, c, a = chunk
        ve = jnp.take(v, c, axis=0).reshape(-1, H, d)
        contrib = (ve * a[:, :, None]).reshape(-1, n_out)
        return acc + jax.ops.segment_sum(
            contrib, r, num_segments=adj.nrows), None

    y0 = jnp.zeros((adj.nrows, n_out), v.dtype)
    y, _ = jax.lax.scan(agg_chunk, y0, (rc, cc, att_p))
    return y


def _psum_terms(fn, axis, *args):
    """``psum(fn(*args), axis)`` with a backward pass that ALSO psums
    the input cotangents over ``axis``.

    Inside a shard_map body, plain autodiff through ``lax.psum``
    produces per-part cotangents whose AVERAGE (not each) is the true
    gradient — the trainer's design invariant is that sharded-resident
    grads are bit-identical across the part axis (its gradient psum
    spans only the data axes), and spmm upholds it because its custom
    VJP performs the backward psums itself (`ops/hotdense.py`). This
    wrapper gives the same property to any partial-terms computation:
    the forward sums each part's partial over the axis, the backward
    runs the LOCAL vjp and psums the resulting partial input cotangents
    so every part holds the full gradient."""
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
    def call(f, ax, *a):
        return jax.tree_util.tree_map(
            lambda t: jax.lax.psum(t, ax), f(*a))

    def call_fwd(f, ax, *a):
        out, vjp = jax.vjp(f, *a)
        return jax.tree_util.tree_map(
            lambda t: jax.lax.psum(t, ax), out), vjp

    def call_bwd(f, ax, vjp, g):
        return tuple(jax.tree_util.tree_map(
            lambda t: jax.lax.psum(t, ax), gr) for gr in vjp(g))

    call.defvjp(call_fwd, call_bwd)
    return call(fn, axis, *args)


def hot_attention_aggregate(adj, q_pad, k, v, n_heads: int):
    """Hot-block attention: the resident dense block carries the batch's
    hot-hot edges, so their scores, softmax terms and aggregation run as
    DENSE MXU matmuls over the batch-present compacted slots; the cold
    residual (~15-30% of edges) runs the SDDMM-direction edge-stream
    kernels when the batch ships stream tiles (``adj.es_rc`` set —
    tile-dense masked flash attention, `gnn_tpu.ops.pallas_esattn`), or
    the chunked per-edge gather/segment route on a shipped cold COO.
    One row-wise softmax spans both parts exactly.

    ``adj`` is a :class:`~gnn_tpu.ops.hotdense.HotDenseAdj` (resident
    mode — attention needs only the PATTERN, so the rank-1 recomputed
    cold values serve purely as a live-edge mask). This is the
    attention analog of `hot_forward`'s decomposition and exists for
    the same reason: the per-edge route is gather-bound at 20-40
    ns/element on TPU, and LADIES minibatch edges concentrate on the
    hot slots (70-85% at canonical K — benchmarks/RESULTS.md).

    Part-sharded resident state (``adj.part_axis`` set,
    `gnn_tpu.parallel.shardedresident`): each part owns a slot-COLUMN
    shard of the block, so it masks to the hot columns it owns and the
    softmax terms combine with one pmax + two psums over the part axis
    ([rh]/[rh, n_out]-sized — batch-sized, never K-sized). The cold
    residual is replicated across parts in lite mode; in sharded
    full-expansion mode (``cold_partial``) its segment max/sums get the
    same treatment.
    """
    H = n_heads
    n_out = k.shape[1]
    d = n_out // H
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    # three cold strategies: edge-stream tiles (the deployed TPU path —
    # tile-dense flash attention on the packed coords,
    # gnn_tpu.ops.pallas_esattn), the chunked per-edge route (COO on
    # device), or nothing (a fully-hot layer with zero cold capacity)
    use_es = adj.es_rc is not None
    cold_empty = (not use_es) and adj.rows.shape[0] == 0
    if use_es:
        assert not adj.cold_partial, \
            "stream tiles are replicated across parts (lite mode)"

    # --- hot part: compacted [rh, ch] dense scores on the MXU ---
    sentinel = jnp.int32(1 << 30)
    rh = adj.present_row_slots.shape[0]
    ch = adj.present_col_slots.shape[0]
    r_loc = jnp.take(adj.rowpos, adj.present_row_slots)   # local rows
    c_loc = jnp.take(adj.colpos, adj.present_col_slots)   # local cols
    # the present arrays pad by repeating slot 0 — mask pad entries via
    # the true present counts or cols would double-aggregate
    n_hot_r = jnp.sum((adj.row_cmp_idx != sentinel).astype(jnp.int32))
    n_hot_c = jnp.sum((adj.col_cmp_idx != sentinel).astype(jnp.int32))
    row_ok = jnp.arange(rh) < n_hot_r
    col_ok = jnp.arange(ch) < n_hot_c
    d_rows = jnp.take(adj.dense, adj.present_row_slots, axis=0)
    if adj.part_axis is not None:
        # slot-COLUMN shard [k, ksh]: this part masks to the hot
        # columns it owns; softmax terms recombine via pmax/psum below
        ksh = adj.dense.shape[1]
        lo = jax.lax.axis_index(adj.part_axis) * ksh
        pcs_loc = adj.present_col_slots - lo
        owned = (pcs_loc >= 0) & (pcs_loc < ksh)
        d_sub = jnp.take(d_rows, jnp.clip(pcs_loc, 0, ksh - 1), axis=1)
        col_ok = col_ok & owned
    else:
        d_sub = jnp.take(d_rows, adj.present_col_slots, axis=1)
    mask_hot = (d_sub != 0) & row_ok[:, None] & col_ok[None, :]

    fill0 = dict(axis=0, mode="fill", fill_value=0)
    q_cmp = jnp.take(q_pad, r_loc, **fill0)
    k_cmp = jnp.take(k, c_loc, **fill0)
    v_cmp = jnp.take(v, c_loc, **fill0)
    split = lambda a: jnp.moveaxis(a.reshape(a.shape[0], H, d), 1, 0)
    qh, kh, vh = split(q_cmp), split(k_cmp), split(v_cmp)
    s_hot = None
    if adj.part_axis is not None:
        # sharded path: the row max crosses parts through lax.pmax
        # (which has no differentiation rule), so it comes from a
        # stop-gradient score pass; the differentiable scores are
        # recomputed inside _hot_terms below (inherent to the custom
        # two-phase psum softmax — a per-part [H, rh, ch/P] einsum)
        s_ng = jnp.einsum("hrd,hcd->hrc", jax.lax.stop_gradient(qh),
                          jax.lax.stop_gradient(kh),
                          preferred_element_type=jnp.float32) * scale
        s_ng = jnp.where(mask_hot[None], s_ng, -jnp.inf)
        m_hot = jax.lax.pmax(jnp.max(s_ng, axis=2), adj.part_axis)
    else:
        # replicated path: ONE differentiable score einsum serves both
        # the row max (through stop_gradient — the max is a softmax
        # shift whose gradient cancels) and the softmax terms below; no
        # reliance on XLA CSE to merge a duplicate (round-4 advice: CSE
        # does not fire across custom_vjp boundaries)
        s_hot = jnp.einsum("hrd,hcd->hrc", qh, kh,
                           preferred_element_type=jnp.float32) * scale
        s_hot = jnp.where(mask_hot[None], s_hot, -jnp.inf)
        m_hot = jax.lax.stop_gradient(jnp.max(s_hot, axis=2))  # [H, rh]

    # --- cold residual, pass 1: per-row score max ---
    if use_es:
        # SDDMM-direction edge-stream: the packed cold tiles densify on
        # the MXU and the row max never materializes per-edge scores
        from gnn_tpu.ops import pallas_esattn as esat
        es_interp = jax.default_backend() != "tpu"
        qs = q_pad * scale            # fold the scale into q once
        m_cold = esat.cold_attention_rowmax(
            adj.es_coords, adj.es_rc, adj.es_off,
            jax.lax.stop_gradient(qs), jax.lax.stop_gradient(k),
            n_heads=H, bm=adj.es_bm, bk=adj.es_bk, interpret=es_interp)
        # kernel emits float32-min for rows with no cold edges; restore
        # the -inf convention the combine below expects
        m_cold = jnp.where(m_cold > esat.NEG_SENTINEL / 2, m_cold,
                           -jnp.inf)
    elif cold_empty:
        m_cold = jnp.full((adj.nrows, H), -jnp.inf)
    else:
        # chunked per-edge scores (COO residual on device)
        rows_c = adj.rows.astype(jnp.int32)
        cols_c = adj.cols.astype(jnp.int32)
        live = adj.vals.astype(jnp.float32) != 0  # pads ship exactly 0
        nnz = rows_c.shape[0]
        n_chunks = max(-(-nnz // _EDGE_CHUNK), 1)
        pad = n_chunks * _EDGE_CHUNK - nnz
        rc = jnp.pad(rows_c, (0, pad),
                     constant_values=adj.nrows - 1).reshape(n_chunks, -1)
        cc = jnp.pad(cols_c, (0, pad)).reshape(n_chunks, -1)
        lc = jnp.pad(live, (0, pad)).reshape(n_chunks, -1)

        def score_chunk(_, chunk):
            r, c, msk = chunk
            qe = jnp.take(q_pad, r, axis=0).reshape(-1, H, d)
            ke = jnp.take(k, c, axis=0).reshape(-1, H, d)
            s = jnp.einsum("ehd,ehd->eh", qe, ke) * scale
            return None, jnp.where(msk[:, None], s, -jnp.inf)

        _, s_cold = jax.lax.scan(score_chunk, None, (rc, cc, lc))
        s_cold = s_cold.reshape(-1, H)[:nnz]               # [nnz, H]
        m_cold = jax.ops.segment_max(s_cold, rows_c,
                                     num_segments=adj.nrows)
        if adj.cold_partial:
            # sharded full expansion: each part holds only its owned
            # rows' cold edges — combine the per-part softmax terms
            # (stop_gradient first: pmax has no differentiation rule)
            m_cold = jax.lax.pmax(jax.lax.stop_gradient(m_cold),
                                  adj.part_axis)

    # --- one softmax across both parts ---
    m_hot_rows = jnp.take(m_hot.T, adj.row_cmp_idx, axis=0, mode="fill",
                          fill_value=-jnp.inf)             # [nrows, H]
    row_max = jnp.maximum(m_cold, m_hot_rows)
    # the max is a softmax SHIFT: its gradient cancels analytically, so
    # cut it out of the autodiff graph (like jax.nn.softmax) — also
    # required under part sharding, where lax.pmax has no
    # differentiation rule
    row_max = jax.lax.stop_gradient(
        jnp.where(jnp.isfinite(row_max), row_max, 0.0))

    rm_cmp = jnp.take(row_max, r_loc, **fill0)             # [rh, H]

    def _hot_terms(qh_, kh_, vh_):
        s = jnp.einsum("hrd,hcd->hrc", qh_, kh_,
                       preferred_element_type=jnp.float32) * scale
        # premask to -inf BEFORE the exp: masked entries' raw s - rm
        # can exceed the f32 exp range, and while where() discards the
        # inf in the forward, the exp VJP recomputes it against a zero
        # cotangent — 0 * inf = NaN (bit us at canonical magnitudes;
        # small-scale tests never overflow)
        s = jnp.where(mask_hot[None], s, -jnp.inf)
        e = jnp.exp(s - rm_cmp.T[:, :, None])
        return (jnp.sum(e, axis=2),                        # [H, rh]
                jnp.einsum("hrc,hcd->hrd", e, vh_,
                           preferred_element_type=jnp.float32))

    if adj.part_axis is not None:
        # each part sums only its owned hot columns; _psum_terms makes
        # both the terms AND their input cotangents full on every part
        # (batch-sized collectives — nothing K-sized moves), keeping
        # gradients bit-identical across 'part' (the trainer's grad
        # psum spans only the data axes)
        den_hot, num_hot = _psum_terms(_hot_terms, adj.part_axis,
                                       qh, kh, vh)
    else:
        # reuse the single differentiable score einsum from the row-max
        # pass (s_hot) — the hot score matmul runs exactly once
        e_hot = jnp.exp(s_hot - rm_cmp.T[:, :, None])
        den_hot = jnp.sum(e_hot, axis=2)                   # [H, rh]
        num_hot = jnp.einsum("hrc,hcd->hrd", e_hot, vh,
                             preferred_element_type=jnp.float32)

    # --- cold pass 2: softmax denominators + aggregation ---
    if use_es:
        # tile-dense softmax terms + aggregation on the MXU
        # (flash-attention-style custom VJP; no per-edge score table,
        # no gathers — the SDDMM direction of the edge-stream kernel).
        # Replicated across parts in lite mode, so no psum.
        den_cold, num_cold = esat.cold_attention_terms(
            adj.es_coords, adj.es_rc, adj.es_off, adj.es_ord,
            qs, k, v, row_max, n_heads=H, bm=adj.es_bm, bk=adj.es_bk,
            interpret=es_interp)
    elif cold_empty:
        den_cold = jnp.zeros((adj.nrows, H), jnp.float32)
        num_cold = jnp.zeros((adj.nrows, n_out), jnp.float32)
    else:
        def _cold_terms(qp_, k_, v_, s_c=None):
            if s_c is None:  # sharded recompute (s_cold's graph is local)
                def sc(_, chunk):
                    r, c, msk = chunk
                    qe = jnp.take(qp_, r, axis=0).reshape(-1, H, d)
                    ke = jnp.take(k_, c, axis=0).reshape(-1, H, d)
                    s = jnp.einsum("ehd,ehd->eh", qe, ke) * scale
                    return None, jnp.where(msk[:, None], s, -jnp.inf)

                _, s_c = jax.lax.scan(sc, None, (rc, cc, lc))
                s_c = s_c.reshape(-1, H)[:nnz]
            att = (jnp.exp(s_c - jnp.take(row_max, rows_c, **fill0))
                   * live[:, None])                        # [nnz, H]
            dc = jax.ops.segment_sum(att, rows_c,
                                     num_segments=adj.nrows)
            att_p = jnp.pad(att, ((0, pad), (0, 0))).reshape(
                n_chunks, -1, H)

            def agg_chunk(acc, chunk):
                r, c, a = chunk
                ve = jnp.take(v_, c, axis=0).reshape(-1, H, d)
                contrib = (ve * a[:, :, None]).reshape(-1, n_out)
                return acc + jax.ops.segment_sum(
                    contrib, r, num_segments=adj.nrows), None

            nc, _ = jax.lax.scan(
                agg_chunk, jnp.zeros((adj.nrows, n_out), v_.dtype),
                (rc, cc, att_p))
            return dc, nc

        if adj.cold_partial:
            den_cold, num_cold = _psum_terms(_cold_terms, adj.part_axis,
                                             q_pad, k, v)
        else:
            den_cold, num_cold = _cold_terms(q_pad, k, v, s_cold)
    num_cold = num_cold.astype(v.dtype)

    den = jnp.take(den_hot.T, adj.row_cmp_idx, **fill0) + den_cold
    num = num_cold + jnp.take(
        jnp.moveaxis(num_hot, 0, 1).reshape(rh, n_out),
        adj.row_cmp_idx, **fill0).astype(v.dtype)          # [nrows, n_out]
    # den == 0 exactly iff the row has NO edges (any edge contributes
    # exp(s - rm) with rm == its row's max, so den >= ~1 otherwise —
    # pad rows only). Substitute 1, NOT a tiny epsilon: the division
    # VJP computes -g * num / den^2, and 1e-40 overflows the f32
    # reciprocal to inf, making 0 * inf = NaN COTANGENTS at pad rows.
    # The per-edge segment-sum backward silently discarded those NaNs
    # (its transpose is a gather that never touches edgeless rows); the
    # edge-stream attention VJP does not, so keep them from existing.
    den_e = jnp.where(den > 0, den, 1.0)[:, :, None]       # [nrows, H, 1]
    return (num.reshape(adj.nrows, H, d) / den_e).reshape(adj.nrows,
                                                          n_out)


class GATConv(nn.Module):
    """Multi-head dot-product graph attention over a sampled adjacency.

    Three device strategies:

    * ``HotDenseAdj`` input (resident mode) — hot-block attention:
      dense MXU scores/softmax/aggregation over the resident block's
      batch-present slots + the cold residual via the edge-stream
      attention kernels (stream tiles) or the per-edge route (cold
      COO). The deployed TPU path at scale.
    * ``'tile'`` — occupied-tile SDDMM + tile softmax + streaming SpMM
      on the MXU; fastest when the dense tile mask fits (small/medium
      minibatches).
    * ``'edge'`` — chunked per-edge gather/segment pipeline with O(nnz)
      memory; scales to samp_num 8192+ where the tile mask would
      materialize gigabytes.
    """

    n_out: int
    n_heads: int = 1
    bm: int = 128
    bk: int = 128
    impl: str = "auto"   # 'auto' | 'tile' | 'edge'

    @nn.compact
    def __call__(self, x, adj, sampled_nodes):
        assert self.n_out % self.n_heads == 0
        d = self.n_out // self.n_heads
        q = nn.Dense(self.n_out, name="q")(x)
        k = nn.Dense(self.n_out, name="k")(x)
        v = nn.Dense(self.n_out, name="v")(x)
        # q rows live in the OUTPUT index space (sampled_nodes maps output
        # rows to their position among inputs)
        q_rows = jnp.take(q, sampled_nodes, axis=0)
        q_pad = jnp.zeros((adj.nrows, self.n_out), q.dtype
                          ).at[: q_rows.shape[0]].set(q_rows)

        from gnn_tpu.ops.hotdense import HotDenseAdj
        if isinstance(adj, HotDenseAdj):
            agg = hot_attention_aggregate(adj, q_pad, k, v, self.n_heads)
            return nn.elu(agg + nn.Dense(self.n_out, name="self")(
                jnp.take(x, sampled_nodes, axis=0)))

        impl = self.impl
        if impl == "auto":
            n_tiles = (adj.nrows // self.bm) * (adj.ncols // self.bk)
            mask_floats = n_tiles * self.bm * self.bk
            impl = "tile" if mask_floats <= _TILE_MASK_LIMIT else "edge"

        if impl == "edge":
            agg = edge_attention_aggregate(adj, q_pad, k, v,
                                           self.n_heads)
        else:
            n_rt = adj.nrows // self.bm
            blk_rc, mask = _coo_to_tilewise(adj, self.bm, self.bk)

            def one_head(qh, kh, vh):
                scores = sddmm_reference(blk_rc, qh, kh, self.bm,
                                         self.bk)
                scores = scores / jnp.sqrt(jnp.float32(d))
                att = masked_tile_softmax(blk_rc, scores, mask, n_rt)
                stream = StreamBlocks(blk_rc=blk_rc, vals=att,
                                      nrows=adj.nrows, ncols=adj.ncols,
                                      bm=self.bm, bk=self.bk)
                return _stream_aggregate(stream, vh)

            split = lambda a: jnp.moveaxis(
                a.reshape(a.shape[0], self.n_heads, d), 1, 0)
            heads = jax.vmap(one_head)(split(q_pad), split(k), split(v))
            agg = jnp.moveaxis(heads, 0, 1).reshape(adj.nrows,
                                                    self.n_out)
        return nn.elu(agg + nn.Dense(self.n_out, name="self")(
            jnp.take(x, sampled_nodes, axis=0)))


class GATEncoder(nn.Module):
    """Stack of GATConv layers, drop-in alongside GraphSage/GCN.

    Layers auto-select between the MXU tile route (small minibatches)
    and the O(nnz)-memory per-edge route (samp_num 8192+); force with
    ``impl``.
    """

    nhid: int
    orders: Sequence[int]
    dropout: float = 0.1
    n_heads: int = 1
    impl: str = "auto"

    @property
    def out_dim(self) -> int:
        return self.nhid

    @nn.compact
    def __call__(self, x, adjs, sampled_nodes, *, deterministic: bool):
        for i, order in enumerate(self.orders):
            if order > 0:
                x = GATConv(self.nhid, n_heads=self.n_heads,
                            impl=self.impl, name=f"gcs_{i}")(
                    x, adjs[i], sampled_nodes[i])
            else:
                x = nn.elu(nn.Dense(self.nhid, name=f"gcs_{i}")(x))
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


def _stream_aggregate(stream: StreamBlocks, x):
    try:
        if jax.default_backend() == "tpu":
            return stream_spmm(stream, x)
    except Exception:
        pass
    # jnp fallback: scatter tiles to dense then matmul (test scale)
    rt = stream.blk_rc >> 16
    ct = stream.blk_rc & 0xFFFF
    n_rt = stream.nrows // stream.bm
    n_ct = stream.ncols // stream.bk
    dense = jnp.zeros((n_rt, n_ct, stream.bm, stream.bk), x.dtype)
    dense = dense.at[rt, ct].add(stream.vals.astype(x.dtype))
    dense = dense.transpose(0, 2, 1, 3).reshape(stream.nrows,
                                                stream.ncols)
    return dense @ x
