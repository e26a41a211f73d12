"""Asynchronous minibatch pipeline (host side).

Replaces the reference's `prepare_data` (`/root/reference/sampler.py:163-210`):
a ThreadPoolExecutor prefetches sampler calls in bounded waves (the
reference uses depth-32 waves, `sampler.py:186`) while the device trains.

Differences from the reference, driven by the TPU execution model:

* DP ranks are not threads — they are mesh devices fed from ONE host
  process. Each global step therefore needs `world_size` minibatches
  (one per device), sampled from *disjoint* chunks of the shuffled epoch
  exactly like the reference's per-rank chunking
  (`sampler.py:170-183`), then re-padded to common static shapes and
  stacked along a leading device axis.

* Global vs local shuffle both supported: global shuffle re-seeds from
  the epoch counter so every rank sees the same permutation and takes
  its own chunk (`sampler.py:177-179`); local shuffle permutes only
  within each rank's chunk (`sampler.py:181-183`).
"""
from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np

from gnn_tpu.ops import sparse as sparse_ops
from gnn_tpu.sampling.ladies import (MiniBatch, SamplerConfig, SAMPLERS,
                                     bucket_size)


def _repad_coo(adj, nnz_pad: int):
    """Re-pad the cold/COO edge arrays to a common bucket. Pad rows sit
    at the LAST row (zero-valued) so row-sorted streams stay sorted;
    same for the transpose copy's cols."""
    cur = adj.rows.shape[0]
    if cur == nnz_pad:
        return adj
    pad = nnz_pad - cur

    def ext(a, fill=0):
        return np.concatenate(
            [a, np.full(pad, fill, a.dtype)])

    fields = dict(
        rows=ext(adj.rows, adj.nrows - 1),
        cols=ext(adj.cols),
        vals=ext(adj.vals),
    )
    if hasattr(adj, "rows_t"):
        fields.update(
            rows_t=ext(adj.rows_t),
            cols_t=ext(adj.cols_t, adj.ncols - 1),
            vals_t=ext(adj.vals_t),
        )
    return dataclasses.replace(adj, **fields)


def _repad_blocked(adj: sparse_ops.BlockedAdj, max_blk: int,
                   max_blk_t: int) -> sparse_ops.BlockedAdj:
    def pad2(a, m):
        cur = a.shape[1]
        if cur == m:
            return a
        widths = [(0, 0), (0, m - cur)] + [(0, 0)] * (a.ndim - 2)
        return np.pad(a, widths)

    return dataclasses.replace(
        adj,
        block_cols=pad2(adj.block_cols, max_blk),
        block_vals=pad2(adj.block_vals, max_blk),
        block_cols_t=pad2(adj.block_cols_t, max_blk_t),
        block_vals_t=pad2(adj.block_vals_t, max_blk_t),
    )


class ShapeBook:
    """Sticky per-layer shape buckets: every cap only ever GROWS, and
    every batch pads UP to the recorded maximum.

    Why: the jitted step re-compiles on any new shape combination, and
    per-batch `bucket_size` buckets oscillate — a rare small/large nnz
    bucket first hit mid-run pays a 30-40 s recompile in the epoch's
    critical path, and every scale-factor change shifts sampled sizes
    into new buckets (round-4 verdict Weak #5/#6: two 2.6-3.3x epoch
    outliers in the 30-epoch soak; 60-130 s per tuner step). With the
    book, the number of distinct compiled programs equals the number of
    GROWTH events (a handful, early), padding is semantically free
    (padded edges are zero-valued/inert — IEEE adding zeros is exact,
    so loss curves are bit-identical), and a book PERSISTED from a
    prior run pins epoch 0 to the steady-state shapes (one program from
    the first batch — the epoch-0 compile-budget lever of verdict #8).

    Keys are ``(layer_idx, nrows, ncols, type, kind)`` so train/eval
    configs and samplers coexist in one book. Write-on-growth with an
    atomic rename; loading a stale/corrupt book falls back to empty.
    """

    def __init__(self, path: Optional[str] = None):
        self._caps = {}
        self._path = path
        if path is not None:
            self._load(path)

    def cap(self, key: tuple, value: int) -> int:
        k = "|".join(str(x) for x in key)
        cur = self._caps.get(k, 0)
        if value > cur:
            self._caps[k] = value
            cur = value
            self._save()
        return cur

    def _load(self, path):
        import json
        import os
        if not os.path.exists(path):
            return
        try:
            with open(path) as f:
                caps = json.load(f)
            self._caps = {str(k): int(v) for k, v in caps.items()}
        except Exception as e:  # corrupt book: start empty
            print(f"shape book {path} unusable ({e}); starting empty",
                  flush=True)

    def _save(self):
        if self._path is None:
            return
        import json
        import os
        tmp = f"{self._path}.{os.getpid()}.tmp"
        try:
            with open(tmp, "w") as f:
                json.dump(self._caps, f)
            os.replace(tmp, self._path)
        except Exception:
            if os.path.exists(tmp):
                os.unlink(tmp)


def _book_cap(book, l, a, kind, value):
    """Sticky cap lookup keyed by (layer, padded shape, type, kind)."""
    if book is None:
        return value
    return book.cap((l, a.nrows, a.ncols, type(a).__name__, kind),
                    value)


def _unify_layer(layer, l, book):
    """Pad a group of one layer's adjacencies to common bucketed shapes
    (group max, additionally raised to the ShapeBook's sticky cap)."""
    from gnn_tpu.ops.hotdense import HotDenseAdj
    if isinstance(layer[0], (sparse_ops.COOAdj, HotDenseAdj)):
        # HotDenseAdj shares the COO cold-residual fields; its other
        # leaves are fixed-shape except the batch-present compaction
        # arrays, which re-bucket to the group max (pad slots gather
        # nothing — the cmp-idx sentinels are fixed OOB constants)
        nnz = _book_cap(book, l, layer[0], "nnz",
                        bucket_size(max(a.rows.shape[0] for a in layer)))
        layer = [_repad_coo(a, nnz) for a in layer]
        if isinstance(layer[0], HotDenseAdj):
            rh = _book_cap(book, l, layer[0], "rh",
                           max(a.present_row_slots.shape[0]
                               for a in layer))
            ch = _book_cap(book, l, layer[0], "ch",
                           max(a.present_col_slots.shape[0]
                               for a in layer))
            pad1 = lambda a, m: np.concatenate(
                [a, np.zeros(m - a.shape[0], a.dtype)])
            layer = [dataclasses.replace(
                a,
                present_row_slots=pad1(a.present_row_slots, rh),
                present_col_slots=pad1(a.present_col_slots, ch))
                for a in layer]
        return layer
    if isinstance(layer[0], sparse_ops.PatternAdj):
        # pattern transport: only the cols array is bucketed (pad
        # edges expand to the last row and carry live=False)
        nnz = _book_cap(book, l, layer[0], "nnz",
                        bucket_size(max(a.cols.shape[0] for a in layer)))
        return [a if a.cols.shape[0] == nnz else dataclasses.replace(
            a, cols=np.concatenate(
                [a.cols,
                 np.zeros(nnz - a.cols.shape[0], a.cols.dtype)]))
            for a in layer]
    if type(layer[0]).__name__ == "ResidentLayerRef":
        # normfact/row_cnt share static caps; the shipped cold
        # arrays (lite mode) re-pad to the group-max bucket, and
        # the static device-build buckets unify to the group max
        nnz = _book_cap(book, l, layer[0], "nnz",
                        max(x.nnz_cold for x in layer))

        def _ext(a, fill=0):
            if a is None or a.shape[0] == nnz:
                return a
            return np.concatenate(
                [a, np.full(nnz - a.shape[0], fill, a.dtype)])

        if layer[0].cols is not None:
            layer = [dataclasses.replace(
                a, cols=_ext(a.cols),
                rows=_ext(a.rows, a.nrows - 1),
                vals=_ext(a.vals)) for a in layer]
        if layer[0].es_rc is not None:
            # edge-stream tile payload: unify entry count and coord
            # rows across the group (pad entries carry zero edges)
            from gnn_tpu.ops.pallas_edgestream import repad_tiles
            nbp = _book_cap(book, l, layer[0], "nbp",
                            max(x.es_rc.shape[0] for x in layer))
            ncr = _book_cap(book, l, layer[0], "ncr",
                            max(x.es_coords.shape[0] for x in layer))
            fixed = []
            for a in layer:
                c2, rc2, off2, ord2, v2 = repad_tiles(
                    a.es_coords, a.es_rc, a.es_off, a.es_ord, nbp,
                    ncr, a.nrows // a.es_bm, a.ncols // a.es_bk,
                    vals=a.es_vals)
                fixed.append(dataclasses.replace(
                    a, es_coords=c2, es_rc=rc2, es_off=off2,
                    es_ord=ord2, es_vals=v2))
            layer = fixed
        return [dataclasses.replace(
            a,
            e_cap=_book_cap(book, l, layer[0], "ecap",
                            max(x.e_cap for x in layer)),
            nnz_cold=nnz,
            rh_pad=_book_cap(book, l, layer[0], "rh",
                             max(x.rh_pad for x in layer)),
            ch_pad=_book_cap(book, l, layer[0], "ch",
                             max(x.ch_pad for x in layer)))
            for a in layer]
    mb_max = _book_cap(book, l, layer[0], "mb", bucket_size(
        max(a.block_cols.shape[1] for a in layer), minimum=8))
    mbt_max = _book_cap(book, l, layer[0], "mbt", bucket_size(
        max(a.block_cols_t.shape[1] for a in layer), minimum=8))
    return [_repad_blocked(a, mb_max, mbt_max) for a in layer]


def stack_minibatches(mbs: Sequence[MiniBatch],
                      book: Optional[ShapeBook] = None) -> MiniBatch:
    """Re-pad `world_size` minibatches to common bucketed shapes and stack
    every array leaf along a new leading device axis. With a
    :class:`ShapeBook`, every bucket additionally pads up to the sticky
    recorded maximum (compile-stability — see ShapeBook).

    The single-replica case adds the axis with zero-copy views (book
    pads still apply to the variable-size adjacency leaves)."""
    if len(mbs) == 1:
        mb = mbs[0]
        ex = lambda a: np.expand_dims(a, 0)
        adjs = []
        for l, adj in enumerate(mb.adjs):
            if adj is None:
                adjs.append(None)
                continue
            if book is not None:
                adj = _unify_layer([adj], l, book)[0]
            fields = {f.name: ex(getattr(adj, f.name))
                      for f in dataclasses.fields(adj)
                      if isinstance(getattr(adj, f.name), np.ndarray)}
            adjs.append(dataclasses.replace(
                adj, **fields,
                n_valid_rows=np.asarray([adj.n_valid_rows]),
                n_valid_cols=np.asarray([adj.n_valid_cols])))
        return MiniBatch(
            adjs=adjs,
            sampled_nodes=[ex(s) for s in mb.sampled_nodes],
            input_nodes=ex(mb.input_nodes), n_input=mb.n_input,
            input_mask=ex(mb.input_mask), labels=ex(mb.labels),
            label_mask=ex(mb.label_mask), batch_nodes=ex(mb.batch_nodes))
    n_layers = len(mbs[0].adjs)
    adjs = []
    for l in range(n_layers):
        if mbs[0].adjs[l] is None:
            adjs.append(None)
            continue
        layer = _unify_layer([mb.adjs[l] for mb in mbs], l, book)
        stacked = dataclasses.replace(
            layer[0],
            **{f.name: np.stack([getattr(a, f.name) for a in layer])
               for f in dataclasses.fields(layer[0])
               if f.name not in ("nrows", "ncols", "bm", "bk")
               and isinstance(getattr(layer[0], f.name), np.ndarray)},
            n_valid_rows=np.stack([a.n_valid_rows for a in layer]),
            n_valid_cols=np.stack([a.n_valid_cols for a in layer]),
        )
        adjs.append(stacked)
    return MiniBatch(
        adjs=adjs,
        sampled_nodes=[np.stack([mb.sampled_nodes[l] for mb in mbs])
                       for l in range(n_layers)],
        input_nodes=np.stack([mb.input_nodes for mb in mbs]),
        n_input=max(mb.n_input for mb in mbs),
        input_mask=np.stack([mb.input_mask for mb in mbs]),
        labels=np.stack([mb.labels for mb in mbs]),
        label_mask=np.stack([mb.label_mask for mb in mbs]),
        batch_nodes=np.stack([mb.batch_nodes for mb in mbs]),
    )


def regroup_minibatch(mb: MiniBatch, group: int) -> MiniBatch:
    """Reshape a stacked minibatch's ``[group*ws, ...]`` leaves to
    ``[group, ws, ...]`` — the layout of a multi-step-per-dispatch batch
    (`gnn_tpu.train.trainer`: one jitted `lax.scan` runs ``group`` train
    steps per host dispatch, amortizing the per-call host/relay latency
    that otherwise floors the step time)."""

    def rs(a):
        return a.reshape(group, a.shape[0] // group, *a.shape[1:])

    adjs = []
    for adj in mb.adjs:
        if adj is None:
            adjs.append(None)
            continue
        fields = {f.name: rs(getattr(adj, f.name))
                  for f in dataclasses.fields(adj)
                  if isinstance(getattr(adj, f.name), np.ndarray)}
        adjs.append(dataclasses.replace(adj, **fields))
    return MiniBatch(
        adjs=adjs,
        sampled_nodes=[rs(s) for s in mb.sampled_nodes],
        input_nodes=rs(mb.input_nodes), n_input=mb.n_input,
        input_mask=rs(mb.input_mask), labels=rs(mb.labels),
        label_mask=rs(mb.label_mask), batch_nodes=rs(mb.batch_nodes))


def _rank_chunks(n_targets: int, world_size: int):
    chunk = n_targets // world_size
    if n_targets % world_size:
        chunk += 1
    return [(r * chunk, min((r + 1) * chunk, n_targets))
            for r in range(world_size)]


class BatchPipeline:
    """Prefetching minibatch source for one trainer."""

    def __init__(self, cfg: SamplerConfig, lap_matrix, labels_full,
                 world_size: int = 1, pool_num: int = 4,
                 queue_depth: int = 8,
                 skewed_sampling_nodes: Optional[List[np.ndarray]] = None,
                 per_rank_skew: Optional[List[List[np.ndarray]]] = None,
                 local_shuffle: bool = False, seed: int = 0,
                 shape_book_path: Optional[str] = None):
        """``skewed_sampling_nodes`` — one per-layer skew list shared by
        all ranks; ``per_rank_skew`` — per-rank per-layer lists (each
        rank skews toward ITS resident nodes, `sampler.py:23-25`;
        takes precedence when both are given)."""
        self.cfg = cfg
        self.lap = lap_matrix
        self.labels = labels_full
        self.world_size = world_size
        self.pool = ThreadPoolExecutor(max_workers=pool_num)
        self.queue_depth = queue_depth
        self.skew = skewed_sampling_nodes
        self.per_rank_skew = per_rank_skew
        if per_rank_skew is not None:
            assert len(per_rank_skew) == world_size, \
                (len(per_rank_skew), world_size)
        self.local_shuffle = local_shuffle
        self._sampler = SAMPLERS[cfg.sampler]
        # sticky shape buckets (see ShapeBook): shared by train AND
        # eval stacking; persisted write-on-growth when a path is given
        self.shape_book = ShapeBook(shape_book_path)
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        # cross-epoch prefetch (`_step_groups`): the first step-groups
        # of epoch e+1, submitted while the trainer runs its val/eval/
        # checkpoint tail (workers were idle there — measured 2-4 s of
        # the canonical epoch). Epoch randomness is a pure function of
        # (seed, epoch), so the primed batches are bit-identical to
        # sampling them lazily; exact-replay resume is unaffected.
        self._primed = None
        # last training-epoch index (set by Trainer.fit): priming past
        # it wastes worker time ahead of the final full-sweep eval
        self.final_epoch: Optional[int] = None
        # tune native OpenMP width so pool x OMP ~= 2x cores (measured
        # optimum on this class of host; oversubscription collapses
        # throughput - see benchmarks/RESULTS.md)
        try:
            from gnn_tpu import native as _native
            lib = _native.get_lib()
            if lib is not None:
                import os as _os
                ncpu = _os.cpu_count() or 4
                lib.set_threads(max(1, round(2 * ncpu / max(pool_num, 1))))
        except Exception:
            pass

    def _sample_one(self, seed, batch_nodes, cfg=None, rank=0):
        skew = self.skew
        if self.per_rank_skew is not None:
            skew = self.per_rank_skew[rank % len(self.per_rank_skew)]
        return self._sampler(cfg or self.cfg, seed, batch_nodes, self.lap,
                             self.labels, skew)

    def train_epoch(self, target_nodes: np.ndarray,
                    rank_chunks: Optional[List[np.ndarray]] = None,
                    epoch: Optional[int] = None,
                    ) -> Iterator[MiniBatch]:
        """Yield stacked minibatches (leading axis = world_size) for one
        epoch. ``rank_chunks`` overrides the chunking (used with PaGraph
        local-shuffle where ranks own explicit train-node sets,
        `main.py:280-282`). Passing ``epoch`` pins this epoch's shuffle
        AND sampling randomness to a function of (seed, epoch) — the
        property checkpoint resume needs to reproduce an uninterrupted
        run exactly."""
        for group in self._step_groups(target_nodes, rank_chunks, epoch):
            yield stack_minibatches(group, self.shape_book)

    def train_epoch_grouped(self, target_nodes: np.ndarray,
                            rank_chunks: Optional[List[np.ndarray]] = None,
                            epoch: Optional[int] = None, group: int = 1):
        """Yield ``(MiniBatch, n_valid_steps)`` pairs whose leaves carry a
        leading ``[group, world_size]`` axis pair — ``group`` train steps
        shipped and dispatched together (see :func:`regroup_minibatch`).
        The final short group is padded by repeating its last step with
        ``n_valid_steps < group``; the trainer masks the padded steps'
        parameter updates so training is EXACTLY the per-step schedule."""
        pending: List[List[MiniBatch]] = []
        # the main thread drains the queue in G-step bursts, then spends
        # a while stacking + shipping: keep ~2 groups in flight so the
        # workers sample through that window instead of idling
        for step_group in self._step_groups(target_nodes, rank_chunks,
                                            epoch, min_depth=2 * group + 1):
            pending.append(step_group)
            if len(pending) == group:
                flat = [mb for g in pending for mb in g]
                yield (regroup_minibatch(
                    stack_minibatches(flat, self.shape_book), group),
                    group)
                pending = []
        if pending:
            n_valid = len(pending)
            while len(pending) < group:
                pending.append(pending[-1])
            flat = [mb for g in pending for mb in g]
            yield (regroup_minibatch(
                stack_minibatches(flat, self.shape_book), group),
                n_valid)

    def _epoch_plan(self, target_nodes, rank_chunks, eid):
        """Per-rank shuffled chunks + step count for internal epoch id
        ``eid`` — a pure function of (eid, targets), shared by the lazy
        path and the cross-epoch primer."""
        ws, bs = self.world_size, self.cfg.batch_size
        if rank_chunks is None:
            n = len(target_nodes)
            if self.local_shuffle:
                spans = _rank_chunks(n, ws)
                per_rank = [
                    target_nodes[s + np.random.default_rng(
                        eid * ws + r).permutation(e - s)]
                    for r, (s, e) in enumerate(spans)]
            else:
                # identical global shuffle on every rank, disjoint chunks
                # (`sampler.py:177-179`)
                perm = np.random.default_rng(eid).permutation(n)
                shuffled = target_nodes[perm]
                spans = _rank_chunks(n, ws)
                per_rank = [shuffled[s:e] for s, e in spans]
        else:
            per_rank = [
                c[np.random.default_rng(
                    eid * ws + r).permutation(len(c))]
                for r, c in enumerate(rank_chunks)]
        num_steps = max(int(np.ceil(len(c) / bs)) for c in per_rank)
        return per_rank, num_steps

    def _submit_step(self, per_rank, rng, j):
        ws, bs = self.world_size, self.cfg.batch_size
        group = []
        for r in range(ws):
            chunk = per_rank[r][j * bs:(j + 1) * bs]
            if len(chunk) == 0:
                # rank exhausted before num_steps (uneven chunk sizes):
                # keep cycling its shuffled permutation rather than
                # reusing the first batch, so no example within the
                # rank is repeated before the whole chunk recurs
                # (the reference simply runs fewer batches on such
                # ranks, `sampler.py:170-175`; a static mesh needs a
                # batch per rank every step)
                nr = len(per_rank[r])
                idx = np.arange(j * bs, j * bs + bs) % max(nr, 1)
                chunk = per_rank[r][idx]
            seed = int(rng.integers(2 ** 31 - 1))
            group.append(self.pool.submit(self._sample_one, seed,
                                          chunk, None, r))
        return group

    @staticmethod
    def _same_targets(a, b):
        if a is None or b is None:
            return a is b
        if isinstance(a, list) or isinstance(b, list):
            return (isinstance(a, list) and isinstance(b, list)
                    and len(a) == len(b)
                    and all(np.array_equal(x, y) for x, y in zip(a, b)))
        return np.array_equal(a, b)

    def _discard_prime(self, primed):
        """Drop a stale prime: `Future.cancel` removes pending work from
        the FIFO pool (it would otherwise run ahead of eval submissions);
        futures that already ran — or are RUNNING right now, which
        cancel() cannot stop — get their exceptions observed via a done
        callback, so a sampler crash inside a primed batch never
        vanishes silently."""
        import warnings

        def _observe(f):
            exc = f.exception()
            if exc is not None:
                warnings.warn(
                    f"discarded primed sampler batch raised: {exc!r}")

        for group in primed["futures"]:
            for f in group:
                if not f.cancel():
                    # done OR still running: the callback fires now or
                    # at completion respectively
                    f.add_done_callback(_observe)

    def _prime_next_epoch(self, epoch, target_nodes, rank_chunks, depth):
        """Submit the first ``depth`` step-groups of epoch ``epoch``
        (trainer numbering) on the worker pool. Called when the current
        epoch's last step has been submitted: the pool is FIFO, so the
        primed work queues behind this epoch's tail and runs exactly
        where the workers used to idle (the trainer's val/eval/
        checkpoint + device-drain tail). Uses a FRESH rng((seed, epoch))
        — the same stream `_step_groups` would create — so adoption
        continues it seamlessly and replay stays exact."""
        eid = epoch + 1
        rng = np.random.default_rng((self._seed, epoch))
        per_rank, num_steps = self._epoch_plan(target_nodes, rank_chunks,
                                               eid)
        futures = []
        for j in range(min(depth, num_steps)):
            futures.append(self._submit_step(per_rank, rng, j))
        self._primed = dict(eid=eid, rng=rng, per_rank=per_rank,
                            num_steps=num_steps, futures=futures,
                            targets=target_nodes, chunks=rank_chunks)

    def _step_groups(self, target_nodes, rank_chunks, epoch,
                     min_depth: int = 2):
        """Prefetched per-step groups of ``world_size`` raw minibatches
        (the shared engine behind `train_epoch` / `train_epoch_grouped`).
        When ``epoch`` is given (the deterministic (seed, epoch) mode the
        trainer uses), the first groups of epoch+1 are primed onto the
        idle workers as this epoch's sampling finishes."""
        futures = []
        submitted = 0
        primed, self._primed = self._primed, None
        if (epoch is not None and primed is not None
                and primed["eid"] == epoch + 1
                and self._same_targets(primed["targets"], target_nodes)
                and self._same_targets(primed["chunks"], rank_chunks)):
            # adopt the primed epoch: same plan, same rng stream
            self._epoch = primed["eid"]
            self._rng = primed["rng"]
            per_rank, num_steps = primed["per_rank"], primed["num_steps"]
            futures = primed["futures"]
            submitted = len(futures)
        else:
            # stale primed futures (different epoch/targets): cancel the
            # not-yet-started ones so they don't queue ahead of real
            # work, and surface exceptions from the ones that ran
            if primed is not None:
                self._discard_prime(primed)
            if epoch is not None:
                self._epoch = epoch + 1
                self._rng = np.random.default_rng((self._seed, epoch))
            else:
                self._epoch += 1
            per_rank, num_steps = self._epoch_plan(
                target_nodes, rank_chunks, self._epoch)
        ws = self.world_size
        emitted = 0

        # shallow prefetch: once `depth` steps are ready the workers
        # idle, freeing host cores for the main thread's H2D +
        # dispatch (a deep queue keeps all cores hot with sampling and
        # starves the transfer path - measured 73 MB/s vs 2.2 GB/s H2D);
        # grouped dispatch consumes steps in bursts, so keep at least a
        # group's worth in flight
        depth = max(self.queue_depth // max(ws, 1), min_depth)
        rng = self._rng

        def maybe_prime():
            # current epoch fully submitted: hand the idle workers the
            # next epoch's head (deterministic mode only — without an
            # epoch number the rng stream is shared with val sampling
            # and cannot be advanced early). Prime DEEPER than the
            # in-epoch queue: the shallow depth exists to keep host
            # cores free for H2D, but the tail this fills has no H2D —
            # the cap is how much of the ~2-4 s val/eval/drain tail
            # 4 workers can use (6x depth ~= 3 s of worker-seconds at
            # canonical batch cost; done futures idle in RAM, ~5 MB
            # per canonical group, and do not compete for cores at the
            # next epoch's start)
            # final_epoch (set by Trainer.fit) stops priming past the
            # last training epoch: those futures are pure waste AND,
            # the pool being FIFO, they'd delay the full-sweep test
            # eval's own submissions by seconds of worker time
            if (epoch is not None and self._primed is None
                    and (self.final_epoch is None
                         or epoch < self.final_epoch)):
                self._prime_next_epoch(epoch + 1, target_nodes,
                                       rank_chunks, 6 * depth)

        while submitted < num_steps and submitted < depth:
            futures.append(self._submit_step(per_rank, rng, submitted))
            submitted += 1
        if submitted >= num_steps:
            maybe_prime()
        while emitted < num_steps:
            group = futures.pop(0)
            if submitted < num_steps:
                futures.append(self._submit_step(per_rank, rng,
                                                 submitted))
                submitted += 1
                if submitted >= num_steps:
                    maybe_prime()
            yield [f.result() for f in group]
            emitted += 1

    def eval_batches(self, target_nodes: np.ndarray, batch_size: int,
                     mode: str = "val") -> Iterator[MiniBatch]:
        """Single-replica evaluation batches (reference `sampler.py:194-210`):
        val = one random batch; test = full sweep."""
        # eval batch size may exceed the train batch size (the reference
        # always evaluates on 128-node batches, `main.py:180`); widen the
        # static caps accordingly
        cfg = self.cfg
        if batch_size > cfg.batch_size:
            cfg = dataclasses.replace(cfg, batch_size=batch_size)
        if mode == "val":
            idx = self._rng.permutation(len(target_nodes))[:batch_size]
            yield stack_minibatches(
                [self._sample_one(int(self._rng.integers(2 ** 31 - 1)),
                                  target_nodes[idx], cfg)],
                self.shape_book)
            return
        n_batches = int(np.ceil(len(target_nodes) / batch_size))
        futs = [self.pool.submit(
            self._sample_one, int(self._rng.integers(2 ** 31 - 1)),
            target_nodes[j * batch_size:(j + 1) * batch_size], cfg)
            for j in range(n_batches)]
        for f in futs:
            yield stack_minibatches([f.result()], self.shape_book)

    def eval_batches_sharded(self, target_nodes: np.ndarray,
                             batch_size: int) -> Iterator[MiniBatch]:
        """Full-sweep evaluation sharded over the mesh: each yielded
        stack carries ``world_size`` eval minibatches (one per device),
        so the test sweep runs ws batches per dispatch and the sharded
        feature-cache gather serves eval exactly like training (the
        reference evaluates on rank 0 only, `main.py:178` — this is the
        scale-out upgrade). A short final group is padded by repeating
        the last batch with its label/input masks zeroed, so padded
        replicas contribute nothing."""
        cfg = self.cfg
        if batch_size > cfg.batch_size:
            cfg = dataclasses.replace(cfg, batch_size=batch_size)
        ws = self.world_size
        n_batches = int(np.ceil(len(target_nodes) / batch_size))
        futs = [self.pool.submit(
            self._sample_one, int(self._rng.integers(2 ** 31 - 1)),
            target_nodes[j * batch_size:(j + 1) * batch_size], cfg, j % ws)
            for j in range(n_batches)]
        for g in range(0, n_batches, ws):
            group = [f.result() for f in futs[g: g + ws]]
            while len(group) < ws:
                filler = group[-1]
                filler = dataclasses.replace(
                    filler,
                    label_mask=np.zeros_like(filler.label_mask),
                    input_mask=np.zeros_like(filler.input_mask))
                group.append(filler)
            yield stack_minibatches(group)
