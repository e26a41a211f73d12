"""Pipeline unit tests: chunking, stacking, shuffle modes, eval modes."""
import numpy as np
import pytest

from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
from gnn_tpu.sampling.pipeline import BatchPipeline, _rank_chunks, \
    stack_minibatches
from gnn_tpu.utils.normalize import build_laplacian


def _pipe(graph, ws, **kw):
    lap = build_laplacian(graph.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=32, samp_num=64, orders=(1, 1),
                        num_nodes=graph.adj_full.shape[0],
                        num_classes=graph.num_classes, **kw)
    return BatchPipeline(cfg, lap, graph.labels, world_size=ws,
                         pool_num=2), lap, cfg


def test_rank_chunks_disjoint_cover():
    spans = _rank_chunks(103, 4)
    assert spans[0] == (0, 26)
    assert spans[-1][1] == 103
    covered = sum(e - s for s, e in spans)
    assert covered == 103


def test_epoch_yields_expected_steps(small_graph):
    pipe, _, cfg = _pipe(small_graph, 2)
    n_train = len(small_graph.train_nodes)
    per_rank = (n_train + 1) // 2
    expected = int(np.ceil(per_rank / 32))
    steps = list(pipe.train_epoch(small_graph.train_nodes))
    assert len(steps) == expected
    for mb in steps:
        assert mb.input_nodes.shape[0] == 2  # leading device axis
        assert mb.labels.shape[0] == 2


def test_stacking_repads_to_common_bucket(small_graph):
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=32, samp_num=64, orders=(1,),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes)
    a = ladies_sample(cfg, 0, small_graph.train_nodes[:32], lap,
                      small_graph.labels)
    b = ladies_sample(cfg, 1, small_graph.train_nodes[32:64], lap,
                      small_graph.labels)
    mb = stack_minibatches([a, b])
    assert mb.adjs[0].rows.shape[0] == 2
    assert mb.adjs[0].rows.shape[1] >= max(a.adjs[0].rows.shape[0],
                                           b.adjs[0].rows.shape[0]) or \
        mb.adjs[0].rows.shape[1] == a.adjs[0].rows.shape[0]
    # stacked batches reproduce each source's valid edges
    for i, src in enumerate((a, b)):
        nz_src = np.sort(src.adjs[0].vals[src.adjs[0].vals != 0])
        nz_stk = np.sort(mb.adjs[0].vals[i][mb.adjs[0].vals[i] != 0])
        np.testing.assert_array_equal(nz_src, nz_stk)


def test_global_shuffle_identical_across_ranks(small_graph):
    """Global shuffle must be epoch-seeded identically so rank chunks are
    disjoint (`sampler.py:177-179` semantics)."""
    pipe, _, _ = _pipe(small_graph, 2)
    seen = []
    for mb in pipe.train_epoch(small_graph.train_nodes):
        for r in range(2):
            valid = int(mb.label_mask[r].sum())
            seen.append(mb.batch_nodes[r][:valid])
    flat = np.concatenate(seen)
    # every trained node unique within the epoch (disjoint chunks)
    assert len(np.unique(flat)) == len(flat)


def test_eval_modes(small_graph):
    pipe, _, _ = _pipe(small_graph, 1)
    val = list(pipe.eval_batches(small_graph.valid_nodes, 128, "val"))
    assert len(val) == 1
    assert int(val[0].label_mask.sum()) == 128
    test = list(pipe.eval_batches(small_graph.test_nodes, 128, "test"))
    total = sum(int(mb.label_mask.sum()) for mb in test)
    assert total == len(small_graph.test_nodes)


def test_exhausted_rank_cycles_permutation(small_graph):
    """A rank whose chunk runs out before num_steps must keep cycling its
    shuffled permutation (no example repeated before the whole chunk
    recurs), not resample its first batch every step."""
    pipe, _, _ = _pipe(small_graph, 2)
    # rank 0 owns 3 batches worth, rank 1 only 1 batch worth
    chunks = [small_graph.train_nodes[:96], small_graph.train_nodes[96:128]]
    seen_r1 = []
    for mb in pipe.train_epoch(small_graph.train_nodes, rank_chunks=chunks):
        valid = int(mb.label_mask[1].sum())
        seen_r1.append(np.asarray(mb.batch_nodes[1][:valid]))
    assert len(seen_r1) == 3
    # each step trains rank-1's full 32-node chunk (a cycle), never a
    # strict repeat of only the first batch subset
    for batch in seen_r1:
        np.testing.assert_array_equal(np.sort(batch),
                                      np.sort(chunks[1]))


def test_cross_epoch_prefetch_is_replay_exact(small_graph):
    """Epoch e+1's head is primed onto the workers while epoch e's tail
    runs (deterministic (seed, epoch) mode). The adopted batches must be
    bit-identical to sampling epoch e+1 from scratch in a fresh
    pipeline — exact-replay resume depends on it."""
    def epoch_sig(pipe, epoch):
        sig = []
        for group in pipe._step_groups(small_graph.train_nodes, None,
                                       epoch):
            for mb in group:
                sig.append((np.asarray(mb.input_nodes).tobytes(),
                            np.asarray(mb.labels).tobytes()))
        return sig

    warm, _, _ = _pipe(small_graph, 2)
    sig0 = epoch_sig(warm, 0)
    assert warm._primed is not None and warm._primed["eid"] == 2
    sig1 = epoch_sig(warm, 1)          # adopts the primed head

    fresh, _, _ = _pipe(small_graph, 2)
    assert epoch_sig(fresh, 1) == sig1
    assert epoch_sig(fresh, 0) == sig0  # epoch order doesn't matter


def test_prefetch_discards_stale_prime(small_graph):
    """A primed epoch that doesn't match the next request (different
    epoch number or targets) is dropped, not misused."""
    pipe, _, _ = _pipe(small_graph, 2)
    list(pipe._step_groups(small_graph.train_nodes, None, 0))
    assert pipe._primed is not None
    # jump to epoch 5: the primed epoch-1 head must be discarded
    fresh, _, _ = _pipe(small_graph, 2)
    a = [np.asarray(m.input_nodes).tobytes()
         for g in pipe._step_groups(small_graph.train_nodes, None, 5)
         for m in g]
    b = [np.asarray(m.input_nodes).tobytes()
         for g in fresh._step_groups(small_graph.train_nodes, None, 5)
         for m in g]
    assert a == b


def test_no_priming_past_final_epoch(small_graph):
    """With `final_epoch` set (Trainer.fit does), the last epoch leaves
    no primed futures behind — they would be pure waste queued ahead of
    the final full-sweep eval's pool submissions (FIFO pool)."""
    pipe, _, _ = _pipe(small_graph, 2)
    pipe.final_epoch = 1
    list(pipe._step_groups(small_graph.train_nodes, None, 0))
    assert pipe._primed is not None        # epoch 1 still primes
    list(pipe._step_groups(small_graph.train_nodes, None, 1))
    assert pipe._primed is None            # past the last epoch: nothing


def test_stale_prime_is_cancelled_and_observed(small_graph):
    """Discarding a stale prime cancels pending futures and surfaces
    exceptions from completed ones as warnings (not silence)."""
    import warnings

    pipe, _, _ = _pipe(small_graph, 2)
    list(pipe._step_groups(small_graph.train_nodes, None, 0))
    assert pipe._primed is not None
    for group in pipe._primed["futures"]:  # let the primed work finish
        for f in group:
            f.exception()
    # poison one completed future so the discard path must report it
    # (also covers the RUNNING-at-discard case: cancel() fails and the
    # done callback observes the exception at completion)
    class _F:
        def cancel(self):
            return False

        def done(self):
            return True

        def exception(self):
            return RuntimeError("boom")

        def add_done_callback(self, cb):
            cb(self)

    pipe._primed["futures"].append([_F()])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        # epoch jump -> stale prime -> discard
        list(pipe._step_groups(small_graph.train_nodes, None, 7))
    assert any("boom" in str(w.message) for w in rec)


def test_shape_book_pins_stacked_shapes(small_graph, tmp_path):
    """Sticky shape buckets: after a big batch grows the book, smaller
    batches pad UP to the recorded maxima — every stacked step has
    IDENTICAL leaf shapes (one compiled program), and a fresh pipeline
    loading the persisted book reproduces them from its first batch
    (the epoch-0 compile-budget lever)."""
    import jax

    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.sampling.ladies import SamplerConfig, to_device_batch
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes)
    book_path = str(tmp_path / "book.json")

    def shapes_of(mb):
        return tuple(
            (tuple(a.shape), str(a.dtype)) for a in
            jax.tree_util.tree_leaves(to_device_batch(mb)))

    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                         pool_num=2, shape_book_path=book_path)
    sigs = [shapes_of(mb) for mb in
            pipe.train_epoch(small_graph.train_nodes, epoch=0)]
    # shapes may grow early, but once grown they never shrink: the
    # LAST signature is the maximum and the set of distinct signatures
    # is tiny (growth events only)
    assert len(set(sigs)) <= 3, len(set(sigs))
    assert sigs[-1] in set(sigs)

    # a fresh pipeline with the persisted book starts AT the maxima
    pipe2 = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                          pool_num=2, shape_book_path=book_path)
    sigs2 = [shapes_of(mb) for mb in
             pipe2.train_epoch(small_graph.train_nodes, epoch=0)]
    assert len(set(sigs2)) == 1
    assert sigs2[0] == max(set(sigs), key=lambda s: sum(
        np.prod(sh) for sh, _ in s))
