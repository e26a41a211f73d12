"""Aux subsystem tests: reorder, shared CSR, checkpoint/resume, metrics,
scale-factor tuner, loss golden values."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from gnn_tpu.data.reorder import degree_order, reorder_dataset, \
    reorder_graph
from gnn_tpu.data.shared import SharedCSR, attach_shared_csr
from gnn_tpu.train.loss import masked_loss
from gnn_tpu.train.metrics import MetricsRegistry, ScaleFactorTuner


def test_reorder_preserves_graph(small_graph):
    g2 = reorder_dataset(small_graph)
    # degrees sorted descending
    deg = np.asarray(g2.adj_full.sum(axis=1)).ravel()
    assert np.all(np.diff(deg) <= 1e-6)
    # edge count preserved
    assert g2.adj_full.nnz == small_graph.adj_full.nnz
    # an edge (u, v) maps to (new[u], new[v])
    order = degree_order(small_graph.adj_full)
    _, new_of_old = reorder_graph(small_graph.adj_full, order)
    coo = small_graph.adj_full.tocoo()
    u, v = coo.row[0], coo.col[0]
    assert g2.adj_full[new_of_old[u], new_of_old[v]] != 0
    # features/labels follow
    np.testing.assert_array_equal(g2.feats[new_of_old[u]],
                                  small_graph.feats[u])


def test_shared_csr_roundtrip():
    m = sp.random(50, 70, density=0.1, format="csr",
                  random_state=np.random.RandomState(0), dtype=np.float32)
    with SharedCSR(m) as sh:
        m2, segs = attach_shared_csr(sh.handle)
        np.testing.assert_array_equal(m2.toarray(), m.toarray())
        for s in segs:
            s.close()


def test_checkpoint_resume_roundtrip(small_graph, tmp_path):
    from tests.test_train_e2e import _make_trainer
    tr = _make_trainer(small_graph, world_size=2)
    tr.fit(small_graph.train_nodes, small_graph.valid_nodes, epochs=1,
           log=False)
    path = tr.save(str(tmp_path), step=7)
    assert os.path.exists(path)
    p_before = jax.tree_util.tree_map(np.asarray, tr.params)

    tr2 = _make_trainer(small_graph, world_size=2)
    tr2.fit(small_graph.train_nodes, small_graph.valid_nodes, epochs=1,
            log=False)  # different state
    step = tr2.restore(str(tmp_path))
    assert step == 7
    p_after = jax.tree_util.tree_map(np.asarray, tr2.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p_before,
                           p_after)


def test_metrics_registry_jsonl(tmp_path):
    m = MetricsRegistry(str(tmp_path / "m.jsonl"))
    m.log(epoch=0, f1=0.5)
    m.log(epoch=1, f1=0.7)
    assert m.latest("f1") == 0.7
    import json
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert len(lines) == 2 and lines[1]["epoch"] == 1


def test_scale_factor_tuner_bisects():
    t = ScaleFactorTuner(1.0)
    assert t.update(0.5, 1.0) == 2.0     # ratio 0.5 >= 0.2 -> double
    assert t.update(0.3, 1.0) == 4.0
    assert t.update(0.05, 1.0) == 3.0    # ratio < 0.1 -> bisect
    assert t.update(0.15, 1.0) == 3.0    # in band -> stop
    assert not t.active


def test_tuner_skips_compile_epoch(small_graph, monkeypatch):
    """fit(locality_tuner=True) must NOT feed the tuner epoch 0's
    buckets: the first epoch's execution time is compile-dominated, its
    movement/exec ratio reads ~0, and (at sf=1.0) the tuner's
    middle-zone rule would permanently deactivate the controller before
    it ever saw a steady epoch (observed on a canonical chip run)."""
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.metrics import EpochMetrics
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=32, samp_num=64, orders=(1, 1),
                        num_nodes=lap.shape[0],
                        num_classes=small_graph.num_classes)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=1,
                         pool_num=1)
    net = build_model("graphsage", nhid=8, orders=(1, 1),
                      num_classes=small_graph.num_classes)
    tr = Trainer(net, pipe, small_graph.feats, lr=0.01,
                 sigmoid_loss=False)

    def fake_epoch(train_nodes, epoch, rank_chunks=None):
        # epoch 0 looks compile-dominated (ratio ~0); later epochs are
        # movement-dominated (ratio 5.0 -> the tuner should double)
        exec_t = 100.0 if epoch == 0 else 1.0
        return EpochMetrics(epoch=epoch, train_loss=1.0, valid_loss=1.0,
                            valid_f1=0.0, data_movement_time=5.0,
                            execution_time=exec_t, sample_wait_time=0.0)

    monkeypatch.setattr(tr, "train_epoch", fake_epoch)
    monkeypatch.setattr(tr, "evaluate", lambda *a, **k: (0.0, 1.0))
    tr.fit(small_graph.train_nodes, small_graph.valid_nodes, epochs=3,
           log=False, locality_tuner=True)
    # epoch 0 skipped; epochs 1-2 (ratio 5.0) double twice: 1 -> 2 -> 4
    assert tr.pipeline.cfg.scale_factor == 4.0


def test_loss_matches_torch_formulas():
    """Golden check of `utils.py:129-140` semantics: BCEWithLogits with
    per-example weight 1/B sum reduction, and weighted CE."""
    preds = jnp.asarray([[2.0, -1.0], [0.5, 0.0], [-3.0, 1.0]])
    labels = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    mask = jnp.asarray([1.0, 1.0, 1.0])
    # manual BCE
    x, y = np.asarray(preds), np.asarray(labels)
    bce = np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x)))
    expected = (bce / 3).sum()
    got = float(masked_loss(preds, labels, mask, sigmoid_loss=True))
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # manual weighted CE with one-hot targets
    logp = x - np.log(np.exp(x).sum(1, keepdims=True))
    ce = -(y * logp).sum(1)
    expected = (ce / 3).sum()
    got = float(masked_loss(preds, labels, mask, sigmoid_loss=False))
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # padded rows contribute nothing
    mask2 = jnp.asarray([1.0, 1.0, 0.0])
    got2 = float(masked_loss(preds, labels, mask2, sigmoid_loss=True))
    expected2 = (bce[:2] / 2).sum()
    np.testing.assert_allclose(got2, expected2, rtol=1e-6)


def test_op_timing_buckets(small_graph):
    """measure_op_buckets returns finite per-step spmm fwd/bwd + comm
    estimates after an epoch, and fit(op_timing=True) surfaces them on
    the metrics line (reference main.py:196 buckets)."""
    import numpy as np
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian

    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=64, samp_num=128, orders=(1, 1),
                        num_nodes=small_graph.adj_full.shape[0],
                        num_classes=small_graph.num_classes)
    net = build_model("graphsage", 32, (1, 1), small_graph.num_classes)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                         pool_num=2)
    tr = Trainer(net, pipe, small_graph.feats, lr=0.05,
                 sigmoid_loss=False)
    hist = tr.fit(small_graph.train_nodes, small_graph.valid_nodes, 1,
                  log=False, op_timing=True)
    m = hist[0]
    assert np.isfinite(m.spmm_fwd_time) and m.spmm_fwd_time > 0
    assert np.isfinite(m.spmm_bwd_time) and m.spmm_bwd_time > 0
    assert np.isfinite(m.communication_time)
    assert "spmm" in m.format() and "comm" in m.format()


def test_kill_and_resume_reproduces_loss_curve(small_graph, tmp_path):
    """Crash recovery: train 4 epochs uninterrupted vs train 2 epochs,
    'crash', build a FRESH trainer and fit(resume=True) — the resumed
    epochs must reproduce the uninterrupted loss curve exactly (epoch-
    deterministic sampling + dropout + restored optimizer state)."""
    from tests.test_train_e2e import _make_trainer

    tr_full = _make_trainer(small_graph, world_size=2)
    hist_full = tr_full.fit(small_graph.train_nodes,
                            small_graph.valid_nodes, epochs=4, log=False)

    ck = str(tmp_path / "resume_ck")
    tr_a = _make_trainer(small_graph, world_size=2)
    tr_a.fit(small_graph.train_nodes, small_graph.valid_nodes, epochs=2,
             log=False, checkpoint_dir=ck)
    del tr_a  # the "crash"

    tr_b = _make_trainer(small_graph, world_size=2)
    hist_b = tr_b.fit(small_graph.train_nodes, small_graph.valid_nodes,
                      epochs=4, log=False, checkpoint_dir=ck,
                      resume=True)
    assert [m.epoch for m in hist_b] == [2, 3]
    for m_resumed in hist_b:
        m_ref = hist_full[m_resumed.epoch]
        np.testing.assert_allclose(m_resumed.train_loss,
                                   m_ref.train_loss, rtol=1e-5)
    assert tr_b.best_val >= 0  # watermark restored/updated


def test_resume_restores_best_params_for_test_sweep(small_graph,
                                                    tmp_path):
    """A resumed run's final test sweep must evaluate the BEST
    checkpoint, exactly like an uninterrupted run (`main.py:218-235`
    protocol): fit + crash + fit(resume=True) at the SAME final epoch
    (no further training) -> best_params is loaded from
    best_model.msgpack, and test() equals the uninterrupted run's."""
    from tests.test_train_e2e import _make_trainer

    ck = str(tmp_path / "best_resume_ck")
    tr_a = _make_trainer(small_graph, world_size=2)
    tr_a.fit(small_graph.train_nodes, small_graph.valid_nodes, epochs=3,
             log=False, checkpoint_dir=ck)
    assert tr_a.best_params is not None
    want_best = jax.tree_util.tree_map(np.asarray, tr_a.best_params)
    want_val = tr_a.best_val
    del tr_a

    tr_b = _make_trainer(small_graph, world_size=2)
    hist_b = tr_b.fit(small_graph.train_nodes, small_graph.valid_nodes,
                      epochs=3, log=False, checkpoint_dir=ck,
                      resume=True)
    assert hist_b == []  # already at the final epoch: no training ran
    assert tr_b.best_params is not None  # loaded from best_model
    assert tr_b.best_val == pytest.approx(want_val)
    for a, b in zip(jax.tree_util.tree_leaves(want_best),
                    jax.tree_util.tree_leaves(tr_b.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the sweep actually runs on them (F1 finite; eval batches are
    # themselves SAMPLED — reference sampler.py:194-210 — so the score
    # is rng-state-dependent and not comparable across trainers)
    got = tr_b.test(small_graph.test_nodes, batch_size=64)
    assert 0.0 <= got <= 1.0
