"""Dataset loader tests (GraphSAINT format + synthetic scheme; OGB gated)."""
import json
import os

import numpy as np
import pytest
import scipy.sparse as sp

from gnn_tpu.data.loaders import load_dataset, load_graphsaint_data


def _write_graphsaint_dir(tmp_path, n=40, c=3, multilabel=False):
    d = tmp_path / "tiny"
    os.makedirs(d)
    rng = np.random.RandomState(0)
    m = sp.random(n, n, density=0.2, format="csr", random_state=rng,
                  dtype=np.float32)
    m = m + m.T
    sp.save_npz(d / "adj_full.npz", m.tocoo())
    ids = list(range(n))
    role = {"tr": ids[: n // 2], "va": ids[n // 2: 3 * n // 4],
            "te": ids[3 * n // 4:]}
    with open(d / "role.json", "w") as f:
        json.dump(role, f)
    np.save(d / "feats.npy", rng.randn(n, 8).astype(np.float32))
    if multilabel:
        cm = {str(i): rng.randint(0, 2, c).tolist() for i in range(n)}
    else:
        cm = {str(i): int(rng.randint(1, c + 1)) for i in range(n)}  # 1-based
    with open(d / "class_map.json", "w") as f:
        json.dump(cm, f)
    return str(tmp_path), "tiny", cm


def test_graphsaint_single_label(tmp_path):
    root, name, cm = _write_graphsaint_dir(tmp_path)
    g = load_graphsaint_data(name, root)
    assert g.num_classes == 3  # offset-normalized (labels were 1..3)
    assert g.labels.shape == (40, 3)
    # every node one-hot at (label - min)
    dense = np.asarray(g.labels.todense())
    for i in range(40):
        assert dense[i, cm[str(i)] - 1] == 1
    # train-fit standardization: train feats ~zero-mean
    tr = g.feats[g.train_nodes]
    assert np.abs(tr.mean(0)).max() < 0.2


def test_graphsaint_multilabel(tmp_path):
    root, name, cm = _write_graphsaint_dir(tmp_path, multilabel=True)
    g = load_graphsaint_data(name, root)
    assert g.num_classes == 3
    dense = np.asarray(g.labels.todense())
    np.testing.assert_array_equal(dense[5], np.asarray(cm["5"]))


def test_synthetic_scheme():
    g = load_dataset("synthetic:nodes=500,deg=6,feats=12,classes=4,seed=9")
    assert g.adj_full.shape == (500, 500)
    assert g.feats.shape == (500, 12)
    assert g.num_classes == 4
    gm = load_dataset("synthetic:nodes=300,deg=6,feats=8,classes=4,multilabel")
    assert np.asarray(gm.labels.todense()).sum(axis=1).max() > 1


def test_ogb_gated_error():
    with pytest.raises(ImportError, match="ogb"):
        load_dataset("ogbn-arxiv", "/tmp/nonexistent")


def test_synthetic_graph_cache_roundtrip(tmp_path):
    """Disk-cached synthetic graphs reload exactly (adj, labels, feats,
    splits) — the cache every big benchmark run hits."""
    import numpy as np

    from gnn_tpu.data.loaders import _load_graph_cache, _save_graph_cache
    from gnn_tpu.data.synthetic import make_powerlaw_graph

    g = make_powerlaw_graph(500, 8, 12, 5, seed=3)
    path = str(tmp_path / "g.npz")
    _save_graph_cache(path, g)
    g2 = _load_graph_cache(path)
    assert (g.adj_full != g2.adj_full).nnz == 0
    assert (g.labels.tocsr() != g2.labels.tocsr()).nnz == 0
    np.testing.assert_array_equal(g.feats, g2.feats)
    np.testing.assert_array_equal(g.train_nodes, g2.train_nodes)
    np.testing.assert_array_equal(g.test_nodes, g2.test_nodes)
    assert g2.num_classes == g.num_classes
    # corrupt cache falls back to None (caller regenerates)
    (tmp_path / "bad.npz").write_bytes(b"not an npz")
    assert _load_graph_cache(str(tmp_path / "bad.npz")) is None
