"""ONE place for the canonical Reddit-scale benchmark graph recipe.

bench.py's cache, the hot-COO sidecar, and the coverage/edgestream
probes all depend on the SAME deterministic graph + sample-prob
ranking; before this helper the recipe was copy-pasted four times and
a seed/shape change would silently desynchronize the caches."""
from __future__ import annotations

import numpy as np

N_NODES, AVG_DEG, N_FEATS, N_CLASSES, SEED = 232965, 100, 8, 41, 0


def canonical_graph_and_prob(depth: int = 3):
    """(graph, lap, sample_prob) of the canonical benchmark graph."""
    from gnn_tpu.data.synthetic import make_powerlaw_graph
    from gnn_tpu.placement.engine import compute_sample_prob
    from gnn_tpu.utils.normalize import build_laplacian

    g = make_powerlaw_graph(N_NODES, AVG_DEG, N_FEATS, N_CLASSES,
                            seed=SEED)
    lap = build_laplacian(g.adj_full, "graphsage")
    prob = compute_sample_prob(lap, g.train_nodes, depth)
    return g, lap, prob


def canonical_rank(depth: int = 3) -> np.ndarray:
    """rank[node] = position in the descending sample-prob order."""
    _, _, prob = canonical_graph_and_prob(depth)
    order = np.argsort(-prob, kind="stable")
    rank = np.empty(len(prob), np.int64)
    rank[order] = np.arange(len(prob))
    return rank
