"""Hot-coverage study: fraction of canonical-minibatch edges captured by
the resident top-K hot block, per layer, as K grows — the ONLY lever on
the cold residual (RESULTS.md: every cold formulation is gather-bound at
20-50 ns/edge). Reads the layer COOs from bench_cache/minibatch_v2.npz
and recomputes the full sample-prob ranking (graph regeneration is
seed-deterministic). Host-only; no TPU.

Also reports the cold split by side (hot-row/cold-col vs cold-row) to
judge whether a rectangular [K_r, K_c] block would beat a square one.
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from benchmarks.canonical_graph import canonical_rank

    here = os.path.dirname(os.path.abspath(__file__))
    z = np.load(os.path.join(here, "..", "bench_cache",
                             "minibatch_v2.npz"))
    n_layers = int(z["n_layers"])

    print("regenerating graph + sample prob (deterministic)...",
          flush=True)
    rank = canonical_rank(3)

    ks = [8192, 16384, 32768, 49152, 65536, 98304]
    for li in range(n_layers):
        rows, cols = z[f"rows{li}"], z[f"cols{li}"]
        prev, after = z[f"prev{li}"], z[f"after{li}"]
        rr = rank[prev[rows]]        # global hotness rank of each edge's row
        rc = rank[after[cols]]
        nnz = len(rows)
        print(f"layer {li}: nnz={nnz}")
        for K in ks:
            hot = (rr < K) & (rc < K)
            cold = ~hot
            n_cold = int(cold.sum())
            # split the cold set: row hot (col is the miss) vs row cold
            rowhot = int((cold & (rr < K)).sum())
            blk_bf16_gib = 2 * (K ** 2) * 2 / 2 ** 30
            print(f"  K={K:6d}: hot {100 * (nnz - n_cold) / nnz:5.1f}%  "
                  f"cold {n_cold:7d}  (row-hot/col-cold {rowhot:7d}, "
                  f"row-cold {n_cold - rowhot:7d})  "
                  f"blocks {blk_bf16_gib:.1f} GiB bf16", flush=True)


if __name__ == "__main__":
    main()
