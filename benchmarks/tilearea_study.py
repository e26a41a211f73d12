"""Host-only study: how much does reordering a layer's LOCAL indices
shrink the number of occupied cold tiles (the edge-stream kernel's cost
is ~proportional to occupied-tile AREA, not edge count — the seg-grid
probe showed grid overhead is immaterial)?

Orders tried per layer (rows and cols independently permuted):
  none     — sampler order (locals ascend by global id)
  hotfirst — stable partition: hot locals (rank < K) first
  rank     — locals sorted by global sample-prob rank (subsumes
             hotfirst; clusters high-degree cold nodes together)
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def occ_tiles(r, c, bm, bk, n_ct):
    key = (r // bm).astype(np.int64) * n_ct + (c // bk)
    return len(np.unique(key))


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    z = np.load(os.path.join(here, "..", "bench_cache",
                             "minibatch_v2.npz"))
    rank = np.load(os.path.join(here, "..", "bench_cache",
                                "prob_rank.npy"))
    K = int(os.environ.get("GNN_TPU_PROBE_K", "32768"))
    bm = bk = 256
    for li in range(int(z["n_layers"])):
        R, C = int(z[f"R{li}"]), int(z[f"C{li}"])
        rows, cols = z[f"rows{li}"], z[f"cols{li}"]
        prev, after = z[f"prev{li}"], z[f"after{li}"]
        R, C = len(prev), len(after)   # valid (unpadded) local counts
        r_rank = rank[prev]          # [R] global rank of each local row
        c_rank = rank[after]
        cold = ~((r_rank[rows] < K) & (c_rank[cols] < K))
        cr, cc = rows[cold], cols[cold]
        n_ct = -(-C // bk)
        base = occ_tiles(cr, cc, bm, bk, n_ct)

        def perm_from(keys_r, keys_c):
            pr = np.empty(R, np.int64)
            pr[np.argsort(keys_r, kind="stable")] = np.arange(R)
            pc = np.empty(C, np.int64)
            pc[np.argsort(keys_c, kind="stable")] = np.arange(C)
            return occ_tiles(pr[cr], pc[cc], bm, bk, n_ct)

        hot = perm_from(r_rank >= K, c_rank >= K)
        rk = perm_from(r_rank, c_rank)
        full = (-(-R // bm)) * n_ct
        print(f"L{li} [{R}x{C}] cold={len(cr)}: tiles "
              f"none={base} ({100*base/full:.0f}% of {full}) "
              f"hotfirst={hot} ({base/hot:.2f}x) "
              f"rank={rk} ({base/rk:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
