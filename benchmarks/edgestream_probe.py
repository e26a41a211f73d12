"""On-chip probe: edge-stream tile-densify SpMM vs sorted-COO
segment-sum on the canonical minibatch's COLD residual (the piece that
bounds the deployed hot path — RESULTS.md: every XLA formulation is
gather-bound at 20-50 ns/edge; this kernel's cost is ~the dense MXU
cost of the occupied tiles, independent of cold count).

Run ALONE on the chip (one TPU process rule). Reads the bench cache;
reports per-layer fwd/bwd times for both cold formulations at a given
hot K (GNN_TPU_PROBE_K, default 16384; bench.py's deployed K_HOT default
is 32768 — pass GNN_TPU_PROBE_K=32768 to match it; ranks come from
the full sample-prob ordering recomputed on the
host, cached next to the bench cache)."""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from benchmarks.timing import chain_time
    from gnn_tpu.ops import sparse as sops
    from gnn_tpu.ops.pallas_edgestream import (edge_stream_spmm,
                                               pack_edge_tiles)

    log(f"backend: {jax.default_backend()}")
    here = os.path.dirname(os.path.abspath(__file__))
    z = np.load(os.path.join(here, "..", "bench_cache",
                             "minibatch_v2.npz"))
    rank_path = os.path.join(here, "..", "bench_cache", "prob_rank.npy")
    if os.path.exists(rank_path):
        rank = np.load(rank_path)
    else:
        from benchmarks.canonical_graph import canonical_rank
        log("recomputing sample-prob ranking (one-time)...")
        rank = canonical_rank(3)
        np.save(rank_path, rank)

    K = int(os.environ.get("GNN_TPU_PROBE_K", "16384"))
    ecap = int(os.environ.get("GNN_TPU_PROBE_ECAP", "256"))
    bk = int(os.environ.get("GNN_TPU_PROBE_BK", "128"))
    bm = int(os.environ.get("GNN_TPU_PROBE_BM", "128"))
    n_feats = 602
    rng = np.random.RandomState(0)
    n_iter = 16

    for li in range(int(z["n_layers"])):
        R, C = int(z[f"R{li}"]), int(z[f"C{li}"])
        rows, cols = z[f"rows{li}"], z[f"cols{li}"]
        vals = z[f"vals{li}"]
        prev, after = z[f"prev{li}"], z[f"after{li}"]
        # cached normfact is unpadded (len(after) entries); pad to the
        # layer's padded column cap C
        normfact = np.zeros(C, np.float32)
        nf_raw = z[f"normfact{li}"].astype(np.float32)
        normfact[: len(nf_raw)] = nf_raw
        cold = ~((rank[prev[rows]] < K) & (rank[after[cols]] < K))
        cr, cc, cv = rows[cold], cols[cold], vals[cold]
        # rank-1 factors: vals = lap_val * nf[col]; graphsage laps are
        # row-constant, so rv[r] = lap row value (recovered per row)
        rv = np.zeros(R, np.float32)
        nf_safe = np.where(normfact[cc] > 0, normfact[cc], 1.0)
        rv[cr] = cv / nf_safe
        exact = np.abs(rv[cr] * normfact[cc] - cv).max() if len(cr) \
            else 0.0
        log(f"layer {li} [{R}x{C}] cold={len(cr)} "
            f"({100 * len(cr) / max(len(rows), 1):.0f}%) "
            f"rank1 max err {exact:.2e}")

        x = jnp.asarray(rng.randn(C, n_feats).astype(np.float32))
        gy = jnp.asarray(rng.randn(R, n_feats).astype(np.float32))

        # --- current formulation: sorted segment-sum over padded COO
        coo = jax.tree_util.tree_map(
            jnp.asarray, sops.pack_coo(cr, cc, cv, R, C, R, C,
                                       compress=True))
        tf = chain_time(lambda u, a: sops.spmm(a, u), x, n=n_iter,
                        args=(coo,))
        tb = chain_time(lambda u, a: sops.spmm_transpose(a, u), gy,
                        n=n_iter, args=(coo,))
        log(f"  segsum:      fwd {tf * 1e3:7.3f} ms  bwd {tb * 1e3:7.3f} ms")

        # --- edge-stream tile-densify kernel
        tiles = jax.tree_util.tree_map(
            jnp.asarray,
            pack_edge_tiles(cr.astype(np.int64), cc.astype(np.int64),
                            R, C, bm=bm, bk=bk, ecap=ecap))
        nb = tiles.blk_rc.shape[0]
        rvj, nfj = jnp.asarray(rv), jnp.asarray(normfact)
        y_k = np.asarray(edge_stream_spmm(tiles, x, rvj, nfj))
        y_s = np.asarray(sops.spmm(coo, x))
        err = np.abs(y_k - y_s).max() / max(np.abs(y_s).max(), 1e-9)
        dx_k = np.asarray(edge_stream_spmm(tiles, gy, rvj, nfj,
                                           transpose=True))
        dx_s = np.asarray(sops.spmm_transpose(coo, gy))
        errt = np.abs(dx_k - dx_s).max() / max(np.abs(dx_s).max(), 1e-9)
        log(f"  edgestream:  entries={nb}  rel err fwd {err:.2e} "
            f"bwd {errt:.2e}")
        tf2 = chain_time(
            lambda u, t, rv_, nf_: edge_stream_spmm(t, u, rv_, nf_),
            x, n=n_iter, args=(tiles, rvj, nfj))
        tb2 = chain_time(
            lambda u, t, rv_, nf_: edge_stream_spmm(t, u, rv_, nf_,
                                                    transpose=True),
            gy, n=n_iter, args=(tiles, rvj, nfj))
        log(f"  edgestream:  fwd {tf2 * 1e3:7.3f} ms  bwd {tb2 * 1e3:7.3f} ms"
            f"  ({tf / max(tf2, 1e-9):.1f}x / {tb / max(tb2, 1e-9):.1f}x)")

        # --- segment-grid kernel: one grid step per row-tile segment
        # (fwd on the same pack; bwd = the FORWARD kernel on a second
        # pack with (rows, cols) swapped — both directions rt-major)
        from gnn_tpu.ops.pallas_edgestream import (edge_stream_spmm_seg,
                                                   segment_tiles)
        segp = jnp.asarray(segment_tiles(
            np.asarray(tiles.blk_rc), np.asarray(tiles.off)))
        tiles_t = jax.tree_util.tree_map(
            jnp.asarray,
            pack_edge_tiles(cc.astype(np.int64), cr.astype(np.int64),
                            C, R, bm=bk, bk=bm, ecap=ecap))
        segp_t = jnp.asarray(segment_tiles(
            np.asarray(tiles_t.blk_rc), np.asarray(tiles_t.off)))
        y_g = np.asarray(edge_stream_spmm_seg(tiles, segp, x, rvj, nfj))
        errg = np.abs(y_g - y_s).max() / max(np.abs(y_s).max(), 1e-9)
        dx_g = np.asarray(edge_stream_spmm_seg(tiles_t, segp_t, gy,
                                               nfj, rvj))
        errgt = np.abs(dx_g - dx_s).max() / max(np.abs(dx_s).max(), 1e-9)
        log(f"  seg-grid:    segs={int(segp.shape[0]) - 1}/"
            f"{int(segp_t.shape[0]) - 1}  rel err fwd {errg:.2e} "
            f"bwd {errgt:.2e}")
        tf3 = chain_time(
            lambda u, t, sp, rv_, nf_: edge_stream_spmm_seg(
                t, sp, u, rv_, nf_),
            x, n=n_iter, args=(tiles, segp, rvj, nfj))
        tb3 = chain_time(
            lambda u, t, sp, rv_, nf_: edge_stream_spmm_seg(
                t, sp, u, rv_, nf_),
            gy, n=n_iter, args=(tiles_t, segp_t, nfj, rvj))
        log(f"  seg-grid:    fwd {tf3 * 1e3:7.3f} ms  bwd {tb3 * 1e3:7.3f} ms"
            f"  ({tf2 / max(tf3, 1e-9):.2f}x / {tb2 / max(tb3, 1e-9):.2f}x"
            f" vs per-entry)")


if __name__ == "__main__":
    main()
