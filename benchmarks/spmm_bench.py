"""SpMM strategy benchmark on real LADIES minibatch shapes.

Generates a Reddit-scale synthetic graph, samples a real LADIES minibatch,
and times every SpMM implementation on the actual sampled adjacencies:
  - pallas stream kernel (bm 8 / 128, default & highest precision)
  - XLA COO gather + segment_sum
  - dense MXU matmul (prebuilt dense A, f32 and bf16)
Prints per-layer timings and edges/s.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.data.synthetic import make_powerlaw_graph
from gnn_tpu.ops import sparse as sops
from gnn_tpu.ops.pallas_spmm import pack_stream, stream_spmm
from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
from gnn_tpu.utils.normalize import build_laplacian


import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.timing import chain_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=232965)
    ap.add_argument("--avg-degree", type=int, default=100)
    ap.add_argument("--feats", type=int, default=602)
    ap.add_argument("--samp-num", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    print("generating graph...", flush=True)
    g = make_powerlaw_graph(args.nodes, args.avg_degree, 8, 41, seed=0)
    lap = build_laplacian(g.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=args.batch, samp_num=args.samp_num,
                        orders=(1, 1, 1), num_nodes=args.nodes,
                        num_classes=41)
    print("sampling...", flush=True)
    mb = ladies_sample(cfg, 0, g.train_nodes[: args.batch], lap, g.labels)
    rng = np.random.RandomState(0)

    for li, adj in enumerate(mb.adjs):
        R, C = adj.shape
        rows, cols, vals = (np.asarray(adj.rows), np.asarray(adj.cols),
                            np.asarray(adj.vals))
        nnz = int((vals != 0).sum())
        x = jnp.asarray(rng.randn(C, args.feats).astype(np.float32))
        dens = nnz / (int(mb.adjs[li].n_valid_rows) * max(int(mb.adjs[li].n_valid_cols),1))
        print(f"\n== layer {li}: A [{R}x{C}] nnz={nnz} density={dens:.4%}",
              flush=True)

        results = {}
        # pallas stream variants
        import numpy as _np
        for bm in (8, 128):
            for prec, vdt, xdt in (("default", _np.float32, jnp.float32),
                                   ("highest", _np.float32, jnp.float32),
                                   ("default", _np.dtype(jnp.bfloat16), jnp.bfloat16)):
                tag = f"pallas bm={bm} {prec} {_np.dtype(vdt).name[:4]}"
                try:
                    st = pack_stream(rows, cols, vals, R, C, bm=bm, bk=128,
                                     dtype=vdt)
                    st = jax.tree_util.tree_map(jnp.asarray, st)
                    xx = x.astype(xdt)
                    if st.blk_rc.shape[0] > 240000:
                        print(f"  {tag:28s}: SKIP (stream too long)",
                              flush=True)
                        continue
                    t = chain_time(
                        lambda z, st_: stream_spmm(st_, z, precision=prec),
                        xx, n=16, args=(st,))
                    nb = st.blk_rc.shape[0]
                    results[tag] = t
                    print(f"  {tag:28s}: {t*1e3:8.3f} ms  "
                          f"(nb={nb}, occ={nb/((R//bm)*(C//128)):.1%}, "
                          f"{nnz/t/1e9:.2f} Gedge/s)", flush=True)
                except Exception as e:
                    print(f"  {tag:28s}: FAILED {str(e)[:120]}", flush=True)
        # coo segment-sum
        coo = sops.pack_coo(rows, cols, vals, R, C, R, C)
        coo = jax.tree_util.tree_map(jnp.asarray, coo)
        t = chain_time(lambda z, c: sops.spmm(c, z), x, n=16,
                       args=(coo,))
        results["coo"] = t
        print(f"  coo segsum        : {t*1e3:8.3f} ms  ({nnz/t/1e9:.2f} Gedge/s)",
              flush=True)
        # dense
        dense = np.zeros((R, C), np.float32)
        dense[rows, cols] = vals
        dj = jnp.asarray(dense)
        t = chain_time(lambda z, a: a @ z, x, n=16, args=(dj,))
        results["dense f32"] = t
        print(f"  dense f32 matmul  : {t*1e3:8.3f} ms  ({nnz/t/1e9:.2f} Gedge/s)",
              flush=True)
        db = dj.astype(jnp.bfloat16)
        xb = x.astype(jnp.bfloat16)
        t = chain_time(lambda z, a: (a @ z), xb, n=16, args=(db,))
        results["dense bf16"] = t
        print(f"  dense bf16 matmul : {t*1e3:8.3f} ms  ({nnz/t/1e9:.2f} Gedge/s)",
              flush=True)
        # roofline estimate: bytes for COO = nnz*(4+4+4) + C*F*4 + R*F*4
        bw = 819e9
        roof = (nnz*12 + (C+R)*args.feats*4) / bw
        print(f"  [mem roofline ~{roof*1e3:.3f} ms @819GB/s]", flush=True)


if __name__ == "__main__":
    main()
