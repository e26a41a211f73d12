"""Sustained train-dispatch throughput under different H2D transport
strategies (the isolated per-step probe in step_probe.py mispredicts
the loop: what matters is how transfers OVERLAP queued device work).

Strategies, all shipping the same canonical grouped batch (G steps
per dispatch, ~10.5*G MiB):

  leaf      per-leaf device_put of the raw pytree (round-1 transport)
  packed    ONE blocking uint8-buffer put (round-2 v1)
  chunk4    the packed buffer split into 4 column chunks put
            concurrently from a thread pool
  thread    packed put issued from a transfer thread one dispatch
            ahead (main thread never blocks on the wire)

Run on the chip:
    GNN_TPU_SYNTH_CACHE=/tmp/gnn_tpu_synth \
    python benchmarks/transport_probe.py [--dispatches 24] [--group 4]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=(
        "synthetic:nodes=232965,deg=100,feats=602,classes=41"))
    ap.add_argument("--samp", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--nhid", type=int, default=512)
    ap.add_argument("--hot_k", type=int, default=32768)
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--dispatches", type=int, default=24)
    ap.add_argument("--save_dir", default="/tmp/gnn_save")
    ap.add_argument("--strategies", default="exec,leaf,packed,typed,chunk4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnn_tpu.data.loaders import load_dataset
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense_cached
    from gnn_tpu.parallel import packbuf
    from gnn_tpu.parallel.feature_cache import ReplicatedFeatures
    from gnn_tpu.parallel.mesh import data_sharded, make_mesh, \
        put_grouped_batch
    from gnn_tpu.placement.engine import compute_sample_prob
    from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
    from gnn_tpu.sampling.pipeline import regroup_minibatch, \
        stack_minibatches
    from gnn_tpu.sampling.ladies import to_device_batch
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian

    t0 = time.time()
    graph = load_dataset(args.dataset, "data")
    lap = build_laplacian(graph.adj_full, "graphsage")
    n = graph.adj_full.shape[0]
    orders = (1, 1, 1)
    dsname = args.dataset.replace("/", "_").replace(":", "_")
    depth = sum(orders)
    prob_path = os.path.join(args.save_dir,
                             f"{dsname}.sampprob.L{depth}.npy")
    prob = np.load(prob_path) if os.path.exists(prob_path) else \
        compute_sample_prob(lap, graph.train_nodes, depth)
    hot_spec = HotSpec.from_sample_prob(prob, args.hot_k)
    hot_dense = build_hot_dense_cached(
        lap, hot_spec, dtype=jnp.bfloat16,
        cache_path=os.path.join(args.save_dir,
                                f"{dsname}.hotcoo.L{depth}"
                                f".K{args.hot_k}.npz"))
    G = args.group
    cfg = SamplerConfig(batch_size=args.batch, samp_num=args.samp,
                        orders=orders, num_nodes=n,
                        num_classes=graph.num_classes,
                        adj_format="hot", hot_spec=hot_spec)
    net = build_model("graphsage", args.nhid, orders, graph.num_classes)
    src = ReplicatedFeatures(graph.feats, dtype=jnp.bfloat16)
    trainer = Trainer(net, None, graph.feats, mesh=make_mesh(1),
                      lr=0.04, sigmoid_loss=False, seed=0,
                      feature_source=src, hot_dense=hot_dense,
                      steps_per_dispatch=G)

    # ONE fixed grouped batch reused for every dispatch (pure transport
    # + device throughput; no sampling in the loop)
    rng = np.random.default_rng(0)
    mbs = [ladies_sample(cfg, s, rng.choice(graph.train_nodes,
                                            args.batch, replace=False),
                         lap, graph.labels) for s in range(G)]
    mb = regroup_minibatch(stack_minibatches(mbs), G)
    batch = to_device_batch(mb)
    plan = ()
    trainer._init_params(jax.tree_util.tree_map(lambda a: a[0], batch))
    print(f"setup {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    mesh = trainer.mesh
    feat_state, agg_state = trainer.feat_state, trainer.agg_state
    spec = packbuf.PackSpec.from_tree((batch, plan), 1)
    nbytes = spec.row_bytes + packbuf.TRAILER_BYTES
    pool = packbuf.BufferPool()
    epoch_key = jax.device_put(
        jax.random.PRNGKey(1),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    packed_fn = trainer._packed_fn(spec, group=G)
    sh = data_sharded(mesh)
    ND = args.dispatches

    valid = jnp.ones((G,), bool)

    # ---------------- strategies ----------------
    # Each keeps its OWN (params, opt_state) chain (the steps donate
    # them); all are timed INTERLEAVED round-robin with a block per
    # dispatch, because the relay's throughput drifts over minutes —
    # sequential per-strategy timing confounds strategy with time.
    host_p = jax.tree_util.tree_map(np.asarray, trainer.params)
    host_o = jax.tree_util.tree_map(np.asarray, trainer.opt_state)

    from gnn_tpu.parallel.mesh import put_replicated

    rngs0 = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(1), g)
                       for g in range(G)])

    def f_exec(p, o, i, db_cache={}):
        if "db" not in db_cache:
            db_cache["db"] = put_grouped_batch(mesh, batch)
        p, o, _ = trainer.fns.train_multi_step(
            p, o, feat_state, agg_state, db_cache["db"], plan, rngs0,
            valid)
        return p, o

    def f_leaf(p, o, i):
        db = put_grouped_batch(mesh, batch)
        p, o, _ = trainer.fns.train_multi_step(
            p, o, feat_state, agg_state, db, plan, rngs0, valid)
        return p, o

    def f_packed(p, o, i):
        buf = packbuf.pack(spec, (batch, plan), i, G,
                           out=pool.get(spec.ws, nbytes))
        db = jax.device_put(buf, sh)
        p, o, _ = packed_fn(p, o, feat_state, agg_state, epoch_key, db)
        return p, o

    tspec = packbuf.TypedPackSpec((batch, plan), 1)
    typed_fn = trainer.fns.make_typed_multi_step(tspec, G)
    print("typed pools:", {d: c for d, c in tspec.pool_counts.items()},
          file=sys.stderr)

    def f_typed(p, o, i):
        pools = tspec.pack((batch, plan), i, G, pool=pool)
        dp = jax.device_put(pools, sh)
        p, o, _ = typed_fn(p, o, feat_state, agg_state, epoch_key, dp)
        return p, o

    xfer = ThreadPoolExecutor(4)
    n_chunks = 4
    bounds = [int(nbytes * k / n_chunks) for k in range(n_chunks + 1)]
    chunk_fn = trainer.fns.make_packed_multi_step_chunked(
        spec, G, tuple(b2 - b1 for b1, b2 in zip(bounds, bounds[1:])))

    def f_chunk(p, o, i):
        buf = packbuf.pack(spec, (batch, plan), i, G,
                           out=pool.get(spec.ws, nbytes))
        futs = [xfer.submit(jax.device_put, buf[:, b1:b2], sh)
                for b1, b2 in zip(bounds, bounds[1:])]
        chunks = [f.result() for f in futs]
        p, o, _ = chunk_fn(p, o, feat_state, agg_state, epoch_key,
                           *chunks)
        return p, o

    def make_f_chunk_n(n_chunks, workers=None, align=512):
        ex = ThreadPoolExecutor(workers or n_chunks)
        step = -(-nbytes // n_chunks)
        step = -(-step // align) * align
        bnds = [min(k * step, nbytes) for k in range(n_chunks + 1)]
        widths = tuple(b2 - b1 for b1, b2 in zip(bnds, bnds[1:])
                       if b2 > b1)
        fn = trainer.fns.make_packed_multi_step_chunked(spec, G, widths)

        def f(p, o, i):
            buf = packbuf.pack(spec, (batch, plan), i, G,
                               out=pool.get(spec.ws, nbytes))
            futs = [ex.submit(jax.device_put, buf[:, b1:b1 + w], sh)
                    for b1, w in zip(bnds, widths)]
            chunks = [f_.result() for f_ in futs]
            p, o, _ = fn(p, o, feat_state, agg_state, epoch_key, *chunks)
            return p, o
        return f

    def make_f_typed_par():
        ex = ThreadPoolExecutor(len(tspec.pool_counts))

        def f(p, o, i):
            pools_h = tspec.pack((batch, plan), i, G, pool=pool)
            futs = {d: ex.submit(jax.device_put, a, sh)
                    for d, a in pools_h.items()}
            dp = {d: f_.result() for d, f_ in futs.items()}
            p, o, _ = typed_fn(p, o, feat_state, agg_state, epoch_key,
                               dp)
            return p, o
        return f

    all_strats = {"exec": f_exec, "leaf": f_leaf, "packed": f_packed,
                  "typed": f_typed, "chunk4": f_chunk,
                  "typedpar": make_f_typed_par(),
                  "chunk8": make_f_chunk_n(8),
                  "chunk16": make_f_chunk_n(16),
                  "chunk32": make_f_chunk_n(32)}
    todo = [s for s in args.strategies.split(",") if s in all_strats]
    state = {}
    for s in todo:
        state[s] = (put_replicated(mesh, host_p),
                    put_replicated(mesh, host_o))
        p, o = all_strats[s](*state[s], 0)     # compile warm
        jax.block_until_ready(p)
        state[s] = (p, o)
    totals = {s: 0.0 for s in todo}
    for r in range(args.dispatches):
        for s in todo:
            p, o = state[s]
            t0 = time.perf_counter()
            p, o = all_strats[s](p, o, r + 1)
            jax.block_until_ready(p)
            totals[s] += time.perf_counter() - t0
            state[s] = (p, o)
        if (r + 1) % 4 == 0:
            print(f"  round {r+1}: " + "  ".join(
                f"{s}={totals[s]/(r+1)*1e3:.0f}ms" for s in todo),
                flush=True)
    print("---- per-dispatch means over "
          f"{args.dispatches} interleaved rounds "
          f"({spec.row_bytes / 2**20:.1f} MiB/dispatch) ----", flush=True)
    for s in todo:
        per = totals[s] / args.dispatches
        print(f"{s:8s}: {per * 1e3:7.1f} ms/dispatch "
              f"({per / G * 1e3:6.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
