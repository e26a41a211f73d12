"""Decompose the canonical e2e step: pure device exec vs dispatch/H2D.

The epoch totals (EpochMetrics.total_time) bound the whole pipeline but
don't say WHERE the per-step time goes — async dispatch smears device
work across the sample/move/exec buckets. This probe measures, honestly
(chained iterations inside one jit + scalar readback, two-point
calibrated like benchmarks/timing.py):

  1. pure device exec of ONE full train step (fwd+bwd+clip+Adam) at
     canonical shapes, batch resident — the device floor;
  2. the per-dispatch cost of shipping one step's batch (device_put of
     the packed minibatch + readback) — the H2D/relay tax.

Run on the chip (~3 min warm):
    GNN_TPU_SYNTH_CACHE=/tmp/gnn_tpu_synth \
    python benchmarks/step_probe.py [--steps 8] [--samp 8192] ...
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=(
        "synthetic:nodes=232965,deg=100,feats=602,classes=41"))
    ap.add_argument("--samp", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--nhid", type=int, default=512)
    ap.add_argument("--hot_k", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=6,
                    help="chain length n (times n and 2n)")
    ap.add_argument("--save_dir", default="/tmp/gnn_save")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.expanduser("~"), ".cache", "jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.)
    except Exception:
        pass

    from gnn_tpu.data.loaders import load_dataset
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense_cached
    from gnn_tpu.parallel.feature_cache import ReplicatedFeatures
    from gnn_tpu.parallel.mesh import make_mesh, put_batch
    from gnn_tpu.placement.engine import compute_sample_prob
    from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample, \
        to_device_batch
    from gnn_tpu.sampling.pipeline import stack_minibatches
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
    cfg = SamplerConfig(batch_size=args.batch, samp_num=args.samp,
                        orders=orders, num_nodes=n,
                        num_classes=graph.num_classes,
                        adj_format="hot", hot_spec=hot_spec)
    net = build_model("graphsage", args.nhid, orders, graph.num_classes)
    src = ReplicatedFeatures(graph.feats, dtype=jnp.bfloat16)

    trainer = Trainer(net, None, graph.feats, mesh=make_mesh(1),
                      lr=0.04, sigmoid_loss=False, seed=0,
                      feature_source=src, hot_dense=hot_dense)
    print(f"setup {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    tgt = rng.choice(graph.train_nodes, args.batch, replace=False)
    mb = ladies_sample(cfg, 0, tgt, lap, graph.labels)
    stacked = stack_minibatches([mb])
    batch = to_device_batch(stacked)
    plan = src.plan(stacked)

    mesh = trainer.mesh
    dev_batch = put_batch(mesh, batch)
    dev_plan = put_batch(mesh, plan)
    trainer._init_params(dev_batch)
    fns = trainer.fns

    nbytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(batch)
                 if hasattr(a, "nbytes"))
    print(f"batch payload: {nbytes / 2**20:.1f} MiB", file=sys.stderr)

    # ---- 1. pure device exec per step (chained, two-point) ----
    feat_state, agg_state = trainer.feat_state, trainer.agg_state

    def chained(k):
        @jax.jit
        def run(params, opt_state, feat_state, agg_state, b, p):
            def body(i, c):
                params, opt_state, acc = c
                r = jax.random.fold_in(jax.random.PRNGKey(7), i)
                params, opt_state, loss = fns.train_step(
                    params, opt_state, feat_state, agg_state, b, p, r)
                return params, opt_state, acc + loss
            _, _, acc = jax.lax.fori_loop(
                0, k, body, (params, opt_state, jnp.float32(0)))
            return acc
        return run

    def timed(k):
        run = chained(k)
        np.asarray(run(trainer.params, trainer.opt_state, feat_state,
                       agg_state, dev_batch, dev_plan))  # compile+run
        best = np.inf
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(run(trainer.params, trainer.opt_state, feat_state,
                           agg_state, dev_batch, dev_plan))
            best = min(best, time.perf_counter() - t)
        return best

    k = args.steps
    t1, t2 = timed(k), timed(2 * k)
    exec_per_step = (t2 - t1) / k
    print(f"device exec/step: {exec_per_step * 1e3:.1f} ms "
          f"(T({k})={t1:.2f}s T({2 * k})={t2:.2f}s)", flush=True)

    # ---- 2. H2D + dispatch cost of one step's batch ----
    # device_put the host batch + force materialization via tiny readback
    host_leaves = jax.tree_util.tree_leaves((batch, plan))

    def ship_once():
        db = put_batch(mesh, batch)
        dp = put_batch(mesh, plan)
        for leaf in jax.tree_util.tree_leaves((db, dp)):
            leaf.block_until_ready()
        return db, dp

    ship_once()  # warm
    best = np.inf
    for _ in range(5):
        t = time.perf_counter()
        ship_once()
        best = min(best, time.perf_counter() - t)
    print(f"H2D ship/step: {best * 1e3:.1f} ms for {nbytes / 2**20:.1f} "
          f"MiB ({len(host_leaves)} leaves) -> "
          f"{nbytes / best / 2**20:.0f} MiB/s "
          f"(block_until_ready may under-report through the relay)",
          flush=True)

    # ---- 3. one full dispatched step, end to end (put + step + sync) --
    # train_step donates params/opt_state: roll the returned state forward
    cur_p, cur_o = trainer.params, trainer.opt_state

    def full_step(cur_p, cur_o, i):
        db = put_batch(mesh, batch)
        dp = put_batch(mesh, plan)
        p, o, loss = fns.train_step(cur_p, cur_o, feat_state, agg_state,
                                    db, dp,
                                    jax.random.fold_in(
                                        jax.random.PRNGKey(3), i))
        return p, o, float(loss)

    cur_p, cur_o, _ = full_step(cur_p, cur_o, 0)
    best = np.inf
    for i in range(5):
        t = time.perf_counter()
        cur_p, cur_o, _ = full_step(cur_p, cur_o, i + 1)
        best = min(best, time.perf_counter() - t)
    print(f"dispatched step (put+step+loss readback): {best * 1e3:.1f} ms",
          flush=True)

    # ---- 4. packed transport: one uint8 buffer per step ----
    from gnn_tpu.parallel import packbuf
    from gnn_tpu.parallel.mesh import data_sharded

    spec = packbuf.PackSpec.from_tree((batch, plan), 0)
    pool = packbuf.BufferPool()
    print(f"packed buffer: {spec.row_bytes / 2**20:.1f} MiB/row, "
          f"{len(spec.shapes)} leaves folded", file=sys.stderr)

    def pack_ship(i):
        buf = packbuf.pack(spec, (batch, plan), base_step=i, n_valid=1,
                           out=pool.get(spec.ws, spec.row_bytes +
                                        packbuf.TRAILER_BYTES))
        db = jax.device_put(buf, data_sharded(mesh))
        db.block_until_ready()
        return db

    t = time.perf_counter()
    pack_ship(0)
    print(f"packed ship (cold): {(time.perf_counter() - t) * 1e3:.1f} ms",
          flush=True)
    best = np.inf
    for i in range(5):
        t = time.perf_counter()
        pack_ship(i)
        best = min(best, time.perf_counter() - t)
    print(f"packed pack+ship/step: {best * 1e3:.1f} ms "
          f"({(spec.row_bytes + 8) / 2**20:.1f} MiB, 1 leaf)", flush=True)

    packed_fn = trainer._packed_fn(spec)
    epoch_key = jax.device_put(jax.random.PRNGKey(11),
                               jax.sharding.NamedSharding(
                                   mesh, jax.sharding.PartitionSpec()))

    def full_packed_step(cur_p, cur_o, i):
        buf = packbuf.pack(spec, (batch, plan), base_step=i, n_valid=1,
                           out=pool.get(spec.ws, spec.row_bytes +
                                        packbuf.TRAILER_BYTES))
        db = jax.device_put(buf, data_sharded(mesh))
        p, o, loss = packed_fn(cur_p, cur_o, feat_state, agg_state,
                               epoch_key, db)
        return p, o, float(loss)

    cur_p, cur_o, _ = full_packed_step(cur_p, cur_o, 0)  # compile
    best = np.inf
    for i in range(5):
        t = time.perf_counter()
        cur_p, cur_o, _ = full_packed_step(cur_p, cur_o, i + 1)
        best = min(best, time.perf_counter() - t)
    print(f"packed dispatched step (pack+put+step+loss readback): "
          f"{best * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
