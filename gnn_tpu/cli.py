"""Command-line trainer mirroring the reference CLI
(`/root/reference/main.py:24-65`), flag for flag, plus TPU-specific
extensions (adjacency format, mesh size, checkpoint/resume).

Run e.g.::

    python -m gnn_tpu.cli --dataset synthetic:nodes=50000,deg=30 \
        --model graphsage --nhid 512 --orders 1,1,1 --samp_num 8192 \
        --batch_size 512 --epoch_num 10 --n_devices 1

Reference flag semantics preserved: ``--orders '1,1,1'`` is both the layer
count and per-layer aggregation order (0 = dense layer); ``--buffer_size``
is a fraction of N; ``--alpha`` gates placement replacement; ``--cuda``
is accepted (ignored) for drop-in compatibility.
"""
from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native GNN training (GraphSAGE/GCN + LADIES)")
    # --- reference flags (`main.py:24-65`) ---
    p.add_argument("--dataset", type=str, default="synthetic",
                   help="dataset name, GraphSAINT dir, ogbn-*, or "
                        "synthetic:nodes=..,deg=..")
    p.add_argument("--model", type=str, default="graphsage",
                   choices=["graphsage", "gcn", "gat", "gin"])
    p.add_argument("--nhid", type=int, default=512)
    p.add_argument("--epoch_num", type=int, default=4)
    p.add_argument("--pool_num", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--orders", type=str, default="1,1,1")
    p.add_argument("--samp_num", type=int, default=8192)
    p.add_argument("--cuda", type=str, default="",
                   help="accepted for reference compatibility; ignored "
                        "(use --n_devices)")
    # reference `main.py:44` declares type=bool default=True, which makes
    # sigmoid BCE effectively always on; default True matches that, and
    # --no_sigmoid_loss provides the off switch argparse-bool can't express
    p.add_argument("--sigmoid_loss", dest="sigmoid_loss",
                   action="store_true", default=True)
    p.add_argument("--no_sigmoid_loss", dest="sigmoid_loss",
                   action="store_false",
                   help="train with softmax cross-entropy instead of BCE")
    p.add_argument("--local_shuffle", action="store_true")
    p.add_argument("--buffer_size", type=float, default=0.2,
                   help="fraction of nodes buffered per device")
    p.add_argument("--scale_factor", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=None,
                   help="learning rate. Default 0.01 (the reference's, "
                        "main.py:30) — except --model gat, which "
                        "defaults to 0.002: flat 0.01 is UNSTABLE for "
                        "canonical-scale dot-product graph attention "
                        "(it saturates to a uniform-prediction fixed "
                        "point; chip-measured round 5, "
                        "benchmarks/RESULTS.md). An explicit --lr "
                        "always wins")
    p.add_argument("--lr_warmup", type=int, default=-1,
                   help="linear lr warmup steps (lr/100 -> lr; "
                        "schedule rides the Adam step count). -1 = "
                        "auto: 300 for attention models (gat — flat "
                        "lr at canonical scale can saturate the "
                        "softmax into a uniform fixed point; measured "
                        "round 5), 0 for everything else")
    p.add_argument("--test", action="store_true")
    p.add_argument("--alpha", type=float, default=0)
    p.add_argument("--sampler", type=str, default="ladies",
                   choices=["ladies", "subgraph"])
    p.add_argument("--pagraph", action="store_true")
    p.add_argument("--naive", action="store_true")
    p.add_argument("--random", action="store_true")
    p.add_argument("--locality_sampling", action="store_true")
    # --- TPU-native extensions ---
    p.add_argument("--n_devices", type=int, default=0,
                   help="mesh size (0 = all available devices)")
    p.add_argument("--adj_format", type=str, default="resident",
                   choices=["coo", "blocked", "hot", "resident",
                            "pattern"],
                   help="'hot' = resident hot-subgraph dense block + cold "
                        "COO residual (fastest device path); 'coo' = "
                        "portable chunked segment-sum; 'blocked' = Pallas "
                        "tile stream; 'pattern' = pattern-only compressed "
                        "edges for attention models (GAT default: values "
                        "are computed on device, ~2 bytes/edge)")
    p.add_argument("--hot_k", type=int, default=16384,
                   help="hot-subgraph size (top-K nodes by sample_prob) "
                        "for --adj_format hot")
    p.add_argument("--resident_parts", type=int, default=0,
                   help="shard the resident state (slot table, row "
                        "values, hot blocks) over a 'part' mesh axis of "
                        "this size (resident format only): training "
                        "runs DP(n_devices) x part on a hybrid mesh — "
                        "for graphs whose resident state exceeds one "
                        "chip's HBM (gnn_tpu.parallel.shardedresident)")
    p.add_argument("--norm", type=str, default="row",
                   choices=["row", "sym"],
                   help="graph normalization: 'row' = D^-1 A (the "
                        "reference's only form); 'sym' = D^-1/2 A "
                        "D^-1/2 (Kipf GCN — present but never called "
                        "in the reference, utils.py:41-54). Both are "
                        "rank-1 val-free in resident format")
    p.add_argument("--resident_stream", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="ship the resident cold residual as tile-grouped"
                        " packed coords and aggregate it with the Pallas"
                        " edge-stream kernel (1.9x fwd / 4.2x bwd vs the"
                        " segment-sum on chip; rank-1 graphs ship coords"
                        " only, weighted graphs add per-edge values in "
                        "tile order). 'auto' = on for TPU backends, off "
                        "elsewhere (the kernel runs interpreted off-TPU)")
    p.add_argument("--hot_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="resident hot-block dtype; bfloat16 (default) "
                        "halves HBM (2 x K^2 bytes) so K can double for "
                        "the same budget, at ~0.4%% relative weight "
                        "rounding (accuracy-validated at canonical "
                        "scale, benchmarks/RESULTS.md)")
    p.add_argument("--feat_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="HBM feature-table dtype (replicated table or "
                        "sharded cache): bfloat16 halves residency, "
                        "gather bandwidth, cache all_to_all bytes and "
                        "host-row H2D; rows are cast back to f32 after "
                        "the gather")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="train steps per host dispatch (>1 ships G "
                        "stacked batches and runs a jitted lax.scan of G "
                        "optimizer steps — amortizes per-call host/relay "
                        "latency; numerically identical to per-step)")
    p.add_argument("--feature_cache", action="store_true",
                   help="use the placement-driven sharded HBM cache "
                        "instead of a replicated feature table")
    p.add_argument("--save_dir", type=str, default="save")
    p.add_argument("--resume", action="store_true",
                   help="resume from save_dir's rolling 'latest' "
                        "checkpoint (params + optimizer + epoch); the "
                        "(seed, epoch)-derived randomness replays the "
                        "uninterrupted run exactly")
    p.add_argument("--data_dir", type=str,
                   default=os.environ.get("GNN_DATA_DIR", "data"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of epoch 1 here")
    # default mirrors the reference exactly: its spmm timers are dead
    # code (`custom_sparse_ops.py:21-27` commented out; `main.py:196`
    # prints zeros), so measuring them is opt-in — on TPU the isolated-op
    # chains cost several extra compiles on first use
    p.add_argument("--op_timing", action="store_true", default=False,
                   help="estimate spmm fwd/bwd + communication buckets "
                        "per epoch (reference main.py:196 buckets; "
                        "adds one-time compile cost on TPU)")
    p.add_argument("--no_op_timing", dest="op_timing",
                   action="store_false")
    return p


def resolve_training_defaults(args, steps_per_epoch: int = 10**9) -> int:
    """Resolve model-dependent lr / warmup defaults (mutates args.lr;
    returns the warmup step count).

    GAT defaults to lr 0.002 + warmup (min(300, one epoch) steps):
    flat lr 0.01 is unstable for canonical-scale dot-product graph
    attention — the first large Adam steps saturate the softmax into a
    uniform-prediction fixed point, and a warmup ramp back to 0.01
    re-collapses (both chip-measured, benchmarks/RESULTS.md round 5).
    Reference models keep the reference's 0.01 (`main.py:30`); an
    explicit --lr always wins."""
    if args.lr is None:
        args.lr = 0.002 if args.model == "gat" else 0.01
    if args.lr_warmup >= 0:
        return args.lr_warmup
    if args.model != "gat":
        return 0
    return max(1, min(300, steps_per_epoch))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(args, flush=True)

    import jax

    # persistent XLA compilation cache: a config's first run pays
    # minutes of per-bucket compiles; the cache makes later processes
    # start warm (GNN_TPU_COMP_CACHE=  disables)
    cache_dir = os.environ.get(
        "GNN_TPU_COMP_CACHE",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "jax_comp_cache")))
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    # Some sandboxes force a platform via sitecustomize config updates that
    # silently override $JAX_PLATFORMS; re-assert the user's choice.
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from gnn_tpu.data.loaders import load_dataset
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.feature_cache import CachedFeatures, \
        ReplicatedFeatures
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.placement.engine import create_placement, \
        get_per_rank_skewed_nodes
    from gnn_tpu.sampling.ladies import SamplerConfig
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer
    from gnn_tpu.utils.normalize import build_laplacian
    import scipy.sparse as sp

    orders = tuple(int(t) for t in args.orders.split(","))
    n_devices = args.n_devices or jax.device_count()
    graph = load_dataset(args.dataset, args.data_dir)
    n = graph.adj_full.shape[0]
    lap = build_laplacian(graph.adj_full, args.model, norm=args.norm)

    strategy = ("pagraph" if args.pagraph else
                "random" if args.random else
                "naive" if args.naive else "greedy")
    per_dev = int(args.buffer_size * n)
    print("buffer_size: ", per_dev, flush=True)
    # composed mode (--resident_parts + --feature_cache): the cache
    # shards over the SAME 'part' axis as the resident state, so the
    # placement distributes over resident_parts buffers (one per part),
    # not over the DP ranks
    placement_devs = (args.resident_parts
                      if args.resident_parts > 1 and args.feature_cache
                      else n_devices)
    placement = create_placement(
        lap, graph.train_nodes, per_dev=per_dev, num_devs=placement_devs,
        num_conv_layers=sum(orders), alpha=args.alpha, strategy=strategy,
        cache_dir=args.save_dir, dataset=args.dataset.replace("/", "_"))

    per_rank_skew = None
    scale_factor = args.scale_factor
    if args.locality_sampling:
        # each rank skews toward ITS OWN resident nodes
        # (`sampler.py:23-25,119-121`), not the union of all buffers
        per_rank_skew = get_per_rank_skewed_nodes(
            graph.adj_full + sp.eye(n), placement, orders)
        if scale_factor <= 1.0:
            scale_factor = 1.0  # tuner may raise it during training

    if args.adj_format == "pattern" and args.model != "gat":
        raise SystemExit("--adj_format pattern is attention-only (the "
                         "aggregation weights are computed on device); "
                         "use coo/hot/resident for graphsage/gcn/gin")
    if args.model == "gat" and args.adj_format == "hot":
        # the hot SHIPPED-EDGE format carries precomputed values GAT
        # never uses; the pattern transport is strictly cheaper there.
        # (resident mode is GAT's fast path: hot-block attention on the
        # resident dense block + per-edge cold residual,
        # gnn_tpu.models.gat.hot_attention_aggregate)
        print("--model gat ships pattern-only edges; overriding "
              f"--adj_format hot -> pattern", flush=True)
        args.adj_format = "pattern"

    hot_spec = None
    hot_dense = None
    resident_graph = None
    if args.adj_format in ("hot", "resident"):
        from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense_cached
        from gnn_tpu.placement.engine import compute_sample_prob
        import jax.numpy as jnp
        import numpy as np
        # setup caches (reference-style keyed files, `preprocess.py:317`):
        # the sample-prob chain and the lap[H][:,H] slice each cost
        # minutes at Reddit scale but depend only on (graph, layers, K)
        os.makedirs(args.save_dir, exist_ok=True)
        dsname = args.dataset.replace("/", "_").replace(":", "_")
        depth = sum(orders)
        prob_path = os.path.join(args.save_dir,
                                 f"{dsname}.sampprob.L{depth}.npy")
        if os.path.exists(prob_path):
            prob = np.load(prob_path)
        else:
            prob = compute_sample_prob(lap, graph.train_nodes, depth)
            np.save(prob_path, prob)
        hot_spec = HotSpec.from_sample_prob(prob, args.hot_k)
        hot_dense = build_hot_dense_cached(
            lap, hot_spec,
            dtype=jnp.bfloat16 if args.hot_dtype == "bfloat16"
            else np.float32,
            cache_path=os.path.join(
                args.save_dir, f"{dsname}.hotcoo.L{depth}"
                f".K{args.hot_k}.npz"))
        print(f"hot block: K={hot_spec.k} "
              f"({2 * hot_dense[0].nbytes / 2**20:.0f} MiB resident "
              f"incl. transpose)", flush=True)
        if args.adj_format == "resident":
            # ship IDs, not edges: the full CSR joins the hot blocks in
            # HBM and each layer's adjacency is rebuilt on device
            # (gnn_tpu.ops.residentgraph; ~17x smaller step payloads)
            from gnn_tpu.ops.residentgraph import build_resident_graph
            resident_graph = build_resident_graph(
                lap, hot_spec, hot_dense[0], hot_dense[1],
                val_dtype=jnp.bfloat16 if args.hot_dtype == "bfloat16"
                else np.float32)
            hot_dense = None
            print(f"resident CSR: {resident_graph['col_idx'].nbytes / 2**20:.0f}"
                  f"+{resident_graph['val'].nbytes / 2**20:.0f} MiB "
                  "(cols+vals) in HBM", flush=True)

    val_free = bool(resident_graph and resident_graph.get("val_free"))
    # stream tiles serve BOTH value classes: rank-1 (val-free) graphs
    # ship coords only; weighted graphs additionally ship the per-edge
    # weights in tile order. Off-TPU the kernel runs interpreted
    # (slow), so 'auto' enables it only on TPU backends.
    stream_tiles = (args.resident_stream == "on"
                    or (args.resident_stream == "auto"
                        and args.adj_format == "resident"
                        and jax.default_backend() == "tpu"))
    # GAT composes with stream tiles too: the cold attention runs the
    # SDDMM-direction edge-stream kernels (gnn_tpu.ops.pallas_esattn —
    # tile-dense masked flash attention over the same packed coords the
    # SpMM direction streams), so the per-edge gather route never runs.
    cfg = SamplerConfig(
        batch_size=args.batch_size, samp_num=args.samp_num, orders=orders,
        num_nodes=n, num_classes=graph.num_classes, sampler=args.sampler,
        scale_factor=scale_factor, adj_format=args.adj_format,
        hot_spec=hot_spec,
        resident_val_free=val_free,
        resident_stream_tiles=stream_tiles)
    # sticky shape buckets, persisted per config: a warm book pins
    # every batch (epoch 0 included) to the recorded steady-state
    # shapes, so reruns compile ONE program per step function instead
    # of one per bucket combination (ShapeBook in sampling/pipeline.py)
    os.makedirs(args.save_dir, exist_ok=True)
    book_tag = (f"{args.dataset.replace('/', '_').replace(':', '_')}"
                f".{args.model}.{args.sampler}.o{args.orders}"
                f".s{args.samp_num}.b{args.batch_size}.{args.adj_format}"
                f".w{n_devices}")
    pipe = BatchPipeline(cfg, lap, graph.labels, world_size=n_devices,
                         pool_num=args.pool_num,
                         per_rank_skew=per_rank_skew,
                         local_shuffle=args.local_shuffle, seed=args.seed,
                         shape_book_path=os.path.join(
                             args.save_dir,
                             f"{book_tag}.shapebook.json"))
    net = build_model(args.model, args.nhid, orders, graph.num_classes)

    import jax.numpy as _jnp
    import numpy as _np
    feat_dtype = _jnp.bfloat16 if args.feat_dtype == "bfloat16" \
        else _np.float32
    if args.feature_cache and args.resident_parts > 1:
        # placement-driven cache sharded over the resident state's
        # 'part' axis: both memory scalings compose (per-chip resident
        # AND feature HBM divide by resident_parts)
        from gnn_tpu.parallel.feature_cache import PartCachedFeatures
        source = PartCachedFeatures(graph.feats, placement,
                                    dtype=feat_dtype)
    elif args.feature_cache:
        source = CachedFeatures(graph.feats, placement, dtype=feat_dtype)
    elif args.resident_parts > 1:
        # shard the feature table over the same 'part' axis as the
        # resident state (per-chip feature HBM divides by P too)
        from gnn_tpu.parallel.feature_cache import PartShardedFeatures
        source = PartShardedFeatures(graph.feats, args.resident_parts,
                                     dtype=feat_dtype)
    else:
        source = ReplicatedFeatures(graph.feats, dtype=feat_dtype)
    if args.resident_parts > 1:
        # DP(n_devices) x part(resident_parts) hybrid mesh with the
        # resident state sharded over 'part'
        if args.adj_format != "resident":
            raise SystemExit("--resident_parts needs --adj_format "
                             "resident")
        from gnn_tpu.parallel.multihost import make_hybrid_mesh
        mesh = make_hybrid_mesh(dp=n_devices, part=args.resident_parts)
    else:
        mesh = make_mesh(n_devices)
    lr_warmup = resolve_training_defaults(
        args, steps_per_epoch=max(
            1, len(graph.train_nodes) // (args.batch_size * n_devices)))
    trainer = Trainer(net, pipe, graph.feats, mesh=mesh,
                      lr=args.lr, sigmoid_loss=args.sigmoid_loss,
                      lr_warmup=lr_warmup,
                      seed=args.seed, feature_source=source,
                      hot_dense=hot_dense,
                      resident_graph=resident_graph,
                      resident_parts=args.resident_parts,
                      steps_per_dispatch=args.steps_per_dispatch)

    rank_chunks = None
    if args.local_shuffle and args.pagraph:
        assert placement.train_nodes_per_dev is not None
        rank_chunks = placement.train_nodes_per_dev

    from gnn_tpu.train.metrics import MetricsRegistry
    metrics = MetricsRegistry(os.path.join(args.save_dir, "metrics.jsonl"))
    trainer.fit(graph.train_nodes, graph.valid_nodes, args.epoch_num,
                rank_chunks=rank_chunks, checkpoint_dir=args.save_dir,
                locality_tuner=args.locality_sampling, metrics=metrics,
                profile_dir=args.profile_dir or None,
                op_timing=args.op_timing, resume=args.resume)

    if args.test:
        f1 = trainer.test(graph.test_nodes, batch_size=128)
        print("Test f1 score: %.3f" % f1, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
