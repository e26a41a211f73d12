#!/bin/sh
# One background chain (single TPU process rule): regenerate the bench
# cache if absent (host-only), then run the edge-stream probe with the
# segment-grid section at the deployed operating point.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
python - <<'EOF'
import os, sys
sys.path.insert(0, "/root/repo")
# force CPU for the host-only cache build (sitecustomize overrides
# $JAX_PLATFORMS; the config update is the documented way)
import jax
jax.config.update("jax_platforms", "cpu")
import bench
p = "/root/repo/bench_cache/minibatch_v2.npz"
if not os.path.exists(p):
    bench._generate_cache(p)
rank_path = "/root/repo/bench_cache/prob_rank.npy"
if not os.path.exists(rank_path):
    import numpy as np
    from benchmarks.canonical_graph import canonical_rank
    np.save(rank_path, canonical_rank(3))
print("cache ready", flush=True)
EOF
unset JAX_PLATFORMS
GNN_TPU_PROBE_K=32768 GNN_TPU_PROBE_BM=256 GNN_TPU_PROBE_BK=256 \
  python /root/repo/benchmarks/edgestream_probe.py
