#!/bin/sh
# Round-5 chip chain A (ONE TPU process at a time; each step wrapped in
# timeout so a relay wedge self-clears — CLAUDE.md):
#   1. esattn kernel smoke + microbench (new Mosaic kernels)
#   2. canonical GAT, resident + edge-stream attention (target <=18 s
#      steady epoch; round-4 per-edge cold route was 25.6 s)
#   3. bench.py with the VPU floor term (target vs_deployed_floor >=0.85)
#   4. canonical subgraph sampler (native path; target epoch <=20 s)
# Logs: /tmp/r5a_*.log
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
export GNN_TPU_SYNTH_CACHE=/tmp/gnn_tpu_synth
cd /root/repo

timeout 2400 python benchmarks/esattn_smoke.py \
    > /tmp/r5a_smoke.log 2>&1

GNN_TPU_STEP_LOG=50 timeout 4800 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 3 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir /tmp/gnn_save_r5gat \
    > /tmp/r5a_gat.log 2>&1

timeout 1800 python bench.py > /tmp/r5a_bench.json 2> /tmp/r5a_bench.err

GNN_TPU_STEP_LOG=50 timeout 4800 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model graphsage --nhid 512 --orders 1,1,1 --sampler subgraph \
    --samp_num 8192 --batch_size 512 --lr 0.04 --no_sigmoid_loss \
    --epoch_num 3 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir /tmp/gnn_save_r5subg \
    > /tmp/r5a_subg.log 2>&1

echo CHAIN_A_DONE
