#!/bin/sh
# Round-5 chain D (ONE TPU process at a time; each step under timeout so
# a relay wedge self-clears — CLAUDE.md):
#   1. canonical GAT with the FIXED esattn kernels, cold caches
#      (verdict #1 Done-criterion: steady epoch <= 18 s; also a cold-
#      start compile-budget datapoint for a 2-layer GAT)
#   2. canonical GAT warm restart (fresh process; shapebook + persistent
#      compile cache present) — verdict #8 time-to-first-steady-epoch
#   3. canonical GraphSAGE 30-epoch soak with the sticky ShapeBook
#      (verdict #5 Done-criterion: max steady epoch <= 1.5x median;
#      epoch-0 line = cold compile budget vs round-4's 1120 s)
#   4. canonical GraphSAGE warm restart (verdict #8: <= 500 s to first
#      steady epoch)
#   5. bench.py (BENCH_r05 refresh with the VPU floor term)
# Logs: /tmp/r5d_*.log ; wall marks on stdout (this file's log).
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
export GNN_TPU_SYNTH_CACHE=/tmp/gnn_tpu_synth
cd /root/repo

echo "MARK gat_cold_start $(date +%s)"
GNN_TPU_STEP_LOG=50 timeout 4800 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 4 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir /tmp/gnn_save_r5gat \
    > /tmp/r5d_gat.log 2>&1

echo "MARK gat_warm_start $(date +%s)"
GNN_TPU_STEP_LOG=50 timeout 2400 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 2 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir /tmp/gnn_save_r5gat \
    > /tmp/r5d_gat_warm.log 2>&1

echo "MARK soak_cold_start $(date +%s)"
GNN_TPU_STEP_LOG=100 timeout 5400 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model graphsage --nhid 512 --orders 1,1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.04 --no_sigmoid_loss \
    --epoch_num 30 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir /tmp/gnn_save_r5soak \
    > /tmp/r5d_soak.log 2>&1

echo "MARK sage_warm_start $(date +%s)"
GNN_TPU_STEP_LOG=100 timeout 2400 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model graphsage --nhid 512 --orders 1,1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.04 --no_sigmoid_loss \
    --epoch_num 2 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir /tmp/gnn_save_r5soak \
    > /tmp/r5d_sage_warm.log 2>&1

echo "MARK bench_start $(date +%s)"
timeout 1800 python bench.py > /tmp/r5d_bench.json 2> /tmp/r5d_bench.err

echo "MARK done $(date +%s)"
echo CHAIN_D_DONE
