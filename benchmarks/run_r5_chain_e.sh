#!/bin/sh
# Round-5 chain E: GAT-trains-at-chance drilldown (ONE TPU process at a
# time; timeout-wrapped per CLAUDE.md).
#   1. esattn e2e probe at canonical scale (materialized stream vs
#      per-edge cold attention, raw + stacked + scan stages)
#   2. small-graph on-chip GAT e2e, stream ON vs OFF (cheap learning
#      A/B: if small-scale stream learns, the bug is shape-dependent)
# Logs: /tmp/r5e_*.log
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
export GNN_TPU_SYNTH_CACHE=/tmp/gnn_tpu_synth
cd /root/repo

timeout 3600 python benchmarks/esattn_e2e_probe.py \
    > /tmp/r5e_probe.log 2>&1

GNN_TPU_STEP_LOG=50 timeout 1800 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=20000,deg=20,feats=64,classes=7 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 2048 --batch_size 256 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 3 \
    --adj_format resident --hot_k 2048 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --resident_stream on \
    --save_dir /tmp/gnn_save_r5e_on \
    > /tmp/r5e_gat_small_on.log 2>&1

GNN_TPU_STEP_LOG=50 timeout 1800 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=20000,deg=20,feats=64,classes=7 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 2048 --batch_size 256 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 3 \
    --adj_format resident --hot_k 2048 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --resident_stream off \
    --save_dir /tmp/gnn_save_r5e_off \
    > /tmp/r5e_gat_small_off.log 2>&1

echo CHAIN_E_DONE
