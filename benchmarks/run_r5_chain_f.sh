#!/bin/sh
# Round-5 chain F: canonical GAT learning A/B.
#   1. stream OFF (the round-4 route that reached F1 0.531) — if this
#      ALSO trains at chance now, the regression predates esattn
#   2. stream ON with steps_per_dispatch=1 (kills the scan variable)
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
export GNN_TPU_SYNTH_CACHE=/tmp/gnn_tpu_synth
cd /root/repo

GNN_TPU_STEP_LOG=50 timeout 4800 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 3 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --resident_stream off \
    --save_dir /tmp/gnn_save_r5f_off \
    > /tmp/r5f_gat_off.log 2>&1

GNN_TPU_STEP_LOG=50 timeout 3600 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 2 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 1 \
    --resident_stream on \
    --save_dir /tmp/gnn_save_r5f_g1 \
    > /tmp/r5f_gat_g1.log 2>&1

echo CHAIN_F_DONE
