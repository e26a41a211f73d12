#!/bin/sh
# Round-5 chain H: canonical GAT lr-0.01 stability bisect — round-4
# verdict-era gat.py (P1) on the CURRENT tree (pipeline/book/trainer
# unchanged), stream off. Learns -> the round-5 gat.py changes moved
# the stability edge; at-chance -> environment (pad-shape bf16
# rounding) moved it and the code is equivalent.
set -x
export GNN_TPU_SYNTH_CACHE=/tmp/gnn_tpu_synth
cd /root/repo
PYTHONPATH=/root/.axon_site:/tmp/p1tree GNN_TPU_STEP_LOG=50 \
timeout 3600 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 2 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --resident_stream off \
    --save_dir /tmp/gnn_save_r5h_p1 \
    > /tmp/r5h_gat_p1.log 2>&1
echo CHAIN_H_DONE
