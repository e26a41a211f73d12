#!/bin/sh
# Round-5 chain G: canonical GAT regression bisect.
#   1. probe at canonical-run score magnitudes (QSCALE=3)
#   2. mid-scale e2e (does the at-chance bug depend on graph scale?)
#   3. canonical at lr 0.002 (loss-landscape vs code-bug discriminator)
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
export GNN_TPU_SYNTH_CACHE=/tmp/gnn_tpu_synth
cd /root/repo

GNN_PROBE_QSCALE=3 timeout 3600 python benchmarks/esattn_e2e_probe.py \
    > /tmp/r5g_probe_mag.log 2>&1

GNN_TPU_STEP_LOG=50 timeout 2400 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=100000,deg=50,feats=302,classes=41 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 3 \
    --adj_format resident --hot_k 16384 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir /tmp/gnn_save_r5g_mid \
    > /tmp/r5g_gat_mid.log 2>&1

GNN_TPU_STEP_LOG=50 timeout 2400 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.002 --no_sigmoid_loss \
    --epoch_num 3 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir /tmp/gnn_save_r5g_lr \
    > /tmp/r5g_gat_lr.log 2>&1

echo CHAIN_G_DONE
