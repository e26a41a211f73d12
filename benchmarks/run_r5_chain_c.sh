#!/bin/sh
# Round-5 chain C: canonical GAT rerun with the FIXED esattn kernels.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
export GNN_TPU_SYNTH_CACHE=/tmp/gnn_tpu_synth
cd /root/repo
GNN_TPU_STEP_LOG=50 timeout 4800 python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model gat --nhid 512 --orders 1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.01 --no_sigmoid_loss \
    --epoch_num 4 \
    --adj_format resident --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir /tmp/gnn_save_r5gat \
    > /tmp/r5c_gat.log 2>&1
echo CHAIN_C_DONE
