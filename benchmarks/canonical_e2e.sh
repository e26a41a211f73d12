#!/bin/sh
# Canonical Reddit-scale end-to-end run (benchmarks/RESULTS.md §round-2).
#
# GraphSAGE + LADIES, samp 8192 / batch 512 / nhid 512 / 3 layers on a
# 232,965-node synthetic graph (Reddit's shape), ~300 steps/epoch.
# Epoch 0 pays one-time XLA compiles (minutes through a remote-compile
# service); epochs >=1 are the steady-state number to report.
#
# All heavy setup is disk-cached (synthetic graph npz, sample_prob
# chain, hot-block COO, placement), so warm reruns start in ~2-3 min.
#
# NEVER run two TPU processes at once (CLAUDE.md).

CACHE=${GNN_TPU_SYNTH_CACHE:-/tmp/gnn_tpu_synth}
SAVE=${1:-/tmp/gnn_save}

GNN_TPU_STEP_LOG=50 GNN_TPU_SYNTH_CACHE="$CACHE" \
exec python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model graphsage --nhid 512 --orders 1,1,1 \
    --samp_num 8192 --batch_size 512 --lr 0.04 --no_sigmoid_loss \
    --epoch_num 3 \
    --adj_format ${ADJ_FORMAT:-resident} --hot_k 32768 --hot_dtype bfloat16 \
    --feat_dtype bfloat16 --steps_per_dispatch 4 \
    --save_dir "$SAVE"
