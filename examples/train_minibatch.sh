#!/bin/sh
# GraphSAGE + LADIES minibatch training (reference README.md:18 analog).
# Swap --dataset for `reddit` with $GNN_DATA_DIR pointing at a
# GraphSAINT-format directory to run the real thing.
python -m gnn_tpu.cli \
    --dataset synthetic:nodes=232965,deg=100,feats=602,classes=41 \
    --model graphsage --nhid 512 --orders 1,1,1 \
    --samp_num 8192 --batch_size 512 --epoch_num 30 --lr 0.04 \
    --buffer_size 0.1 --feature_cache --locality_sampling --test
