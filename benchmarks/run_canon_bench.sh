#!/bin/sh
# One background TPU chain (single TPU process rule): canonical e2e
# (3 epochs, resident+stream, measures the cross-epoch prefetch win)
# then bench.py. Logs: /tmp/canon_r3c.log (this file's stdout/stderr).
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
sh benchmarks/canonical_e2e.sh /tmp/gnn_save_r3c
python bench.py > /tmp/bench_r3c.json 2> /tmp/bench_r3c.err
cat /tmp/bench_r3c.json
