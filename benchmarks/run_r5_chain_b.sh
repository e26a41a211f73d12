#!/bin/sh
# Round-5 chain B: staged esattn smoke (after the _col fix).
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
timeout 2400 python benchmarks/esattn_smoke.py > /tmp/r5b_smoke.log 2>&1
echo CHAIN_B_DONE
