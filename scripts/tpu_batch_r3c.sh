#!/bin/bash
# Round-3 third TPU pass: HATRPO with CG/line-search early exits (commit
# 5221c53, which landed after tpu_batch_r3b.sh's process had already
# imported the pre-early-exit runner).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/val_r3
cd /root/repo

timeout 7200 env MARL_ALGO=hatrpo BENCH_NUM_ENVS=4096 PROF_OVERLAP=0 PROF_BF16_MU=0 \
    python scripts/profile_marl.py > /tmp/val_r3/hatrpo_perf_earlyexit.log 2>&1
echo "hatrpo_perf_earlyexit EXIT=$?" >> /tmp/val_r3/summary.log
grep "full train_iter" /tmp/val_r3/hatrpo_perf_earlyexit.log >> /tmp/val_r3/summary.log
cat /tmp/val_r3/summary.log
