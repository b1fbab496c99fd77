#!/bin/bash
# Round-3 follow-up TPU batch: post-FVP-hoist HATRPO, re-bench with analytic
# utilization fields, and the 34M-step long-horizon MAPPO parity run
# (VERDICT r2 item 10).  Run AFTER tpu_batch_r3.sh.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/val_r3 /root/repo/results
cd /root/repo

# 1. HATRPO throughput with the hoisted FVP linearization (pre-hoist r3
#    measurement: 74.5k env-steps/s, update 399 ms)
timeout 7200 env MARL_ALGO=hatrpo BENCH_NUM_ENVS=4096 PROF_OVERLAP=0 PROF_BF16_MU=0 \
    python scripts/profile_marl.py > /tmp/val_r3/hatrpo_perf_hoisted.log 2>&1
echo "hatrpo_perf_hoisted EXIT=$?" >> /tmp/val_r3/summary.log
grep "full train_iter" /tmp/val_r3/hatrpo_perf_hoisted.log >> /tmp/val_r3/summary.log

# 2. bench with the analytic MFU/HBM fields
timeout 5400 python bench.py > /tmp/val_r3/bench_analytic.log 2>&1
echo "bench_analytic EXIT=$?" >> /tmp/val_r3/summary.log
tail -1 /tmp/val_r3/bench_analytic.log >> /tmp/val_r3/summary.log
tail -1 /tmp/val_r3/bench_analytic.log > /root/repo/results/bench_r3.json

# 3. long-horizon TenAnt+MAPPO to the reference's full 34M-step horizon at
#    bench scale (logs/ten_ant/mappo collapses late; ours should not)
timeout 7200 python train.py --task TenAnt --algo mappo --num_envs 4096 \
    --num_env_steps 34000000 --logdir /tmp/val_r3/mappo_34m \
    > /tmp/val_r3/mappo_34m.log 2>&1
echo "mappo_34m EXIT=$?" >> /tmp/val_r3/summary.log
tail -3 /tmp/val_r3/mappo_34m.log >> /tmp/val_r3/summary.log

cat /tmp/val_r3/summary.log
