#!/bin/bash
# Round-3 TPU validation batch (run on the axon chip, NOT under pytest).
# Ordering front-loads the compile-heavy jobs so the cache warms once.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/val_r3
cd /root/repo

# 1. fused kernel vs array engine on real TPU (1e-6 gate)
timeout 5400 python scripts/validate_fused_tpu.py > /tmp/val_r3/validate_fused.log 2>&1
echo "validate_fused EXIT=$?" >> /tmp/val_r3/summary.log

# 2. headline bench (+ new MFU/bandwidth fields)
timeout 5400 python bench.py > /tmp/val_r3/bench.log 2>&1
echo "bench EXIT=$?" >> /tmp/val_r3/summary.log
tail -1 /tmp/val_r3/bench.log >> /tmp/val_r3/summary.log

# 3. HATRPO fused-path throughput at bench scale (VERDICT item 3 target:
#    >= ~110k env-steps/s at E=4096, 2x the r2 54.9k)
timeout 7200 env MARL_ALGO=hatrpo BENCH_NUM_ENVS=4096 python scripts/profile_marl.py \
    > /tmp/val_r3/hatrpo_perf.log 2>&1
echo "hatrpo_perf EXIT=$?" >> /tmp/val_r3/summary.log

# 4. MAPPO throughput re-measure (physics overhaul cost check)
timeout 7200 env MARL_ALGO=mappo BENCH_NUM_ENVS=4096 python scripts/profile_marl.py \
    > /tmp/val_r3/mappo_perf.log 2>&1
echo "mappo_perf EXIT=$?" >> /tmp/val_r3/summary.log

# 5. learning validation with the new contact model: TenAnt+MAPPO short run
timeout 7200 python train.py --task TenAnt --algo mappo --num_envs 128 \
    --num_env_steps 1000000 --logdir /tmp/val_r3/mappo_learn \
    > /tmp/val_r3/mappo_learn.log 2>&1
echo "mappo_learn EXIT=$?" >> /tmp/val_r3/summary.log

# 6. HATRPO learning sanity (fused TRPO step on TPU)
timeout 7200 python train.py --task TenAnt --algo hatrpo --num_envs 128 \
    --num_env_steps 300000 --logdir /tmp/val_r3/hatrpo_learn \
    > /tmp/val_r3/hatrpo_learn.log 2>&1
echo "hatrpo_learn EXIT=$?" >> /tmp/val_r3/summary.log

cat /tmp/val_r3/summary.log
