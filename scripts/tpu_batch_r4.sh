#!/bin/bash
# Round-4 TPU validation batch (run serially; one chip).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

# MTSAC / MTTRPO: long enough to show learning (VERDICT r3 item 6)
timeout 7200 python train.py --task OneAnt --algo mtsac --num_envs 128 \
    --max_iterations 2000 --logdir /tmp/val_r4/mtsac 2>&1 | tail -40
timeout 7200 python train.py --task OneAnt --algo mttrpo --num_envs 128 \
    --max_iterations 1500 --logdir /tmp/val_r4/mttrpo 2>&1 | tail -40

# MAML adaptation on the real ant heading meta-task
MAML_ITERS=150 timeout 7200 python scripts/val_maml_adaptation.py 2>&1 | tail -30
