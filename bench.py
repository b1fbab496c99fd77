"""Benchmark: TenAnt + PPO end-to-end training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity is env-steps/s through full training iterations
(collection + learning), the same FPS the reference prints at
agents/algorithms/rl/ppo/ppo.py:207: nsteps * num_envs / iteration_time.
Baseline: the driver-set north star of 256,000 env-steps/s/chip
(/root/repo/BASELINE.json); the reference itself publishes no numbers
(BASELINE.md).
"""
from __future__ import annotations

import json
import os
import time

# bench runs on the real chip - do NOT force CPU here
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
from massive_marl_tpu.envs.ten_ant import TenAntEnv

BASELINE = 256_000.0  # env-steps/s/chip target (BASELINE.json north_star)


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    cfg = PPOConfig()  # reference defaults: nsteps 8, 5 epochs x 4 minibatches
    # fused Pallas physics substep (5.2x over the array engine on v5e;
    # scripts/validate_fused_tpu.py) - BENCH_FUSED=0 falls back
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    env = TenAntEnv({"sim": {"fused_kernel": fused}})
    ppo = PPO(env, num_envs=num_envs, cfg=cfg, seed=0, print_log=False)
    ts = ppo.init_state()

    # compile + warmup: the axon runtime's first ~10 executions of a program
    # include on-demand upload/allocation costs; measure steady state
    warmup = int(os.environ.get("BENCH_WARMUP", 12))
    for _ in range(warmup):
        ts, _ = ppo._train_iter(ts)
    jax.block_until_ready(ts.params)

    t0 = time.perf_counter()
    for _ in range(iters):
        ts, metrics = ppo._train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0

    steps = cfg.nsteps * num_envs * iters
    sps = steps / dt
    print(json.dumps({
        "metric": "tenant_ppo_env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(sps / BASELINE, 4),
    }))


if __name__ == "__main__":
    main()
