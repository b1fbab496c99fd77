"""Break down TenAnt+PPO iteration time on the real chip.

Times each stage as its own jitted program at bench shapes:
  1. physics only          (scene_step, vmapped)
  2. full env.step         (physics + auto-reset + obs + reward)
  3. rollout (nsteps scan) (policy fwd + env.step)
  4. full train iteration  (rollout + GAE + epochs x minibatch updates)

Usage: python scripts/profile_tenant.py [num_envs] [substeps]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
from massive_marl_tpu.envs.ten_ant import TenAntEnv
from massive_marl_tpu.envs.ant_scene import scene_step


def timeit(fn, *args, warmup=8, iters=20):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    substeps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    env = TenAntEnv({"sim": {"substeps": substeps}})
    cfg = PPOConfig()
    ppo = PPO(env, num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts = ppo.init_state()
    es = ts.env_state
    acts = jnp.zeros((E, 80))

    phys = jax.jit(jax.vmap(lambda p, a: scene_step(env.spec, p, a),
                            in_axes=(0, 0)))
    t_phys = timeit(lambda: phys(es.pipeline, acts.reshape(E, 10, 8)))
    print(f"physics only      : {t_phys*1e3:8.2f} ms  ({E/t_phys:,.0f} env-steps/s)")

    estep = jax.jit(jax.vmap(env.step))
    t_env = timeit(lambda: estep(es, acts))
    print(f"full env.step     : {t_env*1e3:8.2f} ms  ({E/t_env:,.0f} env-steps/s)")

    model = ppo.model

    def rollout(ts):
        def body(carry, _):
            env_state, key = carry
            key, k = jax.random.split(key)
            obs = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            mean, value, log_std = model.apply(ts.params, obs)
            from massive_marl_tpu.algos import nets
            a = nets.gaussian_sample(k, mean, log_std)
            nxt = jax.vmap(env.step)(env_state, jnp.clip(a, -1, 1))
            return (nxt, key), nxt.reward
        (es2, _), rews = jax.lax.scan(body, (ts.env_state, ts.key), None,
                                      length=cfg.nsteps)
        return es2, rews

    roll = jax.jit(rollout)
    t_roll = timeit(lambda: roll(ts))
    print(f"rollout ({cfg.nsteps} steps) : {t_roll*1e3:8.2f} ms  "
          f"({cfg.nsteps*E/t_roll:,.0f} env-steps/s)")

    t_iter = timeit(lambda: ppo._train_iter(ts), warmup=10)
    sps = cfg.nsteps * E / t_iter
    print(f"train iteration   : {t_iter*1e3:8.2f} ms  ({sps:,.0f} env-steps/s)")
    print(f"  -> learn overhead {100*(t_iter-t_roll)/t_iter:.1f}% of iter")


if __name__ == "__main__":
    main()
