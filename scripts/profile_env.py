"""Break down TenAnt env.step cost on the current backend at bench shapes.

Times each piece as its own jitted program at E=4096:
  scene_step (physics only), _fresh_pipeline (reset sampling), _obs,
  _reward path via _finish_step, full step, and isfinite blowup check.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from massive_marl_tpu.envs.ten_ant import TenAntEnv
from massive_marl_tpu.envs.ant_scene import scene_step


def timeit(name, fn, *args, n=30, warmup=10):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    for _ in range(warmup - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt * 1e3:9.3f} ms/call   (compile {t_compile:.1f}s)", flush=True)
    return dt


def main():
    E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    env = TenAntEnv()
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    state = jax.jit(jax.vmap(env.reset))(keys)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (E, 80), minval=-1, maxval=1)
    acts_r = actions.reshape(E, 10, 8)
    print(f"backend={jax.default_backend()} E={E}", flush=True)

    t_step = timeit("full vmap(env.step)", jax.jit(jax.vmap(env.step)), state, actions)

    t_phys = timeit("vmap(scene_step) physics only",
                    jax.jit(jax.vmap(lambda s, a: scene_step(env.spec, s, a))),
                    state.pipeline, acts_r)

    t_fresh = timeit("vmap(_fresh_pipeline) reset sample",
                     jax.jit(jax.vmap(env._fresh_pipeline)), keys)

    t_obs = timeit("vmap(_obs)",
                   jax.jit(jax.vmap(env._obs)), state.pipeline, acts_r)

    def fin(p):
        return ~(jnp.isfinite(p.ant_qpos).all() & jnp.isfinite(p.ant_qvel).all()
                 & jnp.isfinite(p.box_qpos).all() & jnp.isfinite(p.box_qvel).all())
    t_fin = timeit("vmap(isfinite blowup check)", jax.jit(jax.vmap(fin)), state.pipeline)

    def reward_only(s, a):
        a2 = a.reshape(10, 8)
        obs = env._obs(s.pipeline, a2)
        return env._reward(obs, a2, s.pipeline, s.carry, s.progress)
    t_rew = timeit("vmap(obs+reward)", jax.jit(jax.vmap(reward_only)), state, actions)

    print(f"\nsummary: step {t_step*1e3:.2f} = phys {t_phys*1e3:.2f} + fresh {t_fresh*1e3:.2f}"
          f" + obs+rew {t_rew*1e3:.2f} + isfinite {t_fin*1e3:.2f} + select/misc rest")


if __name__ == "__main__":
    main()
