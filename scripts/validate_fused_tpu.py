"""Validate + microbench the fused Pallas substep on the real TPU.

1. correctness: fused_scene_step vs vmap(scene_step) at E=64 (one control
   step, fresh reset states, random actions)
2. perf: both paths at bench scale E=4096
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from massive_marl_tpu.envs.ten_ant import TenAntEnv
from massive_marl_tpu.envs.ant_scene import scene_step
from massive_marl_tpu.ops import fused_substep as fs


def timeit(name, fn, *args, n=30, warmup=10):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    for _ in range(warmup - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt * 1e3:9.3f} ms/call (compile {tc:.1f}s)", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    env = TenAntEnv()

    # ---- correctness @ E=64 ----
    E = 64
    keys = jax.random.split(jax.random.PRNGKey(3), E)
    st = jax.jit(jax.vmap(env._fresh_pipeline))(keys)
    acts = jax.random.uniform(jax.random.PRNGKey(0), (E, 10, 8), minval=-1, maxval=1)

    ref = jax.jit(jax.vmap(lambda s, a: scene_step(env.spec, s, a)))(st, acts)
    jax.block_until_ready(ref)
    print("engine reference done", flush=True)
    got = jax.jit(lambda s, a: fs.fused_scene_step(env.spec, s, a))(st, acts)
    jax.block_until_ready(got)
    print("pallas fused done", flush=True)

    for name, a, b, tol in [("ant_qpos", got.ant_qpos, ref.ant_qpos, 2e-4),
                            ("ant_qvel", got.ant_qvel, ref.ant_qvel, 5e-3),
                            ("box_qpos", got.box_qpos, ref.box_qpos, 2e-4),
                            ("box_qvel", got.box_qvel, ref.box_qvel, 5e-3)]:
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"  max|{name} diff| = {err:.2e} (tol {tol})", flush=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol, atol=tol)
    print("CORRECTNESS OK", flush=True)

    # ---- perf @ E=4096 ----
    E = 4096
    keys = jax.random.split(jax.random.PRNGKey(3), E)
    st = jax.jit(jax.vmap(env._fresh_pipeline))(keys)
    acts = jax.random.uniform(jax.random.PRNGKey(0), (E, 10, 8), minval=-1, maxval=1)
    t_eng = timeit("vmap(scene_step) engine", jax.jit(jax.vmap(
        lambda s, a: scene_step(env.spec, s, a))), st, acts)
    t_fus = timeit("fused_scene_step pallas", jax.jit(
        lambda s, a: fs.fused_scene_step(env.spec, s, a)), st, acts)
    print(f"\nspeedup: {t_eng / t_fus:.2f}x  ({t_eng*1e3:.2f} -> {t_fus*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
