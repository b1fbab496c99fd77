"""Isolate the MARL MLP forward cost: vmapped-params batch dim vs LayerNorm.

Variants at [N=10, B=32768, obs 46 -> 512x3 -> 8]:
  base      MarlActor vmapped over stacked params (the runner's form)
  merged    ONE agent's params on the merged [N*B] batch (no batched matmul)
  no-ln     same stack but LayerNorms removed
  f32       base in f32 (is bf16 helping or hurting?)
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from massive_marl_tpu.algos.nets import orthogonal_init


def timeit(name, fn, *args, n=30, warmup=12):
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
    print(f"{name:30s} {dt * 1e3:9.3f} ms   (compile {tc:.1f} s)", flush=True)
    return dt


class Tower(nn.Module):
    use_ln: bool = True
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.use_ln:
            x = nn.LayerNorm()(x)
        for _ in range(3):
            x = nn.Dense(512, kernel_init=orthogonal_init(np.sqrt(2)), dtype=self.dtype)(x)
            x = nn.elu(x)
            if self.use_ln:
                x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(8, kernel_init=orthogonal_init(0.01))(x)


def main():
    N, B, D = 10, 32768, 46
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (N, B, D), jnp.float32)
    obs_merged = obs.reshape(N * B, D)

    for name, use_ln, dt in (("base bf16+LN", True, jnp.bfloat16),
                             ("no-LN bf16", False, jnp.bfloat16),
                             ("base f32+LN", True, jnp.float32)):
        m = Tower(use_ln=use_ln, dtype=dt)
        p1 = m.init(key, jnp.zeros((1, D)))
        pN = jax.vmap(lambda k: m.init(k, jnp.zeros((1, D))))(jax.random.split(key, N))

        @jax.jit
        def fwd_vmapped(pN, obs):
            return jax.vmap(m.apply)(pN, obs).sum()

        @jax.jit
        def fwd_merged(p1, o):
            return m.apply(p1, o).sum()

        @jax.jit
        def grad_vmapped(pN, obs):
            g = jax.vmap(jax.grad(lambda p, o: m.apply(p, o).sum()))(pN, obs)
            return jax.tree_util.tree_map(lambda x: x.sum(), g)

        timeit(f"{name} fwd vmapped[N]", fwd_vmapped, pN, obs)
        timeit(f"{name} fwd merged[N*B]", fwd_merged, p1, obs_merged)
        timeit(f"{name} grad vmapped[N]", grad_vmapped, pN, obs)


if __name__ == "__main__":
    main()
