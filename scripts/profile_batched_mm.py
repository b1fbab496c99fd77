"""Is the agent-batched matmul the MARL-learner pathology?  Trusted harness.

Same total FLOPs each:
  flat        [N*B, 512] @ [512, 512]
  batched     einsum('nbi,nio->nbo'), N=10 batch of per-agent weights
  batched46   einsum with in=46 (first layer shape)
  tower grads grad of 3-layer tower: shared weights vs vmapped per-agent,
              with and without LayerNorm
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from massive_marl_tpu.algos.nets import orthogonal_init
from massive_marl_tpu.utils.profiling import measure_rtt, time_scanned


def main():
    N, B, H = 10, 32768, 512
    key = jax.random.PRNGKey(0)
    rtt = measure_rtt()
    print(f"rtt={rtt*1e3:.1f}ms", flush=True)

    xf = jax.random.normal(key, (N * B, H), jnp.bfloat16)
    wf = jax.random.normal(key, (H, H), jnp.bfloat16)
    xb = xf.reshape(N, B, H)
    wb = jax.random.normal(key, (N, H, H), jnp.bfloat16)

    def flat(x):
        y = x @ wf
        return y / jnp.maximum(jnp.abs(y).max(), 1e-3)

    def batched(x):
        y = jnp.einsum("nbi,nio->nbo", x, wb)
        return y / jnp.maximum(jnp.abs(y).max(), 1e-3)

    # 2*N*B*H*H = 172 GFLOP -> ~1.0ms at 80% of 197 TFLOP/s
    dt = time_scanned(flat, xf, n=20, rtt=rtt)
    print(f"flat [NB,512]x[512,512]      {dt*1e3:9.3f} ms  ({2*N*B*H*H/dt/1e12:.1f} TFLOP/s)", flush=True)
    dt = time_scanned(batched, xb, n=20, rtt=rtt)
    print(f"batched einsum nbi,nio->nbo  {dt*1e3:9.3f} ms  ({2*N*B*H*H/dt/1e12:.1f} TFLOP/s)", flush=True)

    # tower grads: shared vs per-agent params, LN vs no-LN
    class Tower(nn.Module):
        use_ln: bool = True

        @nn.compact
        def __call__(self, x):
            for _ in range(3):
                x = nn.Dense(H, kernel_init=orthogonal_init(np.sqrt(2)),
                             dtype=jnp.bfloat16)(x)
                x = nn.elu(x)
                if self.use_ln:
                    x = nn.LayerNorm(dtype=jnp.bfloat16)(x)
            return nn.Dense(8, kernel_init=orthogonal_init(0.01))(x)

    obs_f = jax.random.normal(key, (N * B, 46), jnp.float32)
    obs_b = obs_f.reshape(N, B, 46)

    for use_ln in (True, False):
        m = Tower(use_ln=use_ln)
        p1 = m.init(key, jnp.zeros((1, 46)))
        pN = jax.vmap(lambda k: m.init(k, jnp.zeros((1, 46))))(jax.random.split(key, N))

        def loss1(p, o):
            return m.apply(p, o).mean()

        def shared_grad(p):
            g = jax.grad(loss1)(p, obs_f)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)

        def vmapped_grad(p):
            g = jax.vmap(lambda pp, oo: jax.grad(loss1)(pp, oo))(p, obs_b)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)

        tag = "LN" if use_ln else "noLN"
        dt = time_scanned(shared_grad, p1, n=10, rtt=rtt)
        print(f"tower grad shared  {tag:5s}      {dt*1e3:9.3f} ms", flush=True)
        dt = time_scanned(vmapped_grad, pN, n=10, rtt=rtt)
        print(f"tower grad vmapped {tag:5s}      {dt*1e3:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
