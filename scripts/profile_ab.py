"""Measurement-validity check on the axon backend: identical args vs varying
args for the same program, plus the exact runner-form actor grad.

If identical-arg calls are much faster than varying-arg calls, repeated
executions are being elided/memoized and every standalone microbench here
must vary its inputs.
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

from massive_marl_tpu.algos.marl import nets as mnets
from massive_marl_tpu.algos.nets import orthogonal_init


def bench(name, fn, args_list, warmup=8):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    for a in args_list[1:warmup]:
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for a in args_list[warmup:]:
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (len(args_list) - warmup)
    print(f"{name:42s} {dt * 1e3:9.3f} ms", flush=True)


def main():
    N, B, D = 10, 32768, 46
    key = jax.random.PRNGKey(0)
    actor = mnets.MarlActor(act_dim=8)
    pN = jax.vmap(lambda k: actor.init(k, jnp.zeros((1, D))))(jax.random.split(key, N))
    obs = jax.random.normal(key, (N, B, D), jnp.float32)
    actions = jax.random.normal(jax.random.PRNGKey(1), (N, B, 8), jnp.float32)
    logp = jax.random.normal(jax.random.PRNGKey(2), (N, B), jnp.float32) * 0.1
    adv = jax.random.normal(jax.random.PRNGKey(3), (N, B), jnp.float32)

    def one_actor_loss(p, o, a, lp, ad):
        mean, std = actor.apply(p, o)
        nlp = mnets.normal_log_prob(mean, std, a)
        ratio = jnp.exp(nlp - lp)
        return -jnp.mean(jnp.minimum(ratio * ad, jnp.clip(ratio, 0.8, 1.2) * ad))

    @jax.jit
    def actor_grad(ap, obs, actions, logp, adv):
        g = jax.vmap(jax.grad(one_actor_loss))(ap, obs, actions, logp, adv)
        return jax.tree_util.tree_map(lambda x: x.sum(), g)

    M = 40
    same = [(pN, obs, actions, logp, adv)] * M
    varying = [(pN, obs + 0.001 * i, actions, logp, adv) for i in range(M)]
    # pre-materialize the varying inputs so the +0.001*i add is NOT timed
    varying = jax.block_until_ready(varying)

    bench("actor grad IDENTICAL args", actor_grad, same)
    bench("actor grad VARYING obs", actor_grad, varying)

    @jax.jit
    def actor_fwd(ap, obs):
        m, s = jax.vmap(actor.apply)(ap, obs)
        return m.sum()

    bench("actor fwd IDENTICAL args", actor_fwd, [(pN, obs)] * M)
    varying_f = jax.block_until_ready([(pN, obs + 0.001 * i) for i in range(M)])
    bench("actor fwd VARYING obs", actor_fwd, varying_f)


if __name__ == "__main__":
    main()
