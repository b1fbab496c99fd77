"""Phase-level profile of the TenAnt+PPO iteration on the current backend.

Times, at bench shapes (E=4096, nsteps=8, 5x4 minibatches):
  1. full cached train_iter            (the bench.py program)
  2. vmap(env.step)                    (physics + obs + reward + auto-reset)
  3. policy forward                    (rollout-side NN)
  4. learn phase only                  (epochs x minibatch scan on fixed data)

Each is its own XLA program; compile wall-times are printed too (on axon a
fresh compile can be slow - run this in the background).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from massive_marl_tpu.algos import nets
from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
from massive_marl_tpu.envs.ten_ant import TenAntEnv


def timeit(name, fn, *args, n=20, warmup=12):
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
    print(f"{name:34s} {dt * 1e3:9.3f} ms/call   (first call incl compile: {t_compile:.1f} s)",
          flush=True)
    return dt


def main():
    E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    cfg = PPOConfig()
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    env = TenAntEnv({"sim": {"fused_kernel": fused}})
    print(f"fused_kernel={fused}", flush=True)
    ppo = PPO(env, num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts = ppo.init_state()
    print(f"backend={jax.default_backend()} devices={jax.devices()} E={E}", flush=True)

    # 1. full iteration (cached bench program)
    def full(ts):
        ts, m = ppo._train_iter(ts)
        return ts
    t_full = timeit("full train_iter", full, ts)

    # 2. env.step alone
    from massive_marl_tpu.envs.base import batched_step
    step = jax.jit(batched_step(env))
    acts = jnp.zeros((E, 80), jnp.float32)
    t_env = timeit("vmap(env.step)", step, ts.env_state, acts)

    # 3. policy forward alone
    obs = jnp.zeros((E, env.num_obs), jnp.float32)
    fwd = jax.jit(lambda p, o: ppo.model.apply(p, o))
    t_fwd = timeit("policy forward", fwd, ts.params, obs)

    # 4. learn phase alone: same epoch scan as train_iter, on fixed data
    T = cfg.nsteps
    n_mb = cfg.nminibatches
    mb_size = T * E // n_mb
    k = jax.random.PRNGKey(0)
    flat = dict(
        obs=jax.random.normal(k, (T * E, env.num_obs)),
        actions=jax.random.normal(k, (T * E, 80)) * 0.1,
        logp=jnp.zeros(T * E), value=jnp.zeros(T * E),
        mean=jax.random.normal(k, (T * E, 80)) * 0.1,
        adv=jax.random.normal(k, (T * E,)), returns=jnp.zeros(T * E),
    )

    ti = ppo._make_train_iter()  # only for closure parity; re-derive learn phase
    # reimplementation of the epoch scan over the SAME minibatch_update body is
    # not accessible from outside; approximate with value_and_grad over the
    # full loss at minibatch size, noptepochs*n_mb times back-to-back in a scan
    model = ppo.model

    def loss_fn(params, batch):
        mean, value, log_std = model.apply(params, batch["obs"])
        logp = nets.gaussian_log_prob(mean, log_std, batch["actions"])
        ratio = jnp.exp(logp - batch["logp"])
        surr = jnp.mean(-batch["adv"] * ratio)
        vloss = jnp.mean((batch["returns"] - value) ** 2)
        return surr + vloss

    def learn(params, opt_state, flat):
        mbs = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                x[: n_mb * mb_size].reshape(n_mb, mb_size, *x.shape[1:]),
                (cfg.noptepochs * n_mb // n_mb, n_mb, mb_size, *x.shape[1:])
            ).reshape(cfg.noptepochs * n_mb, mb_size, *x.shape[1:]), flat)

        def upd(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = ppo.tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p - 3e-4 * u, params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(upd, (params, opt_state), mbs)
        return losses.mean()

    learn_j = jax.jit(learn)
    t_learn = timeit("learn phase (20 minibatch steps)", learn_j, ts.params, ts.opt_state, flat)

    steps = cfg.nsteps * E
    print(f"\nsummary @ E={E}:")
    print(f"  full iter        {t_full*1e3:8.2f} ms  -> {steps/t_full:,.0f} env-steps/s")
    print(f"  8x env.step      {8*t_env*1e3:8.2f} ms ({100*8*t_env/t_full:.0f}% of full)")
    print(f"  8x policy fwd    {8*t_fwd*1e3:8.2f} ms ({100*8*t_fwd/t_full:.0f}% of full)")
    print(f"  learn (approx)   {t_learn*1e3:8.2f} ms ({100*t_learn/t_full:.0f}% of full)")


if __name__ == "__main__":
    main()
