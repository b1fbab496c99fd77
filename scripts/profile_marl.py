"""Phase-level profile of the TenAnt+MAPPO/HAPPO iteration on the TPU.

Times, at bench shapes (E=4096, episode_length=8, 10 agents, 512-hidden):
  1. full cached train_iter            (rollout + GAE + all-agent epochs)
  2. rollout only                      (scan of act_all + env.step)
  3. act_all + value_all               (per-step NN cost, 10 agents)
  4. update only                       (GAE + vmapped/scanned agent epochs)

Run in the background on axon (fresh compiles can take minutes).
  MARL_ALGO=mappo|happo|ippo python scripts/profile_marl.py
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
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
    algo = os.environ.get("MARL_ALGO", "mappo")
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    env = TenAntEnv({"sim": {"fused_kernel": fused}})
    cfg = MarlConfig(algorithm_name=algo)
    runner = MarlRunner(env, num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts = runner.init_state()
    T, N = cfg.episode_length, runner.N
    print(f"algo={algo} E={E} T={T} N={N} fused={fused}", flush=True)

    # 1. full iteration
    full = timeit("full train_iter", runner._train_iter, ts)
    sps = T * E / full
    print(f"  -> {sps:,.0f} env-steps/s", flush=True)

    # internals (rebuild the pieces the way _make_train_iter composes them)
    ti = runner._make_train_iter()

    # 2. rollout only
    import types
    from massive_marl_tpu.envs.base import batched_step
    from massive_marl_tpu.algos.marl import nets

    actor, critic = runner.actor, runner.critic

    def act_all(ap, obs):
        return jax.vmap(lambda p, o: actor.apply(p, o), in_axes=(0, 1), out_axes=1)(ap, obs)

    def value_all(cp, cin):
        return jax.vmap(lambda p, o: critic.apply(p, o), in_axes=(0, 1), out_axes=1)(cp, cin)

    def rollout_step(carry, _):
        env_state, key, ap, cp = carry
        key, k_act = jax.random.split(key)
        obs_buf = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
        obs, cin = runner._agent_views(obs_buf)
        mean, std = act_all(ap, obs)
        actions = mean + std * jax.random.normal(k_act, mean.shape)
        values = value_all(cp, cin)
        a_clip = jnp.clip(actions, -1.0, 1.0)
        next_state = batched_step(env)(env_state, a_clip.reshape(E, -1))
        return (next_state, key, ap, cp), (next_state.reward, values)

    @jax.jit
    def rollout(ts):
        (es, key, _, _), out = jax.lax.scan(
            rollout_step, (ts.env_state, ts.key, ts.actor_params, ts.critic_params),
            None, length=T)
        return out[0].sum(), es.obs.sum()

    timeit("rollout only (scan T steps)", rollout, ts)

    # 3. per-step NN
    obs_buf = jnp.clip(ts.env_state.obs, -cfg.clip_obs, cfg.clip_obs)
    obs, cin = runner._agent_views(obs_buf)

    @jax.jit
    def nn_step(ap, cp, obs, cin):
        m, s = act_all(ap, obs)
        v = value_all(cp, cin)
        return m.sum() + v.sum()

    timeit("act_all+value_all (one step)", nn_step,
           ts.actor_params, ts.critic_params, obs, cin)

    # 4. env step only
    a = jnp.zeros((E, env.num_actions * N if env.num_actions * N == 80 else 80))

    @jax.jit
    def env_step(es, a):
        return batched_step(env)(es, a)

    timeit("env.step (one control step)", env_step, ts.env_state, a)


if __name__ == "__main__":
    main()
