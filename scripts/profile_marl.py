"""Phase-level profile of the TenAnt+MAPPO/HAPPO iteration on the TPU.

All timings use utils/profiling.time_scanned (device-side lax.scan + host
fetch): on the axon runtime `block_until_ready` does NOT wait, so plain
python-loop timings are invalid (see time_scanned docstring).

Phases, at bench shapes (E=4096, episode_length=8, 10 agents, 512-hidden):
  1. full train_iter       (rollout + GAE + all-agent epochs)
  2. rollout only          (scan of act_all + value_all + env.step)
  3. act_all+value_all     (per-step NN cost, 10 agents, chained via obs)
  4. env.step              (one control step, chained via state)

  MARL_ALGO=mappo|happo|ippo python scripts/profile_marl.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
from massive_marl_tpu.envs.base import batched_step
from massive_marl_tpu.envs.ten_ant import TenAntEnv
from massive_marl_tpu.utils.profiling import measure_rtt, time_scanned


def main():
    E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    algo = os.environ.get("MARL_ALGO", "mappo")
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    env = TenAntEnv({"sim": {"fused_kernel": fused}})
    cfg = MarlConfig(algorithm_name=algo)
    runner = MarlRunner(env, num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts = runner.init_state()
    T, N = cfg.episode_length, runner.N
    rtt = measure_rtt()
    print(f"algo={algo} E={E} T={T} N={N} fused={fused} rtt={rtt*1e3:.1f}ms", flush=True)

    train_iter = runner._make_train_iter()

    # 1. full iteration (carry = train state)
    dt = time_scanned(lambda ts: train_iter(ts)[0], ts, n=10, rtt=rtt)
    print(f"full train_iter      {dt*1e3:9.3f} ms  -> {T*E/dt:,.0f} env-steps/s", flush=True)

    actor, critic = runner.actor, runner.critic

    def act_all(ap, obs):
        return jax.vmap(lambda p, o: actor.apply(p, o), in_axes=(0, 1), out_axes=1)(ap, obs)

    def value_all(cp, cin):
        return jax.vmap(lambda p, o: critic.apply(p, o), in_axes=(0, 1), out_axes=1)(cp, cin)

    # 2. rollout only (carry = (env_state, key); params closed over)
    def rollout_once(carry):
        env_state, key = carry
        def step(c, _):
            es, k = c
            k, k_act = jax.random.split(k)
            obs_buf = jnp.clip(es.obs, -cfg.clip_obs, cfg.clip_obs)
            obs, cin = runner._agent_views(obs_buf)
            mean, std = act_all(ts.actor_params, obs)
            a = jnp.clip(mean + std * jax.random.normal(k_act, mean.shape), -1, 1)
            v = value_all(ts.critic_params, cin)
            es = batched_step(env)(es, a.reshape(E, -1))
            return (es, k), None
        return jax.lax.scan(step, (env_state, key), None, length=T)[0]

    dt = time_scanned(rollout_once, (ts.env_state, ts.key), n=10, rtt=rtt)
    print(f"rollout (T steps)    {dt*1e3:9.3f} ms  ({dt/T*1e3:.3f} ms/env-step)", flush=True)

    # 3. NN only, chained through obs
    obs0, _ = runner._agent_views(jnp.clip(ts.env_state.obs, -cfg.clip_obs, cfg.clip_obs))

    def nn_step(obs):
        cin = jnp.broadcast_to(
            obs.reshape(E, -1)[:, None, :obs.shape[-1]], obs.shape) if False else obs
        mean, std = act_all(ts.actor_params, obs)
        share = jnp.clip(ts.env_state.obs, -cfg.clip_obs, cfg.clip_obs)
        _, cin = runner._agent_views(share)
        v = value_all(ts.critic_params, cin)
        return obs.at[..., :8].add(1e-4 * mean + 1e-6 * v[..., None])

    dt = time_scanned(nn_step, obs0, n=20, rtt=rtt)
    print(f"act_all+value_all    {dt*1e3:9.3f} ms/step", flush=True)

    # 4. env.step only, chained through state
    a0 = jnp.zeros((E, 80))
    dt = time_scanned(lambda es: batched_step(env)(es, a0), ts.env_state, n=20, rtt=rtt)
    print(f"env.step             {dt*1e3:9.3f} ms/step", flush=True)

    # 5. update phase alone + the rollout/update overlap probe (VERDICT r2
    # item 4).  A pipelined schedule would run iteration t's update while
    # rolling out iteration t+1 with 1-step-stale data; its best case is
    # max(rollout, update) instead of their sum.  Whether that best case is
    # reachable on ONE TensorCore is exactly what the combined program
    # measures: rollout_phase and update_phase with INDEPENDENT dataflow in
    # a single jit - if XLA serializes them (one core, both phases
    # contending for the same MXU/HBM), t_combined ~= t_roll + t_upd and
    # pipelining buys nothing on a single chip.
    if os.environ.get("PROF_OVERLAP", "1") != "0":
        roll = train_iter.rollout_phase
        upd = train_iter.update_phase
        es0, k0, traj0 = jax.jit(roll)(ts)
        traj0 = jax.tree_util.tree_map(jax.block_until_ready, traj0)

        dt_u = time_scanned(lambda t: upd(t, es0, k0, traj0)[0], ts, n=10, rtt=rtt)
        print(f"update phase alone   {dt_u*1e3:9.3f} ms", flush=True)

        def combined(t):
            es2, k2, _traj2 = roll(t)                # fresh rollout ...
            t2, _ = upd(t, es0, k0, traj0)           # ... while updating on
            return t2.replace(env_state=es2, key=k2)  # a stale buffer

        dt_c = time_scanned(combined, ts, n=10, rtt=rtt)
        print(f"pipelined combined   {dt_c*1e3:9.3f} ms  "
              f"(serial bound = roll+upd; ideal overlap = max(roll, upd))",
              flush=True)

    # 6. bf16 Adam first-moment variant (VERDICT r2 item 4 lever): halves
    # the mu read+write traffic of every optimizer step.
    if algo in ("mappo", "ippo") and os.environ.get("PROF_BF16_MU", "1") != "0":
        runner_b = MarlRunner(env, num_envs=E,
                              cfg=MarlConfig(algorithm_name=algo, bf16_adam_mu=True),
                              seed=0, print_log=False)
        ts_b = runner_b.init_state()
        it_b = runner_b._make_train_iter()
        dt_b = time_scanned(lambda t: it_b(t)[0], ts_b, n=10, rtt=rtt)
        print(f"train_iter bf16-mu   {dt_b*1e3:9.3f} ms  -> {T*E/dt_b:,.0f} env-steps/s",
              flush=True)


if __name__ == "__main__":
    main()
