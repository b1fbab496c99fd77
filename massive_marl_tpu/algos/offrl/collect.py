"""ppo_collect: train PPO online while dumping an offline dataset.

Reference: agents/algorithms/offrl/ppo_collect.py:135-165, 225-233 - the PPO
trainer additionally records (state, action, reward, done, next_state)
transitions and saves them as .npy files for the offline algos.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from massive_marl_tpu.envs.base import batched_step
from massive_marl_tpu.algos.rl.ppo import PPO, PPOConfig
from massive_marl_tpu.algos import nets
from massive_marl_tpu.algos.offrl import datasets


class PPOCollect:
    def __init__(self, env, num_envs: int, cfg_train: dict, seed: int = 0,
                 log_dir: str | None = None, dataset_dir: str = "./datasets",
                 task: str = "OneAnt", datatype: str = "expert",
                 collect_steps: int | None = None):
        cfg = PPOConfig.from_cfg_train(cfg_train)
        self.ppo = PPO(env, num_envs=num_envs, cfg=cfg, seed=seed, log_dir=log_dir,
                       print_log=True)
        self.env = env
        self.num_envs = num_envs
        self.out_dir = datasets.dataset_dir(dataset_dir, task, datatype)
        self.collect_steps = collect_steps or cfg_train.get("learn", {}).get(
            "collect_steps", 100_000)
        self._collect_fn = jax.jit(self._make_collect())

    def _make_collect(self):
        env = self.env
        cfg = self.ppo.cfg
        model = self.ppo.model

        def collect(params, env_state, key, n_steps):
            def step(carry, _):
                st, key = carry
                key, k = jax.random.split(key)
                obs = jnp.clip(st.obs, -cfg.clip_obs, cfg.clip_obs)
                mean, _, log_std = model.apply(params, obs)
                a = jnp.clip(nets.gaussian_sample(k, mean, log_std),
                             -cfg.clip_actions, cfg.clip_actions)
                ns = batched_step(env)(st, a)
                nobs = jnp.clip(ns.obs, -cfg.clip_obs, cfg.clip_obs)
                return (ns, key), (obs, a, ns.reward, ns.done.astype(jnp.float32), nobs)
            (env_state, key), traj = jax.lax.scan(step, (env_state, key), None,
                                                  length=n_steps)
            return env_state, key, traj

        return lambda params, es, key: collect(params, es, key, 8)

    def run(self, num_learning_iterations: int | None = None):
        # 1. train PPO (the collected policy)
        self.ppo.run(num_learning_iterations)
        # 2. roll the trained policy and dump the dataset
        state = self.ppo.state
        env_state, key = state.env_state, state.key
        bufs = {k: [] for k in datasets.FILES}
        steps = 0
        while steps < self.collect_steps:
            env_state, key, (obs, act, rew, done, nobs) = self._collect_fn(
                state.params, env_state, key)
            flat = lambda x: np.asarray(x).reshape(-1, *x.shape[2:])
            bufs["states"].append(flat(obs))
            bufs["actions"].append(flat(act))
            bufs["rewards"].append(np.asarray(rew).reshape(-1, 1))
            bufs["dones"].append(np.asarray(done).reshape(-1, 1))
            bufs["next_states"].append(flat(nobs))
            steps += 8 * self.num_envs
        arrays = {k: np.concatenate(v)[: self.collect_steps] for k, v in bufs.items()}
        datasets.save_dataset(self.out_dir, **arrays)
        print(f"[ppo_collect] wrote {len(arrays['states'])} transitions to {self.out_dir}")
        return self.out_dir
