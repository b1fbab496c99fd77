"""Multi-task PPO (MTPPO) + random-policy baseline.

Re-design of the reference MTRL family (agents/algorithms/mtrl/mtppo.py:
112-300 and the `random` mode 127-214) with the multi-task wrapper semantics
of agents/tasks/agent_base/multi_task_vec_task.py:33-42 ('add-onehot': the
task one-hot is appended to the observation).

Tasks may have different obs/act dims: observations are zero-padded to the
max and a K-dim one-hot appended; actions are sliced per task.  One shared
policy is trained on the concatenation of per-task GAE batches; per-task
mean rewards are logged separately (mtppo.py per-task bookkeeping).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from massive_marl_tpu.envs.base import batched_step
from massive_marl_tpu.algos import nets
from massive_marl_tpu.algos.rl.ppo import PPOConfig


@dataclass
class MTPPOConfig(PPOConfig):
    task_sample_mode: str = "round_robin"
    # 'add-onehot' appends the task one-hot to the obs; 'vanilla' feeds the
    # (padded) raw obs (multi_task_vec_task.py:37-39,115-117,128-130)
    mode: str = "add-onehot"

    @classmethod
    def from_cfg_train(cls, cfg_train: dict) -> "MTPPOConfig":
        base = PPOConfig.from_cfg_train(cfg_train)
        mode = cfg_train.get("mode", "add-onehot")
        if mode not in ("add-onehot", "vanilla"):
            raise ValueError(f"unknown multi-task mode {mode!r}")
        return cls(**base.__dict__, mode=mode)


@struct.dataclass
class MTPPOState:
    params: Any
    opt_state: Any
    lr: jnp.ndarray
    env_states: Any          # dict task -> batched EnvState
    key: jnp.ndarray
    iteration: jnp.ndarray


class MTPPO:
    def __init__(self, envs: Dict[str, Any], num_envs: int,
                 cfg: MTPPOConfig | None = None, seed: int = 0,
                 log_dir: str | None = None, print_log: bool = True,
                 mesh=None):
        self.envs = envs
        self.task_names = sorted(envs.keys())
        self.K = len(self.task_names)
        self.num_envs = num_envs            # per task
        self.cfg = cfg or MTPPOConfig()
        self.seed = seed
        self.log_dir = log_dir
        self.print_log = print_log
        # multi-device: EVERY task's env batch shards over 'data' (per-task
        # env step under shard_map); the shared policy replicates and the
        # multi-task update's batch reductions become global means with
        # SPMD-inserted psums (tests/test_distributed.py mtppo case)
        self.mesh = mesh

        self.obs_dims = {t: envs[t].num_obs for t in self.task_names}
        self.act_dims = {t: envs[t].num_actions * envs[t].num_agents for t in self.task_names}
        self.max_obs = max(self.obs_dims.values())
        self.max_act = max(self.act_dims.values())
        # padded (+ onehot unless vanilla)
        self.obs_dim = self.max_obs + (self.K if self.cfg.mode == "add-onehot" else 0)
        self.model = nets.ActorCritic(act_dim=self.max_act, hidden_actor=self.cfg.hidden,
                                      hidden_critic=self.cfg.hidden,
                                      activation=self.cfg.activation,
                                      init_noise_std=self.cfg.init_noise_std)
        self.tx = optax.chain(optax.clip_by_global_norm(self.cfg.max_grad_norm),
                              optax.scale_by_adam())
        self._collect = {t: jax.jit(self._make_collect(t, i))
                         for i, t in enumerate(self.task_names)}
        self._update = jax.jit(self._make_update())
        self.state: MTPPOState | None = None

    def _aug_obs(self, obs, task_idx):
        pad = self.max_obs - obs.shape[-1]
        obs = jnp.pad(obs, [(0, 0)] * (obs.ndim - 1) + [(0, pad)])
        if self.cfg.mode == "vanilla":
            return obs
        onehot = jax.nn.one_hot(jnp.full(obs.shape[:-1], task_idx), self.K)
        return jnp.concatenate([obs, onehot], axis=-1)

    def init_state(self) -> MTPPOState:
        key = jax.random.PRNGKey(self.seed)
        key, km = jax.random.split(key)
        params = self.model.init(km, jnp.zeros((1, self.obs_dim)))
        env_states = {}
        for t in self.task_names:
            key, ke = jax.random.split(key)
            env_states[t] = jax.jit(jax.vmap(self.envs[t].reset))(
                jax.random.split(ke, self.num_envs))
        if self.mesh is not None:
            from massive_marl_tpu.parallel import mesh as pm
            env_states = jax.device_put(
                env_states, jax.tree_util.tree_map(
                    lambda _: pm.data_sharded(self.mesh), env_states))
        return MTPPOState(params=params, opt_state=self.tx.init(params),
                          lr=jnp.asarray(self.cfg.lr), env_states=env_states,
                          key=key, iteration=jnp.asarray(0, jnp.int32))

    def _make_collect(self, task, task_idx):
        cfg = self.cfg
        env = self.envs[task]
        act_dim = self.act_dims[task]
        E, T = self.num_envs, cfg.nsteps
        env_step = batched_step(env)
        if self.mesh is not None:
            from massive_marl_tpu.parallel.mesh import shard_env_step
            env_step = shard_env_step(env_step, self.mesh)

        def step(carry, _):
            env_state, key, params = carry
            key, k = jax.random.split(key)
            obs = self._aug_obs(jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs), task_idx)
            mean, value, log_std = self.model.apply(params, obs)
            actions = nets.gaussian_sample(k, mean, log_std)
            logp = nets.gaussian_log_prob(mean, log_std, actions)
            a_env = jnp.clip(actions[:, :act_dim], -cfg.clip_actions, cfg.clip_actions)
            ns = env_step(env_state, a_env)
            return (ns, key, params), dict(obs=obs, actions=actions, logp=logp,
                                           value=value, reward=ns.reward,
                                           done=ns.done.astype(jnp.float32))

        def collect(env_state, key, params):
            (env_state, key, _), traj = jax.lax.scan(step, (env_state, key, params),
                                                     None, length=T)
            last = self._aug_obs(jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs), task_idx)
            _, last_value, _ = self.model.apply(params, last)

            def back(adv, x):
                r, d, v, nv = x
                delta = r + cfg.gamma * nv * (1 - d) - v
                adv = delta + cfg.gamma * cfg.lam * (1 - d) * adv
                return adv, adv

            nv = jnp.concatenate([traj["value"][1:], last_value[None]], 0)
            _, adv = jax.lax.scan(back, jnp.zeros(E),
                                  (traj["reward"], traj["done"], traj["value"], nv),
                                  reverse=True)
            returns = adv + traj["value"]
            batch = dict(obs=traj["obs"].reshape(T * E, -1),
                         actions=traj["actions"].reshape(T * E, -1),
                         logp=traj["logp"].reshape(T * E),
                         value=traj["value"].reshape(T * E),
                         adv=adv.reshape(T * E), returns=returns.reshape(T * E))
            return env_state, key, batch, traj["reward"].mean()

        return collect

    def _make_update(self):
        cfg = self.cfg

        def loss_fn(params, batch):
            mean, value, log_std = self.model.apply(params, batch["obs"])
            logp = nets.gaussian_log_prob(mean, log_std, batch["actions"])
            ratio = jnp.exp(logp - batch["logp"])
            surr = jnp.mean(jnp.maximum(-batch["adv"] * ratio,
                                        -batch["adv"] * jnp.clip(ratio, 1 - cfg.cliprange,
                                                                 1 + cfg.cliprange)))
            v_clip = batch["value"] + jnp.clip(value - batch["value"],
                                               -cfg.cliprange, cfg.cliprange)
            vloss = jnp.mean(jnp.maximum((value - batch["returns"]) ** 2,
                                         (v_clip - batch["returns"]) ** 2))
            return surr + cfg.vf_coef * vloss, (surr, vloss)

        def update(params, opt_state, lr, batch):
            # advantage normalization over the multi-task batch
            adv = batch["adv"]
            batch = dict(batch, adv=(adv - adv.mean()) / (adv.std() + 1e-8))

            def epoch(carry, _):
                params, opt_state = carry
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
                return (params, opt_state), aux

            (params, opt_state), aux = jax.lax.scan(epoch, (params, opt_state),
                                                    None, length=cfg.noptepochs)
            return params, opt_state, aux[1].mean()

        return update

    def run(self, num_learning_iterations: int | None = None, log_interval: int = 1):
        from massive_marl_tpu.utils.logging import Writer
        n = num_learning_iterations or self.cfg.max_iterations
        if self.state is None:
            self.state = self.init_state()
        writer = Writer(self.log_dir) if self.log_dir else None
        for it in range(int(self.state.iteration), n):
            t0 = time.time()
            batches, task_rewards = [], {}
            env_states = dict(self.state.env_states)
            key = self.state.key
            for t in self.task_names:
                env_states[t], key, batch, rew = self._collect[t](
                    env_states[t], key, self.state.params)
                batches.append(batch)
                task_rewards[t] = float(rew)
            batch = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *batches)
            params, opt_state, vloss = self._update(self.state.params,
                                                    self.state.opt_state,
                                                    self.state.lr, batch)
            self.state = MTPPOState(params=params, opt_state=opt_state,
                                    lr=self.state.lr, env_states=env_states,
                                    key=key, iteration=self.state.iteration + 1)
            if it % log_interval == 0:
                if writer:
                    for t, r in task_rewards.items():
                        writer.add_scalar(f"train/reward_{t}", r, it)
                    writer.add_scalar("train/value_loss", float(vloss), it)
                if self.print_log:
                    rews = " ".join(f"{t}:{r:.2f}" for t, r in task_rewards.items())
                    tag = type(self).__name__.lower()
                    print(f"[{tag}] it {it}: {rews} ({time.time() - t0:.2f}s)")
            if self.log_dir and self.cfg.save_interval and (it + 1) % self.cfg.save_interval == 0:
                self.save(os.path.join(self.log_dir, f"model_{it + 1}.ckpt"))
        if writer:
            writer.flush()
        return self.state

    def save(self, path):
        from flax import serialization
        from massive_marl_tpu.utils.checkpoint import atomic_write_bytes
        atomic_write_bytes(path, serialization.to_bytes({"params": self.state.params,
                                            "iteration": self.state.iteration}))

    def load(self, path):
        from flax import serialization
        if self.state is None:
            self.state = self.init_state()
        tmpl = {"params": self.state.params, "iteration": self.state.iteration}
        with open(path, "rb") as f:
            restored = serialization.from_bytes(tmpl, f.read())
        self.state = self.state.replace(**restored)


class RandomPolicyRunner:
    """`--algo random` baseline (process_mtrl.py / mtppo.py:127-214): steps
    every task with uniform random actions and reports mean rewards."""

    def __init__(self, envs: Dict[str, Any], num_envs: int = 32, seed: int = 0):
        self.envs = envs
        self.num_envs = num_envs
        self.key = jax.random.PRNGKey(seed)

    def run(self, iterations: int = 10, steps_per_iter: int = 8):
        results = {}
        for t, env in self.envs.items():
            self.key, ke = jax.random.split(self.key)
            state = jax.jit(jax.vmap(env.reset))(jax.random.split(ke, self.num_envs))
            act_dim = env.num_actions * env.num_agents

            def roll(state, key):
                def step(carry, k):
                    st = carry
                    a = jax.random.uniform(k, (self.num_envs, act_dim), minval=-1, maxval=1)
                    st = batched_step(env)(st, a)
                    return st, st.reward
                keys = jax.random.split(key, iterations * steps_per_iter)
                return jax.lax.scan(step, state, keys)

            self.key, kr = jax.random.split(self.key)
            _, rewards = jax.jit(roll)(state, kr)
            results[t] = float(rewards.mean())
            print(f"[random] {t}: mean reward/step {results[t]:.3f}")
        return results
