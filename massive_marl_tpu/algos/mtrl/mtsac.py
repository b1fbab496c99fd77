"""MTSAC: multi-task SAC (reference agents/algorithms/mtrl/mtsac).

One squashed-Gaussian SAC policy trained across K tasks: observations are
zero-padded to the max dim with a task one-hot appended (the multi-task
wrapper's 'add-onehot' mode), transitions from every task share one replay
ring, actions are sliced per task.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from massive_marl_tpu.envs.base import batched_step
from massive_marl_tpu.algos.rl.offpolicy import (
    OffPolicyConfig,
    QFunction,
    SquashedGaussianActor,
    squashed_sample,
)


@dataclass
class MTSACConfig(OffPolicyConfig):
    pass


@struct.dataclass
class MTSACState:
    params: Any
    target_params: Any
    opt_pi: Any
    opt_q: Any
    replay: Any              # dict of arrays
    env_states: Any          # dict task -> batched EnvState
    key: jnp.ndarray
    iteration: jnp.ndarray


class MTSAC:
    def __init__(self, envs: Dict[str, Any], num_envs: int,
                 cfg: MTSACConfig | None = None, seed: int = 0,
                 log_dir: str | None = None, print_log: bool = True,
                 mesh=None):
        self.envs = envs
        self.task_names = sorted(envs.keys())
        self.K = len(self.task_names)
        self.num_envs = num_envs
        self.cfg = cfg or MTSACConfig(algo="sac")
        self.seed = seed
        self.log_dir = log_dir
        self.print_log = print_log
        # multi-device: per-task env batches + the shared replay ring's env
        # axis ([R, E, ...], axis 1) shard over 'data'; params replicate and
        # the Q/pi grad reductions psum (same layout as OffPolicy)
        self.mesh = mesh
        self.max_obs = max(e.num_obs for e in envs.values())
        self.obs_dim = self.max_obs + self.K
        self.act_dims = {t: envs[t].num_actions * envs[t].num_agents
                         for t in self.task_names}
        self.act_dim = max(self.act_dims.values())
        hidden = [self.cfg.hidden_nodes] * self.cfg.hidden_layer
        self.pi = SquashedGaussianActor(self.act_dim, hidden)
        self.q = QFunction(hidden)
        self.tx = optax.chain(optax.clip_by_global_norm(self.cfg.max_grad_norm),
                              optax.adam(self.cfg.lr))
        self._collect = {t: jax.jit(self._make_collect(t, i))
                         for i, t in enumerate(self.task_names)}
        self._update = jax.jit(self._make_update())
        self.state: MTSACState | None = None

    def _aug(self, obs, idx):
        pad = self.max_obs - obs.shape[-1]
        obs = jnp.pad(obs, [(0, 0)] * (obs.ndim - 1) + [(0, pad)])
        onehot = jax.nn.one_hot(jnp.full(obs.shape[:-1], idx), self.K)
        return jnp.concatenate([obs, onehot], axis=-1)

    def init_state(self) -> MTSACState:
        c = self.cfg
        key = jax.random.PRNGKey(self.seed)
        key, kp, k1, k2 = jax.random.split(key, 4)
        o = jnp.zeros((1, self.obs_dim))
        a = jnp.zeros((1, self.act_dim))
        params = {"pi": self.pi.init(kp, o), "q1": self.q.init(k1, o, a),
                  "q2": self.q.init(k2, o, a)}
        R = c.replay_size
        E = self.num_envs
        replay = dict(obs=jnp.zeros((R, E, self.obs_dim)),
                      actions=jnp.zeros((R, E, self.act_dim)),
                      rewards=jnp.zeros((R, E)), dones=jnp.zeros((R, E)),
                      next_obs=jnp.zeros((R, E, self.obs_dim)),
                      ptr=jnp.asarray(0, jnp.int32), count=jnp.asarray(0, jnp.int32))
        env_states = {}
        for t in self.task_names:
            key, ke = jax.random.split(key)
            env_states[t] = jax.jit(jax.vmap(self.envs[t].reset))(
                jax.random.split(ke, E))
        q_params = {k: params[k] for k in ("q1", "q2")}
        ts = MTSACState(params=params,
                        target_params=jax.tree_util.tree_map(lambda x: x, params),
                        opt_pi=self.tx.init(params["pi"]),
                        opt_q=self.tx.init(q_params),
                        replay=replay, env_states=env_states, key=key,
                        iteration=jnp.asarray(0, jnp.int32))
        if self.mesh is not None:
            from massive_marl_tpu.parallel import mesh as pm
            sh = pm.replicate_tree(ts, self.mesh)
            sh = sh.replace(
                env_states=jax.tree_util.tree_map(
                    lambda _: pm.data_sharded(self.mesh), ts.env_states),
                replay=pm.shard_axis_tree(ts.replay, self.mesh, axis=1))
            ts = jax.device_put(ts, sh)
        return ts

    def _make_collect(self, task, idx):
        c = self.cfg
        env = self.envs[task]
        E = self.num_envs
        act_dim = self.act_dims[task]
        env_step = batched_step(env)
        if self.mesh is not None:
            from massive_marl_tpu.parallel.mesh import shard_env_step
            env_step = shard_env_step(env_step, self.mesh)

        def collect(env_state, replay, params, key):
            def step(carry, _):
                st, rep, key = carry
                key, k = jax.random.split(key)
                obs = self._aug(jnp.clip(st.obs, -c.clip_obs, c.clip_obs), idx)
                mu, log_std = self.pi.apply(params["pi"], obs)
                a, _ = squashed_sample(k, mu, log_std)
                ns = env_step(st, jnp.clip(a[:, :act_dim], -1, 1))
                nobs = self._aug(jnp.clip(ns.obs, -c.clip_obs, c.clip_obs), idx)
                rep = dict(rep,
                           obs=rep["obs"].at[rep["ptr"]].set(obs),
                           actions=rep["actions"].at[rep["ptr"]].set(a),
                           rewards=rep["rewards"].at[rep["ptr"]].set(ns.reward),
                           dones=rep["dones"].at[rep["ptr"]].set(ns.done.astype(jnp.float32)),
                           next_obs=rep["next_obs"].at[rep["ptr"]].set(nobs),
                           ptr=(rep["ptr"] + 1) % c.replay_size,
                           count=jnp.minimum(rep["count"] + 1, c.replay_size))
                return (ns, rep, key), ns.reward.mean()
            (env_state, replay, key), rews = jax.lax.scan(
                step, (env_state, replay, key), None, length=c.nsteps)
            return env_state, replay, key, rews.mean()

        return collect

    def _make_update(self):
        c = self.cfg
        E = self.num_envs

        def one_update(params, target_params, opt_pi, opt_q, replay, key):
            key, ki, kq, kp = jax.random.split(key, 4)
            idx = jax.random.randint(ki, (c.batch_size,), 0,
                                     jnp.maximum(replay["count"], 1))
            B = c.batch_size * E
            o = replay["obs"][idx].reshape(B, -1)
            a = replay["actions"][idx].reshape(B, -1)
            r = replay["rewards"][idx].reshape(B)
            d = replay["dones"][idx].reshape(B)
            o2 = replay["next_obs"][idx].reshape(B, -1)

            def q_loss(qp):
                mu2, ls2 = self.pi.apply(params["pi"], o2)
                a2, logp2 = squashed_sample(kq, mu2, ls2)
                tq = jnp.minimum(self.q.apply(target_params["q1"], o2, a2),
                                 self.q.apply(target_params["q2"], o2, a2))
                backup = jax.lax.stop_gradient(
                    r + c.gamma * (1 - d) * (tq - c.ent_coef * logp2))
                return (jnp.mean((self.q.apply(qp["q1"], o, a) - backup) ** 2)
                        + jnp.mean((self.q.apply(qp["q2"], o, a) - backup) ** 2))

            q_params = {k: params[k] for k in ("q1", "q2")}
            ql, qg = jax.value_and_grad(q_loss)(q_params)
            qu, opt_q = self.tx.update(qg, opt_q, q_params)
            q_params = optax.apply_updates(q_params, qu)
            params = {**params, **q_params}

            def pi_loss(pp):
                mu, ls = self.pi.apply(pp, o)
                api, logp = squashed_sample(kp, mu, ls)
                q = jnp.minimum(self.q.apply(params["q1"], o, api),
                                self.q.apply(params["q2"], o, api))
                return jnp.mean(c.ent_coef * logp - q)

            pl, pg = jax.value_and_grad(pi_loss)(params["pi"])
            pu, opt_pi = self.tx.update(pg, opt_pi, params["pi"])
            params = {**params, "pi": optax.apply_updates(params["pi"], pu)}
            target_params = jax.tree_util.tree_map(
                lambda t, p: c.polyak * t + (1 - c.polyak) * p, target_params, params)
            return params, target_params, opt_pi, opt_q, key, ql

        def update(params, target_params, opt_pi, opt_q, replay, key, n_updates):
            ql = jnp.asarray(0.0)
            for _ in range(n_updates):
                params, target_params, opt_pi, opt_q, key, ql = one_update(
                    params, target_params, opt_pi, opt_q, replay, key)
            return params, target_params, opt_pi, opt_q, key, ql

        return lambda p, tp, opi, oq, rep, key: update(p, tp, opi, oq, rep, key,
                                                       c.noptepochs * c.nminibatches)

    def run(self, num_iterations: int | None = None, log_interval: int = 1):
        from massive_marl_tpu.utils.logging import Writer
        c = self.cfg
        n = num_iterations or c.max_iterations
        if self.state is None:
            self.state = self.init_state()
        writer = Writer(self.log_dir) if self.log_dir else None
        for it in range(int(self.state.iteration), n):
            t0 = time.time()
            st = self.state
            env_states = dict(st.env_states)
            replay, key = st.replay, st.key
            task_rews = {}
            for t in self.task_names:
                env_states[t], replay, key, rew = self._collect[t](
                    env_states[t], replay, st.params, key)
                task_rews[t] = float(rew)
            params, tp, opi, oq = st.params, st.target_params, st.opt_pi, st.opt_q
            ql = 0.0
            if int(replay["count"]) >= c.batch_size:
                params, tp, opi, oq, key, ql = self._update(params, tp, opi, oq,
                                                            replay, key)
                ql = float(ql)
            self.state = MTSACState(params=params, target_params=tp, opt_pi=opi,
                                    opt_q=oq, replay=replay, env_states=env_states,
                                    key=key, iteration=st.iteration + 1)
            if it % log_interval == 0:
                if writer:
                    for t, r in task_rews.items():
                        writer.add_scalar(f"train/reward_{t}", r, it)
                    writer.add_scalar("train/q_loss", ql, it)
                if self.print_log:
                    rs = " ".join(f"{t}:{r:.2f}" for t, r in task_rews.items())
                    print(f"[mtsac] it {it}: {rs} qloss {ql:.3f} "
                          f"({time.time() - t0:.2f}s)")
        if writer:
            writer.flush()
        return self.state
