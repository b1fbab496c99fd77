"""Off-policy SARL: DDPG, TD3, SAC.

Functional re-design of the reference trainers
(agents/algorithms/rl/{ddpg/ddpg.py:23-385, td3/td3.py:23-391,
sac/sac.py:24-406}) with their replay semantics (sac/storage.py:5-62):

  * replay ring [R, E, ...] holds whole env-rows per time slot; sampling
    draws random time slots and uses all E rows (the reference's generator
    is vestigial/commented - random-slot sampling is the documented intent)
  * `update()` runs noptepochs x nminibatches gradient steps per env step
    after warm-up (ddpg.py:174-206; sac nsteps loop 160-206)
  * polyak-averaged target nets (polyak * targ + (1-polyak) * new)
  * DDPG: deterministic actor + act_noise exploration; TD3 adds twin Q,
    clipped target noise and delayed policy updates (policy_delay=2);
    SAC: squashed-Gaussian actor, twin Q, and automatic entropy-temperature
    tuning (SAC-v2 dual step on log_alpha toward -act_dim target entropy;
    `ent_coef: auto`) or a fixed alpha when the cfg gives a number

TPU shape: the replay ring lives in HBM inside the train state (donated by
jit), one iteration = lax.scan over nsteps of [env step -> ring write ->
k gradient updates], all one XLA program.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Sequence

import jax

from massive_marl_tpu.envs.base import batched_step
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


# ---------------------------------------------------------------------------
# networks (sac/module.py:23-92, ddpg/module.py, td3/module.py)
# ---------------------------------------------------------------------------


class QFunction(nn.Module):
    hidden: Sequence[int]

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return jnp.squeeze(nn.Dense(1)(x), -1)


class DetActor(nn.Module):
    """tanh deterministic actor (DDPG/TD3), act_limit = 1."""
    act_dim: int
    hidden: Sequence[int]

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return jnp.tanh(nn.Dense(self.act_dim)(x))


class SquashedGaussianActor(nn.Module):
    act_dim: int
    hidden: Sequence[int]

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        mu = nn.Dense(self.act_dim)(x)
        log_std = jnp.clip(nn.Dense(self.act_dim)(x), LOG_STD_MIN, LOG_STD_MAX)
        return mu, log_std


def squashed_sample(key, mu, log_std):
    std = jnp.exp(log_std)
    pre = mu + std * jax.random.normal(key, mu.shape)
    # log prob with tanh correction (spinning-up formulation, sac/module.py)
    logp = jnp.sum(-0.5 * ((pre - mu) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi), -1)
    logp = logp - jnp.sum(2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)), -1)
    return jnp.tanh(pre), logp


# ---------------------------------------------------------------------------
# config / state
# ---------------------------------------------------------------------------


@dataclass
class OffPolicyConfig:
    algo: str = "sac"               # sac | td3 | ddpg
    nsteps: int = 8
    noptepochs: int = 1
    nminibatches: int = 4
    replay_size: int = 5000        # cfg/sac/config.yaml:24 (td3: 100, ddpg: 10000)
    batch_size: int = 32           # time slots per gradient step
    gamma: float = 0.99
    polyak: float = 0.99           # targ <- polyak*targ + (1-polyak)*new
    lr: float = 3e-4
    max_grad_norm: float = 1.0
    ent_coef: float = 0.2          # SAC alpha (initial value when auto_alpha)
    auto_alpha: bool = False       # SAC v2: tune alpha toward target_entropy
    target_entropy: float | None = None  # default -act_dim (set at init)
    reward_scale: float = 1.0
    act_noise: float = 0.1         # ddpg/td3 exploration noise
    target_noise: float = 0.2      # td3
    noise_clip: float = 0.5        # td3
    policy_delay: int = 2          # td3
    hidden_nodes: int = 1024       # sac (td3/ddpg: 256)
    hidden_layer: int = 3
    clip_obs: float = 5.0
    clip_actions: float = 1.0
    max_iterations: int = 6500
    save_interval: int = 1000
    warmup_slots: int | None = None  # defaults to batch_size (sac.py:189-193)

    @classmethod
    def from_cfg_train(cls, cfg_train: dict, algo: str) -> "OffPolicyConfig":
        learn = cfg_train.get("learn", {})
        kw = {"algo": algo}
        m = {"nsteps": "nsteps", "noptepochs": "noptepochs",
             "nminibatches": "nminibatches", "replay_size": "replay_size",
             "batch_size": "batch_size", "gamma": "gamma", "polyak": "polyak",
             "lr": "learning_rate", "max_grad_norm": "max_grad_norm",
             "ent_coef": "ent_coef", "reward_scale": "reward_scale",
             "act_noise": "act_noise", "target_noise": "target_noise",
             "noise_clip": "noise_clip", "policy_delay": "policy_delay",
             "hidden_nodes": "hidden_nodes", "hidden_layer": "hidden_layer",
             "max_iterations": "max_iterations", "save_interval": "save_interval",
             "auto_alpha": "auto_alpha", "target_entropy": "target_entropy"}
        for k, yk in m.items():
            if yk in learn:
                kw[k] = learn[yk]
        # ent_coef: 'auto' enables SAC-v2 alpha tuning (initial alpha 0.2)
        if kw.get("ent_coef") == "auto":
            kw["ent_coef"] = 0.2
            kw["auto_alpha"] = True
        kw["lr"] = float(kw.get("lr", 3e-4))
        return cls(**kw)


@struct.dataclass
class Replay:
    obs: jnp.ndarray        # [R,E,obs]
    actions: jnp.ndarray    # [R,E,act]
    rewards: jnp.ndarray    # [R,E]
    next_obs: jnp.ndarray   # [R,E,obs]
    dones: jnp.ndarray      # [R,E]
    ptr: jnp.ndarray        # i32 next write slot
    count: jnp.ndarray      # i32 filled slots (<= R)


@struct.dataclass
class OffPolicyState:
    params: Any             # dict(pi=..., q1=..., q2=...)
    target_params: Any
    opt_pi: Any
    opt_q: Any
    replay: Replay
    env_state: Any
    key: jnp.ndarray
    iteration: jnp.ndarray
    update_count: jnp.ndarray


class OffPolicy:
    """SAC/TD3/DDPG trainer over a functional env."""

    def __init__(self, env, num_envs: int, cfg: OffPolicyConfig | None = None,
                 seed: int = 0, log_dir: str | None = None, print_log: bool = True,
                 mesh=None):
        self.env = env
        self.num_envs = num_envs
        self.cfg = cfg or OffPolicyConfig()
        self.seed = seed
        self.log_dir = log_dir
        self.print_log = print_log
        # multi-device: env batch + replay ring sharded over mesh axis 'data'
        # (ring on its E axis - [R, E, ...]); params replicated, gradient
        # psum inserted by the SPMD partitioner; env step under shard_map
        # because the fused pallas kernel cannot be auto-partitioned
        self.mesh = mesh

        self.obs_dim = env.num_obs
        self.act_dim = env.num_actions * env.num_agents
        hidden = [self.cfg.hidden_nodes] * self.cfg.hidden_layer
        self.is_sac = self.cfg.algo == "sac"
        self.twin_q = self.cfg.algo in ("sac", "td3")
        if self.is_sac:
            self.pi = SquashedGaussianActor(self.act_dim, hidden)
        else:
            self.pi = DetActor(self.act_dim, hidden)
        self.q = QFunction(hidden)

        self.tx_pi = optax.chain(optax.clip_by_global_norm(self.cfg.max_grad_norm),
                                 optax.adam(self.cfg.lr))
        self.tx_q = optax.chain(optax.clip_by_global_norm(self.cfg.max_grad_norm),
                                optax.adam(self.cfg.lr))
        self._collect_iter = jax.jit(self._make_iter(update=False))
        self._train_iter = jax.jit(self._make_iter(update=True), donate_argnums=(0,))
        self.state: OffPolicyState | None = None

    # ------------------------------------------------------------------ setup
    def init_state(self) -> OffPolicyState:
        cfg = self.cfg
        key = jax.random.PRNGKey(self.seed)
        key, kpi, kq1, kq2, kenv = jax.random.split(key, 5)
        obs0 = jnp.zeros((1, self.obs_dim))
        act0 = jnp.zeros((1, self.act_dim))
        params = {"pi": self.pi.init(kpi, obs0), "q1": self.q.init(kq1, obs0, act0)}
        if self.twin_q:
            params["q2"] = self.q.init(kq2, obs0, act0)
        # targets exclude the temperature (never read from the target copy).
        # REAL copies, not aliases: donate_argnums would otherwise see the
        # same buffer twice on the first _train_iter call
        target_params = jax.tree_util.tree_map(jnp.copy, params)
        if self.is_sac and cfg.auto_alpha:
            # SAC v2: learned temperature, updated toward target_entropy
            params["alpha"] = {"log_alpha": jnp.log(jnp.asarray(cfg.ent_coef))}
        opt_pi = self.tx_pi.init(params["pi"])
        q_params = {k: params[k] for k in params if k.startswith("q")}
        opt_q = self.tx_q.init(q_params)
        E, R = self.num_envs, cfg.replay_size
        # bf16 HBM ring (same rationale as the MADDPG buffer): on TenAnt
        # (obs 388) the f32 version is ~4.5 GB at R=10k/E=128 and scales
        # linearly with E; obs are clipped so bf16 precision is ample
        bf = jnp.bfloat16
        replay = Replay(
            obs=jnp.zeros((R, E, self.obs_dim), bf),
            actions=jnp.zeros((R, E, self.act_dim), bf),
            rewards=jnp.zeros((R, E)),
            next_obs=jnp.zeros((R, E, self.obs_dim), bf),
            dones=jnp.zeros((R, E)),
            ptr=jnp.asarray(0, jnp.int32), count=jnp.asarray(0, jnp.int32))
        env_state = jax.jit(jax.vmap(self.env.reset))(jax.random.split(kenv, E))
        ts = OffPolicyState(params=params, target_params=target_params,
                            opt_pi=opt_pi, opt_q=opt_q, replay=replay,
                            env_state=env_state, key=key,
                            iteration=jnp.asarray(0, jnp.int32),
                            update_count=jnp.asarray(0, jnp.int32))
        return self._place(ts)

    def _place(self, ts: OffPolicyState) -> OffPolicyState:
        """Mesh placement: env batch and replay E-axis sharded over 'data',
        everything else replicated (no-op without a mesh)."""
        if self.mesh is None:
            return ts
        from massive_marl_tpu.parallel import mesh as pm
        sh = pm.replicate_tree(ts, self.mesh)
        sh = sh.replace(env_state=pm.shard_leading_axis(ts.env_state, self.mesh),
                        replay=pm.shard_axis_tree(ts.replay, self.mesh, axis=1))
        return jax.device_put(ts, sh)

    # -------------------------------------------------------------- internals
    def _policy_act(self, params, obs, key, explore: bool):
        if self.is_sac:
            mu, log_std = self.pi.apply(params, obs)
            if explore:
                a, _ = squashed_sample(key, mu, log_std)
                return a
            return jnp.tanh(mu)
        a = self.pi.apply(params, obs)
        if explore:
            a = a + self.cfg.act_noise * jax.random.normal(key, a.shape)
        return jnp.clip(a, -1.0, 1.0)

    def _q_loss(self, q_params, params, target_params, batch, key):
        cfg = self.cfg
        o, a, r, o2, d = (batch["obs"], batch["actions"], batch["rewards"],
                          batch["next_obs"], batch["dones"])
        if self.is_sac:
            mu2, log_std2 = self.pi.apply(params["pi"], o2)
            a2, logp_a2 = squashed_sample(key, mu2, log_std2)
        elif self.cfg.algo == "td3":
            a2 = self.pi.apply(target_params["pi"], o2)
            eps = jnp.clip(cfg.target_noise * jax.random.normal(key, a2.shape),
                           -cfg.noise_clip, cfg.noise_clip)
            a2 = jnp.clip(a2 + eps, -1.0, 1.0)
            logp_a2 = 0.0
        else:
            a2 = self.pi.apply(target_params["pi"], o2)
            logp_a2 = 0.0
        q1_t = self.q.apply(target_params["q1"], o2, a2)
        q_t = jnp.minimum(q1_t, self.q.apply(target_params["q2"], o2, a2)) if self.twin_q else q1_t
        alpha = self._alpha(params) if self.is_sac else 0.0
        backup = r + cfg.gamma * (1 - d) * (q_t - alpha * logp_a2)
        backup = jax.lax.stop_gradient(backup)
        q1 = self.q.apply(q_params["q1"], o, a)
        loss = jnp.mean((q1 - backup) ** 2)
        if self.twin_q:
            q2 = self.q.apply(q_params["q2"], o, a)
            loss = loss + jnp.mean((q2 - backup) ** 2)
        return loss

    def _alpha(self, params):
        """Entropy temperature: learned (SAC v2) when auto_alpha, else fixed."""
        if self.is_sac and self.cfg.auto_alpha:
            return jnp.exp(params["alpha"]["log_alpha"])
        return self.cfg.ent_coef

    def _pi_loss(self, pi_params, params, batch, key):
        """Returns (loss, mean_logp) - the aux feeds the alpha dual step."""
        o = batch["obs"]
        if self.is_sac:
            mu, log_std = self.pi.apply(pi_params, o)
            a, logp = squashed_sample(key, mu, log_std)
            q1 = self.q.apply(params["q1"], o, a)
            q = jnp.minimum(q1, self.q.apply(params["q2"], o, a))
            alpha = jax.lax.stop_gradient(self._alpha(params))
            return jnp.mean(alpha * logp - q), jnp.mean(logp)
        a = self.pi.apply(pi_params, o)
        return -jnp.mean(self.q.apply(params["q1"], o, a)), jnp.asarray(0.0)

    def _make_iter(self, update: bool):
        cfg = self.cfg
        env = self.env
        E = self.num_envs
        R = cfg.replay_size
        B = cfg.batch_size
        n_updates = cfg.noptepochs * cfg.nminibatches if update else 0
        env_step_fn = batched_step(env)
        if self.mesh is not None:
            from massive_marl_tpu.parallel.mesh import shard_env_step
            env_step_fn = shard_env_step(env_step_fn, self.mesh)

        def grad_update(params, target_params, opt_pi, opt_q, replay, key, upd_count):
            key, k_idx, k_q, k_pi = jax.random.split(key, 4)
            idx = jax.random.randint(k_idx, (B,), 0, jnp.maximum(replay.count, 1))
            f32 = jnp.float32
            batch = dict(
                obs=replay.obs[idx].reshape(B * E, -1).astype(f32),
                actions=replay.actions[idx].reshape(B * E, -1).astype(f32),
                rewards=replay.rewards[idx].reshape(B * E),
                next_obs=replay.next_obs[idx].reshape(B * E, -1).astype(f32),
                dones=replay.dones[idx].reshape(B * E))

            q_params = {k: params[k] for k in params if k.startswith("q")}
            qloss, qgrad = jax.value_and_grad(self._q_loss)(
                q_params, params, target_params, batch, k_q)
            qup, opt_q = self.tx_q.update(qgrad, opt_q, q_params)
            q_params = optax.apply_updates(q_params, qup)
            params = {**params, **q_params}

            def do_pi(args):
                params, opt_pi = args
                (ploss, mean_logp), pgrad = jax.value_and_grad(
                    self._pi_loss, has_aux=True)(params["pi"], params, batch, k_pi)
                pup, opt_pi = self.tx_pi.update(pgrad, opt_pi, params["pi"])
                params = {**params, "pi": optax.apply_updates(params["pi"], pup)}
                if self.is_sac and cfg.auto_alpha:
                    # SAC v2 temperature dual step, reusing the pi-loss logp:
                    # L(log_a) = -log_a * (E[logp] + target_H).  The raw step
                    # is clipped (logp scales with act_dim early in training)
                    # and log_alpha bounded to keep alpha finite.
                    target_h = (cfg.target_entropy if cfg.target_entropy is not None
                                else -float(self.act_dim))
                    delta = jnp.clip(cfg.lr * (mean_logp + target_h), -0.01, 0.01)
                    la = jnp.clip(params["alpha"]["log_alpha"] + delta, -10.0, 2.0)
                    params = {**params, "alpha": {"log_alpha": la}}
                return params, opt_pi

            if cfg.algo == "td3":
                params, opt_pi = jax.lax.cond(
                    upd_count % cfg.policy_delay == 0, do_pi,
                    lambda args: args, (params, opt_pi))
            else:
                params, opt_pi = do_pi((params, opt_pi))

            # polyak only over the target's own keys (it excludes 'alpha')
            target_params = jax.tree_util.tree_map(
                lambda t, p: cfg.polyak * t + (1 - cfg.polyak) * p, target_params,
                {k: params[k] for k in target_params})
            return params, target_params, opt_pi, opt_q, key, qloss

        def env_step(carry, _):
            (params, target_params, opt_pi, opt_q, replay, env_state, key, upd_count) = carry
            key, k_act = jax.random.split(key)
            obs = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            actions = self._policy_act(params["pi"], obs, k_act, explore=True)
            a_clip = jnp.clip(actions, -cfg.clip_actions, cfg.clip_actions)
            next_env = env_step_fn(env_state, a_clip)
            next_obs = jnp.clip(next_env.obs, -cfg.clip_obs, cfg.clip_obs)
            r = next_env.reward * cfg.reward_scale
            bf = jnp.bfloat16
            replay = replay.replace(
                obs=replay.obs.at[replay.ptr].set(obs.astype(bf)),
                actions=replay.actions.at[replay.ptr].set(actions.astype(bf)),
                rewards=replay.rewards.at[replay.ptr].set(r),
                next_obs=replay.next_obs.at[replay.ptr].set(next_obs.astype(bf)),
                dones=replay.dones.at[replay.ptr].set(next_env.done.astype(jnp.float32)),
                ptr=(replay.ptr + 1) % R,
                count=jnp.minimum(replay.count + 1, R))

            qloss = jnp.asarray(0.0)
            for _ in range(n_updates):
                params, target_params, opt_pi, opt_q, key, qloss = grad_update(
                    params, target_params, opt_pi, opt_q, replay, key, upd_count)
                upd_count = upd_count + 1
            return (params, target_params, opt_pi, opt_q, replay, next_env, key,
                    upd_count), (r.mean(), qloss)

        def iteration(ts: OffPolicyState):
            carry = (ts.params, ts.target_params, ts.opt_pi, ts.opt_q, ts.replay,
                     ts.env_state, ts.key, ts.update_count)
            carry, (rews, qlosses) = jax.lax.scan(env_step, carry, None, length=cfg.nsteps)
            (params, target_params, opt_pi, opt_q, replay, env_state, key, upd_count) = carry
            metrics = dict(mean_reward=rews.mean(), q_loss=qlosses.mean())
            return OffPolicyState(params=params, target_params=target_params,
                                  opt_pi=opt_pi, opt_q=opt_q, replay=replay,
                                  env_state=env_state, key=key,
                                  iteration=ts.iteration + 1,
                                  update_count=upd_count), metrics

        return iteration

    # ---------------------------------------------------------------- driving
    def run(self, num_learning_iterations: int | None = None, log_interval: int = 1):
        from massive_marl_tpu.utils.logging import Writer, fetch_metrics
        cfg = self.cfg
        n_iter = num_learning_iterations or cfg.max_iterations
        if self.state is None:
            self.state = self.init_state()
        writer = Writer(self.log_dir) if self.log_dir else None
        warmup = cfg.warmup_slots if cfg.warmup_slots is not None else cfg.batch_size
        steps_per_iter = cfg.nsteps * self.num_envs
        for it in range(int(self.state.iteration), n_iter):
            t0 = time.time()
            # warm-up: collect without updating until the ring holds a batch
            # (sac.py:189-193 warm_up flag)
            if int(self.state.replay.count) < warmup:
                self.state, metrics = self._collect_iter(self.state)
            else:
                self.state, metrics = self._train_iter(self.state)
            if it % log_interval == 0:
                m = fetch_metrics(metrics)
                fps = steps_per_iter / (time.time() - t0)
                if writer:
                    writer.add_scalar("train/mean_reward", m["mean_reward"], it)
                    writer.add_scalar("train/q_loss", m["q_loss"], it)
                    writer.add_scalar("perf/fps", fps, it)
                if self.print_log:
                    print(f"[{cfg.algo}] it {it}: rew/step {m['mean_reward']:.3f} "
                          f"qloss {m['q_loss']:.3f} fps {fps:.0f}")
            if self.log_dir and cfg.save_interval and (it + 1) % cfg.save_interval == 0:
                self.save(os.path.join(self.log_dir, f"model_{it + 1}.ckpt"))
        if writer:
            writer.flush()
        return self.state

    def save(self, path: str):
        from flax import serialization
        from massive_marl_tpu.utils.checkpoint import atomic_write_bytes
        atomic_write_bytes(path, serialization.to_bytes(
                {"params": self.state.params, "target_params": self.state.target_params,
                 "iteration": self.state.iteration}))

    def load(self, path: str):
        from flax import serialization
        if self.state is None:
            self.state = self.init_state()
        tmpl = {"params": self.state.params, "target_params": self.state.target_params,
                "iteration": self.state.iteration}
        with open(path, "rb") as f:
            restored = serialization.from_bytes(tmpl, f.read())
        self.state = self.state.replace(**restored)

    test = load

    def act_inference(self, obs):
        obs = jnp.clip(obs, -self.cfg.clip_obs, self.cfg.clip_obs)
        return self._policy_act(self.state.params["pi"], obs, jax.random.PRNGKey(0),
                                explore=False)
