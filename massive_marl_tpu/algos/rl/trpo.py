"""TRPO (single-agent), fully jitted.

Functional counterpart of agents/algorithms/rl/trpo/trpo.py:28-477: GAE
rollout (same skeleton as PPO), then a natural-gradient policy step:
conjugate-gradient solve of F s = g with Fisher-vector products from the KL
Hessian (trpo.py:283-306), analytic step size sqrt(2*max_kl / sFs), and a
backtracking line search that accepts only when the surrogate improves and
KL stays within bounds (trpo.py:307-318).  The critic takes Adam steps on a
(clipped) value loss like the reference (trpo.py:325-336).

All control flow (CG iterations, backtracking) is lax.fori_loop / lax.scan -
no host round-trips inside an iteration.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree

from massive_marl_tpu.envs.base import batched_step
from massive_marl_tpu.algos import nets


@dataclass
class TRPOConfig:
    nsteps: int = 8
    gamma: float = 0.96
    lam: float = 0.95
    max_kl: float = 0.016
    cg_nsteps: int = 10
    damping: float = 0.1
    max_num_backtrack: int = 10
    backtrack_coeff: float = 0.8
    vf_lr: float = 3e-4
    vf_epochs: int = 5
    cliprange: float = 0.2
    init_noise_std: float = 0.8
    hidden: tuple = (1024, 1024, 512)
    activation: str = "elu"
    clip_obs: float = 5.0
    clip_actions: float = 1.0
    max_iterations: int = 6500
    save_interval: int = 1000

    @classmethod
    def from_cfg_train(cls, cfg_train: dict) -> "TRPOConfig":
        learn = cfg_train.get("learn", {})
        pol = cfg_train.get("policy", {})
        kw = {}
        for k, yk in {"nsteps": "nsteps", "gamma": "gamma", "lam": "lam",
                      "max_kl": "max_kl", "cg_nsteps": "cg_nsteps",
                      "damping": "damping", "max_num_backtrack": "max_num_backtrack",
                      "init_noise_std": "init_noise_std",
                      "max_iterations": "max_iterations",
                      "save_interval": "save_interval"}.items():
            if yk in learn:
                kw[k] = learn[yk]
        if "pi_hid_sizes" in pol:
            kw["hidden"] = tuple(pol["pi_hid_sizes"])
        if "activation" in pol:
            kw["activation"] = pol["activation"]
        return cls(**kw)


@struct.dataclass
class TRPOTrainState:
    actor_params: Any
    critic_params: Any
    vf_opt: Any
    env_state: Any
    key: jnp.ndarray
    iteration: jnp.ndarray


class _Actor(nets.nn.Module):
    act_dim: int
    hidden: tuple
    activation: str
    init_noise_std: float

    @nets.nn.compact
    def __call__(self, obs):
        mean = nets.MLP(self.hidden, self.act_dim, self.activation, 0.01)(obs)
        log_std = self.param("log_std",
                             nets.nn.initializers.constant(nets.np.log(self.init_noise_std)),
                             (self.act_dim,))
        return mean, log_std


class _Critic(nets.nn.Module):
    hidden: tuple
    activation: str

    @nets.nn.compact
    def __call__(self, obs):
        return jnp.squeeze(nets.MLP(self.hidden, 1, self.activation, 1.0)(obs), -1)


class TRPO:
    def __init__(self, env, num_envs: int, cfg: TRPOConfig | None = None,
                 seed: int = 0, log_dir: str | None = None, print_log: bool = True,
                 mesh=None):
        self.env = env
        self.num_envs = num_envs
        self.cfg = cfg or TRPOConfig()
        self.seed = seed
        self.log_dir = log_dir
        self.print_log = print_log
        # multi-device: env batch sharded over 'data' (env step under
        # shard_map - the fused pallas kernel cannot be auto-partitioned);
        # params/opt replicated, the CG/FVP/line-search reductions (jnp.mean
        # over the T*E batch) are global means for which the SPMD partitioner
        # inserts the psums (tests/test_distributed.py::test_trpo_psum_equivalence)
        self.mesh = mesh
        self.act_dim = env.num_actions * env.num_agents
        self.obs_dim = env.num_obs
        c = self.cfg
        self.actor = _Actor(self.act_dim, c.hidden, c.activation, c.init_noise_std)
        self.critic = _Critic(c.hidden, c.activation)
        self.vf_tx = optax.adam(c.vf_lr)
        self._train_iter = jax.jit(self._make_train_iter())
        self.state: TRPOTrainState | None = None

    def init_state(self) -> TRPOTrainState:
        key = jax.random.PRNGKey(self.seed)
        key, ka, kc, ke = jax.random.split(key, 4)
        ap = self.actor.init(ka, jnp.zeros((1, self.obs_dim)))
        cp = self.critic.init(kc, jnp.zeros((1, self.obs_dim)))
        env_state = jax.jit(jax.vmap(self.env.reset))(jax.random.split(ke, self.num_envs))
        ts = TRPOTrainState(actor_params=ap, critic_params=cp,
                            vf_opt=self.vf_tx.init(cp), env_state=env_state,
                            key=key, iteration=jnp.asarray(0, jnp.int32))
        if self.mesh is not None:
            from massive_marl_tpu.parallel import mesh as pm
            ts = pm.apply_sharding(ts, self.mesh)
        return ts

    def _make_train_iter(self):
        cfg = self.cfg
        env = self.env
        T, E = cfg.nsteps, self.num_envs
        actor, critic = self.actor, self.critic
        env_step = batched_step(env)
        if self.mesh is not None:
            from massive_marl_tpu.parallel.mesh import shard_env_step
            env_step = shard_env_step(env_step, self.mesh)

        flat_util = ravel_pytree

        def rollout_step(carry, _):
            env_state, key, ap, cp = carry
            key, k_act = jax.random.split(key)
            obs = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            mean, log_std = actor.apply(ap, obs)
            actions = nets.gaussian_sample(k_act, mean, log_std)
            logp = nets.gaussian_log_prob(mean, log_std, actions)
            value = critic.apply(cp, obs)
            ns = env_step(env_state, jnp.clip(actions, -cfg.clip_actions, cfg.clip_actions))
            return (ns, key, ap, cp), dict(obs=obs, actions=actions, logp=logp,
                                           value=value, mean=mean,
                                           reward=ns.reward,
                                           done=ns.done.astype(jnp.float32))

        def train_iter(ts: TRPOTrainState):
            (env_state, key, _, _), traj = jax.lax.scan(
                rollout_step, (ts.env_state, ts.key, ts.actor_params, ts.critic_params),
                None, length=T)
            last_obs = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            last_value = critic.apply(ts.critic_params, last_obs)

            def back(adv, x):
                r, d, v, nv = x
                delta = r + cfg.gamma * nv * (1 - d) - v
                adv = delta + cfg.gamma * cfg.lam * (1 - d) * adv
                return adv, adv

            next_vals = jnp.concatenate([traj["value"][1:], last_value[None]], 0)
            _, adv = jax.lax.scan(back, jnp.zeros(E),
                                  (traj["reward"], traj["done"], traj["value"], next_vals),
                                  reverse=True)
            returns = adv + traj["value"]
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)

            obs = traj["obs"].reshape(T * E, -1)
            actions = traj["actions"].reshape(T * E, -1)
            old_logp = traj["logp"].reshape(T * E)
            old_mean = traj["mean"].reshape(T * E, -1)
            advf = adv_n.reshape(T * E)
            retf = returns.reshape(T * E)
            old_log_std = ts.actor_params["params"]["log_std"]

            flat_params, unravel = flat_util(ts.actor_params)

            def surrogate(p_flat):
                p = unravel(p_flat)
                mean, log_std = actor.apply(p, obs)
                logp = nets.gaussian_log_prob(mean, log_std, actions)
                return jnp.mean(jnp.exp(logp - old_logp) * advf)

            def mean_kl(p_flat):
                p = unravel(p_flat)
                mean, log_std = actor.apply(p, obs)
                return nets.gaussian_kl(old_mean,
                                        jnp.broadcast_to(old_log_std, mean.shape),
                                        mean,
                                        jnp.broadcast_to(log_std, mean.shape)).mean()

            g = jax.grad(surrogate)(flat_params)

            def fvp(v):
                # Hessian-vector product of the KL at the old params + damping
                return jax.jvp(jax.grad(mean_kl), (flat_params,), (v,))[1] + cfg.damping * v

            def cg(b):
                def body(i, st):
                    x, r, p, rs = st
                    Ap = fvp(p)
                    alpha = rs / (jnp.dot(p, Ap) + 1e-10)
                    x = x + alpha * p
                    r = r - alpha * Ap
                    rs_new = jnp.dot(r, r)
                    p = r + (rs_new / (rs + 1e-10)) * p
                    return (x, r, p, rs_new)
                x0 = jnp.zeros_like(b)
                st = (x0, b, b, jnp.dot(b, b))
                x, *_ = jax.lax.fori_loop(0, cfg.cg_nsteps, body, st)
                return x

            step_dir = cg(g)
            sAs = jnp.dot(step_dir, fvp(step_dir))
            beta = jnp.sqrt(2.0 * cfg.max_kl / jnp.maximum(sAs, 1e-10))
            full_step = beta * step_dir
            old_surr = surrogate(flat_params)

            # backtracking line search (trpo.py:307-318): accept the first
            # scale with positive improvement and KL within bounds
            def ls_body(carry, i):
                accepted, best = carry
                scale = cfg.backtrack_coeff ** i
                cand = flat_params + scale * full_step
                improve = surrogate(cand) - old_surr
                kl_ok = mean_kl(cand) <= cfg.max_kl * 1.5
                take = (~accepted) & (improve > 0) & kl_ok
                best = jnp.where(take, cand, best)
                return (accepted | take, best), None

            (accepted, new_flat), _ = jax.lax.scan(
                ls_body, (jnp.asarray(False), flat_params),
                jnp.arange(cfg.max_num_backtrack))
            actor_params = unravel(new_flat)

            # ---- critic update (Adam epochs, clipped value loss) ----
            def vf_loss(cp):
                v = critic.apply(cp, obs)
                v_old = traj["value"].reshape(T * E)
                v_clip = v_old + jnp.clip(v - v_old, -cfg.cliprange, cfg.cliprange)
                return jnp.mean(jnp.maximum((v - retf) ** 2, (v_clip - retf) ** 2))

            def vf_epoch(carry, _):
                cp, opt = carry
                loss, gr = jax.value_and_grad(vf_loss)(cp)
                up, opt = self.vf_tx.update(gr, opt, cp)
                return (optax.apply_updates(cp, up), opt), loss

            (critic_params, vf_opt), vlosses = jax.lax.scan(
                vf_epoch, (ts.critic_params, ts.vf_opt), None, length=cfg.vf_epochs)

            metrics = dict(mean_reward=traj["reward"].mean(),
                           surrogate=old_surr, accepted=accepted.astype(jnp.float32),
                           value_loss=vlosses.mean())
            return TRPOTrainState(actor_params=actor_params, critic_params=critic_params,
                                  vf_opt=vf_opt, env_state=env_state, key=key,
                                  iteration=ts.iteration + 1), metrics

        return train_iter

    def run(self, num_learning_iterations: int | None = None, log_interval: int = 1):
        from massive_marl_tpu.utils.logging import Writer
        n = num_learning_iterations or self.cfg.max_iterations
        if self.state is None:
            self.state = self.init_state()
        writer = Writer(self.log_dir) if self.log_dir else None
        spi = self.cfg.nsteps * self.num_envs
        for it in range(int(self.state.iteration), n):
            t0 = time.time()
            self.state, m = self._train_iter(self.state)
            if it % log_interval == 0:
                mm = {k: float(v) for k, v in m.items()}
                fps = spi / (time.time() - t0)
                if writer:
                    writer.add_scalar("train/mean_reward", mm["mean_reward"], it)
                    writer.add_scalar("train/value_loss", mm["value_loss"], it)
                    writer.add_scalar("perf/fps", fps, it)
                if self.print_log:
                    print(f"[trpo] it {it}: rew {mm['mean_reward']:.3f} "
                          f"accept {mm['accepted']:.0f} fps {fps:.0f}")
            if self.log_dir and self.cfg.save_interval and (it + 1) % self.cfg.save_interval == 0:
                self.save(os.path.join(self.log_dir, f"model_{it + 1}.ckpt"))
        if writer:
            writer.flush()
        return self.state

    def save(self, path):
        from flax import serialization
        from massive_marl_tpu.utils.checkpoint import atomic_write_bytes
        atomic_write_bytes(path, serialization.to_bytes(
                {"actor_params": self.state.actor_params,
                 "critic_params": self.state.critic_params,
                 "iteration": self.state.iteration}))

    def load(self, path):
        from flax import serialization
        if self.state is None:
            self.state = self.init_state()
        tmpl = {"actor_params": self.state.actor_params,
                "critic_params": self.state.critic_params,
                "iteration": self.state.iteration}
        with open(path, "rb") as f:
            restored = serialization.from_bytes(tmpl, f.read())
        self.state = self.state.replace(**restored)

    test = load

    def act_inference(self, obs):
        mean, _ = self.actor.apply(self.state.actor_params,
                                   jnp.clip(obs, -self.cfg.clip_obs, self.cfg.clip_obs))
        return mean
