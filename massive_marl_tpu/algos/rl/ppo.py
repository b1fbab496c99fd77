"""PPO, redesigned TPU-first.

Functional counterpart of the reference trainer
(agents/algorithms/rl/ppo/ppo.py:21-317 + storage.py:5-87): the whole
iteration - T-step rollout (lax.scan over jitted env.step), GAE, and
epochs x minibatches of clipped-surrogate updates with the adaptive-KL LR
schedule - compiles to ONE XLA program.  No host<->device traffic inside an
iteration; storage is the scan's stacked output, not a mutable buffer.

Reference semantics preserved:
  * clipped surrogate + clipped value loss (ppo.py:285-306)
  * adaptive KL learning rate x1.5 / /1.5 in [1e-5, 1e-2] (ppo.py:277-283)
  * GAE with (1 - done) masking (storage.py:51-65), advantage normalization
  * sequential minibatch split (storage.py:75-87), 5 epochs x 4 minibatches
  * obs clipped to +-5 before the policy (vec_task.py:126-139)
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training.train_state import TrainState as FlaxTrainState

from massive_marl_tpu.algos import nets


@dataclass
class PPOConfig:
    nsteps: int = 8                 # cfg/ppo/config.yaml:23
    noptepochs: int = 5
    nminibatches: int = 4
    gamma: float = 0.96
    lam: float = 0.95
    cliprange: float = 0.2
    ent_coef: float = 0.0
    vf_coef: float = 1.0            # value_loss_coef (ppo.py:63)
    max_grad_norm: float = 1.0
    lr: float = 3e-4                # optim_stepsize
    desired_kl: float = 0.016
    schedule: str = "adaptive"
    init_noise_std: float = 0.8
    hidden: tuple = (1024, 1024, 512)
    activation: str = "elu"
    clip_obs: float = 5.0
    clip_actions: float = 1.0
    max_iterations: int = 6500
    save_interval: int = 1000
    use_clipped_value_loss: bool = True

    @classmethod
    def from_cfg_train(cls, cfg_train: dict) -> "PPOConfig":
        """Build from a reference-style train yaml (cfg/ppo/config.yaml)."""
        learn = cfg_train.get("learn", {})
        pol = cfg_train.get("policy", {})
        kw = {}
        m = {
            "nsteps": "nsteps", "noptepochs": "noptepochs", "nminibatches": "nminibatches",
            "gamma": "gamma", "lam": "lam", "cliprange": "cliprange",
            "ent_coef": "ent_coef", "max_grad_norm": "max_grad_norm",
            "lr": "optim_stepsize", "desired_kl": "desired_kl",
            "schedule": "schedule", "init_noise_std": "init_noise_std",
            "max_iterations": "max_iterations", "save_interval": "save_interval",
        }
        for k, yk in m.items():
            if yk in learn:
                kw[k] = learn[yk]
        if "pi_hid_sizes" in pol:
            kw["hidden"] = tuple(pol["pi_hid_sizes"])
        if "activation" in pol:
            kw["activation"] = pol["activation"]
        if "clip_observations" in cfg_train:
            kw["clip_obs"] = cfg_train["clip_observations"]
        if "clip_actions" in cfg_train:
            kw["clip_actions"] = cfg_train["clip_actions"]
        kw["lr"] = float(kw.get("lr", 3e-4))
        return cls(**kw)


@struct.dataclass
class PPOTrainState:
    params: Any
    opt_state: Any
    lr: jnp.ndarray            # adaptive-KL controlled step size
    env_state: Any             # batched EnvState [E, ...]
    key: jnp.ndarray
    iteration: jnp.ndarray


class PPO:
    """Drop-in trainer: PPO(env, num_envs, cfg).run(max_iterations)."""

    def __init__(self, env, num_envs: int, cfg: PPOConfig | None = None,
                 seed: int = 0, log_dir: str | None = None, device=None,
                 is_testing: bool = False, print_log: bool = True, mesh=None):
        self.env = env
        self.num_envs = num_envs
        self.cfg = cfg or PPOConfig()
        self.seed = seed
        self.log_dir = log_dir
        self.print_log = print_log
        # multi-device: env step runs under shard_map over mesh axis 'data'
        # (required for the fused pallas path; see parallel/mesh.py)
        self.mesh = mesh

        self.act_dim = env.num_actions * env.num_agents
        self.obs_dim = env.num_obs
        self.model = nets.ActorCritic(
            act_dim=self.act_dim, hidden_actor=self.cfg.hidden,
            hidden_critic=self.cfg.hidden, activation=self.cfg.activation,
            init_noise_std=self.cfg.init_noise_std)

        self.tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.max_grad_norm),
            optax.scale_by_adam(),
        )
        self._train_iter = jax.jit(self._make_train_iter())
        self._writer = None
        self.state: PPOTrainState | None = None

    # ------------------------------------------------------------------ setup
    def init_state(self) -> PPOTrainState:
        key = jax.random.PRNGKey(self.seed)
        key, k_model, k_env = jax.random.split(key, 3)
        params = self.model.init(k_model, jnp.zeros((1, self.obs_dim)))
        opt_state = self.tx.init(params)
        env_keys = jax.random.split(k_env, self.num_envs)
        env_state = jax.jit(jax.vmap(self.env.reset))(env_keys)
        return PPOTrainState(params=params, opt_state=opt_state,
                             lr=jnp.asarray(self.cfg.lr),
                             env_state=env_state, key=key,
                             iteration=jnp.asarray(0, jnp.int32))

    # ------------------------------------------------------- jitted iteration
    def _make_train_iter(self):
        cfg = self.cfg
        env = self.env
        model = self.model
        tx = self.tx
        T = cfg.nsteps
        E = self.num_envs
        n_mb = cfg.nminibatches
        mb_size = (T * E) // n_mb
        from massive_marl_tpu.envs.base import batched_step
        env_step = batched_step(env)
        if self.mesh is not None:
            from massive_marl_tpu.parallel.mesh import shard_env_step
            env_step = shard_env_step(env_step, self.mesh)

        def policy_apply(params, obs):
            return model.apply(params, obs)

        def rollout_step(carry, _):
            env_state, key, params = carry
            key, k_act = jax.random.split(key)
            obs = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            mean, value, log_std = policy_apply(params, obs)
            actions = nets.gaussian_sample(k_act, mean, log_std)
            logp = nets.gaussian_log_prob(mean, log_std, actions)
            actions_clipped = jnp.clip(actions, -cfg.clip_actions, cfg.clip_actions)
            next_state = env_step(env_state, actions_clipped)
            data = dict(obs=obs, actions=actions, logp=logp, value=value,
                        mean=mean, reward=next_state.reward,
                        done=next_state.done.astype(jnp.float32))
            return (next_state, key, params), data

        def gae(traj, last_value):
            def back(carry, x):
                adv = carry
                delta = x["reward"] + (1 - x["done"]) * cfg.gamma * x["next_value"] - x["value"]
                adv = delta + (1 - x["done"]) * cfg.gamma * cfg.lam * adv
                return adv, adv

            next_values = jnp.concatenate([traj["value"][1:], last_value[None]], axis=0)
            xs = dict(reward=traj["reward"], done=traj["done"],
                      value=traj["value"], next_value=next_values)
            _, adv = jax.lax.scan(back, jnp.zeros_like(last_value), xs, reverse=True)
            returns = adv + traj["value"]
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
            return adv_n, returns

        def loss_fn(params, batch, log_std_only_kl_lr):
            mean, value, log_std = policy_apply(params, batch["obs"])
            logp = nets.gaussian_log_prob(mean, log_std, batch["actions"])
            ratio = jnp.exp(logp - batch["logp"])
            adv = batch["adv"]
            surr = -adv * ratio
            surr_clip = -adv * jnp.clip(ratio, 1 - cfg.cliprange, 1 + cfg.cliprange)
            surrogate_loss = jnp.mean(jnp.maximum(surr, surr_clip))
            if cfg.use_clipped_value_loss:
                v_clip = batch["value"] + jnp.clip(value - batch["value"],
                                                   -cfg.cliprange, cfg.cliprange)
                value_loss = jnp.mean(jnp.maximum(
                    (value - batch["returns"]) ** 2, (v_clip - batch["returns"]) ** 2))
            else:
                value_loss = jnp.mean((batch["returns"] - value) ** 2)
            entropy = nets.gaussian_entropy(log_std, batch["obs"].shape[:1]).mean()
            loss = surrogate_loss + cfg.vf_coef * value_loss - cfg.ent_coef * entropy
            return loss, (surrogate_loss, value_loss, mean, log_std)

        def minibatch_update(carry, batch):
            params, opt_state, lr = carry
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, None)
            # adaptive KL LR (ppo.py:277-283): the reference evaluates the KL
            # on the pre-step params, the same params the loss forward just
            # ran - reuse that forward's (mean, log_std) instead of paying a
            # second policy forward per minibatch
            if cfg.schedule == "adaptive":
                mean_new, log_std_new = aux[2], aux[3]
                old_log_std = jnp.broadcast_to(batch["log_std"], mean_new.shape)
                kl = nets.gaussian_kl(batch["mean"], old_log_std, mean_new,
                                      jnp.broadcast_to(log_std_new, mean_new.shape)).mean()
                lr = jnp.where(kl > cfg.desired_kl * 2.0, jnp.maximum(1e-5, lr / 1.5), lr)
                lr = jnp.where((kl < cfg.desired_kl / 2.0) & (kl > 0.0),
                               jnp.minimum(1e-2, lr * 1.5), lr)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
            return (params, opt_state, lr), (aux[0], aux[1])

        def rollout_phase(ts: PPOTrainState):
            """(env_state, key, traj): the collection half of the iteration
            (exposed for the bench's rollout/update phase split)."""
            (env_state, key, _), traj = jax.lax.scan(
                rollout_step, (ts.env_state, ts.key, ts.params), None, length=T)
            return env_state, key, traj

        def update_phase(ts: PPOTrainState, env_state, key, traj):
            last_obs = jnp.clip(env_state.obs, -cfg.clip_obs, cfg.clip_obs)
            _, last_value, _ = policy_apply(ts.params, last_obs)
            adv, returns = gae(traj, last_value)

            log_std = ts.params["params"]["log_std"]
            flat = dict(
                obs=traj["obs"].reshape(T * E, -1),
                actions=traj["actions"].reshape(T * E, -1),
                logp=traj["logp"].reshape(T * E),
                value=traj["value"].reshape(T * E),
                mean=traj["mean"].reshape(T * E, -1),
                adv=adv.reshape(T * E),
                returns=returns.reshape(T * E),
            )

            # sequential minibatch split (storage.py:75-87), repeated per epoch
            def epoch(carry, _):
                mbs = jax.tree_util.tree_map(
                    lambda x: x[: n_mb * mb_size].reshape(n_mb, mb_size, *x.shape[1:]), flat)
                mbs["log_std"] = jnp.broadcast_to(log_std, (n_mb, mb_size, log_std.shape[0]))
                return jax.lax.scan(minibatch_update, carry, mbs)

            (params, opt_state, lr), (surr_losses, value_losses) = jax.lax.scan(
                epoch, (ts.params, ts.opt_state, ts.lr), None, length=cfg.noptepochs)

            metrics = dict(
                mean_reward=traj["reward"].mean(),
                mean_value_loss=value_losses.mean(),
                mean_surrogate_loss=surr_losses.mean(),
                mean_noise_std=jnp.mean(nets.dist_std(params["params"]["log_std"])),
                lr=lr,
                done_frac=traj["done"].mean(),
            )
            return PPOTrainState(params=params, opt_state=opt_state, lr=lr,
                                 env_state=env_state, key=key,
                                 iteration=ts.iteration + 1), metrics

        def train_iter(ts: PPOTrainState):
            env_state, key, traj = rollout_phase(ts)
            return update_phase(ts, env_state, key, traj)

        train_iter.rollout_phase = rollout_phase
        train_iter.update_phase = update_phase
        return train_iter

    # ---------------------------------------------------------------- driving
    def run(self, num_learning_iterations: int | None = None, log_interval: int = 1):
        from massive_marl_tpu.utils.logging import Writer, fetch_metrics
        n_iter = num_learning_iterations or self.cfg.max_iterations
        if self.state is None:
            self.state = self.init_state()
        writer = Writer(self.log_dir) if self.log_dir else None
        steps_per_iter = self.cfg.nsteps * self.num_envs
        for it in range(int(self.state.iteration), n_iter):
            t0 = time.time()
            self.state, metrics = self._train_iter(self.state)
            if it % log_interval == 0:
                m = fetch_metrics(metrics)
                dt_it = time.time() - t0
                m["fps"] = steps_per_iter / dt_it
                if writer:
                    writer.add_scalar("Train2/mean_reward/step", m["mean_reward"], it)
                    writer.add_scalar("Loss/value_function", m["mean_value_loss"], it)
                    writer.add_scalar("Loss/surrogate", m["mean_surrogate_loss"], it)
                    writer.add_scalar("Policy/mean_noise_std", m["mean_noise_std"], it)
                    writer.add_scalar("Perf/fps", m["fps"], it)
                if self.print_log:
                    print(f"it {it}: rew/step {m['mean_reward']:.3f} vloss {m['mean_value_loss']:.3f} "
                          f"std {m['mean_noise_std']:.2f} lr {m['lr']:.2e} fps {m['fps']:.0f}")
            if self.log_dir and self.cfg.save_interval and (it + 1) % self.cfg.save_interval == 0:
                self.save(os.path.join(self.log_dir, f"model_{it + 1}.ckpt"))
        if writer:
            writer.flush()
        return self.state

    # ------------------------------------------------------------- checkpoint
    def save(self, path: str):
        """Full train-state checkpoint (params AND optimizer state - the
        reference drops Adam moments, SURVEY.md section 5)."""
        from flax import serialization
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = serialization.to_bytes(
            {"params": self.state.params, "opt_state": self.state.opt_state,
             "lr": self.state.lr, "iteration": self.state.iteration})
        from massive_marl_tpu.utils.checkpoint import atomic_write_bytes
        atomic_write_bytes(path, blob)

    def load(self, path: str):
        from flax import serialization
        if self.state is None:
            self.state = self.init_state()
        with open(path, "rb") as f:
            blob = f.read()
        tmpl = {"params": self.state.params, "opt_state": self.state.opt_state,
                "lr": self.state.lr, "iteration": self.state.iteration}
        restored = serialization.from_bytes(tmpl, blob)
        self.state = self.state.replace(**restored)

    def test(self, path: str):
        self.load(path)

    # -------------------------------------------------------------- inference
    def act_inference(self, obs):
        mean, _, _ = self.model.apply(self.state.params,
                                      jnp.clip(obs, -self.cfg.clip_obs, self.cfg.clip_obs))
        return mean
