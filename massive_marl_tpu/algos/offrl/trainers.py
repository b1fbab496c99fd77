"""Offline RL trainers: TD3+BC, BCQ, IQL.

Re-derivations of agents/algorithms/offrl/{td3_bc, bcq, iql}:
  * TD3+BC (td3_bc.py:12-53): TD3 updates on the dataset plus a behavior-
    cloning term lambda * Q / |Q| weighting, obs normalization
  * BCQ (bcq/module.py:50-122): VAE action generator + perturbation actor
    (phi-clamped) + twin Q with lambda-weighted clipped double-Q target
  * IQL (iql/module.py:10-68): expectile value fn + advantage-weighted
    regression policy extraction

All train steps are jitted; the dataset lives in HBM and batches are random
gathers per step.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from massive_marl_tpu.algos.offrl import datasets


@dataclass
class OfflineConfig:
    algo: str = "td3_bc"
    batch_size: int = 256
    lr: float = 3e-4
    discount: float = 0.99
    tau: float = 0.005          # polyak (1-polyak convention here)
    hidden: int = 256
    layers: int = 2
    max_iterations: int = 100_000
    log_interval: int = 1000
    save_interval: int = 10_000
    dataset_root: str = "./datasets"
    # td3_bc
    policy_noise: float = 0.2
    noise_clip: float = 0.5
    policy_freq: int = 2
    alpha: float = 2.5
    normalize: bool = True
    # bcq
    phi: float = 0.05
    lmbda: float = 0.75
    # iql
    expectile: float = 0.7
    temperature: float = 3.0

    @classmethod
    def from_cfg_train(cls, cfg_train: dict, algo: str) -> "OfflineConfig":
        learn = cfg_train.get("learn", {})
        kw = {"algo": algo}
        for k, yk in {"batch_size": "batch_size", "lr": "learning_rate",
                      "discount": "discount", "tau": "tau",
                      "hidden": "hidden_nodes", "layers": "hidden_layer",
                      "max_iterations": "max_iterations",
                      "log_interval": "log_interval", "save_interval": "save_interval",
                      "policy_noise": "policy_noise", "noise_clip": "noise_clip",
                      "policy_freq": "policy_freq", "alpha": "alpha",
                      "normalize": "normalize", "phi": "phi", "lmbda": "lmbda",
                      "expectile": "expectile", "temperature": "temperature"}.items():
            if yk in learn:
                kw[k] = learn[yk]
        kw["lr"] = float(kw.get("lr", 3e-4))
        return cls(**kw)


def _mlp(hidden, layers, out):
    class M(nn.Module):
        @nn.compact
        def __call__(self, *xs):
            x = jnp.concatenate(xs, axis=-1) if len(xs) > 1 else xs[0]
            for _ in range(layers):
                x = nn.relu(nn.Dense(hidden)(x))
            return nn.Dense(out)(x)
    return M()


@struct.dataclass
class OfflineState:
    params: Any
    target_params: Any
    opts: Any
    key: jnp.ndarray
    step: jnp.ndarray


class OfflineTrainer:
    def __init__(self, task: str, datatype: str, cfg: OfflineConfig,
                 seed: int = 0, log_dir: str | None = None, print_log: bool = True,
                 data: dict | None = None, mesh=None):
        self.cfg = cfg
        self.log_dir = log_dir
        self.print_log = print_log
        # multi-device: the dataset REPLICATES (it is small - ~50-200 MB -
        # and replication keeps the random-index gather local to every
        # device); each sampled minibatch is then sharding-constrained over
        # 'data', so the per-step grads are computed data-parallel and the
        # SPMD partitioner inserts the psums.  eval_online's env rollout
        # shards its env batch like the on-policy trainers.
        self.mesh = mesh
        if data is None:
            path = datasets.dataset_dir(cfg.dataset_root, task, datatype)
            if not os.path.isdir(path):
                if datatype == "random":
                    datasets.make_random_dataset(path, task=task, seed=seed)
                else:
                    raise FileNotFoundError(
                        f"dataset {path} missing; run --algo ppo_collect first "
                        f"(process_offrl.py dataset convention)")
            data = datasets.load_dataset(path)
        self.obs_dim = data["states"].shape[1]
        self.act_dim = data["actions"].shape[1]

        if cfg.normalize and cfg.algo == "td3_bc":
            mu = data["states"].mean(0, keepdims=True)
            std = data["states"].std(0, keepdims=True) + 1e-3
            data = dict(data)
            data["states"] = (data["states"] - mu) / std
            data["next_states"] = (data["next_states"] - mu) / std
            self.obs_mean, self.obs_std = mu, std
        self.data = {k: jnp.asarray(v) for k, v in data.items()}
        self.N = len(data["states"])
        self.seed = seed
        self._build()
        self._train_step = jax.jit(self._make_train_step())
        self.state: OfflineState | None = None

    # ------------------------------------------------------------------ build
    def _build(self):
        c = self.cfg
        h, L, A = c.hidden, c.layers, self.act_dim
        self.nets = {}
        if c.algo == "td3_bc":
            self.nets = {"actor": _mlp(h, L, A), "q1": _mlp(h, L, 1), "q2": _mlp(h, L, 1)}
        elif c.algo == "bcq":
            latent = 2 * A
            self.latent_dim = latent
            self.nets = {"vae_enc": _mlp(h, L, 2 * latent), "vae_dec": _mlp(h, L, A),
                         "pert": _mlp(h, L, A), "q1": _mlp(h, L, 1), "q2": _mlp(h, L, 1)}
        elif c.algo == "iql":
            self.nets = {"actor": _mlp(h, L, 2 * A), "q1": _mlp(h, L, 1),
                         "q2": _mlp(h, L, 1), "value": _mlp(h, L, 1)}
        else:
            raise ValueError(c.algo)

    def init_state(self) -> OfflineState:
        c = self.cfg
        key = jax.random.PRNGKey(self.seed)
        keys = jax.random.split(key, len(self.nets) + 1)
        key = keys[0]
        o = jnp.zeros((1, self.obs_dim))
        a = jnp.zeros((1, self.act_dim))
        z = jnp.zeros((1, getattr(self, "latent_dim", 1)))
        init_in = {"actor": (o,), "q1": (o, a), "q2": (o, a), "value": (o,),
                   "vae_enc": (o, a), "vae_dec": (o, z), "pert": (o, a)}
        params = {}
        for (name, net), k in zip(self.nets.items(), keys[1:]):
            params[name] = net.init(k, *init_in[name])
        target_params = jax.tree_util.tree_map(lambda x: x, params)
        self.tx = optax.adam(c.lr)
        opts = {name: self.tx.init(p) for name, p in params.items()}
        return OfflineState(params=params, target_params=target_params, opts=opts,
                            key=key, step=jnp.asarray(0, jnp.int32))

    # ------------------------------------------------------------- train step
    def _sample(self, key):
        idx = jax.random.randint(key, (self.cfg.batch_size,), 0, self.N)
        batch = {k: v[idx] for k, v in self.data.items()}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P("data"))
            batch = jax.lax.with_sharding_constraint(
                batch, {k: sh for k in batch})
        return batch

    def _make_train_step(self):
        c = self.cfg
        if c.algo == "td3_bc":
            return self._td3bc_step
        if c.algo == "bcq":
            return self._bcq_step
        return self._iql_step

    # ---- TD3+BC (td3_bc.py:12-53) ----
    def _td3bc_step(self, st: OfflineState):
        c = self.cfg
        key, kb, kn = jax.random.split(st.key, 3)
        b = self._sample(kb)
        o, a, r, d, o2 = (b["states"], b["actions"], b["rewards"].squeeze(-1),
                          b["dones"].squeeze(-1), b["next_states"])
        nets_, p, tp = self.nets, st.params, st.target_params

        noise = jnp.clip(c.policy_noise * jax.random.normal(kn, a.shape),
                         -c.noise_clip, c.noise_clip)
        a2 = jnp.clip(jnp.tanh(nets_["actor"].apply(tp["actor"], o2)) + noise, -1, 1)
        tq = jnp.minimum(nets_["q1"].apply(tp["q1"], o2, a2).squeeze(-1),
                         nets_["q2"].apply(tp["q2"], o2, a2).squeeze(-1))
        target = r + c.discount * (1 - d) * tq

        def q_loss(qp, name):
            q = nets_[name].apply(qp, o, a).squeeze(-1)
            return jnp.mean((q - target) ** 2)

        params, opts = dict(p), dict(st.opts)
        for name in ("q1", "q2"):
            loss, g = jax.value_and_grad(q_loss)(p[name], name)
            up, opts[name] = self.tx.update(g, st.opts[name], p[name])
            params[name] = optax.apply_updates(p[name], up)

        def pi_loss(ap):
            pi = jnp.tanh(nets_["actor"].apply(ap, o))
            q = nets_["q1"].apply(params["q1"], o, pi).squeeze(-1)
            lmbda = c.alpha / (jnp.abs(q).mean() + 1e-8)
            return -lmbda * q.mean() + jnp.mean((pi - a) ** 2)

        def do_pi(_):
            loss, g = jax.value_and_grad(pi_loss)(p["actor"])
            up, opt = self.tx.update(g, st.opts["actor"], p["actor"])
            return optax.apply_updates(p["actor"], up), opt

        actor_p, actor_opt = jax.lax.cond(
            st.step % c.policy_freq == 0, do_pi,
            lambda _: (p["actor"], st.opts["actor"]), None)
        params["actor"], opts["actor"] = actor_p, actor_opt

        target_params = jax.tree_util.tree_map(
            lambda t, q: (1 - c.tau) * t + c.tau * q, tp, params)
        metrics = dict(q_loss=q_loss(params["q1"], "q1"))
        return st.replace(params=params, target_params=target_params, opts=opts,
                          key=key, step=st.step + 1), metrics

    # ---- BCQ (bcq/module.py:50-122) ----
    def _bcq_step(self, st: OfflineState):
        c = self.cfg
        key, kb, kz, ks = jax.random.split(st.key, 4)
        b = self._sample(kb)
        o, a, r, d, o2 = (b["states"], b["actions"], b["rewards"].squeeze(-1),
                          b["dones"].squeeze(-1), b["next_states"])
        nets_, p, tp = self.nets, st.params, st.target_params
        L = self.latent_dim

        def vae_loss(enc_p, dec_p):
            stats = nets_["vae_enc"].apply(enc_p, o, a)
            mu, log_std = stats[:, :L], jnp.clip(stats[:, L:], -4, 15)
            z = mu + jnp.exp(log_std) * jax.random.normal(kz, mu.shape)
            recon = jnp.tanh(nets_["vae_dec"].apply(dec_p, o, z))
            recon_loss = jnp.mean((recon - a) ** 2)
            kl = -0.5 * jnp.mean(1 + 2 * log_std - mu**2 - jnp.exp(2 * log_std))
            return recon_loss + 0.5 * kl

        params, opts = dict(p), dict(st.opts)
        vloss, grads = jax.value_and_grad(vae_loss, argnums=(0, 1))(p["vae_enc"], p["vae_dec"])
        for name, g in zip(("vae_enc", "vae_dec"), grads):
            up, opts[name] = self.tx.update(g, st.opts[name], p[name])
            params[name] = optax.apply_updates(p[name], up)

        def decode(dec_p, obs, key):
            z = jnp.clip(jax.random.normal(key, (obs.shape[0], L)), -0.5, 0.5)
            return jnp.tanh(nets_["vae_dec"].apply(dec_p, obs, z))

        # target: sample 10 candidate actions, perturb, lambda-weighted min/max
        def target_q():
            reps = 10
            o2r = jnp.repeat(o2, reps, axis=0)
            keys = jax.random.split(ks, 1)[0]
            cand = decode(params["vae_dec"], o2r, keys)
            pert = c.phi * jnp.tanh(nets_["pert"].apply(tp["pert"], o2r, cand))
            a2 = jnp.clip(cand + pert, -1, 1)
            q1 = nets_["q1"].apply(tp["q1"], o2r, a2).squeeze(-1)
            q2 = nets_["q2"].apply(tp["q2"], o2r, a2).squeeze(-1)
            q = c.lmbda * jnp.minimum(q1, q2) + (1 - c.lmbda) * jnp.maximum(q1, q2)
            return q.reshape(-1, reps).max(axis=1)

        tq = r + c.discount * (1 - d) * target_q()

        def q_loss(qp, name):
            return jnp.mean((nets_[name].apply(qp, o, a).squeeze(-1) - tq) ** 2)

        for name in ("q1", "q2"):
            loss, g = jax.value_and_grad(q_loss)(p[name], name)
            up, opts[name] = self.tx.update(g, st.opts[name], p[name])
            params[name] = optax.apply_updates(p[name], up)

        def pert_loss(pp):
            cand = decode(params["vae_dec"], o, kz)
            a_p = jnp.clip(cand + c.phi * jnp.tanh(nets_["pert"].apply(pp, o, cand)), -1, 1)
            return -jnp.mean(nets_["q1"].apply(params["q1"], o, a_p).squeeze(-1))

        loss, g = jax.value_and_grad(pert_loss)(p["pert"])
        up, opts["pert"] = self.tx.update(g, st.opts["pert"], p["pert"])
        params["pert"] = optax.apply_updates(p["pert"], up)

        target_params = jax.tree_util.tree_map(
            lambda t, q: (1 - c.tau) * t + c.tau * q, tp, params)
        return st.replace(params=params, target_params=target_params, opts=opts,
                          key=key, step=st.step + 1), dict(q_loss=q_loss(params["q1"], "q1"))

    # ---- IQL (iql/module.py:10-68) ----
    def _iql_step(self, st: OfflineState):
        c = self.cfg
        key, kb = jax.random.split(st.key)
        b = self._sample(kb)
        o, a, r, d, o2 = (b["states"], b["actions"], b["rewards"].squeeze(-1),
                          b["dones"].squeeze(-1), b["next_states"])
        nets_, p, tp = self.nets, st.params, st.target_params
        params, opts = dict(p), dict(st.opts)

        tq = jnp.minimum(nets_["q1"].apply(tp["q1"], o, a).squeeze(-1),
                         nets_["q2"].apply(tp["q2"], o, a).squeeze(-1))

        def v_loss(vp):
            v = nets_["value"].apply(vp, o).squeeze(-1)
            diff = tq - v
            weight = jnp.where(diff > 0, c.expectile, 1 - c.expectile)
            return jnp.mean(weight * diff**2)

        loss_v, g = jax.value_and_grad(v_loss)(p["value"])
        up, opts["value"] = self.tx.update(g, st.opts["value"], p["value"])
        params["value"] = optax.apply_updates(p["value"], up)

        next_v = nets_["value"].apply(params["value"], o2).squeeze(-1)
        target = r + c.discount * (1 - d) * next_v

        def q_loss(qp, name):
            return jnp.mean((nets_[name].apply(qp, o, a).squeeze(-1) - target) ** 2)

        for name in ("q1", "q2"):
            loss, g = jax.value_and_grad(q_loss)(p[name], name)
            up, opts[name] = self.tx.update(g, st.opts[name], p[name])
            params[name] = optax.apply_updates(p[name], up)

        adv = tq - nets_["value"].apply(params["value"], o).squeeze(-1)
        weights = jnp.minimum(jnp.exp(adv * c.temperature), 100.0)

        def pi_loss(ap):
            stats = nets_["actor"].apply(ap, o)
            mu, log_std = stats[:, :self.act_dim], jnp.clip(stats[:, self.act_dim:], -5, 2)
            logp = jnp.sum(-0.5 * ((a - jnp.tanh(mu)) / jnp.exp(log_std)) ** 2
                           - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
            return -jnp.mean(jax.lax.stop_gradient(weights) * logp)

        loss_pi, g = jax.value_and_grad(pi_loss)(p["actor"])
        up, opts["actor"] = self.tx.update(g, st.opts["actor"], p["actor"])
        params["actor"] = optax.apply_updates(p["actor"], up)

        target_params = jax.tree_util.tree_map(
            lambda t, q: (1 - c.tau) * t + c.tau * q, tp, params)
        return st.replace(params=params, target_params=target_params, opts=opts,
                          key=key, step=st.step + 1), dict(q_loss=loss_v)

    # ---------------------------------------------------------------- driving
    def run(self, iterations: int | None = None):
        from massive_marl_tpu.utils.logging import Writer
        c = self.cfg
        n = iterations or c.max_iterations
        if self.state is None:
            self.state = self.init_state()
        writer = Writer(self.log_dir) if self.log_dir else None
        t0 = time.time()
        for it in range(int(self.state.step), n):
            self.state, m = self._train_step(self.state)
            if it % c.log_interval == 0:
                if writer:
                    writer.add_scalar("train/q_loss", float(m["q_loss"]), it)
                if self.print_log:
                    print(f"[{c.algo}] step {it}: q_loss {float(m['q_loss']):.4f} "
                          f"({(time.time() - t0):.1f}s)")
            if self.log_dir and c.save_interval and (it + 1) % c.save_interval == 0:
                self.save(os.path.join(self.log_dir, f"model_{it + 1}.ckpt"))
        if writer:
            writer.flush()
        return self.state

    def eval_online(self, env, num_envs: int = 64, n_steps: int = 1000):
        """Roll the learned policy deterministically in the live env and return
        mean reward/step (the reference never closes this loop; its offline
        trainers only report losses).  Acting rules per algo: td3_bc/iql use
        the tanh actor mean (td3_bc obs-normalized like its training data);
        bcq samples 10 VAE candidates, perturbs, picks the argmax-Q1 action."""
        from massive_marl_tpu.envs.base import batched_step
        if self.state is None:
            self.state = self.init_state()
        c = self.cfg
        p = self.state.params
        normalize = hasattr(self, "obs_mean")
        obs_mean = getattr(self, "obs_mean", None)
        obs_std = getattr(self, "obs_std", None)

        def act(o, key):
            if normalize:
                o = (o - obs_mean) / obs_std
            if c.algo == "td3_bc":
                return jnp.tanh(self.nets["actor"].apply(p["actor"], o))
            if c.algo == "iql":
                stats = self.nets["actor"].apply(p["actor"], o)
                return jnp.tanh(stats[:, : self.act_dim])
            reps = 10
            orep = jnp.repeat(o, reps, axis=0)
            z = jnp.clip(jax.random.normal(key, (orep.shape[0], self.latent_dim)),
                         -0.5, 0.5)
            cand = jnp.tanh(self.nets["vae_dec"].apply(p["vae_dec"], orep, z))
            a = jnp.clip(cand + c.phi * jnp.tanh(
                self.nets["pert"].apply(p["pert"], orep, cand)), -1, 1)
            q = self.nets["q1"].apply(p["q1"], orep, a).squeeze(-1).reshape(-1, reps)
            a = a.reshape(-1, reps, self.act_dim)
            return a[jnp.arange(o.shape[0]), q.argmax(axis=1)]

        env_step = batched_step(env)
        if self.mesh is not None:
            from massive_marl_tpu.parallel.mesh import shard_env_step
            env_step = shard_env_step(env_step, self.mesh)

        def step(carry, _):
            st, key = carry
            key, k = jax.random.split(key)
            obs = jnp.clip(st.obs, -5.0, 5.0)  # VecTask clip_obs, same as collect
            ns = env_step(st, act(obs, k))
            return (ns, key), ns.reward

        key = jax.random.PRNGKey(self.seed + 1)
        es = jax.jit(jax.vmap(env.reset))(jax.random.split(key, num_envs))
        if self.mesh is not None:
            from massive_marl_tpu.parallel import mesh as pm
            es = jax.device_put(es, pm.shard_leading_axis(es, self.mesh))
        (_, _), rews = jax.jit(
            lambda s, k: jax.lax.scan(step, (s, k), None, length=n_steps))(es, key)
        return float(rews.mean())

    def save(self, path):
        from flax import serialization
        from massive_marl_tpu.utils.checkpoint import atomic_write_bytes
        atomic_write_bytes(path, serialization.to_bytes({"params": self.state.params,
                                            "step": self.state.step}))

    def load(self, path):
        from flax import serialization
        if self.state is None:
            self.state = self.init_state()
        tmpl = {"params": self.state.params, "step": self.state.step}
        with open(path, "rb") as f:
            restored = serialization.from_bytes(tmpl, f.read())
        self.state = self.state.replace(**restored)
