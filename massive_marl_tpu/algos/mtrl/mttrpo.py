"""MTTRPO: multi-task TRPO (reference agents/algorithms/mtrl/mttrpo).

TRPO natural-gradient update on the concatenation of per-task GAE batches
with add-onehot observations - MTPPO's collection pipeline with the TRPO
policy step from algos/rl/trpo.py.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree

from massive_marl_tpu.algos import nets
from massive_marl_tpu.algos.mtrl.mtppo import MTPPO, MTPPOConfig


@dataclass
class MTTRPOConfig(MTPPOConfig):
    max_kl: float = 0.016
    cg_nsteps: int = 10
    damping: float = 0.1
    max_num_backtrack: int = 10
    backtrack_coeff: float = 0.8
    vf_epochs: int = 5


class MTTRPO(MTPPO):
    """Reuses MTPPO's per-task collection; replaces the update with TRPO."""

    def __init__(self, envs: Dict[str, Any], num_envs: int,
                 cfg: MTTRPOConfig | None = None, **kw):
        super().__init__(envs, num_envs, cfg or MTTRPOConfig(), **kw)
        self._update = jax.jit(self._make_trpo_update())

    def _make_trpo_update(self):
        cfg = self.cfg

        def update(params, opt_state, lr, batch):
            adv = batch["adv"]
            batch = dict(batch, adv=(adv - adv.mean()) / (adv.std() + 1e-8))
            obs, actions = batch["obs"], batch["actions"]
            old_logp = batch["logp"]

            flat, unravel = ravel_pytree(params)

            def heads(p_flat):
                mean, value, log_std = self.model.apply(unravel(p_flat), obs)
                return mean, value, log_std

            mean0, _, log_std0 = heads(flat)

            def surrogate(p_flat):
                mean, _, log_std = heads(p_flat)
                logp = nets.gaussian_log_prob(mean, log_std, actions)
                return jnp.mean(jnp.exp(logp - old_logp) * batch["adv"])

            def mean_kl(p_flat):
                mean, _, log_std = heads(p_flat)
                return nets.gaussian_kl(
                    mean0, jnp.broadcast_to(log_std0, mean.shape), mean,
                    jnp.broadcast_to(log_std, mean.shape)).mean()

            g = jax.grad(surrogate)(flat)

            def fvp(v):
                return jax.jvp(jax.grad(mean_kl), (flat,), (v,))[1] + cfg.damping * v

            def cg(b):
                def body(i, st):
                    x, r, p, rs = st
                    Ap = fvp(p)
                    alpha = rs / (jnp.dot(p, Ap) + 1e-10)
                    x = x + alpha * p
                    r = r - alpha * Ap
                    rs_n = jnp.dot(r, r)
                    p = r + (rs_n / (rs + 1e-10)) * p
                    return (x, r, p, rs_n)
                return jax.lax.fori_loop(0, cfg.cg_nsteps, body,
                                         (jnp.zeros_like(b), b, b, jnp.dot(b, b)))[0]

            step_dir = cg(g)
            sFs = jnp.dot(step_dir, fvp(step_dir))
            full_step = jnp.sqrt(2 * cfg.max_kl / jnp.maximum(sFs, 1e-10)) * step_dir
            old_surr = surrogate(flat)

            def ls(carry, i):
                accepted, best = carry
                cand = flat + (cfg.backtrack_coeff ** i) * full_step
                ok = (surrogate(cand) - old_surr > 0) & (mean_kl(cand) <= cfg.max_kl * 1.5)
                take = (~accepted) & ok
                return (accepted | take, jnp.where(take, cand, best)), None

            (_, new_flat), _ = jax.lax.scan(ls, (jnp.asarray(False), flat),
                                            jnp.arange(cfg.max_num_backtrack))
            params = unravel(new_flat)

            # critic: Adam epochs on the value head only (loss masks actor by
            # taking grads of the full model but the surrogate is fixed-point)
            def vf_loss(p):
                _, value, _ = self.model.apply(p, obs)
                return jnp.mean((value - batch["returns"]) ** 2)

            def vf_epoch(carry, _):
                p, opt = carry
                loss, gr = jax.value_and_grad(vf_loss)(p)
                updates, opt = self.tx.update(gr, opt, p)
                p = jax.tree_util.tree_map(lambda w, u: w - lr * u, p, updates)
                return (p, opt), loss

            (params, opt_state), vlosses = jax.lax.scan(
                vf_epoch, (params, opt_state), None, length=cfg.vf_epochs)
            return params, opt_state, vlosses.mean()

        return update
