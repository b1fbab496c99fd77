"""Bisect the MARL update phase with the trusted timing harness
(utils/profiling.time_scanned: device-side scan + host-fetch barrier).

Pieces, at bench shapes (E=4096 -> per-agent batch B=32768, N=10 agents):
  actor epochs     5x (clipped-surrogate grad + adam), vmapped over N
  critic epochs    5x (huber value-loss grad + adam), share obs closed over
  gae+batch        GAE over [T,E,N] + per-agent flat batch construction
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from massive_marl_tpu.algos.marl import nets
from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
from massive_marl_tpu.envs.ten_ant import TenAntEnv
from massive_marl_tpu.utils.profiling import measure_rtt, time_scanned


def main():
    E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    cfg = MarlConfig()
    env = TenAntEnv({"sim": {"fused_kernel": True}})
    runner = MarlRunner(env, num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts = runner.init_state()
    N, T = runner.N, cfg.episode_length
    B = T * E
    key = jax.random.PRNGKey(0)
    rtt = measure_rtt()
    print(f"E={E} B={B} N={N} rtt={rtt*1e3:.1f}ms", flush=True)

    obs = jax.random.normal(key, (N, B, runner.obs_dim), jnp.float32)
    share = jax.random.normal(key, (B, runner.share_dim), jnp.float32)
    actions = jax.random.normal(key, (N, B, runner.act_dim), jnp.float32)
    logp = jax.random.normal(key, (N, B), jnp.float32) * 0.1
    adv = jax.random.normal(key, (N, B), jnp.float32)
    values = jax.random.normal(key, (N, B), jnp.float32)
    returns = values + 0.1
    actor, critic = runner.actor, runner.critic
    actor_tx, critic_tx = runner.actor_tx, runner.critic_tx

    def one_actor_loss(p, o, a, lp, ad):
        mean, std = actor.apply(p, o)
        nlp = nets.normal_log_prob(mean, std, a)
        ratio = jnp.exp(nlp - lp)
        return -jnp.mean(jnp.minimum(ratio * ad, jnp.clip(ratio, 0.8, 1.2) * ad))

    def actor_epochs(carry):
        ap, ao = carry
        def upd(p, o_, a_, lp_, ad_, opt):
            g = jax.grad(one_actor_loss)(p, o_, a_, lp_, ad_)
            u, opt = actor_tx.update(g, opt, p)
            return optax.apply_updates(p, u), opt
        def epoch(c, _):
            ap, ao = c
            ap, ao = jax.vmap(upd)(ap, obs, actions, logp, adv, ao)
            return (ap, ao), None
        return jax.lax.scan(epoch, (ap, ao), None, length=5)[0]

    dt = time_scanned(actor_epochs, (ts.actor_params, ts.actor_opt), n=5, rtt=rtt)
    print(f"actor 5-epoch scan + adam    {dt*1e3:9.3f} ms", flush=True)

    def one_critic_loss(p, cin, v_old, ret):
        v = critic.apply(p, cin)
        vc = v_old + jnp.clip(v - v_old, -0.2, 0.2)
        return jnp.maximum(nets.huber(ret - v, 10.0), nets.huber(ret - vc, 10.0)).mean()

    def critic_epochs(carry):
        cp, co = carry
        def upd(p, v_, r_, opt):
            g = jax.grad(one_critic_loss)(p, share, v_, r_)
            u, opt = critic_tx.update(g, opt, p)
            return optax.apply_updates(p, u), opt
        def epoch(c, _):
            cp, co = c
            cp, co = jax.vmap(upd)(cp, values, returns, co)
            return (cp, co), None
        return jax.lax.scan(epoch, (cp, co), None, length=5)[0]

    dt = time_scanned(critic_epochs, (ts.critic_params, ts.critic_opt), n=5, rtt=rtt)
    print(f"critic 5-epoch scan + adam   {dt*1e3:9.3f} ms", flush=True)

    # single grad steps (no scan) for per-step cost
    def actor_grad_once(carry):
        ap, ao = carry
        def upd(p, o_, a_, lp_, ad_, opt):
            g = jax.grad(one_actor_loss)(p, o_, a_, lp_, ad_)
            u, opt = actor_tx.update(g, opt, p)
            return optax.apply_updates(p, u), opt
        return jax.vmap(upd)(ap, obs, actions, logp, adv, ao)

    dt = time_scanned(actor_grad_once, (ts.actor_params, ts.actor_opt), n=10, rtt=rtt)
    print(f"actor grad+adam (one step)   {dt*1e3:9.3f} ms", flush=True)

    def critic_grad_once(carry):
        cp, co = carry
        def upd(p, v_, r_, opt):
            g = jax.grad(one_critic_loss)(p, share, v_, r_)
            u, opt = critic_tx.update(g, opt, p)
            return optax.apply_updates(p, u), opt
        return jax.vmap(upd)(cp, values, returns, co)

    dt = time_scanned(critic_grad_once, (ts.critic_params, ts.critic_opt), n=10, rtt=rtt)
    print(f"critic grad+adam (one step)  {dt*1e3:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
