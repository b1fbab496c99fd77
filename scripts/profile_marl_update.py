"""Bisect the MARL update phase: which part of the 10-agent, 5-epoch learner
costs what, at bench shapes (E=4096 -> per-agent batch 32768).

Stages timed standalone (each its own XLA program):
  actor fwd              vmapped apply over N agents
  actor grad             value_and_grad of the clipped surrogate, one step
  actor 5-epoch scan     grads + adam updates, scan over epochs
  critic grad            value_and_grad of the huber value loss
  critic 5-epoch scan
  full vmapped update    the runner's agent_epochs vmapped over agents
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from massive_marl_tpu.algos.marl import nets
from massive_marl_tpu.algos.marl.runner import MarlConfig, MarlRunner
from massive_marl_tpu.envs.ten_ant import TenAntEnv


def timeit(name, fn, *args, n=20, warmup=12):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    for _ in range(warmup - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt * 1e3:9.3f} ms/call   (compile {t_compile:.1f} s)", flush=True)
    return dt


def main():
    E = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    cfg = MarlConfig()
    env = TenAntEnv({"sim": {"fused_kernel": True}})
    runner = MarlRunner(env, num_envs=E, cfg=cfg, seed=0, print_log=False)
    ts = runner.init_state()
    N, T = runner.N, cfg.episode_length
    B = T * E
    key = jax.random.PRNGKey(0)

    # synthetic flat batches, same shapes/dtypes as the real update
    obs = jax.random.normal(key, (N, B, runner.obs_dim), jnp.float32)
    share = jax.random.normal(key, (B, runner.share_dim), jnp.float32)
    actions = jax.random.normal(key, (N, B, runner.act_dim), jnp.float32)
    logp = jax.random.normal(key, (N, B), jnp.float32) * 0.1
    adv = jax.random.normal(key, (N, B), jnp.float32)
    values = jax.random.normal(key, (N, B), jnp.float32)
    returns = values + 0.1
    actor, critic = runner.actor, runner.critic
    actor_tx, critic_tx = runner.actor_tx, runner.critic_tx

    # ---- actor fwd
    @jax.jit
    def actor_fwd(ap, obs):
        m, s = jax.vmap(actor.apply)(ap, obs)
        return m.sum()

    timeit("actor fwd (N agents, B=T*E)", actor_fwd, ts.actor_params, obs)

    # ---- actor grad (one step)
    def one_actor_loss(p, o, a, lp, ad):
        mean, std = actor.apply(p, o)
        nlp = nets.normal_log_prob(mean, std, a)
        ratio = jnp.exp(nlp - lp)
        s1 = ratio * ad
        s2 = jnp.clip(ratio, 0.8, 1.2) * ad
        return -jnp.mean(jnp.minimum(s1, s2))

    @jax.jit
    def actor_grad(ap, obs, actions, logp, adv):
        g = jax.vmap(jax.grad(one_actor_loss))(ap, obs, actions, logp, adv)
        return jax.tree_util.tree_map(lambda x: x.sum(), g)

    timeit("actor grad (one step)", actor_grad, ts.actor_params, obs, actions, logp, adv)

    # ---- actor 5-epoch scan with adam
    @jax.jit
    def actor_epochs(ap, ao, obs, actions, logp, adv):
        def upd(p, o_, a_, lp_, ad_, opt):
            g = jax.grad(one_actor_loss)(p, o_, a_, lp_, ad_)
            u, opt = actor_tx.update(g, opt, p)
            return optax.apply_updates(p, u), opt

        def epoch(carry, _):
            ap, ao = carry
            ap, ao = jax.vmap(upd, in_axes=(0, 0, 0, 0, 0, 0))(ap, obs, actions, logp, adv, ao)
            return (ap, ao), None

        (ap, ao), _ = jax.lax.scan(epoch, (ap, ao), None, length=5)
        return jax.tree_util.tree_map(lambda x: x.sum(), ap)

    timeit("actor 5-epoch scan + adam", actor_epochs,
           ts.actor_params, ts.actor_opt, obs, actions, logp, adv)

    # ---- critic grad (share obs closed over, like the runner)
    def one_critic_loss(p, cin, v_old, ret):
        v = critic.apply(p, cin)
        err = ret - v
        vc = v_old + jnp.clip(v - v_old, -0.2, 0.2)
        errc = ret - vc
        return jnp.maximum(nets.huber(err, 10.0), nets.huber(errc, 10.0)).mean()

    @jax.jit
    def critic_grad(cp, values, returns):
        g = jax.vmap(lambda p, v, r: jax.grad(one_critic_loss)(p, share, v, r))(
            cp, values, returns)
        return jax.tree_util.tree_map(lambda x: x.sum(), g)

    timeit("critic grad (one step)", critic_grad, ts.critic_params, values, returns)

    # ---- critic 5-epoch scan
    @jax.jit
    def critic_epochs(cp, co, values, returns):
        def upd(p, v_, r_, opt):
            g = jax.grad(one_critic_loss)(p, share, v_, r_)
            u, opt = critic_tx.update(g, opt, p)
            return optax.apply_updates(p, u), opt

        def epoch(carry, _):
            cp, co = carry
            cp, co = jax.vmap(upd)(cp, values, returns, co)
            return (cp, co), None

        (cp, co), _ = jax.lax.scan(epoch, (cp, co), None, length=5)
        return jax.tree_util.tree_map(lambda x: x.sum(), cp)

    timeit("critic 5-epoch scan + adam", critic_epochs,
           ts.critic_params, ts.critic_opt, values, returns)


if __name__ == "__main__":
    main()
