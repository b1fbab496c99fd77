#!/usr/bin/env python
"""Library-API demo: random actions through `make()` (reference
train_customize.py:1-13)."""
import jax
import jax.numpy as jnp

import massive_marl_tpu

env = massive_marl_tpu.make("TenAnt", algo="mappo", num_envs=16)
obs, share, _ = env.reset()
key = jax.random.PRNGKey(0)
for i in range(20):
    key, k = jax.random.split(key)
    actions = jax.random.uniform(k, (env.num_envs, env.num_agents, env.num_actions),
                                 minval=-1.0, maxval=1.0)
    obs, share, rew, done, infos, _ = env.step(actions)
    print(f"step {i}: mean reward {float(rew.mean()):.3f} done {int(done.sum())}")
