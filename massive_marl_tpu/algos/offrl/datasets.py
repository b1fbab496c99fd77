"""Offline dataset IO.

Format matches the reference collector (ppo_collect.py:135-165, 225-233):
five .npy files per dataset directory - states, actions, rewards, dones,
next_states - flattened to [N, dim]."""
from __future__ import annotations

import os

import numpy as np

FILES = ("states", "actions", "rewards", "dones", "next_states")


def dataset_dir(root: str, task: str, datatype: str) -> str:
    return os.path.join(root, f"{task}_{datatype}")


def save_dataset(path: str, states, actions, rewards, dones, next_states):
    from massive_marl_tpu import native
    os.makedirs(path, exist_ok=True)
    arrays = dict(states=states, actions=actions, rewards=rewards, dones=dones,
                  next_states=next_states)
    for name in FILES:
        native.write_npy(os.path.join(path, f"{name}.npy"),
                         np.asarray(arrays[name], np.float32))


def load_dataset(path: str):
    """Zero-copy mmap'd load via the native reader (numpy fallback inside)."""
    from massive_marl_tpu import native
    out = {}
    for name in FILES:
        m = native.NpyMmap(os.path.join(path, f"{name}.npy"))
        out[name] = m.as_array().copy()
        m.close()
    n = len(out["states"])
    for name in FILES:
        assert len(out[name]) == n, (name, len(out[name]), n)
    return out


def make_random_dataset(path: str, task: str = "OneAnt", n: int = 20000,
                        num_envs: int = 64, seed: int = 0):
    """Generate a quick random-policy dataset (the reference's `--datatype
    random` flavor) so offline algos are runnable without a trained expert."""
    import jax
    import jax.numpy as jnp
    from massive_marl_tpu.utils.registry import build_env, task_class  # noqa: F401
    import yaml
    from massive_marl_tpu.utils import config as cfg_mod
    with open(os.path.join(cfg_mod.CFG_ROOT, f"{task}.yaml")) as f:
        cfg = yaml.safe_load(f)
    env = build_env(task, cfg, multi_agent=False)
    E = num_envs
    act_dim = env.num_actions * env.num_agents
    key = jax.random.PRNGKey(seed)
    key, ke = jax.random.split(key)
    state = jax.jit(jax.vmap(env.reset))(jax.random.split(ke, E))

    steps = n // E + 1

    def roll(state, key):
        def step(carry, k):
            st = carry
            a = jax.random.uniform(k, (E, act_dim), minval=-1, maxval=1)
            ns = jax.vmap(env.step)(st, a)
            return ns, (st.obs, a, ns.reward, ns.done.astype(jnp.float32), ns.obs)
        keys = jax.random.split(key, steps)
        return jax.lax.scan(step, state, keys)

    key, kr = jax.random.split(key)
    _, (obs, acts, rews, dones, nobs) = jax.jit(roll)(state, kr)
    flat = lambda x: np.asarray(x).reshape(-1, *x.shape[2:])[:n]
    save_dataset(path, flat(obs), flat(acts), flat(rews)[:, None] if rews.ndim == 2 else flat(rews),
                 flat(dones)[:, None] if dones.ndim == 2 else flat(dones), flat(nobs))
    return path
