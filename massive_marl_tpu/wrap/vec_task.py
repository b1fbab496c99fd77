"""Vectorized env facades mirroring the reference VecTask API surface
(agents/tasks/agent_base/vec_task.py:17-64 and multi_vec_task.py:20-175).

These wrappers hold batched `EnvState` internally and expose step/reset with
the reference's clamping semantics (actions +-1, obs +-5 single-agent /
+-7 multi-agent).  Trainers that want maximum throughput bypass them and fold
`env.step` directly into their jitted rollout scan; the wrappers exist for
API parity, interactive use and tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


class VecTaskPython:
    """Single-agent joint-action wrapper (vec_task.py:121-139)."""

    def __init__(self, env, num_envs: int, seed: int = 0,
                 clip_observations: float = 5.0, clip_actions: float = 1.0):
        self.env = env
        self.num_envs = num_envs
        self.clip_obs = clip_observations
        self.clip_actions = clip_actions
        self.num_obs = env.num_obs
        self.num_actions = env.num_actions * env.num_agents
        self._key = jax.random.PRNGKey(seed)

        self._reset_fn = jax.jit(jax.vmap(env.reset))
        self._step_fn = jax.jit(jax.vmap(env.step))
        self._state = None

    def _ensure_state(self):
        """In the reference the sim buffers exist from construction
        (base_task.py:56-68), so step() before reset() is legal - mirror that."""
        if self._state is None:
            keys = jax.random.split(self._key, self.num_envs + 1)
            self._key = keys[0]
            self._state = self._reset_fn(keys[1:])

    def reset(self):
        keys = jax.random.split(self._key, self.num_envs + 1)
        self._key = keys[0]
        self._state = self._reset_fn(keys[1:])
        return jnp.clip(self._state.obs, -self.clip_obs, self.clip_obs)

    def step(self, actions):
        self._ensure_state()
        actions = jnp.clip(jnp.asarray(actions), -self.clip_actions, self.clip_actions)
        self._state = self._step_fn(self._state, actions)
        obs = jnp.clip(self._state.obs, -self.clip_obs, self.clip_obs)
        return obs, self._state.reward, self._state.done, {}

    def get_state(self):
        self._ensure_state()
        return jnp.clip(self._state.obs, -self.clip_obs, self.clip_obs)

    @property
    def state(self):
        return self._state


def split_multi_agent_obs(obs_buf: jnp.ndarray, num_agents: int, num_ant_obs: int):
    """[E, N*num_ant_obs + tail] -> per-agent obs [E, N, num_ant_obs + tail]
    (each agent sees its own block + the shared tail, multi_vec_task.py:104-116)."""
    E = obs_buf.shape[0]
    blocks = obs_buf[:, : num_agents * num_ant_obs].reshape(E, num_agents, num_ant_obs)
    tail = obs_buf[:, num_agents * num_ant_obs:]
    tails = jnp.broadcast_to(tail[:, None, :], (E, num_agents, tail.shape[-1]))
    return jnp.concatenate([blocks, tails], axis=-1)


class MultiVecTaskPython:
    """Multi-agent wrapper (multi_vec_task.py:89-175): splits the global obs
    into per-agent views, broadcasts the shared reward/done to every agent."""

    def __init__(self, env, num_envs: int, seed: int = 0,
                 clip_observations: float = 7.0, clip_actions: float = 1.0):
        self.env = env
        self.num_envs = num_envs
        self.num_agents = env.num_agents
        self.num_ant_obs = env.num_ant_obs
        self.num_obs = env.num_ant_obs + (env.num_obs - env.num_agents * env.num_ant_obs)
        self.num_share_obs = env.num_obs
        self.num_actions = env.num_actions
        self.clip_obs = clip_observations
        self.clip_actions = clip_actions
        self._key = jax.random.PRNGKey(seed)

        self._reset_fn = jax.jit(jax.vmap(env.reset))
        self._step_fn = jax.jit(jax.vmap(env.step))
        self._state = None

    def _outputs(self):
        obs_buf = jnp.clip(self._state.obs, -self.clip_obs, self.clip_obs)
        obs = split_multi_agent_obs(obs_buf, self.num_agents, self.num_ant_obs)
        share = jnp.broadcast_to(obs_buf[:, None, :],
                                 (self.num_envs, self.num_agents, obs_buf.shape[-1]))
        return obs, share

    def reset(self):
        """Reference semantics: reset() steps the sim with zero actions
        (multi_vec_task.py:146-175)."""
        if self._state is None:
            keys = jax.random.split(self._key, self.num_envs + 1)
            self._key = keys[0]
            self._state = self._reset_fn(keys[1:])
        else:
            zeros = jnp.zeros((self.num_envs, self.num_agents * self.num_actions))
            self._state = self._step_fn(self._state, zeros)
        obs, share = self._outputs()
        return obs, share, None

    def step(self, actions):
        """actions: [E, N, act] or list of N [E, act] arrays."""
        if self._state is None:
            keys = jax.random.split(self._key, self.num_envs + 1)
            self._key = keys[0]
            self._state = self._reset_fn(keys[1:])
        if isinstance(actions, (list, tuple)):
            actions = jnp.stack(list(actions), axis=1)
        actions = jnp.clip(jnp.asarray(actions), -self.clip_actions, self.clip_actions)
        flat = actions.reshape(self.num_envs, -1)
        self._state = self._step_fn(self._state, flat)
        obs, share = self._outputs()
        rewards = jnp.broadcast_to(self._state.reward[:, None, None],
                                   (self.num_envs, self.num_agents, 1))
        dones = jnp.broadcast_to(self._state.done[:, None],
                                 (self.num_envs, self.num_agents))
        return obs, share, rewards, dones, [{}] * self.num_agents, None

    @property
    def state(self):
        return self._state
