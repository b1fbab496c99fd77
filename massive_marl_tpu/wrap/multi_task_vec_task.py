"""Multi-task and meta-RL wrapper facades.

Mirror of agents/tasks/agent_base/multi_task_vec_task.py:33-152 and
meta_vec_task.py:112-152: a list of task envs behind one interface, task
one-hot appended to observations ('add-onehot'), task sampling strategies,
and `set_task` for meta-RL adaptation loops.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from massive_marl_tpu.wrap.vec_task import VecTaskPython


class MultiTaskVecTaskPython:
    """mode='add-onehot' appends the task one-hot to every obs; mode='vanilla'
    returns the (padded) obs unchanged (multi_task_vec_task.py:37-39,
    115-117, 128-130 branch on self.mode)."""

    def __init__(self, envs: Dict[str, object], num_envs: int, seed: int = 0,
                 sample_strategy: str = "round_robin", mode: str = "add-onehot",
                 clip_observations: float = 5.0, clip_actions: float = 1.0):
        if mode not in ("add-onehot", "vanilla"):
            raise ValueError(f"unknown multi-task mode {mode!r}")
        self.task_names = sorted(envs.keys())
        self.K = len(self.task_names)
        self.wrapped = {t: VecTaskPython(envs[t], num_envs, seed + i,
                                         clip_observations, clip_actions)
                        for i, t in enumerate(self.task_names)}
        self.num_envs = num_envs
        self.sample_strategy = sample_strategy
        self.mode = mode
        self.max_obs = max(e.num_obs for e in envs.values())
        # padding to the widest task is kept in both modes (our tasks differ
        # in obs width; the reference's vanilla assumes equal widths)
        self.num_obs = self.max_obs + (self.K if mode == "add-onehot" else 0)
        self.num_actions = max(w.num_actions for w in self.wrapped.values())
        self._cur = 0

    def _aug(self, obs, idx):
        pad = self.max_obs - obs.shape[-1]
        obs = jnp.pad(obs, ((0, 0), (0, pad)))
        if self.mode == "vanilla":
            return obs
        onehot = jnp.zeros((obs.shape[0], self.K)).at[:, idx].set(1.0)
        return jnp.concatenate([obs, onehot], axis=-1)

    def sample_task(self):
        """Task sampling strategies (multi_task_vec_task.py:60-88)."""
        if self.sample_strategy == "round_robin":
            self._cur = (self._cur + 1) % self.K
        elif self.sample_strategy == "uniform":
            self._cur = int(np.random.randint(self.K))
        return self._cur

    @property
    def current_task(self):
        return self.task_names[self._cur]

    def reset(self):
        obs = self.wrapped[self.current_task].reset()
        return self._aug(obs, self._cur)

    def step(self, actions):
        w = self.wrapped[self.current_task]
        obs, rew, done, info = w.step(jnp.asarray(actions)[:, : w.num_actions])
        return self._aug(obs, self._cur), rew, done, info


class MetaVecTaskPython(MultiTaskVecTaskPython):
    """Meta-RL flavor (meta_vec_task.py:112-152): explicit `set_task` +
    task_envs list for support/query adaptation loops."""

    def set_task(self, idx: int):
        self._cur = int(idx)

    @property
    def task_envs(self) -> List[str]:
        return self.task_names
