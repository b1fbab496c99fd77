"""Library-style entry point: `massive_marl_tpu.make(task, algo)`.

Mirrors the reference's `agents.make` (agents/utils/package_utils.py:20-56),
returning a ready vectorized env.  Filled in as envs land.
"""
from __future__ import annotations


def make(task: str, algo: str = "ppo", num_envs: int | None = None, seed: int = 0, **overrides):
    from massive_marl_tpu.utils.registry import make_env
    return make_env(task, algo=algo, num_envs=num_envs, seed=seed, **overrides)
