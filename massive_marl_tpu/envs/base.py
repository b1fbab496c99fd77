"""Pure-function environment API.

The TPU-native replacement for the reference's `BaseTask`/VecTask stack
(agents/tasks/agent_base/base_task.py:22-417): state is an explicit pytree,
`reset`/`step` are pure, auto-reset is a masked select so that the whole
rollout stays shape-static inside jit (SURVEY.md section 7 "Resets inside
jit").

Reference step semantics preserved exactly (base_task.py:129-149,
ten_ant.py:894-926):
  1. physics substeps advance the *old* state with the new actions
  2. envs flagged done on the previous step are then overwritten with a fresh
     reset sample (so their physics step is discarded, progress becomes 0)
  3. obs / reward / done are computed on the resulting state
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    """Single-env state; wrappers vmap over a leading env axis."""
    pipeline: Any          # physics state pytree (task-specific)
    carry: Any             # reward bookkeeping (pos_before etc.)
    progress: jnp.ndarray  # i32, steps since reset (reference progress_buf)
    done: jnp.ndarray      # bool, this step's reset flag (reference reset_buf)
    key: jnp.ndarray       # per-env PRNG key
    obs: jnp.ndarray       # task observation (flat, task-defined layout)
    reward: jnp.ndarray    # f32 (shared scalar for multi-agent tasks)


def batched_step(env):
    """The env's batched step fn: `env.step_batch` when the env provides one
    (e.g. the fused-Pallas TenAnt path), else vmap over the per-env step.
    Envs whose step_batch merely wraps vmap(self.step) trace to the identical
    graph, so this is a no-op for the default path."""
    fn = getattr(env, "step_batch", None)
    return fn if fn is not None else jax.vmap(env.step)


def select_tree(pred, a, b):
    """where(pred, a, b) over a pytree of equal-shaped leaves."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)
