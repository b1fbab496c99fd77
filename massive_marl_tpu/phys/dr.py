"""Domain randomization, as pure functions of a PRNG key.

The reference's DR engine (BaseTask.apply_randomizations,
agents/tasks/agent_base/base_task.py:216-410) mutates simulator properties
through IsaacGym setters, gated by `randomize_buf` at a configured frequency
(cfg/TenAnt.yaml:84-121).  The TPU-native formulation: physical parameters
live in the `System` pytree, so a randomized system is just a sampled copy -
envs store it in their per-env state and the engine consumes it like any
other input.  Re-randomization happens at reset (the reference also only
applies DR at reset time, ten_ant.py:811-813).

Supported spec (the subset the ant yamls use): uniform/gaussian, additive/
scaling, for rigid_body mass, dof damping/stiffness(armature)/limits, plus
per-step observation/action additive noise.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .system import System


def _sample(key, dist: str, rng, shape):
    lo, hi = float(rng[0]), float(rng[1])
    if dist == "gaussian":
        return lo + hi * jax.random.normal(key, shape)
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def _apply(op: str, value, factor):
    return value * factor if op == "scaling" else value + factor


def randomize_system(sys: System, key: jnp.ndarray, spec: Dict[str, Any]) -> System:
    """Sample a randomized copy of `sys` (one env; vmap for a batch).

    spec: the `actor_params.ant` subtree of randomization_params
    (TenAnt.yaml:95-121)."""
    out = sys
    rb = spec.get("rigid_body_properties", {})
    if "mass" in rb:
        key, k = jax.random.split(key)
        m = rb["mass"]
        f = _sample(k, m.get("distribution", "uniform"), m["range"], sys.mass.shape)
        out = out.replace(mass=_apply(m.get("operation", "scaling"), sys.mass, f))
    dof = spec.get("dof_properties", {})
    if "damping" in dof and sys.nj > 0:
        key, k = jax.random.split(key)
        d = dof["damping"]
        f = _sample(k, d.get("distribution", "uniform"), d["range"], sys.damping.shape)
        out = out.replace(damping=_apply(d.get("operation", "scaling"), sys.damping, f))
    if "stiffness" in dof and sys.nj > 0:
        key, k = jax.random.split(key)
        s = dof["stiffness"]
        f = _sample(k, s.get("distribution", "uniform"), s["range"], sys.armature.shape)
        out = out.replace(armature=_apply(s.get("operation", "scaling"), sys.armature, f))
    if ("lower" in dof or "upper" in dof) and sys.nj > 0:
        rng_ = out.jnt_range
        if "lower" in dof:
            key, k = jax.random.split(key)
            lo = dof["lower"]
            f = _sample(k, lo.get("distribution", "gaussian"), lo["range"], (sys.nj,))
            rng_ = rng_.at[:, 0].set(_apply(lo.get("operation", "additive"), rng_[:, 0], f))
        if "upper" in dof:
            key, k = jax.random.split(key)
            up = dof["upper"]
            f = _sample(k, up.get("distribution", "gaussian"), up["range"], (sys.nj,))
            rng_ = rng_.at[:, 1].set(_apply(up.get("operation", "additive"), rng_[:, 1], f))
        out = out.replace(jnt_range=rng_)
    return out


def noise_fn(spec: Dict[str, Any] | None):
    """Per-step additive noise lambda for obs/actions (base_task.py:262-300).

    Returns f(key, x) -> x + noise (identity when spec is None)."""
    if not spec:
        return lambda key, x: x
    dist = spec.get("distribution", "gaussian")
    rng = spec["range"]

    def f(key, x):
        return x + _sample(key, dist, rng, x.shape)

    return f
