"""Domain randomization, as pure functions of a PRNG key.

The reference's DR engine (BaseTask.apply_randomizations,
agents/tasks/agent_base/base_task.py:216-410) mutates simulator properties
through IsaacGym setters, gated by `randomize_buf` at a configured frequency
(cfg/TenAnt.yaml:84-121).  The TPU-native formulation: the randomized
physical parameters live in a small `DrSample` pytree stored per-ant in the
scene state - the engines consume it like any other input (the fused Pallas
substep takes it as a batched operand, ops/fused_substep.py), so DR composes
with the fast kernel instead of disabling it.

Reference semantics implemented here:
  * uniform/gaussian distributions, additive/scaling operations
    (base_task.py:262-314)
  * linear/constant schedules: the sampled range ramps in over
    `schedule_steps` frames (additive ranges scale toward full, scaling
    ranges interpolate from the identity, base_task.py:254-277)
  * `setup_only` properties (mass in TenAnt.yaml:101-106) are sampled once
    at the env's first reset and kept across re-randomizations
  * re-randomization happens at reset, gated by `frequency`: an env
    re-samples only when >= frequency steps have passed since its last
    randomization (randomize_buf semantics, base_task.py:228-233); the envs
    hold the previous sample otherwise
  * per-step observation/action white noise (base_task.py:245-300); the
    reference re-bakes the noise lambda every `frequency` steps, which only
    matters when a schedule is set - here the schedule scaling is evaluated
    continuously
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .system import System


@struct.dataclass
class DrSample:
    """One articulation's randomized physical parameters."""
    mass: jnp.ndarray      # [nb]
    damping: jnp.ndarray   # [nj]
    armature: jnp.ndarray  # [nj]  (dof "stiffness" spec entries reach this
    #                        only with the opt-in `maps_to: armature` - see
    #                        sample_dr; the default is the reference-faithful
    #                        no-op of drive stiffness under effort control)
    jnt_lo: jnp.ndarray    # [nj]
    jnt_hi: jnp.ndarray    # [nj]

    @classmethod
    def identity(cls, sys: System) -> "DrSample":
        return cls(mass=sys.mass, damping=sys.damping, armature=sys.armature,
                   jnt_lo=sys.jnt_range[:, 0], jnt_hi=sys.jnt_range[:, 1])

    def apply(self, sys: System) -> System:
        """System with this sample's parameters substituted."""
        return sys.replace(mass=self.mass, damping=self.damping,
                           armature=self.armature,
                           jnt_range=jnp.stack([self.jnt_lo, self.jnt_hi], axis=-1))


def sched_scaling(prop: Dict[str, Any], frame):
    """Schedule ramp in [0, 1] (base_task.py:254-259, 291-296): 'linear'
    ramps over schedule_steps frames, 'constant' switches on at
    schedule_steps, no schedule = 1."""
    sched = prop.get("schedule")
    if not sched:
        return 1.0
    steps = float(prop.get("schedule_steps", 1))
    f = jnp.asarray(frame, jnp.float32)
    if sched == "linear":
        return jnp.minimum(f, steps) / steps
    return (f >= steps).astype(jnp.float32)  # 'constant'


def _sched_range(prop: Dict[str, Any], lo, hi, s):
    """Schedule-scaled (lo, hi) per the reference's dist x op table
    (base_task.py:262-307):
      gaussian: range = (mu, var).  additive -> both * s;
                scaling -> var * s, mu interpolated toward the identity 1.0
                (the round-2 repo scaled BOTH toward 1, injecting sigma=1
                noise at schedule start where the reference injects none).
      uniform:  additive -> both * s; scaling -> both interpolated toward 1.
    """
    op = prop.get("operation", "scaling")
    if prop.get("distribution", "uniform") == "gaussian":
        if op == "scaling":
            return lo * s + 1.0 * (1 - s), hi * s
        return lo * s, hi * s
    if op == "scaling":
        return lo * s + 1.0 * (1 - s), hi * s + 1.0 * (1 - s)
    return lo * s, hi * s


def _sample(key, prop: Dict[str, Any], shape, frame=None):
    """Draw the randomization factor with schedule-scaled ranges
    (base_task.py:262-307)."""
    lo, hi = (float(x) for x in prop["range"])
    s = sched_scaling(prop, frame) if frame is not None else 1.0
    lo, hi = _sched_range(prop, lo, hi, s)
    if prop.get("distribution", "uniform") == "gaussian":
        return lo + hi * jax.random.normal(key, shape)
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def _apply(prop: Dict[str, Any], value, factor):
    return value * factor if prop.get("operation", "scaling") == "scaling" else value + factor


def sample_dr(sys: System, key: jnp.ndarray, spec: Dict[str, Any],
              frame=None, skip_setup_only: bool = False) -> DrSample:
    """Sample a DrSample for ONE articulation (vmap over ants for a scene).

    spec: the `actor_params.ant` subtree of randomization_params
    (TenAnt.yaml:97-121).  skip_setup_only: leave `setup_only` properties at
    their nominal values (callers then keep the previous sample's values for
    those fields, matching base_task's first_randomization-only handling)."""
    out = DrSample.identity(sys)
    rb = spec.get("rigid_body_properties", {})
    if "mass" in rb and not (skip_setup_only and rb["mass"].get("setup_only", False)):
        key, k = jax.random.split(key)
        f = _sample(k, rb["mass"], sys.mass.shape, frame)
        out = out.replace(mass=_apply(rb["mass"], sys.mass, f))
    dof = spec.get("dof_properties", {})
    if sys.nj > 0:
        if "damping" in dof:
            key, k = jax.random.split(key)
            f = _sample(k, dof["damping"], out.damping.shape, frame)
            out = out.replace(damping=_apply(dof["damping"], sys.damping, f))
        if "stiffness" in dof and dof["stiffness"].get("maps_to") == "armature":
            # OPT-IN armature lever.  The reference's `dof_properties.stiffness`
            # is PhysX DRIVE stiffness, which is inert under the tasks' pure
            # effort control (set_dof_actuation_force_tensor, ten_ant.py:891),
            # so randomizing it there is a no-op.  The default here is the
            # reference-faithful no-op; `maps_to: armature` turns the spec
            # entry into a real dynamics lever (armature enters the mass
            # matrix, engine.py forward_dynamics) for users who want it.
            key, k = jax.random.split(key)
            f = _sample(k, dof["stiffness"], out.armature.shape, frame)
            out = out.replace(armature=_apply(dof["stiffness"], sys.armature, f))
        if "lower" in dof:
            key, k = jax.random.split(key)
            f = _sample(k, dof["lower"], (sys.nj,), frame)
            out = out.replace(jnt_lo=_apply(dof["lower"], sys.jnt_range[:, 0], f))
        if "upper" in dof:
            key, k = jax.random.split(key)
            f = _sample(k, dof["upper"], (sys.nj,), frame)
            out = out.replace(jnt_hi=_apply(dof["upper"], sys.jnt_range[:, 1], f))
    return out


def randomize_system(sys: System, key: jnp.ndarray, spec: Dict[str, Any]) -> System:
    """Sampled System copy (kept for tools/tests; the scene steppers carry
    DrSample instead so the fused kernel can take it as an operand)."""
    return sample_dr(sys, key, spec).apply(sys)


def noise_fn(spec: Dict[str, Any] | None):
    """Per-step additive/scaling noise lambda for obs/actions
    (base_task.py:245-318), schedule-aware, with the reference's CORRELATED
    component (`range_correlated`, default [0, 0]).

    The reference draws `corr = randn_like(tensor)` once per re-randomization
    and holds it in the noise closure (base_task.py:281-288 gaussian,
    309-316 uniform - note the uniform branch also uses randn for the
    correlated part); every step applies `op(x, corr_scaled + white)`.  Here
    the persistence is a per-env PRNG key (`corr_key`) carried in the scene
    state and re-sampled on frequency-gated re-randomization - the standard-
    normal draw from a held key is constant across steps by construction.

    Returns f(key, x, frame=None, corr_key=None) -> noised x (identity when
    spec is None).  When corr_key is None only the white part applies."""
    if not spec:
        return lambda key, x, frame=None, corr_key=None: x

    lo_c, hi_c = (float(v) for v in spec.get("range_correlated", [0.0, 0.0]))

    def f(key, x, frame=None, corr_key=None):
        noise = _sample(key, spec, x.shape, frame)
        if corr_key is not None:
            s = sched_scaling(spec, frame) if frame is not None else 1.0
            lo, hi = _sched_range(spec, lo_c, hi_c, s)
            if spec.get("distribution", "uniform") == "gaussian":
                # corr * var_corr + mu_corr (base_task.py:285-288)
                corr = lo + hi * jax.random.normal(corr_key, x.shape)
            else:
                # corr * (hi_corr - lo_corr) + lo_corr (base_task.py:313-316)
                corr = lo + (hi - lo) * jax.random.normal(corr_key, x.shape)
            noise = noise + corr
        return _apply(spec, x, noise)

    return f


def get_actor_params_info(spec: Dict[str, Any], sys: System):
    """(params, names, lows, highs) for every randomizable scalar - the DR
    introspection surface of the reference (base_task.py:178-213: flat
    per-attribute lists with `prop_attr_idx`-style names; non-uniform
    distributions report infinite bounds).  `spec` is the `actor_params.ant`
    subtree; the current (nominal) values come from the System.

    Used by external parameter samplers / debugging, not the hot path."""
    params, names, lows, highs = [], [], [], []

    def emit(prop_name, attr, values, prop_cfg):
        lo_hi = prop_cfg["range"]
        if "uniform" not in prop_cfg.get("distribution", "uniform"):
            lo_hi = (-float("inf"), float("inf"))
        vals = np.asarray(values).reshape(-1)
        for i, v in enumerate(vals):
            params.append(float(v))
            names.append(f"{prop_name}_{i}_{attr}")
            lows.append(float(lo_hi[0]))
            highs.append(float(lo_hi[1]))

    rb = spec.get("rigid_body_properties", {})
    if "mass" in rb:
        emit("rigid_body_properties", "mass", sys.mass, rb["mass"])
    dof = spec.get("dof_properties", {})
    # `stiffness` reports the value it actually randomizes: armature under
    # the opt-in maps_to, else the (inert, zero) PhysX drive stiffness the
    # reference's effort-controlled tasks carry (see sample_dr)
    stiff_src = (sys.armature if dof.get("stiffness", {}).get("maps_to") == "armature"
                 else np.zeros(sys.nj))
    for attr, source in (("damping", sys.damping), ("stiffness", stiff_src),
                         ("lower", sys.jnt_range[:, 0] if sys.nj else []),
                         ("upper", sys.jnt_range[:, 1] if sys.nj else [])):
        if attr in dof:
            emit("dof_properties", attr, source, dof[attr])
    return params, names, lows, highs
