"""Batched ant(+box) scene stepping.

One env = A ant articulations and (optionally) one free push-box.  Matches the
reference scene wiring (ten_ant.py:498-552): ants never collide with each
other (IsaacGym collision filter 1), the box's MATERIAL friction is forced
to 0 (pair frictions then follow AntSceneSpec.friction_combine - PhysX
eAVERAGE by default, see the spec field comment), and actions are hinge
torques `action * gear * power_scale` (pre_physics_step, ten_ant.py:886-891).

The whole control step (substeps x [FK -> contacts -> CRBA solve ->
integrate]) is a `lax.scan` body, vmapped over the env axis by the wrappers.
Joint damping and the joint-limit penalty damping integrate IMPLICITLY
(engine.forward_dynamics imp_damping), which keeps the stiff limit penalty
chatter-free.

Domain randomization: state.dr holds a per-ant DrSample ([A]-stacked leaves)
that overrides mass/damping/armature/joint limits; `dr_count`/`frame`
counters implement the reference's frequency gating and schedules
(phys/dr.py docstring).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from massive_marl_tpu.phys import engine
from massive_marl_tpu.phys.system import System


@struct.dataclass
class AntSceneState:
    ant_qpos: jnp.ndarray   # [A, 15]
    ant_qvel: jnp.ndarray   # [A, 14]
    box_qpos: jnp.ndarray   # [7]  (unused zeros when the scene has no box)
    box_qvel: jnp.ndarray   # [6]
    sensors: jnp.ndarray    # [A, 4, 6] foot contact wrenches (body frame)
    # per-ant randomized parameters (phys/dr.DrSample with [A] leaves); the
    # empty tuple when DR is off so the pytree structure stays uniform
    dr: Any = ()
    # steps since this env's params were last re-randomized (randomize_buf,
    # base_task.py:228-233) and total frames lived (schedule clock)
    dr_count: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
    frame: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
    # PRNG key behind the CORRELATED obs/action noise component - held
    # between re-randomizations like the reference's `params['corr']` tensor
    # (base_task.py:281-288); phys/dr.noise_fn draws from it deterministically
    corr_key: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((2,), jnp.uint32))


class AntSceneSpec(NamedTuple):
    ant_sys: System
    box_sys: Optional[System]
    box_half_extents: Optional[Tuple[float, float, float]]
    num_ants: int
    dt: float = 0.0166          # control dt (cfg/TenAnt.yaml:63)
    substeps: int = 3
    power_scale: float = 1.0
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
    contact: engine.ContactParams = engine.ContactParams()
    # Pairwise friction = combine(material_a, material_b) under
    # `friction_combine`.  DEFAULT 'average': PhysX's default PxCombineMode
    # is eAVERAGE and the reference never overrides it, so the sim its
    # agents actually experienced had box-ground mu~0.5 (the 28-mass box is
    # pinned by ground friction: measured 10-ant-shove displacement
    # -0.014 m vs -0.47 m under 'multiply'), ant-box mu~0.75, ant-ground
    # mu~1.25.  'multiply' was rounds 1-3's rule (box frictionless against
    # everything); 'max' is MuJoCo's rule (the MuJoCo cross-validation
    # suites pin their mode explicitly).  Decision + measured sensitivity
    # (box displacement AND TenAnt+MAPPO learning under each mode):
    # BASELINE.md r4 "Friction-combine study"; scripts/friction_sensitivity.py.
    # Ref: /root/reference/agents/tasks/ten_ant.py:548-550 (box material
    # zeroed), /root/reference/cfg/TenAnt.yaml:55-56 (plane mu=1.0).
    plane_friction: float = 1.0
    friction_combine: str = "average"
    # ant-box PAIR friction override (None = combine(ant material, box
    # material) under friction_combine).  Probe knob for the OneAnt peak
    # attribution study (BASELINE.md r5): average combine everywhere EXCEPT
    # the ant-box pair forced to a given mu isolates that pair's effect.
    ant_box_mu: Optional[float] = None
    # box-ground PAIR friction override (None = combine(box material, plane
    # material)).  Second probe knob from the same study: the r5 ant-box
    # probe REFUTED the ant-box attribution, leaving box-ground (0.5 under
    # average vs 0 under multiply - whether the push-box glides or is
    # pinned) as the remaining candidate pair.
    box_ground_mu: Optional[float] = None
    # domain randomization spec (actor_params.ant subtree) or None
    dr_spec: Any = None
    # joint-limit penalty override (None = engine.LIMIT_K / LIMIT_DAMP)
    limit_k: Optional[float] = None
    limit_damp: Optional[float] = None


def scene_step(spec: AntSceneSpec, state: AntSceneState, actions: jnp.ndarray) -> AntSceneState:
    """Advance one control step.  actions: [A, 8] in [-1, 1]."""
    sys = spec.ant_sys
    use_dr = spec.dr_spec is not None
    h = spec.dt / spec.substeps
    gravity = jnp.asarray(spec.gravity)
    cp = spec.contact
    tau_act = actions * sys.gear * spec.power_scale  # [A, nj]
    has_box = spec.box_sys is not None

    if has_box:
        box_inv_static = (1.0 / spec.box_sys.mass[0],
                          engine._inv3x3_sym(spec.box_sys.inertia[0]))
        # box material friction (0.0 for the TenAnt push-box,
        # ten_ant.py:548-550); the PAIR frictions below come from
        # spec.friction_combine (see AntSceneSpec).  np.asarray BEFORE
        # indexing: a jnp index op would be staged out under jit and the
        # float() would see a tracer
        import numpy as _np
        box_mu_mat = float(_np.asarray(spec.box_sys.point_friction)[0])

    def ant_substep(qpos, qvel, tau_a, dr_row, box_qpos, box_qvel):
        """Full substep for ONE ant: contacts + limits + dynamics + integrate."""
        s = dr_row.apply(sys) if use_dr else sys
        fk = engine.fwd_kinematics(s, qpos, qvel)
        p_w, v_w, body = engine.points_world(s, fk)
        pi = engine.point_inertia(s, fk, p_w)
        mu_plane = engine.combine_mu(s.point_friction, spec.plane_friction,
                                     spec.friction_combine)
        f_pts = engine.contact_plane(p_w, v_w, s.point_radius, mu_plane, cp,
                                     pi=pi, h=h)
        box_wrench = jnp.zeros(6)
        if has_box:
            mu_box = (spec.ant_box_mu if spec.ant_box_mu is not None
                      else engine.combine_mu(s.point_friction, box_mu_mat,
                                             spec.friction_combine))
            f_box, box_wrench = engine.contact_box(
                p_w, v_w, s.point_radius, mu_box,
                box_qpos[0:3], box_qpos[3:7], box_qvel,
                spec.box_half_extents, cp, pi=pi, h=h, box_inv=box_inv_static)
            f_pts = f_pts + f_box
        f_ext = engine.accumulate_body_forces(s, p_w, f_pts, fk.base)
        sens = engine.sensor_forces(s, f_pts, fk, p_w)
        t_lim, d_lim, k_lim = engine.joint_limit_spring(
            s, qpos,
            k=spec.limit_k if spec.limit_k is not None else engine.LIMIT_K,
            damp=spec.limit_damp if spec.limit_damp is not None else engine.LIMIT_DAMP)
        tau = tau_a + t_lim
        qacc = engine.forward_dynamics(s, fk, qvel, tau, f_ext, gravity,
                                       imp_damping=s.damping + d_lim, h=h,
                                       imp_stiffness=k_lim)
        qpos2, qvel2 = engine.integrate(s, qpos, qvel, qacc, h)
        return qpos2, qvel2, sens, box_wrench

    def substep(carry, _):
        aq, av, bq, bv = carry
        dr_ax = 0 if use_dr else None
        aq2, av2, sens, box_wrench = jax.vmap(
            ant_substep, in_axes=(0, 0, 0, dr_ax, None, None))(
            aq, av, tau_act, state.dr if use_dr else None, bq, bv)

        if has_box:
            bsys = spec.box_sys
            fk_b = engine.fwd_kinematics(bsys, bq, bv)
            p_b, v_b, body_b = engine.points_world(bsys, fk_b)
            pi_b = engine.point_inertia(bsys, fk_b, p_b)
            mu_bg = (spec.box_ground_mu if spec.box_ground_mu is not None
                     else engine.combine_mu(bsys.point_friction,
                                            spec.plane_friction,
                                            spec.friction_combine))
            f_b = engine.contact_plane(p_b, v_b, bsys.point_radius, mu_bg,
                                       cp, pi=pi_b, h=h)
            f_ext_b = engine.accumulate_body_forces(bsys, p_b, f_b, fk_b.base)
            # ant contact wrenches were taken about the box origin == fk_b.base
            f_ext_b = [f_ext_b[0] + jnp.sum(box_wrench, axis=0)]
            bacc = engine.forward_dynamics(bsys, fk_b, bv, jnp.zeros(0), f_ext_b, gravity)
            bq2, bv2 = engine.integrate(bsys, bq, bv, bacc, h)
        else:
            bq2, bv2 = bq, bv
        return (aq2, av2, bq2, bv2), sens

    (aq, av, bq, bv), sens_hist = jax.lax.scan(
        substep, (state.ant_qpos, state.ant_qvel, state.box_qpos, state.box_qvel),
        None, length=spec.substeps)
    return state.replace(ant_qpos=aq, ant_qvel=av, box_qpos=bq, box_qvel=bv,
                         sensors=sens_hist[-1],
                         dr_count=state.dr_count + 1, frame=state.frame + 1)


def reset_scene(spec: AntSceneSpec, key: jnp.ndarray, ant_start: jnp.ndarray,
                box_start: Optional[jnp.ndarray], init_hinge: jnp.ndarray,
                pos_noise: float = 0.2, vel_noise: float = 0.1,
                frame=None) -> AntSceneState:
    """Fresh scene state (reference reset_idx, ten_ant.py:810-884): roots at
    their spawn poses with zero velocity, hinge pos/vel perturbed uniformly.
    The same noise vector is shared by all ants in an env - exactly like the
    reference, which draws one `positions` tensor and applies it to every ant
    (ten_ant.py:822-854).

    With DR on, every ant gets an independently sampled DrSample (the
    reference's per-actor randomization loop, base_task.py:344+); `frame`
    feeds the schedule ramp."""
    sys = spec.ant_sys
    A = spec.num_ants
    key, kp, kv, kc = jax.random.split(key, 4)
    if spec.dr_spec is not None:
        from massive_marl_tpu.phys import dr
        key, kd = jax.random.split(key)
        dr_sample = jax.vmap(
            lambda k: dr.sample_dr(sys, k, spec.dr_spec, frame)
        )(jax.random.split(kd, A))
    else:
        dr_sample = ()
    dpos = jax.random.uniform(kp, (sys.nj,), minval=-pos_noise, maxval=pos_noise)
    dvel = jax.random.uniform(kv, (sys.nj,), minval=-vel_noise, maxval=vel_noise)
    hinge = jnp.clip(init_hinge + dpos, sys.jnt_range[:, 0], sys.jnt_range[:, 1])
    base_quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    qpos = jnp.concatenate([ant_start, jnp.broadcast_to(base_quat, (A, 4)),
                            jnp.broadcast_to(hinge, (A, sys.nj))], axis=1)
    qvel = jnp.zeros((A, sys.nv)).at[:, 6:].set(dvel)
    if box_start is not None:
        box_qpos = jnp.concatenate([box_start, base_quat])
    else:
        box_qpos = jnp.zeros(7).at[6].set(1.0)
    return AntSceneState(ant_qpos=qpos, ant_qvel=qvel, box_qpos=box_qpos,
                         box_qvel=jnp.zeros(6),
                         sensors=jnp.zeros((A, max(sys.num_sensors, 1), 6)),
                         dr=dr_sample,
                         dr_count=jnp.zeros((), jnp.int32),
                         frame=jnp.asarray(frame, jnp.int32) if frame is not None
                         else jnp.zeros((), jnp.int32),
                         corr_key=kc)
