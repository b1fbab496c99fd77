"""Pallas TPU kernel: the whole ant-articulation physics substep fused.

The array engine (phys/engine.py) expresses one substep as ~40 XLA ops over
small minor-dim-3 tensors; XLA fuses them well but still materialises
intermediates between fusions and pads the (.., 3) layouts.  This module
instead runs the *scalar-form* substep (ops/scalar_phys.py - every physical
scalar its own batch vector, every model constant baked in) as ONE
`pallas_call`: HBM traffic is exactly state-in/state-out and every op is a
full (8,128) VPU tile.

Layout: the flat articulation batch B = E * num_ants is laid out as
[field, R, 128] with R = ceil(B/128) padded up to the row-block size, so a
kernel instance sees [RBLK, 128] tiles per scalar field.  The box (one free
body per env, coupled to all of the env's ants through contact wrenches) is
integrated between kernel launches in plain XLA - it is nb=1 and costs
nothing, and this keeps the kernel a pure per-articulation map.

Domain randomization: the per-ant randomized parameters (phys/dr.DrSample:
mass/damping/armature/joint limits) ride as ONE extra batched operand
[n_dr, R, 128] instead of being baked - DR composes with the fused kernel at
full speed (round 1 disabled the kernel under --randomize, a ~20x cliff).

Equivalence with the array engine is tested in tests/test_pallas_substep.py
(interpret mode on CPU) on top of the scalar<->array agreement suite
(tests/test_fused_substep.py).

Reference anchors: the substep semantics mirror IsaacGym's
`gym.simulate(sim)` inner loop as used by the tasks
(/root/reference/agents/tasks/agent_base/base_task.py:129-149); scene wiring
(frictionless box, ant collision filters) follows
/root/reference/agents/tasks/ten_ant.py:498-552.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from massive_marl_tpu.ops import scalar_phys as sp
from massive_marl_tpu.phys import engine

NQ = 15   # 7 base + 8 hinges
NV = 14   # 6 base + 8 hinges
NU = 8    # actuated hinges

_LANES = 128


# ---------------------------------------------------------------------------
# packing: [B, n] <-> [n, R, 128]
# ---------------------------------------------------------------------------

def _rows(B: int, rblk: int) -> int:
    r = (B + _LANES - 1) // _LANES
    return ((r + rblk - 1) // rblk) * rblk


def pack_fields(x: jnp.ndarray, rows: int, pad_value_per_field=None) -> jnp.ndarray:
    """[B, n] -> [n, rows, 128] (zero- or template-padded)."""
    B, n = x.shape
    xt = x.T  # [n, B]
    pad = rows * _LANES - B
    if pad:
        if pad_value_per_field is None:
            fill = jnp.zeros((n, pad), x.dtype)
        else:
            fill = jnp.broadcast_to(jnp.asarray(pad_value_per_field, x.dtype)[:, None],
                                    (n, pad))
        xt = jnp.concatenate([xt, fill], axis=1)
    return xt.reshape(n, rows, _LANES)


def unpack_fields(x3: jnp.ndarray, B: int) -> jnp.ndarray:
    """[n, rows, 128] -> [B, n]."""
    n = x3.shape[0]
    return x3.reshape(n, -1)[:, :B].T


# a parked articulation far above the scene: no contacts, free fall for one
# substep, never read back.  quat w=1 keeps quat math well-defined.
_PAD_QPOS = np.zeros(NQ, np.float32)
_PAD_QPOS[2] = 1000.0
_PAD_QPOS[6] = 1.0


def _dr_field_layout(c: sp.AntConsts):
    """(total, slices) for the packed DrSample operand: mass[nb], damping,
    armature, jnt_lo, jnt_hi [nj each]."""
    nb, nj = c.nb, c.nj
    names = [("mass", nb), ("damping", nj), ("armature", nj),
             ("jnt_lo", nj), ("jnt_hi", nj)]
    slices, off = {}, 0
    for name, n in names:
        slices[name] = (off, off + n)
        off += n
    return off, slices


def _dr_pad_values(c: sp.AntConsts):
    """Nominal parameter values for padded (parked) articulations."""
    vals = list(c.mass) + list(c.damping) + list(c.armature) \
        + list(c.jnt_lo) + list(c.jnt_hi)
    return np.asarray(vals, np.float32)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _substep_kernel(c: sp.AntConsts, box_he, box_inv, gravity, h: float,
                    cp: engine.ContactParams, plane_friction: float,
                    box_friction: float, friction_combine: str,
                    ant_box_mu, limit_k, limit_damp, dr_slices, *refs):
    if dr_slices is not None:
        aq_ref, av_ref, tau_ref, bq_ref, bv_ref, dr_ref, naq_ref, nav_ref, wr_ref, sens_ref = refs
        dr = {name: [dr_ref[i] for i in range(s, e)]
              for name, (s, e) in dr_slices.items()}
    else:
        aq_ref, av_ref, tau_ref, bq_ref, bv_ref, naq_ref, nav_ref, wr_ref, sens_ref = refs
        dr = None
    qpos = [aq_ref[i] for i in range(NQ)]
    qvel = [av_ref[i] for i in range(NV)]
    tau = [tau_ref[i] for i in range(NU)]
    if box_he is not None:
        bq = [bq_ref[i] for i in range(7)]
        bv = [bv_ref[i] for i in range(6)]
    else:
        bq = bv = None
    nqp, nqv, wrench, sens = sp.substep(
        c, qpos, qvel, tau, bq, bv, box_he, gravity, h,
        cp.stiffness, cp.damping, cp.friction_vel,
        plane_friction=plane_friction,
        box_friction=box_friction, friction_combine=friction_combine,
        ant_box_mu=ant_box_mu,
        limit_k=limit_k, limit_damp=limit_damp,
        beta=cp.beta, max_depen_vel=cp.max_depen_vel,
        acc_units=bool(cp.acc_units), hc_vel=float(cp.hc_vel),
        hc_cap=float(getattr(cp, "hc_cap", 0.0)),
        box_inv=box_inv, dr=dr)
    for i in range(NQ):
        naq_ref[i] = nqp[i]
    for i in range(NV):
        nav_ref[i] = nqv[i]
    if box_he is not None:
        for i in range(6):
            wr_ref[i] = wrench[i]
    # foot-sensor local-frame contact wrenches, 6 per sensor (force + torque
    # about the sensor origin - engine.sensor_forces twin)
    for s in range(c.num_sensors):
        for k in range(6):
            sens_ref[6 * s + k] = sens[s][k]


def build_substep(c: sp.AntConsts, box_he: Optional[Tuple[float, float, float]],
                  box_inv, gravity: Tuple[float, float, float], h: float,
                  cp: engine.ContactParams, plane_friction: float,
                  rows: int, rblk: int = 16, interpret: bool = False,
                  with_dr: bool = False,
                  limit_k: Optional[float] = None,
                  limit_damp: Optional[float] = None,
                  box_friction: float = 0.0,
                  friction_combine: str = "multiply",
                  ant_box_mu=None):
    """Returns f(aq3, av3, tau3, bq3, bv3[, dr3]) -> (naq3, nav3, wrench3, sens3).

    All operands are [n_fields, rows, 128] f32; wrench3 is [6, rows, 128]
    (zeros-shaped placeholder when there is no box); sens3 is
    [6*num_sensors, rows, 128] local-frame foot contact wrenches."""
    assert rows % rblk == 0, (rows, rblk)
    grid = (rows // rblk,)
    f32 = jnp.float32
    ns6 = max(6 * c.num_sensors, 1)

    def bs(n):
        return pl.BlockSpec((n, rblk, _LANES), lambda i: (0, i, 0))

    dr_slices = None
    in_specs = [bs(NQ), bs(NV), bs(NU), bs(7), bs(6)]
    if with_dr:
        n_dr, dr_slices = _dr_field_layout(c)
        in_specs.append(bs(n_dr))

    kernel = functools.partial(_substep_kernel, c, box_he, box_inv,
                               gravity, h, cp, plane_friction,
                               box_friction, friction_combine, ant_box_mu,
                               limit_k, limit_damp, dr_slices)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[bs(NQ), bs(NV), bs(6), bs(ns6)],
        out_shape=[jax.ShapeDtypeStruct((NQ, rows, _LANES), f32),
                   jax.ShapeDtypeStruct((NV, rows, _LANES), f32),
                   jax.ShapeDtypeStruct((6, rows, _LANES), f32),
                   jax.ShapeDtypeStruct((ns6, rows, _LANES), f32)],
        interpret=interpret,
    )
    return call


# ---------------------------------------------------------------------------
# batched scene step (fused counterpart of envs/ant_scene.scene_step)
# ---------------------------------------------------------------------------

def fused_scene_step(spec, state, actions: jnp.ndarray, rblk: int = 16,
                     interpret: bool | None = None):
    """Advance one control step for a BATCH of envs.

    spec: AntSceneSpec.  state: AntSceneState with a leading env axis on
    every field (ant_qpos [E,A,nq], box_qpos [E,7], dr leaves [E,A,...]).
    actions: [E, A, nu] in [-1,1].  Semantically identical to
    jax.vmap(scene_step) (tests/test_pallas_substep.py), including
    last-substep foot-sensor wrenches (OneAnt observes them,
    /root/reference/agents/tasks/one_ant.py:610-614).
    """
    from massive_marl_tpu.envs.ant_scene import AntSceneState

    if interpret is None:
        # Mosaic only lowers on TPU; everywhere else (CPU tests, the virtual
        # 8-device mesh) fall back to the pallas interpreter
        interpret = jax.default_backend() not in ("tpu", "axon")

    sys = spec.ant_sys
    use_dr = spec.dr_spec is not None
    E, A = actions.shape[0], spec.num_ants
    B = E * A
    rows = _rows(B, rblk)
    h = spec.dt / spec.substeps
    cp = spec.contact
    gravity = tuple(float(g) for g in spec.gravity)
    has_box = spec.box_sys is not None

    consts = sp.bake_consts(sys)
    if has_box:
        bm = float(np.asarray(spec.box_sys.mass)[0])
        bI = np.asarray(spec.box_sys.inertia, np.float64)[0]
        box_inv = (1.0 / bm, np.linalg.inv(bI).tolist())
        box_inv_static = (1.0 / spec.box_sys.mass[0],
                         engine._inv3x3_sym(spec.box_sys.inertia[0]))
        box_he = tuple(float(x) for x in spec.box_half_extents)
    else:
        box_inv = None
        box_he = None

    box_mu_mat = (float(np.asarray(spec.box_sys.point_friction)[0])
                  if has_box else 0.0)
    step_k = build_substep(consts, box_he, box_inv, gravity, h, cp,
                           float(spec.plane_friction), rows, rblk, interpret,
                           with_dr=use_dr,
                           limit_k=spec.limit_k, limit_damp=spec.limit_damp,
                           box_friction=box_mu_mat,
                           friction_combine=spec.friction_combine,
                           ant_box_mu=spec.ant_box_mu)

    tau_act = (actions * sys.gear * spec.power_scale).astype(jnp.float32)

    aq3 = pack_fields(state.ant_qpos.reshape(B, consts.nj + 7), rows, _PAD_QPOS)
    av3 = pack_fields(state.ant_qvel.reshape(B, consts.nj + 6), rows)
    tau3 = pack_fields(tau_act.reshape(B, consts.nj), rows)
    if use_dr:
        d = state.dr
        dr_flat = jnp.concatenate([
            d.mass.reshape(B, -1), d.damping.reshape(B, -1),
            d.armature.reshape(B, -1), d.jnt_lo.reshape(B, -1),
            d.jnt_hi.reshape(B, -1)], axis=1).astype(jnp.float32)
        dr3 = pack_fields(dr_flat, rows, _dr_pad_values(consts))

    bq = state.box_qpos  # [E,7]
    bv = state.box_qvel  # [E,6]

    def pack_box(x, n):
        rep = jnp.broadcast_to(x[:, None, :], (E, A, n)).reshape(B, n)
        return pack_fields(rep, rows)

    def box_substep(bq1, bv1, wrench_sum):
        """One free-body substep for the push-box (nb=1), with the summed ant
        contact wrench about the box origin folded in - the XLA twin of the
        box branch in envs/ant_scene.scene_step."""
        bsys = spec.box_sys
        fk_b = engine.fwd_kinematics(bsys, bq1, bv1)
        p_b, v_b, _ = engine.points_world(bsys, fk_b)
        pi_b = engine.point_inertia(bsys, fk_b, p_b)
        mu_bg = (spec.box_ground_mu if spec.box_ground_mu is not None
                 else engine.combine_mu(bsys.point_friction,
                                        spec.plane_friction,
                                        spec.friction_combine))
        f_b = engine.contact_plane(p_b, v_b, bsys.point_radius, mu_bg,
                                   cp, pi=pi_b, h=h)
        f_ext_b = engine.accumulate_body_forces(bsys, p_b, f_b, fk_b.base)
        f_ext_b = [f_ext_b[0] + wrench_sum]
        bacc = engine.forward_dynamics(bsys, fk_b, bv1, jnp.zeros(0), f_ext_b,
                                       jnp.asarray(spec.gravity))
        return engine.integrate(bsys, bq1, bv1, bacc, h)

    for _ in range(spec.substeps):
        bq3 = pack_box(bq, 7) if has_box else jnp.zeros((7, rows, _LANES), jnp.float32)
        bv3 = pack_box(bv, 6) if has_box else jnp.zeros((6, rows, _LANES), jnp.float32)
        ops = (aq3, av3, tau3, bq3, bv3) + ((dr3,) if use_dr else ())
        aq3, av3, wr3, sens3 = step_k(*ops)
        if has_box:
            wrench = unpack_fields(wr3, B).reshape(E, A, 6).sum(axis=1)  # [E,6]
            bq, bv = jax.vmap(box_substep)(bq, bv, wrench)

    # sensors from the LAST substep only (scene_step keeps sens_hist[-1])
    ns = consts.num_sensors
    if ns:
        sensors = unpack_fields(sens3, B).reshape(E, A, ns, 6)
    else:
        sensors = jnp.zeros_like(state.sensors)

    nq, nv = consts.nj + 7, consts.nj + 6
    return state.replace(
        ant_qpos=unpack_fields(aq3, B).reshape(E, A, nq),
        ant_qvel=unpack_fields(av3, B).reshape(E, A, nv),
        box_qpos=bq, box_qvel=bv,
        sensors=sensors,
        dr_count=state.dr_count + 1,
        frame=state.frame + 1)
