"""TPU-native articulated rigid-body dynamics.

This module is the from-scratch replacement for the reference's native layer
(IsaacGym PhysX GPU sim, used via `gym.simulate` at
/root/reference/agents/tasks/agent_base/base_task.py:129-149).  Instead of a
C++/CUDA engine with host bindings, dynamics are expressed as dense batched
linear algebra so that `vmap` over [env, agent] axes and XLA fusion do the
heavy lifting:

  * forward kinematics over the (static) tree
  * CRBA mass matrix + velocity-product bias via ancestor-mask einsums
  * penalty contacts (point-vs-plane, point-vs-box) with Coulomb friction
  * semi-implicit Euler integration; substeps via `lax.scan` in callers

All spatial vectors ([angular; linear] 6D) are expressed in the world frame
**about the articulation's base position** ("base-origin coordinates").
Using a reference point near the bodies keeps the spatial inertia free of
large m*cx*cx terms, so the math stays well-conditioned even when XLA lowers
f32 matmuls to bf16 passes on the MXU.

State per articulation: qpos [nq] = [pos3, quat4(xyzw), hinges], qvel [nv] =
[v_base_origin(world), omega(world), hinge rates] - matching the IsaacGym
root-state convention the tasks read (ten_ant.py:84-127).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .maths import quat_from_axis_angle, quat_integrate, quat_mul, quat_rotate, quat_to_matrix
from .spatial import force_cross, motion_cross, spatial_inertia
from .system import System

_PREC = jax.lax.Precision.HIGHEST


class FK(NamedTuple):
    base: jnp.ndarray     # [3] reference point (= base body origin, world)
    pos: jnp.ndarray      # [nb,3] body frame origins (world)
    quat: jnp.ndarray     # [nb,4]
    R: jnp.ndarray        # [nb,3,3]
    com_w: jnp.ndarray    # [nb,3] world com
    phi: jnp.ndarray      # [nv,6] dof motion axes (base-origin coords)
    v: jnp.ndarray        # [nb,6] body spatial velocities (base-origin coords)


def ancestor_mask(sys: System) -> np.ndarray:
    """A[j, b] = 1 if dof j moves body b.  Static (numpy) per system."""
    nb = sys.nb
    nv = sys.nv
    A = np.zeros((nv, nb), np.float32)
    A[:6, :] = 1.0  # free base dofs move everything
    for b in range(1, nb):
        chain = b
        while chain != 0:
            A[6 + chain - 1, b] = 1.0
            chain = sys.parent[chain]
    return A


def fwd_kinematics(sys: System, qpos: jnp.ndarray, qvel: jnp.ndarray) -> FK:
    base_pos = qpos[0:3]
    base_quat = qpos[3:7]
    hinge = qpos[7:]
    v_b = qvel[0:3]
    omega = qvel[3:6]
    hinge_rate = qvel[6:]

    pos = [base_pos]
    quat = [base_quat]
    axes_w = []     # per hinge world axis
    anchors_w = []  # per hinge world anchor

    for b in range(1, sys.nb):
        j = b - 1
        p_p = pos[sys.parent[b]]
        q_p = quat[sys.parent[b]]
        p0 = p_p + quat_rotate(q_p, sys.body_pos[b])
        q0 = quat_mul(q_p, sys.body_quat[b])
        # hinge about axis (child frame) through anchor (child frame)
        n_w = quat_rotate(q0, sys.jnt_axis[j])
        q_rot = quat_from_axis_angle(n_w, hinge[j])
        q_c = quat_mul(q_rot, q0)
        anchor0 = p0 + quat_rotate(q0, sys.jnt_pos[j])
        p_c = anchor0 - quat_rotate(q_c, sys.jnt_pos[j])
        pos.append(p_c)
        quat.append(q_c)
        axes_w.append(n_w)
        anchors_w.append(anchor0)

    pos = jnp.stack(pos)
    quat = jnp.stack(quat)
    R = quat_to_matrix(quat)
    com_w = pos + jnp.einsum("bij,bj->bi", R, sys.com)

    # dof motion axes in base-origin coordinates: the base point is the
    # reference, so root translation dofs are pure translation and root
    # rotation dofs are pure rotation.
    eye = jnp.eye(3)
    phi_trans = jnp.concatenate([jnp.zeros((3, 3)), eye], axis=1)  # [3,6]
    phi_rot = jnp.concatenate([eye, jnp.zeros((3, 3))], axis=1)
    phis = [phi_trans, phi_rot]
    if sys.nj > 0:
        n = jnp.stack(axes_w)                       # [nj,3]
        w = jnp.stack(anchors_w) - base_pos         # anchors rel. base
        phis.append(jnp.concatenate([n, jnp.cross(w, n)], axis=1))
    phi = jnp.concatenate(phis, axis=0)             # [nv,6]

    # body spatial velocities: v_b = sum over ancestor dofs phi_j * qd_j
    qd = jnp.concatenate([v_b, omega, hinge_rate])
    A = jnp.asarray(ancestor_mask(sys))
    v = jnp.einsum("jb,jk,j->bk", A, phi, qd, precision=_PREC)
    return FK(base=base_pos, pos=pos, quat=quat, R=R, com_w=com_w, phi=phi, v=v)


def forward_dynamics(sys: System, fk: FK, qvel: jnp.ndarray, tau_hinge: jnp.ndarray,
                     f_ext: jnp.ndarray, gravity: jnp.ndarray,
                     fixed_base: bool = False) -> jnp.ndarray:
    """qacc [nv] given hinge torques and external spatial forces per body.

    f_ext: [nb,6] base-origin spatial forces (e.g. contacts, thrust) - build
    them with `point_force_spatial(point, force, fk.base)`.
    fixed_base: solve only the hinge block (base welded to the world).
    """
    A = jnp.asarray(ancestor_mask(sys))
    qd = qvel

    # spatial inertia per body about the base point
    I_com_w = jnp.einsum("bij,bjk,blk->bil", fk.R, sys.inertia, fk.R, precision=_PREC)
    I_sp = spatial_inertia(sys.mass, fk.com_w - fk.base, I_com_w)  # [nb,6,6]

    # mass matrix: M = sum_b J_b^T I_b J_b with J_b = A[:,b,None]*phi
    JB = A[:, :, None] * fk.phi[:, None, :]                        # [nv,nb,6]
    tmp = jnp.einsum("vbi,bij->vbj", JB, I_sp, precision=_PREC)
    M = jnp.einsum("vbj,wbj->vw", tmp, JB, precision=_PREC)
    armature = jnp.concatenate([jnp.zeros(6), sys.armature])
    M = M + jnp.diag(armature)

    # velocity-product accelerations (zeta recursion)
    v_b_lin = qd[0:3]
    omega = qd[3:6]
    # free joint: base point is a material point -> zeta = [0; v_b x omega]
    zeta_base = jnp.concatenate([jnp.zeros(3), jnp.cross(v_b_lin, omega)])
    avp = [zeta_base]
    for b in range(1, sys.nb):
        j = b - 1
        vJ = fk.phi[6 + j] * qd[6 + j]
        zeta = motion_cross(fk.v[sys.parent[b]], vJ)
        avp.append(avp[sys.parent[b]] + zeta)
    avp = jnp.stack(avp)  # [nb,6]

    # gravity as an external force at each com
    f_grav = point_force_spatial(fk.com_w, sys.mass[:, None] * gravity, fk.base)
    f_body = (
        jnp.einsum("bij,bj->bi", I_sp, avp, precision=_PREC)
        + force_cross(fk.v, jnp.einsum("bij,bj->bi", I_sp, fk.v, precision=_PREC))
        - f_grav
        - f_ext
    )
    C = jnp.einsum("jb,jk,bk->j", A, fk.phi, f_body, precision=_PREC)

    tau = jnp.concatenate([jnp.zeros(6), tau_hinge])
    rhs = tau - C
    if fixed_base:
        L = jax.scipy.linalg.cho_factor(M[6:, 6:], lower=True)
        qacc_h = jax.scipy.linalg.cho_solve(L, rhs[6:])
        return jnp.concatenate([jnp.zeros(6), qacc_h])
    L = jax.scipy.linalg.cho_factor(M, lower=True)
    return jax.scipy.linalg.cho_solve(L, rhs)


def point_force_spatial(point: jnp.ndarray, force: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Linear force at a world point -> spatial force in base-origin coords."""
    return jnp.concatenate([jnp.cross(point - base, force), force], axis=-1)


def joint_limit_torque(sys: System, qpos: jnp.ndarray, qvel: jnp.ndarray,
                       k: float = 80.0, damp: float = 2.0) -> jnp.ndarray:
    """Penalty torque pushing hinge dofs back inside [lower, upper]."""
    if sys.nj == 0:
        return jnp.zeros(0)
    q = qpos[7:]
    qd = qvel[6:]
    lo = sys.jnt_range[:, 0]
    hi = sys.jnt_range[:, 1]
    below = jnp.maximum(lo - q, 0.0)
    above = jnp.maximum(q - hi, 0.0)
    viol = (below > 0) | (above > 0)
    return k * (below - above) - jnp.where(viol, damp * qd, 0.0)


def integrate(sys: System, qpos: jnp.ndarray, qvel: jnp.ndarray, qacc: jnp.ndarray,
              dt, max_ang_vel: float = 64.0):
    """Semi-implicit Euler.  max_ang_vel mirrors the PhysX default clamp."""
    qvel = qvel + dt * qacc
    omega = jnp.clip(qvel[3:6], -max_ang_vel, max_ang_vel)
    qvel = qvel.at[3:6].set(omega)
    pos = qpos[0:3] + dt * qvel[0:3]
    quat = quat_integrate(qpos[3:7], omega, dt)
    hinge = qpos[7:] + dt * qvel[6:]
    return jnp.concatenate([pos, quat, hinge]), qvel


# ---------------------------------------------------------------------------
# contacts
# ---------------------------------------------------------------------------


class ContactParams(NamedTuple):
    """Penalty-contact constants (Brax-spring-style; stand-in for the PhysX TGS
    solver configured at /root/reference/cfg/TenAnt.yaml:67-76).

    Defaults are tuned for ~1-2 ms substeps with the ant's light feet
    (explicit damping needs kd*h/m < 2; see tests/test_phys_core.py)."""
    stiffness: float = 2500.0
    damping: float = 25.0
    friction_vel: float = 0.3    # tangential velocity scale for friction ramp


def points_world(sys: System, fk: FK):
    """World positions and velocities of the system's contact sample points."""
    body = jnp.asarray(np.array(sys.point_body, np.int32))
    p_w = fk.pos[body] + jnp.einsum("pij,pj->pi", fk.R[body], sys.point_local)
    v_sp = fk.v[body]  # [P,6] base-origin coords
    v_w = v_sp[:, 3:6] + jnp.cross(v_sp[:, 0:3], p_w - fk.base)
    return p_w, v_w, body


def _contact_force(depth, normal, v_rel, friction, cp: ContactParams):
    """Force on body A for one contact candidate (zero when not touching)."""
    active = depth > 0.0
    vn = jnp.sum(v_rel * normal, axis=-1)
    vt = v_rel - vn[..., None] * normal
    fn = cp.stiffness * depth - cp.damping * vn
    fn = jnp.clip(fn, 0.0, None) * active
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-12)
    # Coulomb cone with a viscous cap near zero slip velocity
    ft_mag = jnp.minimum(friction * fn, friction * fn * vt_norm / cp.friction_vel)
    ft = -ft_mag[..., None] * vt / vt_norm[..., None]
    return fn[..., None] * normal + ft


def contact_plane(p_w, v_w, radius, friction, cp: ContactParams):
    """Points vs ground plane z=0 (reference `_create_ground_plane`,
    ten_ant.py:233-238).  Returns [P,3] world forces on the points' bodies."""
    depth = radius - p_w[..., 2]
    normal = jnp.zeros_like(p_w).at[..., 2].set(1.0)
    return _contact_force(depth, normal, v_w, friction, cp)


def contact_box(p_w, v_w, radius, friction, box_pos, box_quat, box_vel,
                half_extents, cp: ContactParams):
    """Sphere points vs an oriented box (the push-box actor,
    ten_ant.py:490-496).  Returns (force on point bodies [P,3],
    spatial wrench on the box about the box origin [6]).

    box_vel: [6] = [v_origin(world), omega(world)] of the box body.
    """
    he = jnp.asarray(half_extents)
    R = quat_to_matrix(box_quat)
    local = jnp.einsum("ji,...j->...i", R, p_w - box_pos)  # world->box frame
    clamped = jnp.clip(local, -he, he)
    delta = local - clamped
    dist_out = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
    # outside: depth = r - dist; inside the box: push out along min-penetration face
    inside = jnp.all(jnp.abs(local) < he, axis=-1)
    face_pen = he - jnp.abs(local)                      # [P,3] >=0 inside
    min_ax = jnp.argmin(face_pen, axis=-1)
    face_n_local = jnp.sign(
        jnp.take_along_axis(local, min_ax[..., None], axis=-1)
    ) * jax.nn.one_hot(min_ax, 3)
    n_local = jnp.where(inside[..., None], face_n_local, delta / dist_out[..., None])
    depth_out = radius - dist_out
    depth_in = radius + jnp.take_along_axis(face_pen, min_ax[..., None], axis=-1)[..., 0]
    depth = jnp.where(inside, depth_in, depth_out)
    normal = jnp.einsum("ij,...j->...i", R, n_local)     # box->world

    # contact point on box surface (world)
    surf_local = jnp.where(inside[..., None], local, clamped)
    cpnt = box_pos + jnp.einsum("ij,...j->...i", R, surf_local)
    v_box_pt = box_vel[0:3] + jnp.cross(box_vel[3:6], cpnt - box_pos)
    v_rel = v_w - v_box_pt
    f = _contact_force(depth, normal, v_rel, friction, cp)
    # equal and opposite wrench on the box, spatial about the box origin
    f_box_sp = -point_force_spatial(cpnt, f, box_pos)    # [P,6]
    return f, jnp.sum(f_box_sp, axis=0)


def accumulate_body_forces(nb: int, body_idx: jnp.ndarray, p_w: jnp.ndarray,
                           f_w: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Scatter world point forces into per-body base-origin forces [nb,6]."""
    f_sp = point_force_spatial(p_w, f_w, base)           # [P,6]
    return jnp.zeros((nb, 6)).at[body_idx].add(f_sp)


def sensor_forces(sys: System, f_w: jnp.ndarray, fk: FK) -> jnp.ndarray:
    """Per-foot contact wrench in the foot body frame: [num_sensors, 6]
    (force, torque) - the TPU analogue of IsaacGym force sensors
    (ten_ant.py:414-438, obs slice one_ant.py:610-614).  Torque is reported
    as zero (the reference scales sensors by 0.1 into obs only)."""
    if sys.num_sensors == 0:
        return jnp.zeros((0, 6))
    ns = sys.num_sensors
    sens = jnp.asarray(np.array(sys.point_sensor, np.int32))
    valid = sens >= 0
    sens_c = jnp.where(valid, sens, 0)
    f_world = jnp.zeros((ns, 3)).at[sens_c].add(jnp.where(valid[:, None], f_w, 0.0))
    foot_bodies = np.array(sorted({pb for pb, s in zip(sys.point_body, sys.point_sensor) if s >= 0}), np.int32)
    R_feet = fk.R[jnp.asarray(foot_bodies)]
    f_local = jnp.einsum("sji,sj->si", R_feet, f_world)
    return jnp.concatenate([f_local, jnp.zeros_like(f_local)], axis=-1)
