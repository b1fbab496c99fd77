"""TPU-native articulated rigid-body dynamics.

This module is the from-scratch replacement for the reference's native layer
(IsaacGym PhysX GPU sim, used via `gym.simulate` at
/root/reference/agents/tasks/agent_base/base_task.py:129-149).  Instead of a
C++/CUDA engine with host bindings, dynamics are expressed as dense batched
linear algebra so that `vmap` over [env, agent] axes and XLA fusion do the
heavy lifting:

  * forward kinematics over the (static) tree
  * unrolled CRBA mass matrix + velocity-product bias over the static tree
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

from .maths import (
    mm,
    mv,
    quat_from_axis_angle,
    quat_integrate,
    quat_mul,
    quat_rotate,
    quat_to_matrix,
)
from .spatial import force_cross, motion_cross, spatial_inertia
from .system import System


def dof_chains(sys: System):
    """Static: for each dof, the list of ancestor dofs (self included) and the
    body each dof belongs to.  Root free-joint dofs 0..5 live on body 0."""
    body_of_dof = [0] * 6 + [b for b in range(1, sys.nb)]
    chains = []
    for j in range(sys.nv):
        if j < 6:
            chains.append(list(range(j + 1)))  # lower-triangular root block
            continue
        chain = list(range(6))
        b = body_of_dof[j]
        path = []
        while b != 0:
            path.append(6 + b - 1)
            b = sys.parent[b]
        chains.append(chain + list(reversed(path)))
    return body_of_dof, chains

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
    com_w = pos + mv(R, sys.com)

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

    # body spatial velocities down the (static) tree: v_b = v_parent + phi_j qd_j
    qd = jnp.concatenate([v_b, omega, hinge_rate])
    v_base = jnp.concatenate([omega, v_b])          # [w; v at base point]
    vlist = [v_base]
    for b in range(1, sys.nb):
        j = 6 + b - 1
        vlist.append(vlist[sys.parent[b]] + phi[j] * qd[j])
    v = jnp.stack(vlist)
    return FK(base=base_pos, pos=pos, quat=quat, R=R, com_w=com_w, phi=phi, v=v)


def forward_dynamics(sys: System, fk: FK, qvel: jnp.ndarray, tau_hinge: jnp.ndarray,
                     f_ext: jnp.ndarray, gravity: jnp.ndarray,
                     fixed_base: bool = False) -> jnp.ndarray:
    """qacc [nv] given hinge torques and external spatial forces per body.

    f_ext: [nb,6] base-origin spatial forces (e.g. contacts, thrust) - build
    them with `point_force_spatial(point, force, fk.base)`.
    fixed_base: solve only the hinge block (base welded to the world).
    """
    qd = qvel
    body_of_dof, chains = dof_chains(sys)

    # spatial inertia per body about the base point (R I R^T via VPU mat-ops)
    I_com_w = mm(mm(fk.R, sys.inertia), jnp.swapaxes(fk.R, -1, -2))
    I_sp = spatial_inertia(sys.mass, fk.com_w - fk.base, I_com_w)  # [nb,6,6]

    # ---- CRBA over the static tree (unrolled composite inertias) ----
    Ic = [I_sp[b] for b in range(sys.nb)]
    for b in range(sys.nb - 1, 0, -1):
        Ic[sys.parent[b]] = Ic[sys.parent[b]] + Ic[b]
    # M[i, j] = phi_i . (Ic[body(j)] @ phi_j) for i on j's ancestor chain
    armature = jnp.concatenate([jnp.zeros(6), sys.armature])
    Mrows = [[None] * sys.nv for _ in range(sys.nv)]
    for j in range(sys.nv):
        fI = mv(Ic[body_of_dof[j]], fk.phi[j])          # [...,6]
        for i in chains[j]:
            mij = jnp.sum(fk.phi[i] * fI, axis=-1)
            Mrows[i][j] = mij
            Mrows[j][i] = mij
    zero = jnp.zeros_like(Mrows[0][0])
    M = jnp.stack([
        jnp.stack([Mrows[i][j] if Mrows[i][j] is not None else zero for j in range(sys.nv)],
                  axis=-1) for i in range(sys.nv)], axis=-2)
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
        mv(I_sp, avp)
        + force_cross(fk.v, mv(I_sp, fk.v))
        - f_grav
        - f_ext
    )
    # C[j] = phi_j . (subtree force sum below dof j)
    fs = [f_body[b] for b in range(sys.nb)]
    for b in range(sys.nb - 1, 0, -1):
        fs[sys.parent[b]] = fs[sys.parent[b]] + fs[b]
    C = jnp.stack([jnp.sum(fk.phi[j] * fs[body_of_dof[j]], axis=-1)
                   for j in range(sys.nv)], axis=-1)

    tau = jnp.concatenate([jnp.zeros(6), tau_hinge])
    rhs = tau - C
    if fixed_base:
        qacc_h = cholesky_solve_small(M[6:, 6:], rhs[6:])
        return jnp.concatenate([jnp.zeros(6), qacc_h])
    return cholesky_solve_small(M, rhs)


def cholesky_solve_small(M: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = rhs for small SPD M ([..., n, n] with static n).

    Fully unrolled Cholesky + triangular solves: every intermediate is a
    batched scalar ([...]-shaped array), so under vmap the whole solve
    compiles to wide VPU element-wise code.  XLA's batched Cholesky custom
    call is catastrophically slow for tiny matrices on TPU - this unrolled
    form is the TPU-native way to invert a 14x14 mass matrix per ant.
    """
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for i in range(n):
        for j in range(i + 1):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
                inv_diag[i] = 1.0 / L[i][j]
            else:
                L[i][j] = s * inv_diag[j]
    y = [None] * n
    for i in range(n):
        s = rhs[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_diag[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_diag[i]
    return jnp.stack(x, axis=-1)


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


def _point_ranges(sys: System):
    """Static contiguous (body, start, stop) runs of sys.point_body."""
    runs = []
    pb = sys.point_body
    i = 0
    while i < len(pb):
        j = i
        while j < len(pb) and pb[j] == pb[i]:
            j += 1
        runs.append((pb[i], i, j))
        i = j
    return tuple(runs)


def points_world(sys: System, fk: FK):
    """World positions and velocities of the system's contact sample points.

    point_body is static and contiguous, so per-body transforms are static
    slices + broadcasts - no gather ops reach the TPU."""
    ps, vs = [], []
    for b, s, e in _point_ranges(sys):
        pl = sys.point_local[s:e]                       # [k,3]
        # R[b] @ pl_i without a matmul: broadcasted mul + reduce
        p_rel = jnp.sum(fk.R[b][None, :, :] * pl[:, None, :], axis=-1)
        p_w = fk.pos[b] + p_rel                         # [k,3]
        v_sp = fk.v[b]
        v_w = v_sp[3:6] + jnp.cross(v_sp[0:3], p_w - fk.base)
        ps.append(p_w)
        vs.append(v_w)
    body = jnp.asarray(np.array(sys.point_body, np.int32))
    return jnp.concatenate(ps), jnp.concatenate(vs), body


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
    local = jnp.sum(R * (p_w - box_pos)[..., :, None], axis=-2)  # R^T x, world->box
    clamped = jnp.clip(local, -he, he)
    delta = local - clamped
    dist_out = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
    # outside: depth = r - dist; inside the box: push out along min-penetration
    # face.  All branchless/elementwise - no argmin/gather on the TPU hot path.
    inside = jnp.all(jnp.abs(local) < he, axis=-1)
    face_pen = he - jnp.abs(local)                      # [P,3] >=0 inside
    min_pen = jnp.min(face_pen, axis=-1)
    # one-hot of the min axis with a fixed x>y>z tie-break priority
    is_min = face_pen <= min_pen[..., None] + 1e-12
    m0 = is_min[..., 0]
    m1 = is_min[..., 1] & ~m0
    m2 = is_min[..., 2] & ~m0 & ~m1
    onehot = jnp.stack([m0, m1, m2], axis=-1).astype(local.dtype)
    face_n_local = jnp.sign(local) * onehot
    n_local = jnp.where(inside[..., None], face_n_local, delta / dist_out[..., None])
    depth = jnp.where(inside, radius + min_pen, radius - dist_out)
    normal = jnp.sum(R * n_local[..., None, :], axis=-1)  # R x, box->world

    # contact point on box surface (world)
    surf_local = jnp.where(inside[..., None], local, clamped)
    cpnt = box_pos + jnp.sum(R * surf_local[..., None, :], axis=-1)
    v_box_pt = box_vel[0:3] + jnp.cross(box_vel[3:6], cpnt - box_pos)
    v_rel = v_w - v_box_pt
    f = _contact_force(depth, normal, v_rel, friction, cp)
    # equal and opposite wrench on the box, spatial about the box origin
    f_box_sp = -point_force_spatial(cpnt, f, box_pos)    # [P,6]
    return f, jnp.sum(f_box_sp, axis=0)


def accumulate_body_forces(sys: System, p_w: jnp.ndarray,
                           f_w: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Sum world point forces into per-body base-origin forces [nb,6].

    Static segment-sum over contiguous point runs (no scatter ops)."""
    f_sp = point_force_spatial(p_w, f_w, base)           # [P,6]
    per_body = [jnp.zeros(6)] * sys.nb
    for b, s, e in _point_ranges(sys):
        per_body[b] = per_body[b] + jnp.sum(f_sp[s:e], axis=0)
    return jnp.stack(per_body)


def sensor_forces(sys: System, f_w: jnp.ndarray, fk: FK) -> jnp.ndarray:
    """Per-foot contact wrench in the foot body frame: [num_sensors, 6]
    (force, torque) - the TPU analogue of IsaacGym force sensors
    (ten_ant.py:414-438, obs slice one_ant.py:610-614).  Torque is reported
    as zero (the reference scales sensors by 0.1 into obs only)."""
    if sys.num_sensors == 0:
        return jnp.zeros((0, 6))
    ns = sys.num_sensors
    # static point->sensor segments
    f_world = [jnp.zeros(3)] * ns
    foot_body = [0] * ns
    for p, (pb, s) in enumerate(zip(sys.point_body, sys.point_sensor)):
        if s >= 0:
            f_world[s] = f_world[s] + f_w[p]
            foot_body[s] = pb
    out = []
    for s in range(ns):
        # world -> body frame: R^T f
        f_local = jnp.sum(fk.R[foot_body[s]] * f_world[s][:, None], axis=0)
        out.append(jnp.concatenate([f_local, jnp.zeros(3)]))
    return jnp.stack(out)
