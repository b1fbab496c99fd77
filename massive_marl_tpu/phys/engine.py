"""TPU-native articulated rigid-body dynamics.

This module is the from-scratch replacement for the reference's native layer
(IsaacGym PhysX GPU sim, used via `gym.simulate` at
/root/reference/agents/tasks/agent_base/base_task.py:129-149).  Instead of a
C++/CUDA engine with host bindings, dynamics are expressed as dense batched
linear algebra so that `vmap` over [env, agent] axes and XLA fusion do the
heavy lifting:

  * forward kinematics over the (static) tree
  * unrolled CRBA mass matrix + velocity-product bias over the static tree
  * unrolled small-matrix Cholesky solve (XLA's batched Cholesky custom call
    is pathological for 14x14 systems on TPU)
  * penalty contacts (point-vs-plane, point-vs-box) with Coulomb friction
  * semi-implicit Euler integration; substeps via `lax.scan` in callers

TPU-shape decisions (responsible for a ~400x speedup over the naive port):
  - per-body/per-dof quantities are **python lists of small arrays**, not
    stacked [nb, ...] tensors.  stack->index round trips fragment XLA's
    fusions and materialize intermediates to HBM; list-form keeps the whole
    substep one elementwise dataflow.
  - no gathers/scatters/argmin on the hot path: static topology drives
    static slices and branchless selects.
  - small contractions are broadcast-multiply-reduce on the VPU, never
    dot_general (tiny contraction dims pad onto the MXU).

All spatial vectors ([angular; linear] 6D) are expressed in the world frame
**about the articulation's base position** ("base-origin coordinates"), which
keeps the spatial inertia free of large m*cx*cx terms and the math well-
conditioned even when f32 matmuls lower to bf16 passes.

State per articulation: qpos [nq] = [pos3, quat4(xyzw), hinges], qvel [nv] =
[v_base_origin(world), omega(world), hinge rates] - matching the IsaacGym
root-state convention the tasks read (ten_ant.py:84-127).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

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


class FK(NamedTuple):
    base: jnp.ndarray          # [3] reference point (= base body origin, world)
    pos: Sequence[jnp.ndarray]    # per body [3] world origin
    quat: Sequence[jnp.ndarray]   # per body [4]
    R: Sequence[jnp.ndarray]      # per body [3,3]
    com_w: Sequence[jnp.ndarray]  # per body [3]
    phi: Sequence[jnp.ndarray]    # per dof [6] motion axis (base-origin coords)
    v: Sequence[jnp.ndarray]      # per body [6] spatial velocity


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


def ancestor_mask(sys: System) -> np.ndarray:
    """A[j, b] = 1 if dof j moves body b (kept for tests/tools)."""
    A = np.zeros((sys.nv, sys.nb), np.float32)
    A[:6, :] = 1.0
    for b in range(1, sys.nb):
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

    pos = [base_pos]
    quat = [base_quat]
    axes_w = []
    anchors_w = []
    for b in range(1, sys.nb):
        j = b - 1
        p_p = pos[sys.parent[b]]
        q_p = quat[sys.parent[b]]
        p0 = p_p + quat_rotate(q_p, sys.body_pos[b])
        q0 = quat_mul(q_p, sys.body_quat[b])
        n_w = quat_rotate(q0, sys.jnt_axis[j])
        q_rot = quat_from_axis_angle(n_w, hinge[j])
        q_c = quat_mul(q_rot, q0)
        anchor0 = p0 + quat_rotate(q0, sys.jnt_pos[j])
        p_c = anchor0 - quat_rotate(q_c, sys.jnt_pos[j])
        pos.append(p_c)
        quat.append(q_c)
        axes_w.append(n_w)
        anchors_w.append(anchor0)

    R = [quat_to_matrix(q) for q in quat]
    com_w = [pos[b] + mv(R[b], sys.com[b]) for b in range(sys.nb)]

    # dof motion axes in base-origin coordinates
    e = [jnp.zeros(3).at[k].set(1.0) for k in range(3)]
    zero3 = jnp.zeros(3)
    phi = [jnp.concatenate([zero3, e[k]]) for k in range(3)]       # translation
    phi += [jnp.concatenate([e[k], zero3]) for k in range(3)]      # rotation
    for j in range(sys.nj):
        n = axes_w[j]
        w = anchors_w[j] - base_pos
        phi.append(jnp.concatenate([n, jnp.cross(w, n)]))

    # body spatial velocities down the tree
    v = [jnp.concatenate([omega, v_b])]
    for b in range(1, sys.nb):
        j = 6 + b - 1
        v.append(v[sys.parent[b]] + phi[j] * qvel[j])
    return FK(base=base_pos, pos=pos, quat=quat, R=R, com_w=com_w, phi=phi, v=v)


def forward_dynamics(sys: System, fk: FK, qvel: jnp.ndarray, tau_hinge: jnp.ndarray,
                     f_ext: Sequence[jnp.ndarray], gravity: jnp.ndarray,
                     fixed_base: bool = False,
                     imp_damping: jnp.ndarray | None = None,
                     h: float | None = None,
                     imp_stiffness: jnp.ndarray | None = None) -> jnp.ndarray:
    """qacc [nv] given hinge torques and per-body external spatial forces.

    f_ext: sequence of nb base-origin spatial forces [6] (contacts, thrust) -
    build them with `point_force_spatial(point, force, fk.base)`.
    fixed_base: solve only the hinge block (base welded to the world).
    imp_damping: optional [nj] viscous coefficients integrated IMPLICITLY
    (MuJoCo-Euler style): solves (M + h*D) qacc = tau - D qd - C, which is
    unconditionally stable for any damping magnitude - the explicit penalty
    damping bound h < 2*I/d is what made stiff joint-limit damping blow up.
    Callers must NOT also subtract D*qd from tau_hinge.
    imp_stiffness: optional [nj] spring coefficients whose POSITION term the
    caller already placed in tau_hinge (e.g. the joint-limit spring k*viol);
    the spring is then evaluated implicitly at the end-of-step position:
    tau(t+h) ~= -k viol(q) - k h qd(t+h), i.e. (M + h D + h^2 K) qacc =
    tau - (D + h K) qd - C.  This removes the explicit stability bound
    sqrt(k/I) h < ~1 that capped the round-2 limit spring at k~200 and let
    landing impacts flex the ankles past their stops (the 4.5% torso-dip
    error vs MuJoCo, VERDICT r3 contact item)."""
    qd = qvel
    body_of_dof, chains = dof_chains(sys)

    # spatial inertia per body about the base point
    I_sp = []
    for b in range(sys.nb):
        I_w = mm(mm(fk.R[b], sys.inertia[b]), jnp.swapaxes(fk.R[b], -1, -2))
        I_sp.append(spatial_inertia(sys.mass[b], fk.com_w[b] - fk.base, I_w))

    # ---- CRBA: composite inertias up the static tree ----
    Ic = list(I_sp)
    for b in range(sys.nb - 1, 0, -1):
        Ic[sys.parent[b]] = Ic[sys.parent[b]] + Ic[b]
    Mrows = [[None] * sys.nv for _ in range(sys.nv)]
    for j in range(sys.nv):
        fI = mv(Ic[body_of_dof[j]], fk.phi[j])          # [6]
        for i in chains[j]:
            mij = jnp.sum(fk.phi[i] * fI, axis=-1)
            Mrows[i][j] = mij
            Mrows[j][i] = mij
    armature = [None] * 6 + [sys.armature[j] for j in range(sys.nj)]
    for j in range(6, sys.nv):
        Mrows[j][j] = Mrows[j][j] + armature[j]
    if imp_damping is not None:
        for j in range(sys.nj):
            Mrows[6 + j][6 + j] = Mrows[6 + j][6 + j] + h * imp_damping[j]
    if imp_stiffness is not None:
        for j in range(sys.nj):
            Mrows[6 + j][6 + j] = Mrows[6 + j][6 + j] + h * h * imp_stiffness[j]

    # ---- velocity-product accelerations (zeta recursion) ----
    v_b_lin = qd[0:3]
    omega = qd[3:6]
    zeta_base = jnp.concatenate([jnp.zeros(3), jnp.cross(v_b_lin, omega)])
    avp = [zeta_base]
    for b in range(1, sys.nb):
        j = b - 1
        vJ = fk.phi[6 + j] * qd[6 + j]
        avp.append(avp[sys.parent[b]] + motion_cross(fk.v[sys.parent[b]], vJ))

    # ---- bias forces per body ----
    f_body = []
    for b in range(sys.nb):
        f_grav = point_force_spatial(fk.com_w[b], sys.mass[b] * gravity, fk.base)
        f_body.append(mv(I_sp[b], avp[b])
                      + force_cross(fk.v[b], mv(I_sp[b], fk.v[b]))
                      - f_grav - f_ext[b])
    fs = list(f_body)
    for b in range(sys.nb - 1, 0, -1):
        fs[sys.parent[b]] = fs[sys.parent[b]] + fs[b]
    C = [jnp.sum(fk.phi[j] * fs[body_of_dof[j]], axis=-1) for j in range(sys.nv)]

    rhs = [(-C[j] if j < 6 else tau_hinge[j - 6] - C[j]) for j in range(sys.nv)]
    if imp_damping is not None:
        for j in range(sys.nj):
            rhs[6 + j] = rhs[6 + j] - imp_damping[j] * qd[6 + j]
    if imp_stiffness is not None:
        for j in range(sys.nj):
            rhs[6 + j] = rhs[6 + j] - h * imp_stiffness[j] * qd[6 + j]
    lo = 6 if fixed_base else 0
    x = cholesky_solve_rows(Mrows, rhs, lo, sys.nv)
    if fixed_base:
        return jnp.stack([jnp.zeros_like(rhs[0])] * 6 + x, axis=-1)
    return jnp.stack(x, axis=-1)


def cholesky_solve_rows(Mrows, rhs, lo: int, hi: int):
    """Solve M[lo:hi, lo:hi] x = rhs[lo:hi] for an SPD matrix given as a 2D
    list of batched scalars.  Fully unrolled Cholesky + triangular solves so
    every intermediate is a batched scalar -> wide VPU code under vmap.
    Absent entries (None) are structural zeros (disjoint subtrees)."""
    idx = list(range(lo, hi))
    n = len(idx)
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for a in range(n):
        for bq in range(a + 1):
            s = Mrows[idx[a]][idx[bq]]
            for k in range(bq):
                if L[a][k] is None or L[bq][k] is None:
                    continue
                t = L[a][k] * L[bq][k]
                s = -t if s is None else s - t
            if a == bq:
                s = s if s is not None else jnp.zeros_like(rhs[lo])
                L[a][a] = jnp.sqrt(jnp.maximum(s, 1e-12))
                inv_diag[a] = 1.0 / L[a][a]
            else:
                L[a][bq] = None if s is None else s * inv_diag[bq]
    y = [None] * n
    for a in range(n):
        s = rhs[idx[a]]
        for k in range(a):
            if L[a][k] is not None:
                s = s - L[a][k] * y[k]
        y[a] = s * inv_diag[a]
    x = [None] * n
    for a in reversed(range(n)):
        s = y[a]
        for k in range(a + 1, n):
            if L[k][a] is not None:
                s = s - L[k][a] * x[k]
        x[a] = s * inv_diag[a]
    return x


def point_force_spatial(point: jnp.ndarray, force: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Linear force at a world point -> spatial force in base-origin coords."""
    return jnp.concatenate([jnp.cross(point - base, force), force], axis=-1)


def joint_limit_torque(sys: System, qpos: jnp.ndarray, qvel: jnp.ndarray,
                       k: float = 80.0, damp: float = 2.0) -> jnp.ndarray:
    """Penalty torque pushing hinge dofs back inside [lower, upper].
    Legacy fully-explicit form (kept for tests/tools); the scene steppers use
    `joint_limit_spring` + implicit damping via forward_dynamics."""
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


# joint-limit penalty constants.  Both the spring and its damping integrate
# IMPLICITLY (forward_dynamics imp_stiffness/imp_damping), so the stiffness
# is no longer capped by the explicit bound sqrt(k/I_min)*h < ~1 that forced
# the round-2 k=200 (which let landing impacts flex the ankles ~2 deg past
# their stops and sank the torso 4.5% deeper than MuJoCo).  k=16000 holds the
# gravity-loaded ankle within ~5e-5 rad of its stop, matching MuJoCo's
# near-rigid limit constraints (solref 0.02) at our production substep.
LIMIT_K = 16000.0
LIMIT_DAMP = 20.0


def joint_limit_spring(sys_or_range, qpos: jnp.ndarray,
                       k: float = LIMIT_K, damp: float = LIMIT_DAMP):
    """(spring torque [nj], active damping coef [nj], active stiffness [nj])
    for the hinge limits.  The caller adds the spring to tau and feeds the
    damping/stiffness coefficients into forward_dynamics' imp_damping /
    imp_stiffness (damping together with the joint's own viscous term)."""
    jnt_range = getattr(sys_or_range, "jnt_range", sys_or_range)
    q = qpos[7:]
    lo = jnt_range[:, 0]
    hi = jnt_range[:, 1]
    below = jnp.maximum(lo - q, 0.0)
    above = jnp.maximum(q - hi, 0.0)
    viol = (below > 0) | (above > 0)
    return (k * (below - above), jnp.where(viol, damp, 0.0),
            jnp.where(viol, k, 0.0))


def integrate(sys: System, qpos: jnp.ndarray, qvel: jnp.ndarray, qacc: jnp.ndarray,
              dt, max_ang_vel: float = 64.0, max_lin_vel: float = 200.0,
              max_dof_vel: float = 64.0):
    """Semi-implicit Euler.  Velocity clamps mirror the PhysX defaults
    (max angular velocity 64, joint velocity limits) and keep adversarial
    policies from driving the penalty contacts into f32 overflow."""
    qvel = qvel + dt * qacc
    lin = jnp.clip(qvel[0:3], -max_lin_vel, max_lin_vel)
    omega = jnp.clip(qvel[3:6], -max_ang_vel, max_ang_vel)
    hinge_rate = jnp.clip(qvel[6:], -max_dof_vel, max_dof_vel)
    qvel = jnp.concatenate([lin, omega, hinge_rate])
    pos = qpos[0:3] + dt * lin
    quat = quat_integrate(qpos[3:7], omega, dt)
    hinge = qpos[7:] + dt * hinge_rate
    return jnp.concatenate([pos, quat, hinge]), qvel


# ---------------------------------------------------------------------------
# contacts
# ---------------------------------------------------------------------------


class ContactParams(NamedTuple):
    """Contact constants (stand-in for the PhysX TGS solver configured at
    /root/reference/cfg/TenAnt.yaml:67-76).

    When the caller supplies the substep `h` and per-point inertia
    (`PointInertia`), the normal force is the EXACT IMPLICIT EULER solution
    of the 1-dof contact spring-damper along the point's effective mass.
    With `acc_units=True` (default) stiffness/damping are MASS-SCALED
    (MuJoCo solref convention, units 1/s^2 and 1/s): the per-point force
    constants are kn/w and kd/w with w the point's effective inverse mass
    along the direction, so the penetration coordinate follows

        dd'' = -kd*dd' - kn*dd

    for EVERY point regardless of its mass - critically damped at
    kd = 2*sqrt(kn), which is what makes MuJoCo landings bounce-free.  The
    implicit solution in force units:

        fn = (kn*d - (kn*h + kd)*vn) / (w * (1 + h*(kn*h + kd)))

    (round-2 used fixed force-unit constants kn=1e5/kd=300; per-point
    effective mass varies ~10x across the ant, so light foot points were
    underdamped -> the drop test rebounded 0.17 m where MuJoCo settles
    dead, VERDICT r3 contact item.)  With acc_units=False the constants are
    plain force units: fn = (kn*d - (kn*h+kd)*vn) / (1 + w*h*(kn*h+kd)).
    Friction is Coulomb with EXACT one-substep stiction: ft <= vt/(w_t*h)
    (the force that stops the tangential motion).  `max_depen_vel` caps the
    separation velocity a normal impulse may produce (PhysX's
    maxDepenetrationVelocity).

    Without (pi, h) the legacy explicit spring-damper + ramped friction is
    used (stiffness/damping/friction_vel then read their explicit meaning,
    acc_units ignored).
    """
    # Tuned against MuJoCo drop/stiction/push trajectories at the production
    # substep h = 5.53 ms (scripts/sweep_contact.py grids, BASELINE.md r3):
    # kn = 2e5 1/s^2, kd = 2*sqrt(kn) (critically damped), hc_vel = 0.5 m/s
    # -> torso-dip error 0.85%, rest 0.27%, landing-transient max |dz| 8 mm.
    stiffness: float = 2.0e5     # acc units [1/s^2] (MuJoCo solref convention)
    damping: float = 894.0      # acc units [1/s]; 2*sqrt(stiffness) = critical
    friction_vel: float = 0.3    # tangential velocity scale (legacy path)
    beta: float = 0.2            # Baumgarte factor (legacy path)
    max_depen_vel: float = 4.0   # cap on the separation velocity [m/s]
    acc_units: bool = True
    # Hunt-Crossley-style dissipation velocity [m/s] (0 disables): the spring
    # term is scaled by max(1 - vn/hc_vel, 0) - amplified while compressing
    # (vn < 0), suppressed while expanding - which makes the penalty contact
    # near-inelastic WITHOUT touching the static force (vn = 0 -> factor 1).
    # A linear implicit spring-damper at the production substep h = 5.5 ms
    # cannot be both stiff enough for the landing dip and damped enough not
    # to rebound (sweeps in BASELINE.md r3 notes); this is the standard
    # dissipation-model fix (Hunt & Crossley 1975; Drake's hydroelastic
    # model uses the same form).
    hc_vel: float = 0.5
    # cap on the Hunt-Crossley COMPRESSION amplification factor (0 = no
    # cap, the shipped default).  At a 4 m/s impact the uncapped factor is
    # 1 + 4/hc_vel = 9x, which transfers ~23% more impulse into the TenAnt
    # push-box than MuJoCo's solver (BASELINE.md r4 multi-push table); the
    # r5 impact sweep (scripts/impact_sweep_r5.py) measures dx error vs cap
    # and the TenAnt learning sensitivity across that span.
    hc_cap: float = 0.0


class PointInertia(NamedTuple):
    """Per-contact-point effective-mass info of the point's own body."""
    inv_mass: jnp.ndarray      # [P]
    inv_inertia_w: jnp.ndarray  # [P,3,3] world-frame inverse body inertia
    r: jnp.ndarray             # [P,3] lever arm from the body com (world)


def _inv3x3_sym(I: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a symmetric positive-definite 3x3."""
    a, b, c = I[0, 0], I[0, 1], I[0, 2]
    d, e = I[1, 1], I[1, 2]
    f = I[2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    return jnp.array([[A, B, C], [B, D, E], [C, E, F]]) / det


def point_inertia(sys: System, fk: FK, p_w: jnp.ndarray) -> PointInertia:
    """Effective-mass info for every contact sample point: the point's own
    body, with the body's joint ARMATURE added to its rotational inertia.

    A foot capsule's own com inertia is ~6e-4 while its hinge rotor inertia
    (armature) is 1e-2 - without the augmentation the free-body estimate says
    a fingertip push spins the foot ~20x more easily than the articulation
    actually allows, which made the contact solver throttle landing impacts
    to ~5 N/point and let the torso sink through its stance (see
    ContactParams docstring)."""
    inv_m, inv_I, r = [], [], []
    eye3 = jnp.eye(3)
    for b, s, e in _point_ranges(sys):
        k = e - s
        I_b = sys.inertia[b]
        if b > 0 and sys.nj > 0:
            I_b = I_b + sys.armature[b - 1] * eye3
        I_inv_b = _inv3x3_sym(I_b)
        I_inv_w = mm(mm(fk.R[b], I_inv_b), jnp.swapaxes(fk.R[b], -1, -2))
        inv_m.append(jnp.broadcast_to(1.0 / sys.mass[b], (k,)))
        inv_I.append(jnp.broadcast_to(I_inv_w, (k, 3, 3)))
        r.append(p_w[s:e] - fk.com_w[b])
    return PointInertia(inv_mass=jnp.concatenate(inv_m),
                        inv_inertia_w=jnp.concatenate(inv_I),
                        r=jnp.concatenate(r))


def inv_mass_along(pi: PointInertia, d: jnp.ndarray) -> jnp.ndarray:
    """w = 1/m + (r x d)^T I^-1 (r x d) per point; d: [P,3] unit directions."""
    rxd = jnp.cross(pi.r, d)
    return pi.inv_mass + jnp.sum(rxd * jnp.sum(pi.inv_inertia_w * rxd[..., None, :], axis=-1), axis=-1)


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
        p_rel = jnp.sum(fk.R[b][None, :, :] * pl[:, None, :], axis=-1)
        p_w = fk.pos[b] + p_rel                         # [k,3]
        v_sp = fk.v[b]
        v_w = v_sp[3:6] + jnp.cross(v_sp[0:3], p_w - fk.base)
        ps.append(p_w)
        vs.append(v_w)
    body = jnp.asarray(np.array(sys.point_body, np.int32))
    return jnp.concatenate(ps), jnp.concatenate(vs), body


def _contact_force(depth, normal, v_rel, friction, cp: ContactParams,
                   pi: PointInertia | None = None, h=None, w_extra_fn=None):
    """Force on body A for one contact candidate (zero when not touching).

    With (pi, h) given: implicit spring-damper normal force + exact-stiction
    Coulomb friction (see ContactParams docstring).  w_extra_fn(d) optionally
    adds the other body's inverse mass along direction d (two-body contacts,
    e.g. ant foot vs push-box)."""
    active = depth > 0.0
    vn = jnp.sum(v_rel * normal, axis=-1)
    vt = v_rel - vn[..., None] * normal
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-12)
    if pi is not None and h is not None:
        w_n = inv_mass_along(pi, normal)
        t_dir = vt / vt_norm[..., None]
        w_t = inv_mass_along(pi, t_dir)
        if w_extra_fn is not None:
            w_n = w_n + w_extra_fn(normal)
            w_t = w_t + w_extra_fn(t_dir)
        kn = cp.stiffness
        hc = getattr(cp, "hc_vel", 0.0)
        if not (isinstance(hc, (int, float)) and hc == 0.0):
            # Hunt-Crossley dissipation: explicit in the factor, implicit in
            # the spring-damper solve (kn_eff >= 0 keeps it unconditionally
            # stable).  Branchless so hc may be a traced value (sweeps).
            hc_t = jnp.asarray(hc)
            fac = jnp.clip(1.0 - vn / jnp.maximum(hc_t, 1e-9), 0.0, None)
            cap = getattr(cp, "hc_cap", 0.0)
            if not (isinstance(cap, (int, float)) and cap == 0.0):
                cap_t = jnp.asarray(cap)
                fac = jnp.where(cap_t > 0, jnp.minimum(fac, cap_t), fac)
            kn = kn * jnp.where(hc_t > 0, fac, 1.0)
        kh = kn * h + cp.damping
        if getattr(cp, "acc_units", False):
            # mass-scaled constants: identical penetration dynamics for
            # every point (see ContactParams docstring)
            fn = (kn * depth - kh * vn) / (w_n * (1.0 + h * kh))
        else:
            fn = (kn * depth - kh * vn) / (1.0 + w_n * h * kh)
        fn = jnp.clip(fn, 0.0, None) * active
        # cap the separation velocity an impulse may produce
        fn = jnp.minimum(fn, jnp.maximum(cp.max_depen_vel - vn, 0.0) / (w_n * h))
        ft_mag = jnp.minimum(friction * fn, vt_norm / (w_t * h))
    else:
        fn = cp.stiffness * depth - cp.damping * vn
        fn = jnp.clip(fn, 0.0, None) * active
        ft_mag = jnp.minimum(friction * fn, friction * fn * vt_norm / cp.friction_vel)
    ft = -ft_mag[..., None] * vt / vt_norm[..., None]
    return fn[..., None] * normal + ft


def combine_mu(mu_a, mu_b, mode: str = "multiply"):
    """Pairwise contact friction from the two contacting materials.

    'average' is PhysX's default PxCombineMode (eAVERAGE) - what the
    reference's IsaacGym sim actually uses, since it never sets a combine
    mode; 'max' is MuJoCo's rule (used by the cross-validation suites);
    'multiply' is this repo's historical rule.  Works on scalars or
    per-point arrays."""
    if mode == "multiply":
        return mu_a * mu_b
    if mode == "average":
        return 0.5 * (mu_a + mu_b)
    if mode == "max":
        return jnp.maximum(mu_a, mu_b)
    if mode == "min":
        return jnp.minimum(mu_a, mu_b)
    raise ValueError(f"unknown friction_combine mode: {mode!r}")


def contact_plane(p_w, v_w, radius, friction, cp: ContactParams,
                  pi: PointInertia | None = None, h=None):
    """Points vs ground plane z=0 (reference `_create_ground_plane`,
    ten_ant.py:233-238).  Returns [P,3] world forces on the points' bodies."""
    depth = radius - p_w[..., 2]
    normal = jnp.zeros_like(p_w).at[..., 2].set(1.0)
    return _contact_force(depth, normal, v_w, friction, cp, pi=pi, h=h)


def contact_box(p_w, v_w, radius, friction, box_pos, box_quat, box_vel,
                half_extents, cp: ContactParams,
                pi: PointInertia | None = None, h=None, box_inv=None):
    """Sphere points vs an oriented box (the push-box actor,
    ten_ant.py:490-496).  Returns (force on point bodies [P,3],
    spatial wrench on the box about the box origin [6]).

    box_vel: [6] = [v_origin(world), omega(world)] of the box body.
    All branchless/elementwise - no argmin/gather on the TPU hot path."""
    he = jnp.asarray(half_extents)
    R = quat_to_matrix(box_quat)
    local = jnp.sum(R * (p_w - box_pos)[..., :, None], axis=-2)  # R^T x
    clamped = jnp.clip(local, -he, he)
    delta = local - clamped
    dist_out = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
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
    normal = jnp.sum(R * n_local[..., None, :], axis=-1)  # box->world

    surf_local = jnp.where(inside[..., None], local, clamped)
    cpnt = box_pos + jnp.sum(R * surf_local[..., None, :], axis=-1)
    v_box_pt = box_vel[0:3] + jnp.cross(box_vel[3:6], cpnt - box_pos)
    v_rel = v_w - v_box_pt
    w_extra_fn = None
    if box_inv is not None:
        box_inv_m, box_I_inv_body = box_inv
        box_I_inv_w = mm(mm(R, box_I_inv_body), jnp.swapaxes(R, -1, -2))
        r_box = cpnt - box_pos

        def w_extra_fn(d):
            rxd = jnp.cross(r_box, d)
            return box_inv_m + jnp.sum(rxd * jnp.sum(box_I_inv_w * rxd[..., None, :], axis=-1), axis=-1)

    f = _contact_force(depth, normal, v_rel, friction, cp, pi=pi, h=h,
                       w_extra_fn=w_extra_fn)
    f_box_sp = -point_force_spatial(cpnt, f, box_pos)    # [P,6]
    return f, jnp.sum(f_box_sp, axis=0)


def accumulate_body_forces(sys: System, p_w: jnp.ndarray, f_w: jnp.ndarray,
                           base: jnp.ndarray):
    """Sum world point forces into per-body base-origin forces (list of [6]).

    Static segment-sum over contiguous point runs (no scatter ops)."""
    f_sp = point_force_spatial(p_w, f_w, base)           # [P,6]
    per_body = [jnp.zeros(6)] * sys.nb
    for b, s, e in _point_ranges(sys):
        per_body[b] = per_body[b] + jnp.sum(f_sp[s:e], axis=0)
    return per_body


def sensor_forces(sys: System, f_w: jnp.ndarray, fk: FK,
                  p_w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-foot contact wrench in the foot body frame: [num_sensors, 6]
    (force, torque about the sensor origin) - the TPU analogue of IsaacGym
    force sensors created at the foot body origin with an identity transform
    (one_ant.py:245-249, ten_ant.py:414-438; obs slice one_ant.py:610-614).

    p_w: contact point world positions; when given, the torque channels
    carry the real contact moment sum((p - foot_origin) x f) rotated into the
    foot frame (round 1 reported them as zero)."""
    if sys.num_sensors == 0:
        return jnp.zeros((0, 6))
    ns = sys.num_sensors
    f_world = [jnp.zeros(3)] * ns
    t_world = [jnp.zeros(3)] * ns
    foot_body = [0] * ns
    for p, (pb, s) in enumerate(zip(sys.point_body, sys.point_sensor)):
        if s >= 0:
            f_world[s] = f_world[s] + f_w[p]
            if p_w is not None:
                t_world[s] = t_world[s] + jnp.cross(p_w[p] - fk.pos[pb], f_w[p])
            foot_body[s] = pb
    out = []
    for s in range(ns):
        R = fk.R[foot_body[s]]
        f_local = jnp.sum(R * f_world[s][:, None], axis=0)
        t_local = jnp.sum(R * t_world[s][:, None], axis=0)
        out.append(jnp.concatenate([f_local, t_local]))
    return jnp.stack(out)


def cholesky_solve_small(M: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Dense-array variant of the unrolled solve (kept for tests/tools)."""
    n = M.shape[-1]
    Mrows = [[M[..., i, j] for j in range(n)] for i in range(n)]
    rl = [rhs[..., i] for i in range(n)]
    return jnp.stack(cholesky_solve_rows(Mrows, rl, 0, n), axis=-1)
