"""Scalar-form (structure-of-arrays) articulated dynamics.

The same Featherstone substep as phys/engine.py, but every physical scalar is
its own batch-shaped array and every model constant is a baked-in Python
float.  This is the form a Pallas TPU kernel wants: all values are [BLOCK]
vectors that live in registers/VMEM, there are no minor-dim-3 tensors to pad,
and the whole substep fuses into ONE kernel with HBM traffic = state in/out
(ops/fused_substep.py wraps this in pallas_call).

Pure jnp ops only, so the identical code also runs outside pallas for
testing (tests/test_fused_substep.py checks bit-level agreement with the
reference engine).

Conventions match phys/engine.py: xyzw quaternions, base-origin spatial
coordinates [angular; linear], qvel = [v_base(world), omega(world), hinges].
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# component-tuple algebra: v3 = (x,y,z), q4 = (x,y,z,w), m33 = 3x3 nested
# ---------------------------------------------------------------------------

def _combine_mu_f(a: float, b: float, mode: str) -> float:
    """Python-float twin of engine.combine_mu (pair frictions are baked
    constants in the scalar kernel)."""
    if mode == "multiply":
        return a * b
    if mode == "average":
        return 0.5 * (a + b)
    if mode == "max":
        return max(a, b)
    if mode == "min":
        return min(a, b)
    raise ValueError(f"unknown friction_combine mode: {mode!r}")


def v3_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v3_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v3_scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def v3_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v3_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def m33_mv(m, v):
    return (m[0][0] * v[0] + m[0][1] * v[1] + m[0][2] * v[2],
            m[1][0] * v[0] + m[1][1] * v[1] + m[1][2] * v[2],
            m[2][0] * v[0] + m[2][1] * v[1] + m[2][2] * v[2])


def m33_mtv(m, v):
    """m^T v."""
    return (m[0][0] * v[0] + m[1][0] * v[1] + m[2][0] * v[2],
            m[0][1] * v[0] + m[1][1] * v[1] + m[2][1] * v[2],
            m[0][2] * v[0] + m[1][2] * v[1] + m[2][2] * v[2])


def quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz)


def quat_rotate(q, v):
    qv = (q[0], q[1], q[2])
    t = v3_scale(v3_cross(qv, v), 2.0)
    return v3_add(v3_add(v, v3_scale(t, q[3])), v3_cross(qv, t))


def quat_to_mat(q):
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))


def quat_axis_angle(axis, angle):
    half = 0.5 * angle
    s = jnp.sin(half)
    return (axis[0] * s, axis[1] * s, axis[2] * s, jnp.cos(half))


def quat_normalize(q):
    n = jnp.sqrt(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2 + 1e-12)
    inv = 1.0 / n
    return (q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv)


# six-tuples: spatial vectors [w0,w1,w2, p0,p1,p2]
def s6_add(a, b):
    return tuple(a[i] + b[i] for i in range(6))


def s6_scale(a, s):
    return tuple(a[i] * s for i in range(6))


def s6_dot(a, b):
    return sum(a[i] * b[i] for i in range(6))


def s6_motion_cross(v, m):
    w1, p1 = (v[0], v[1], v[2]), (v[3], v[4], v[5])
    w2, p2 = (m[0], m[1], m[2]), (m[3], m[4], m[5])
    ww = v3_cross(w1, w2)
    pp = v3_add(v3_cross(w1, p2), v3_cross(p1, w2))
    return (*ww, *pp)


def s6_force_cross(v, f):
    w, p = (v[0], v[1], v[2]), (v[3], v[4], v[5])
    t, fo = (f[0], f[1], f[2]), (f[3], f[4], f[5])
    tt = v3_add(v3_cross(w, t), v3_cross(p, fo))
    ff = v3_cross(w, fo)
    return (*tt, *ff)


class AntConsts(NamedTuple):
    """Baked model constants (python floats / nested tuples) for one System."""
    nb: int
    nj: int
    parent: Tuple[int, ...]
    body_pos: tuple       # [nb] of float3
    body_quat: tuple      # [nb] of float4 (xyzw)
    jnt_axis: tuple       # [nj] of float3 (child frame)
    jnt_pos: tuple        # [nj] of float3
    jnt_lo: tuple         # [nj]
    jnt_hi: tuple
    armature: tuple
    damping: tuple
    gear: tuple
    mass: tuple           # [nb]
    com: tuple            # [nb] float3 (body frame)
    inertia: tuple        # [nb] 3x3 nested floats (body frame, about com)
    point_body: Tuple[int, ...]
    point_local: tuple    # [P] float3
    point_radius: tuple
    point_friction: tuple
    point_sensor: Tuple[int, ...]
    num_sensors: int
    body_of_dof: Tuple[int, ...]
    chains: tuple         # per dof: ancestor dof indices


def bake_consts(sys) -> AntConsts:
    """System (jnp arrays) -> python-float constants for kernel baking."""
    from massive_marl_tpu.phys.engine import dof_chains
    # np.asarray BEFORE any slicing: the System's concrete arrays may be
    # referenced inside a jit trace (fused_scene_step), where jnp slicing
    # would produce tracers that cannot be baked
    f = lambda x: np.asarray(x).tolist()
    jnt_range = np.asarray(sys.jnt_range)

    def t3(x):
        return tuple(tuple(row) for row in f(x))

    body_of_dof, chains = dof_chains(sys)
    return AntConsts(
        nb=sys.nb, nj=sys.nj, parent=tuple(sys.parent),
        body_pos=t3(sys.body_pos), body_quat=t3(sys.body_quat),
        jnt_axis=t3(sys.jnt_axis), jnt_pos=t3(sys.jnt_pos),
        jnt_lo=tuple(jnt_range[:, 0].tolist()), jnt_hi=tuple(jnt_range[:, 1].tolist()),
        armature=tuple(f(sys.armature)), damping=tuple(f(sys.damping)),
        gear=tuple(f(sys.gear)),
        mass=tuple(f(sys.mass)), com=t3(sys.com),
        inertia=tuple(tuple(tuple(r) for r in m) for m in f(sys.inertia)),
        point_body=tuple(sys.point_body), point_local=t3(sys.point_local),
        point_radius=tuple(f(sys.point_radius)),
        point_friction=tuple(f(sys.point_friction)),
        point_sensor=tuple(sys.point_sensor), num_sensors=sys.num_sensors,
        body_of_dof=tuple(body_of_dof), chains=tuple(tuple(ch) for ch in chains),
    )


def _inv3x3_sym_t(m):
    """Closed-form inverse of a symmetric 3x3 given as nested tuples of
    floats/arrays (scalar twin of engine._inv3x3_sym)."""
    a, b, cc = m[0][0], m[0][1], m[0][2]
    d, e = m[1][1], m[1][2]
    f = m[2][2]
    A = d * f - e * e
    B = cc * e - b * f
    C = b * e - cc * d
    det = a * A + b * B + cc * C
    D = a * f - cc * cc
    E = b * cc - a * e
    F = a * d - b * b
    inv = 1.0 / det
    return ((A * inv, B * inv, C * inv),
            (B * inv, D * inv, E * inv),
            (C * inv, E * inv, F * inv))


def substep(c: AntConsts, qpos: Sequence, qvel: Sequence, tau_act: Sequence,
            box_qpos: Sequence | None, box_qvel: Sequence | None,
            box_he: tuple | None, gravity: tuple, h: float,
            stiffness: float, damping_c: float, friction_vel: float,
            plane_friction: float = 1.0,
            box_friction: float = 0.0,
            friction_combine: str = "multiply",
            ant_box_mu: float | None = None,
            limit_k: float | None = None, limit_damp: float | None = None,
            max_ang_vel: float = 64.0, max_lin_vel: float = 200.0,
            max_dof_vel: float = 64.0,
            beta: float | None = None, max_depen_vel: float = 4.0,
            acc_units: bool = True, hc_vel: float = 0.0,
            hc_cap: float = 0.0,
            box_inv: tuple | None = None,
            dr: dict | None = None):
    """One physics substep in scalar form.

    qpos: 7+nj arrays, qvel: 6+nj arrays, tau_act: nj arrays (actuation only).
    box_*: box state broadcast per articulation (None = no box).
    dr: optional per-articulation randomized params (domain randomization) -
    dict of batch-array lists {mass[nb], damping[nj], armature[nj],
    jnt_lo[nj], jnt_hi[nj]} overriding the baked constants.
    Returns (qpos', qvel', box_wrench six-tuple or None, sensor wrench tuples
    of (fx,fy,fz,tx,ty,tz) per sensor in the foot body frame).
    """
    nb, nj = c.nb, c.nj
    if limit_k is None or limit_damp is None:
        # single source of truth for the limit-penalty constants
        from massive_marl_tpu.phys.engine import LIMIT_DAMP, LIMIT_K
        limit_k = LIMIT_K if limit_k is None else limit_k
        limit_damp = LIMIT_DAMP if limit_damp is None else limit_damp
    mass = dr["mass"] if dr else list(c.mass)
    damping = dr["damping"] if dr else list(c.damping)
    armature = dr["armature"] if dr else list(c.armature)
    jnt_lo = dr["jnt_lo"] if dr else list(c.jnt_lo)
    jnt_hi = dr["jnt_hi"] if dr else list(c.jnt_hi)
    base = (qpos[0], qpos[1], qpos[2])
    base_q = (qpos[3], qpos[4], qpos[5], qpos[6])

    # ---------------- FK ----------------
    pos = [base]
    quat = [base_q]
    axes_w = []
    for b in range(1, nb):
        j = b - 1
        p_p, q_p = pos[c.parent[b]], quat[c.parent[b]]
        p0 = v3_add(p_p, quat_rotate(q_p, c.body_pos[b]))
        q0 = quat_mul(q_p, c.body_quat[b])
        n_w = quat_rotate(q0, c.jnt_axis[j])
        q_rot = quat_axis_angle(n_w, qpos[7 + j])
        q_c = quat_mul(q_rot, q0)
        anchor = v3_add(p0, quat_rotate(q0, c.jnt_pos[j]))
        p_c = v3_sub(anchor, quat_rotate(q_c, c.jnt_pos[j]))
        pos.append(p_c)
        quat.append(q_c)
        axes_w.append((n_w, v3_sub(anchor, base)))
    R = [quat_to_mat(q) for q in quat]
    com_w = [v3_add(pos[b], m33_mv(R[b], c.com[b])) for b in range(nb)]

    zero = qpos[0] * 0.0
    one = zero + 1.0
    e = [(one, zero, zero), (zero, one, zero), (zero, zero, one)]
    phi = [(zero, zero, zero, *e[k]) for k in range(3)]
    phi += [(*e[k], zero, zero, zero) for k in range(3)]
    for j in range(nj):
        n, w = axes_w[j]
        pw = v3_cross(w, n)
        phi.append((*n, *pw))

    v = [(qvel[3], qvel[4], qvel[5], qvel[0], qvel[1], qvel[2])]
    for b in range(1, nb):
        j = 6 + b - 1
        v.append(s6_add(v[c.parent[b]], s6_scale(phi[j], qvel[j])))

    # ---------------- contacts ----------------
    f_body = [(zero,) * 6 for _ in range(nb)]
    ns_slots = max(c.num_sensors, 1)
    sensors = [(zero, zero, zero) for _ in range(ns_slots)]
    sensor_tq = [(zero, zero, zero) for _ in range(ns_slots)]
    box_wrench = (zero,) * 6 if box_he is not None else None
    if box_he is not None:
        bq = (box_qpos[3], box_qpos[4], box_qpos[5], box_qpos[6])
        bR = quat_to_mat(bq)
        bp = (box_qpos[0], box_qpos[1], box_qpos[2])
        bv = (box_qvel[0], box_qvel[1], box_qvel[2])
        bw = (box_qvel[3], box_qvel[4], box_qvel[5])

    # per-body world inverse inertia for the contact effective mass, with the
    # body's joint armature augmenting the rotational inertia (twin of
    # engine.point_inertia; see engine.ContactParams docstring)
    clamp = beta is not None
    if clamp:
        I_inv_w = []
        for b in range(nb):
            I_aug = [[c.inertia[b][i][j] for j in range(3)] for i in range(3)]
            if b > 0 and nj > 0:
                for i in range(3):
                    I_aug[i][i] = I_aug[i][i] + armature[b - 1]
            I_inv_b = _inv3x3_sym_t(tuple(tuple(row) for row in I_aug))
            RI = tuple(tuple(sum(R[b][i][k] * I_inv_b[k][j] for k in range(3))
                             for j in range(3)) for i in range(3))
            I_inv_w.append(tuple(tuple(sum(RI[i][k] * R[b][j][k] for k in range(3))
                                       for j in range(3)) for i in range(3)))
        if box_he is not None and box_inv is not None:
            bim, bIinvb = box_inv
            bRI = tuple(tuple(sum(bR[i][k] * bIinvb[k][j] for k in range(3))
                              for j in range(3)) for i in range(3))
            bIinvw = tuple(tuple(sum(bRI[i][k] * bR[j][k] for k in range(3))
                                 for j in range(3)) for i in range(3))

    for p_i in range(len(c.point_body)):
        b = c.point_body[p_i]
        radius = c.point_radius[p_i]
        p_w = v3_add(pos[b], m33_mv(R[b], c.point_local[p_i]))
        vb = v[b]
        v_w = v3_add((vb[3], vb[4], vb[5]),
                     v3_cross((vb[0], vb[1], vb[2]), v3_sub(p_w, base)))

        w_fn = None
        if clamp:
            r_pt = v3_sub(p_w, com_w[b])
            inv_m = 1.0 / mass[b]

            def w_fn(d, _r=r_pt, _I=I_inv_w[b], _im=inv_m):
                rxd = v3_cross(_r, d)
                return _im + v3_dot(rxd, m33_mv(_I, rxd))

        # plane z=0.  Pair frictions are combined at BAKE time (python
        # floats) under the scene's friction_combine rule - the twin of
        # engine.combine_mu
        depth = radius - p_w[2]
        mu = _combine_mu_f(c.point_friction[p_i], plane_friction,
                           friction_combine)
        f_pt = _contact_force(depth, (zero, zero, one), v_w, mu,
                              stiffness, damping_c, friction_vel,
                              w_fn=w_fn, h=h if clamp else None,
                              beta=beta if clamp else 0.2, mdv=max_depen_vel,
                              acc_units=acc_units, hc_vel=hc_vel, hc_cap=hc_cap)

        if box_he is not None:
            rel = v3_sub(p_w, bp)
            local = m33_mtv(bR, rel)
            cl = tuple(jnp.clip(local[k], -box_he[k], box_he[k]) for k in range(3))
            delta = v3_sub(local, cl)
            dist_out = jnp.sqrt(v3_dot(delta, delta) + 1e-12)
            inside = ((jnp.abs(local[0]) < box_he[0])
                      & (jnp.abs(local[1]) < box_he[1])
                      & (jnp.abs(local[2]) < box_he[2]))
            fp = [box_he[k] - jnp.abs(local[k]) for k in range(3)]
            min_pen = jnp.minimum(jnp.minimum(fp[0], fp[1]), fp[2])
            m0 = fp[0] <= min_pen + 1e-12
            m1 = (fp[1] <= min_pen + 1e-12) & ~m0
            m2 = ~m0 & ~m1
            sgn = [jnp.sign(local[k]) for k in range(3)]
            oh = (m0.astype(zero.dtype), m1.astype(zero.dtype), m2.astype(zero.dtype))
            n_loc_in = (sgn[0] * oh[0], sgn[1] * oh[1], sgn[2] * oh[2])
            inv_d = 1.0 / dist_out
            n_loc_out = v3_scale(delta, inv_d)
            insf = inside.astype(zero.dtype)
            n_loc = tuple(insf * n_loc_in[k] + (1 - insf) * n_loc_out[k] for k in range(3))
            depth_b = insf * (radius + min_pen) + (1 - insf) * (radius - dist_out)
            n_w = m33_mv(bR, n_loc)
            surf = tuple(insf * local[k] + (1 - insf) * cl[k] for k in range(3))
            cpnt = v3_add(bp, m33_mv(bR, surf))
            v_box_pt = v3_add(bv, v3_cross(bw, v3_sub(cpnt, bp)))
            v_rel = v3_sub(v_w, v_box_pt)
            w_fn_box = None
            if clamp:
                if box_inv is not None:
                    r_box = v3_sub(cpnt, bp)

                    def w_fn_box(d, _wf=w_fn, _r=r_box):
                        rxd = v3_cross(_r, d)
                        return _wf(d) + bim + v3_dot(rxd, m33_mv(bIinvw, rxd))
                else:
                    w_fn_box = w_fn
            # box pair friction: combine(ant material, box material) - the
            # box material is 0 for the TenAnt push-box (ten_ant.py:548-552),
            # so 'multiply' gives a frictionless pair and 'average' (PhysX's
            # default combine mode) gives mu_ant/2
            mu_box = (ant_box_mu if ant_box_mu is not None
                      else _combine_mu_f(c.point_friction[p_i], box_friction,
                                         friction_combine))
            f_bx = _contact_force(depth_b, n_w, v_rel, mu_box,
                                  stiffness, damping_c, friction_vel,
                                  w_fn=w_fn_box, h=h if clamp else None,
                                  beta=beta if clamp else 0.2, mdv=max_depen_vel,
                                  acc_units=acc_units, hc_vel=hc_vel, hc_cap=hc_cap)
            f_pt = v3_add(f_pt, f_bx)
            tq = v3_cross(v3_sub(cpnt, bp), f_bx)
            box_wrench = s6_add(box_wrench,
                                (-tq[0], -tq[1], -tq[2], -f_bx[0], -f_bx[1], -f_bx[2]))

        tq_pt = v3_cross(v3_sub(p_w, base), f_pt)
        f_body[b] = s6_add(f_body[b], (*tq_pt, *f_pt))
        s = c.point_sensor[p_i]
        if s >= 0:
            sensors[s] = v3_add(sensors[s], f_pt)
            # contact moment about the sensor origin (= foot body origin,
            # reference one_ant.py:245-249 identity sensor pose)
            sensor_tq[s] = v3_add(sensor_tq[s],
                                  v3_cross(v3_sub(p_w, pos[b]), f_pt))

    # sensor wrenches into foot body frames: (force3, torque3) per sensor
    sensor_out = []
    foot_body = {}
    for p_i, (pb, s) in enumerate(zip(c.point_body, c.point_sensor)):
        if s >= 0:
            foot_body[s] = pb
    for s in range(c.num_sensors):
        f_loc = m33_mtv(R[foot_body[s]], sensors[s])
        t_loc = m33_mtv(R[foot_body[s]], sensor_tq[s])
        sensor_out.append((*f_loc, *t_loc))

    # ---------------- gravity + bias ----------------
    I_sp = []
    for b in range(nb):
        # world inertia about com: R I R^T
        RI = tuple(tuple(sum(R[b][i][k] * c.inertia[b][k][j] for k in range(3))
                         for j in range(3)) for i in range(3))
        Iw = tuple(tuple(sum(RI[i][k] * R[b][j][k] for k in range(3))
                         for j in range(3)) for i in range(3))
        cr = v3_sub(com_w[b], base)
        m = mass[b]
        # I_O blocks: A = Iw - m cx cx ; B = m cx ; C = m I
        cx = ((zero, -cr[2], cr[1]), (cr[2], zero, -cr[0]), (-cr[1], cr[0], zero))
        cxcx = tuple(tuple(sum(cx[i][k] * cx[k][j] for k in range(3))
                           for j in range(3)) for i in range(3))
        A = tuple(tuple(Iw[i][j] - m * cxcx[i][j] for j in range(3)) for i in range(3))
        B = tuple(tuple(m * cx[i][j] for j in range(3)) for i in range(3))
        I_sp.append((A, B, m))

    def I_mv(Iblk, s):
        """I_O = [[A, B], [-B, m*1]] with A = Iw - m cx cx, B = m cx (skew):
        linear momentum = -B w + m p (phys/spatial.py spatial_inertia)."""
        A, B, m = Iblk
        w, p = (s[0], s[1], s[2]), (s[3], s[4], s[5])
        top = v3_add(m33_mv(A, w), m33_mv(B, p))
        Bw = m33_mv(B, w)
        bot = v3_add((-Bw[0], -Bw[1], -Bw[2]), v3_scale(p, m))
        return (*top, *bot)

    def I_add(a, b):
        A1, B1, m1 = a
        A2, B2, m2 = b
        return (tuple(tuple(A1[i][j] + A2[i][j] for j in range(3)) for i in range(3)),
                tuple(tuple(B1[i][j] + B2[i][j] for j in range(3)) for i in range(3)),
                m1 + m2)

    # CRBA composite inertias
    Ic = list(I_sp)
    for b in range(nb - 1, 0, -1):
        Ic[c.parent[b]] = I_add(Ic[c.parent[b]], Ic[b])
    nv = 6 + nj
    Mrows = [[None] * nv for _ in range(nv)]
    for j in range(nv):
        fI = I_mv(Ic[c.body_of_dof[j]], phi[j])
        for i in c.chains[j]:
            mij = s6_dot(phi[i], fI)
            Mrows[i][j] = mij
            Mrows[j][i] = mij
    for j in range(6, nv):
        Mrows[j][j] = Mrows[j][j] + armature[j - 6]

    # velocity-product accel
    avp = [(zero, zero, zero, *v3_cross((qvel[0], qvel[1], qvel[2]),
                                        (qvel[3], qvel[4], qvel[5])))]
    for b in range(1, nb):
        j = b - 1
        vJ = s6_scale(phi[6 + j], qvel[6 + j])
        avp.append(s6_add(avp[c.parent[b]], s6_motion_cross(v[c.parent[b]], vJ)))

    fb = []
    for b in range(nb):
        cr = v3_sub(com_w[b], base)
        fg = v3_scale(gravity, mass[b])
        tg = v3_cross(cr, fg)
        f_grav = (*tg, *fg)
        bias = s6_add(I_mv(I_sp[b], avp[b]), s6_force_cross(v[b], I_mv(I_sp[b], v[b])))
        fb.append(tuple(bias[i] - f_grav[i] - f_body[b][i] for i in range(6)))
    fs = list(fb)
    for b in range(nb - 1, 0, -1):
        fs[c.parent[b]] = s6_add(fs[c.parent[b]], fs[b])
    C = [s6_dot(phi[j], fs[c.body_of_dof[j]]) for j in range(nv)]

    # hinge torques: actuation + limit spring; joint + limit damping AND the
    # limit spring integrate IMPLICITLY via (M + h*D + h^2*K) qacc =
    # tau - (D + h*K)*qd (MuJoCo-Euler style; twin of
    # engine.forward_dynamics imp_damping/imp_stiffness), which keeps the
    # stiff limit spring + boundary damping unconditionally stable
    rhs = [-C[j] for j in range(6)]
    for j in range(nj):
        q = qpos[7 + j]
        qd = qvel[6 + j]
        below = jnp.maximum(jnt_lo[j] - q, 0.0)
        above = jnp.maximum(q - jnt_hi[j], 0.0)
        viol = (below > 0) | (above > 0)
        t_lim = limit_k * (below - above)
        D_j = damping[j] + jnp.where(viol, limit_damp, 0.0)
        K_j = jnp.where(viol, limit_k, 0.0)
        Mrows[6 + j][6 + j] = Mrows[6 + j][6 + j] + h * D_j + (h * h) * K_j
        tau_j = tau_act[j] + t_lim - (D_j + h * K_j) * qd
        rhs.append(tau_j - C[6 + j])

    # ---------------- Cholesky solve ----------------
    L = [[None] * nv for _ in range(nv)]
    inv_diag = [None] * nv
    for a in range(nv):
        for b2 in range(a + 1):
            s = Mrows[a][b2]
            for k in range(b2):
                if L[a][k] is None or L[b2][k] is None:
                    continue
                t = L[a][k] * L[b2][k]
                s = -t if s is None else s - t
            if a == b2:
                s = s if s is not None else zero
                L[a][a] = jnp.sqrt(jnp.maximum(s, 1e-12))
                inv_diag[a] = 1.0 / L[a][a]
            else:
                L[a][b2] = None if s is None else s * inv_diag[b2]
    y = [None] * nv
    for a in range(nv):
        s = rhs[a]
        for k in range(a):
            if L[a][k] is not None:
                s = s - L[a][k] * y[k]
        y[a] = s * inv_diag[a]
    qacc = [None] * nv
    for a in reversed(range(nv)):
        s = y[a]
        for k in range(a + 1, nv):
            if L[k][a] is not None:
                s = s - L[k][a] * qacc[k]
        qacc[a] = s * inv_diag[a]

    # ---------------- integrate ----------------
    nqv = []
    for j in range(nv):
        val = qvel[j] + h * qacc[j]
        if j < 3:
            val = jnp.clip(val, -max_lin_vel, max_lin_vel)
        elif j < 6:
            val = jnp.clip(val, -max_ang_vel, max_ang_vel)
        else:
            val = jnp.clip(val, -max_dof_vel, max_dof_vel)
        nqv.append(val)
    npos = [qpos[k] + h * nqv[k] for k in range(3)]
    omega = (nqv[3], nqv[4], nqv[5])
    dq = (omega[0] * (0.5 * h), omega[1] * (0.5 * h), omega[2] * (0.5 * h), zero)
    q_new = quat_mul(dq, base_q)
    q_new = (base_q[0] + q_new[0], base_q[1] + q_new[1],
             base_q[2] + q_new[2], base_q[3] + q_new[3])
    q_new = quat_normalize(q_new)
    nqp = npos + list(q_new) + [qpos[7 + j] + h * nqv[6 + j] for j in range(nj)]
    return nqp, nqv, box_wrench, sensor_out


def _contact_force(depth, normal, v_rel, friction, kn, kd, fv,
                   w_fn=None, h=None, beta=0.2, mdv=4.0, acc_units=True,
                   hc_vel=0.0, hc_cap=0.0):
    """Mirror of engine._contact_force: implicit spring-damper normal force +
    exact-stiction Coulomb friction (see engine.ContactParams docstring;
    acc_units=True means kn/kd are mass-scaled MuJoCo-solref-style constants
    divided by the point's effective inverse mass).

    w_fn(d3) -> effective inverse mass along direction d (point body with
    armature-augmented inertia + other body)."""
    active = (depth > 0.0).astype(depth.dtype)
    vn = v3_dot(v_rel, normal)
    vt = v3_sub(v_rel, v3_scale(normal, vn))
    vt_norm = jnp.sqrt(v3_dot(vt, vt) + 1e-12)
    if w_fn is not None and h is not None:
        w_n = w_fn(normal)
        inv_vt = 1.0 / vt_norm
        t_dir = v3_scale(vt, inv_vt)
        w_t = w_fn(t_dir)
        if not (isinstance(hc_vel, (int, float)) and hc_vel == 0.0):
            hc_t = jnp.asarray(hc_vel)
            fac = jnp.clip(1.0 - vn / jnp.maximum(hc_t, 1e-9), 0.0, None)
            if not (isinstance(hc_cap, (int, float)) and hc_cap == 0.0):
                cap_t = jnp.asarray(hc_cap)
                fac = jnp.where(cap_t > 0, jnp.minimum(fac, cap_t), fac)
            kn = kn * jnp.where(hc_t > 0, fac, 1.0)
        kh = kn * h + kd
        if acc_units:
            fn = (kn * depth - kh * vn) / (w_n * (1.0 + h * kh))
        else:
            fn = (kn * depth - kh * vn) / (1.0 + w_n * h * kh)
        fn = jnp.maximum(fn, 0.0) * active
        fn = jnp.minimum(fn, jnp.maximum(mdv - vn, 0.0) / (w_n * h))
        ft_mag = jnp.minimum(friction * fn, vt_norm / (w_t * h))
    else:
        fn = jnp.maximum(kn * depth - kd * vn, 0.0) * active
        ft_mag = jnp.minimum(friction * fn, friction * fn * vt_norm / fv)
    f = v3_sub(v3_scale(normal, fn), v3_scale(vt, ft_mag / vt_norm))
    return f
