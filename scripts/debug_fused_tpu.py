"""Bisect the pallas-kernel vs array-engine divergence at substep level.

Cases: (clamp off/on) x (box off/on), one single substep, B=1024 random
articulation states.  Run on TPU (fast compiles for both paths).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from massive_marl_tpu.phys import engine, mjcf
from massive_marl_tpu.ops import scalar_phys as sp
from massive_marl_tpu.ops import fused_substep as fs

GRAV = (0.0, 0.0, -9.81)
CP = engine.ContactParams()
HE = (0.5, 14.0, 0.5)
H = 0.0166 / 3


def engine_substep(sys, qpos, qvel, tau, box_qpos, box_qvel, use_box, clamp):
    fk = engine.fwd_kinematics(sys, qpos, qvel)
    p_w, v_w, _ = engine.points_world(sys, fk)
    pi = engine.point_inertia(sys, fk, p_w) if clamp else None
    h = H if clamp else None
    f_pts = engine.contact_plane(p_w, v_w, sys.point_radius, sys.point_friction,
                                 CP, pi=pi, h=h)
    if use_box:
        m = 28.0
        I = np.diag([m / 3.0 * (HE[1] ** 2 + HE[2] ** 2),
                     m / 3.0 * (HE[0] ** 2 + HE[2] ** 2),
                     m / 3.0 * (HE[0] ** 2 + HE[1] ** 2)]).astype(np.float32)
        f_box, wrench = engine.contact_box(
            p_w, v_w, sys.point_radius, sys.point_friction * 0.0,
            box_qpos[0:3], box_qpos[3:7], box_qvel, HE, CP, pi=pi, h=h,
            box_inv=(1.0 / m, engine._inv3x3_sym(jnp.asarray(I))) if clamp else None)
        f_pts = f_pts + f_box
    fe = engine.accumulate_body_forces(sys, p_w, f_pts, fk.base)
    tt = tau + engine.joint_limit_torque(sys, qpos, qvel) - sys.damping * qvel[6:]
    qacc = engine.forward_dynamics(sys, fk, qvel, tt, fe, jnp.asarray(GRAV))
    return engine.integrate(sys, qpos, qvel, qacc, H)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
    sys = model.system
    consts = sp.bake_consts(sys)
    B = 1024
    rows = 8

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    scenario = os.environ.get("SCENARIO", "chaotic")
    if scenario == "airborne":      # no contacts: pure articulated dynamics
        z0, posn, hingen, veln, taun = 3.0, 0.05, 0.2, 0.3, 5.0
        box_z = -5.0
    elif scenario == "standing":    # light contact, small motion
        z0, posn, hingen, veln, taun = 0.75, 0.0, 0.05, 0.05, 1.0
        box_z = 0.45
    else:                            # deep penetration, large random motion
        z0, posn, hingen, veln, taun = 0.55, 0.3, 0.3, 0.5, 15.0
        box_z = 0.45
    print(f"scenario={scenario}", flush=True)
    qpos = jnp.tile(sys.init_qpos(jnp.array([0.5, -0.3, z0])), (B, 1))
    qpos = qpos.at[:, 0:3].add(jax.random.normal(k1, (B, 3)) * posn)
    qpos = qpos.at[:, 7:].add(jax.random.uniform(k2, (B, 8), minval=-hingen, maxval=hingen))
    qvel = jax.random.normal(k3, (B, sys.nv)) * veln
    tau = jax.random.uniform(k4, (B, 8), minval=-taun, maxval=taun)
    box_qpos = jnp.tile(jnp.array([0.8, 0.0, box_z, 0.0, 0.0, 0.1, 0.995]), (B, 1))
    box_qvel = jax.random.normal(k5, (B, 6)) * 0.2

    m = 28.0
    I = np.diag([m / 3.0 * (HE[1] ** 2 + HE[2] ** 2),
                 m / 3.0 * (HE[0] ** 2 + HE[2] ** 2),
                 m / 3.0 * (HE[0] ** 2 + HE[1] ** 2)])

    if os.environ.get("MODE") == "xla_scalar":
        # scalar lib as plain vmapped XLA (no pallas) vs engine: isolates
        # scalar-lib bugs from pallas-harness bugs
        def sca(a, b, t):
            nqp, nqv, _, _ = sp.substep(
                consts, [a[i] for i in range(15)], [b[i] for i in range(14)],
                [t[i] for i in range(8)], None, None, None, GRAV, H,
                CP.stiffness, CP.damping, CP.friction_vel,
                beta=CP.beta, max_depen_vel=CP.max_depen_vel)
            return jnp.stack(nqp), jnp.stack(nqv)

        qp_e, qv_e = jax.jit(jax.vmap(
            lambda a, b, c, d, e: engine_substep(sys, a, b, c, d, e, False, True)))(
            qpos, qvel, tau, box_qpos, box_qvel)
        qp_s, qv_s = jax.jit(jax.vmap(sca))(qpos, qvel, tau)
        dq = float(jnp.max(jnp.abs(qp_s - qp_e)))
        dv = float(jnp.max(jnp.abs(qv_s - qv_e)))
        print(f"XLA-scalar vs engine (clamp, no box): max|dqpos|={dq:.3e} max|dqvel|={dv:.3e}",
              flush=True)
        # locate worst articulation + dof
        idx = int(jnp.argmax(jnp.max(jnp.abs(qv_s - qv_e), axis=1)))
        print("worst row qvel diff per dof:", np.array(qv_s[idx] - qv_e[idx]).round(4), flush=True)
        print("qpos row:", np.array(qpos[idx]).round(3), flush=True)
        return

    for clamp in (False, True):
        for use_box in (False, True):
            qp_e, qv_e = jax.jit(jax.vmap(
                lambda a, b, c, d, e: engine_substep(sys, a, b, c, d, e, use_box, clamp)))(
                qpos, qvel, tau, box_qpos, box_qvel)

            # pallas path via a one-off kernel with matching config
            def krun(aq, av, ta, bq, bv):
                kern = fs.build_substep(
                    consts,
                    HE if use_box else None,
                    (1.0 / m, np.linalg.inv(I).tolist()) if (use_box and clamp) else None,
                    GRAV, H, CP, 1.0, rows=rows, rblk=8,
                    interpret=False)
                # clamp toggle: sp.substep enables the clamp iff beta is not None
                # build_substep always passes cp.beta -> patch via ContactParams
                return kern(aq, av, ta, bq, bv)

            if not clamp:
                # disable clamp by calling sp path through a kernel built with
                # beta=None: emulate by building with a CP whose beta is None
                import dataclasses
                cpx = CP._replace()  # NamedTuple copy
                def kernel_fn(aq_ref, av_ref, tau_ref, bq_ref, bv_ref,
                              naq_ref, nav_ref, wr_ref):
                    qp = [aq_ref[i] for i in range(fs.NQ)]
                    qv = [av_ref[i] for i in range(fs.NV)]
                    ta = [tau_ref[i] for i in range(fs.NU)]
                    bq = [bq_ref[i] for i in range(7)] if use_box else None
                    bv = [bv_ref[i] for i in range(6)] if use_box else None
                    nqp, nqv, wrench, _ = sp.substep(
                        consts, qp, qv, ta, bq, bv, HE if use_box else None,
                        GRAV, H, CP.stiffness, CP.damping, CP.friction_vel,
                        beta=None)
                    for i in range(fs.NQ):
                        naq_ref[i] = nqp[i]
                    for i in range(fs.NV):
                        nav_ref[i] = nqv[i]
                    for i in range(6):
                        wr_ref[i] = wrench[i] if (use_box and wrench is not None) else jnp.zeros_like(nqp[0])
                    return
                from jax.experimental import pallas as pl
                def bs(n):
                    return pl.BlockSpec((n, 8, 128), lambda i: (0, i, 0))
                krun = pl.pallas_call(
                    kernel_fn, grid=(1,),
                    in_specs=[bs(fs.NQ), bs(fs.NV), bs(fs.NU), bs(7), bs(6)],
                    out_specs=[bs(fs.NQ), bs(fs.NV), bs(6)],
                    out_shape=[jax.ShapeDtypeStruct((fs.NQ, rows, 128), jnp.float32),
                               jax.ShapeDtypeStruct((fs.NV, rows, 128), jnp.float32),
                               jax.ShapeDtypeStruct((6, rows, 128), jnp.float32)])

            aq3 = fs.pack_fields(qpos, rows)
            av3 = fs.pack_fields(qvel, rows)
            ta3 = fs.pack_fields(tau, rows)
            bq3 = fs.pack_fields(box_qpos, rows)
            bv3 = fs.pack_fields(box_qvel, rows)
            naq3, nav3, _ = jax.jit(krun)(aq3, av3, ta3, bq3, bv3)
            qp_s = fs.unpack_fields(naq3, B)
            qv_s = fs.unpack_fields(nav3, B)

            dq = float(jnp.max(jnp.abs(qp_s - qp_e)))
            dv = float(jnp.max(jnp.abs(qv_s - qv_e)))
            print(f"clamp={clamp} box={use_box}:  max|dqpos|={dq:.3e}  max|dqvel|={dv:.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
