"""Scalar-form substep (ops/scalar_phys.py) must agree with the reference
XLA engine bit-for-bit-ish (f32 reassociation tolerance).

Opt-in via RUN_SCALAR_PHYS_TESTS=1: the fully-unrolled scalar graph (the
shape a Pallas kernel wants) takes XLA:CPU an extremely long time to compile
cold (>40 min on 8-vCPU hosts); the persistent cache makes reruns fast, but a
default `pytest tests/` must not eat that."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from massive_marl_tpu.phys import engine, mjcf
from massive_marl_tpu.ops import scalar_phys as sp

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SCALAR_PHYS_TESTS"),
    reason="scalar-phys agreement tests are opt-in (XLA:CPU cold-compile cost)")

GRAV = (0.0, 0.0, -9.81)
CP = engine.ContactParams()


@pytest.fixture(scope="module")
def ant_model():
    return mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))


def _box_inv(he):
    """(1/m, I^-1 body-frame) of the push-box (density 1, as in the tasks)."""
    m = 8.0 * he[0] * he[1] * he[2]
    I = np.diag([m / 3.0 * (he[1] ** 2 + he[2] ** 2),
                 m / 3.0 * (he[0] ** 2 + he[2] ** 2),
                 m / 3.0 * (he[0] ** 2 + he[1] ** 2)]).astype(np.float32)
    return m, I


def engine_substep(sys, qpos, qvel, tau, box_qpos, box_qvel, he, h):
    fk = engine.fwd_kinematics(sys, qpos, qvel)
    p_w, v_w, _ = engine.points_world(sys, fk)
    pi = engine.point_inertia(sys, fk, p_w)
    f_pts = engine.contact_plane(p_w, v_w, sys.point_radius, sys.point_friction,
                                 CP, pi=pi, h=h)
    bm, bI = _box_inv(he)
    f_box, wrench = engine.contact_box(p_w, v_w, sys.point_radius,
                                       sys.point_friction * 0.0,
                                       box_qpos[0:3], box_qpos[3:7], box_qvel, he,
                                       CP, pi=pi, h=h,
                                       box_inv=(1.0 / bm, engine._inv3x3_sym(jnp.asarray(bI))))
    f_pts = f_pts + f_box
    f_ext = engine.accumulate_body_forces(sys, p_w, f_pts, fk.base)
    t_lim, d_lim, k_lim = engine.joint_limit_spring(sys, qpos)
    qacc = engine.forward_dynamics(sys, fk, qvel, tau + t_lim, f_ext,
                                   jnp.asarray(GRAV),
                                   imp_damping=sys.damping + d_lim, h=h,
                                   imp_stiffness=k_lim)
    qp, qv = engine.integrate(sys, qpos, qvel, qacc, h)
    return qp, qv, wrench


def scalar_substep(consts, qpos, qvel, tau, box_qpos, box_qvel, he, h):
    qp = [qpos[i] for i in range(qpos.shape[0])]
    qv = [qvel[i] for i in range(qvel.shape[0])]
    ta = [tau[i] for i in range(tau.shape[0])]
    bq = [box_qpos[i] for i in range(7)]
    bv = [box_qvel[i] for i in range(6)]
    bm, bI = _box_inv(he)
    nqp, nqv, wrench, sensors = sp.substep(
        consts, qp, qv, ta, bq, bv, he, GRAV, h,
        CP.stiffness, CP.damping, CP.friction_vel,
        beta=CP.beta, max_depen_vel=CP.max_depen_vel,
        box_inv=(1.0 / bm, np.linalg.inv(bI).tolist()))
    return jnp.stack(nqp), jnp.stack(nqv), jnp.stack(wrench)


def test_scalar_matches_engine(ant_model):
    sys = ant_model.system
    consts = sp.bake_consts(sys)
    he = (0.5, 14.0, 0.5)
    h = 0.0166 / 6
    key = jax.random.PRNGKey(0)
    B = 8

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    qpos = jnp.tile(sys.init_qpos(jnp.array([0.5, -0.3, 0.55])), (B, 1))
    qpos = qpos.at[:, 0:3].add(jax.random.normal(k1, (B, 3)) * 0.3)
    qpos = qpos.at[:, 7:].add(jax.random.uniform(k2, (B, 8), minval=-0.3, maxval=0.3))
    qvel = jax.random.normal(k3, (B, sys.nv)) * 0.5
    tau = jax.random.uniform(k4, (B, 8), minval=-15, maxval=15)
    box_qpos = jnp.tile(jnp.array([0.8, 0.0, 0.45, 0.0, 0.0, 0.1, 0.995]), (B, 1))
    box_qvel = jax.random.normal(k5, (B, 6)) * 0.2

    qp_e, qv_e, w_e = jax.jit(jax.vmap(
        lambda a, b, c, d, e: engine_substep(sys, a, b, c, d, e, he, h)))(
        qpos, qvel, tau, box_qpos, box_qvel)
    qp_s, qv_s, w_s = jax.jit(jax.vmap(
        lambda a, b, c, d, e: scalar_substep(consts, a, b, c, d, e, he, h)))(
        qpos, qvel, tau, box_qpos, box_qvel)

    np.testing.assert_allclose(np.array(qp_s), np.array(qp_e), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.array(qv_s), np.array(qv_e), rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.array(w_s), np.array(w_e), rtol=3e-3, atol=3e-3)


def test_scalar_matches_engine_no_box(ant_model):
    sys = ant_model.system
    consts = sp.bake_consts(sys)
    h = 1 / 480
    B = 4
    key = jax.random.PRNGKey(7)
    qpos = jnp.tile(sys.init_qpos(jnp.array([0.0, 0.0, 0.5])), (B, 1))
    qvel = jax.random.normal(key, (B, sys.nv)) * 0.3
    tau = jnp.zeros((B, 8))

    def eng(a, b, t):
        fk = engine.fwd_kinematics(sys, a, b)
        p_w, v_w, _ = engine.points_world(sys, fk)
        pi = engine.point_inertia(sys, fk, p_w)
        f_pts = engine.contact_plane(p_w, v_w, sys.point_radius, sys.point_friction,
                                     CP, pi=pi, h=h)
        f_ext = engine.accumulate_body_forces(sys, p_w, f_pts, fk.base)
        t_lim, d_lim, k_lim = engine.joint_limit_spring(sys, a)
        qacc = engine.forward_dynamics(sys, fk, b, t + t_lim, f_ext,
                                       jnp.asarray(GRAV),
                                       imp_damping=sys.damping + d_lim, h=h,
                                       imp_stiffness=k_lim)
        return engine.integrate(sys, a, b, qacc, h)

    def sca(a, b, t):
        nqp, nqv, _, _ = sp.substep(
            consts, [a[i] for i in range(a.shape[0])],
            [b[i] for i in range(b.shape[0])], [t[i] for i in range(8)],
            None, None, None, GRAV, h, CP.stiffness, CP.damping, CP.friction_vel,
            beta=CP.beta, max_depen_vel=CP.max_depen_vel)
        return jnp.stack(nqp), jnp.stack(nqv)

    qp_e, qv_e = jax.jit(jax.vmap(eng))(qpos, qvel, tau)
    qp_s, qv_s = jax.jit(jax.vmap(sca))(qpos, qvel, tau)
    np.testing.assert_allclose(np.array(qp_s), np.array(qp_e), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.array(qv_s), np.array(qv_e), rtol=3e-3, atol=3e-3)
