"""DEFAULT-SUITE guard against fused-kernel math regressions (VERDICT r2
weak item 6): a deliberately tiny scalar-form-vs-array-engine agreement
check that runs EAGERLY (no jit), so the XLA:CPU cold-compile cost that
makes tests/test_fused_substep.py opt-in never applies.  One articulation,
one substep, plane contacts, with and without the DR operand (~20 s each on
an 8-vCPU host).

The full batched/jitted agreement suite stays opt-in via
RUN_SCALAR_PHYS_TESTS=1, and the compiled TPU kernel is validated on real
hardware by scripts/validate_fused_tpu.py; this file is the cheap CPU dev-
loop tripwire in between.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from massive_marl_tpu.phys import engine, mjcf
from massive_marl_tpu.ops import scalar_phys as sp

GRAV = jnp.array([0.0, 0.0, -9.81])
CP = engine.ContactParams()
H = 0.0166 / 3


@pytest.fixture(scope="module")
def ant_model():
    return mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))


def _engine_substep(sys, qpos, qvel, tau):
    fk = engine.fwd_kinematics(sys, qpos, qvel)
    p_w, v_w, _ = engine.points_world(sys, fk)
    pi = engine.point_inertia(sys, fk, p_w)
    f_pts = engine.contact_plane(p_w, v_w, sys.point_radius, sys.point_friction,
                                 CP, pi=pi, h=H)
    f_ext = engine.accumulate_body_forces(sys, p_w, f_pts, fk.base)
    t_lim, d_lim, k_lim = engine.joint_limit_spring(sys, qpos)
    qacc = engine.forward_dynamics(sys, fk, qvel, tau + t_lim, f_ext, GRAV,
                                   imp_damping=sys.damping + d_lim, h=H,
                                   imp_stiffness=k_lim)
    return engine.integrate(sys, qpos, qvel, qacc, H)


def _scalar_substep(consts, qpos, qvel, tau, dr=None):
    nqp, nqv, _, _ = sp.substep(
        consts, [qpos[i] for i in range(qpos.shape[0])],
        [qvel[i] for i in range(qvel.shape[0])],
        [tau[i] for i in range(tau.shape[0])],
        None, None, None, tuple(np.asarray(GRAV).tolist()), H,
        CP.stiffness, CP.damping, CP.friction_vel,
        beta=CP.beta, max_depen_vel=CP.max_depen_vel, hc_vel=CP.hc_vel,
        dr=dr)
    return jnp.stack(nqp), jnp.stack(nqv)


def _state(sys, model):
    qpos = jnp.asarray(np.concatenate([[0.2, -0.1, 0.42], [0, 0, 0, 1.0],
                                       np.asarray(model.init_hinge)]),
                       jnp.float32)
    rng = np.random.RandomState(3)
    qvel = jnp.asarray(0.4 * rng.randn(sys.nv), jnp.float32)
    tau = jnp.asarray(rng.uniform(-10, 10, sys.nj), jnp.float32)
    return qpos, qvel, tau


def test_tiny_scalar_matches_engine(ant_model):
    """One ant, one substep, feet in plane contact, joint limits loaded:
    the scalar-form kernel math must agree with the array engine to f32
    reassociation tolerance - EAGER, runs in the default suite."""
    sys = ant_model.system
    consts = sp.bake_consts(sys)
    qpos, qvel, tau = _state(sys, ant_model)
    qp_e, qv_e = _engine_substep(sys, qpos, qvel, tau)
    qp_s, qv_s = _scalar_substep(consts, qpos, qvel, tau)
    np.testing.assert_allclose(np.asarray(qp_s), np.asarray(qp_e),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qv_s), np.asarray(qv_e),
                               rtol=2e-4, atol=2e-4)


def test_tiny_scalar_matches_engine_with_dr(ant_model):
    """Same check with the DR operand live (randomized mass/damping/armature/
    limits enter the scalar substep as batched inputs, the engine via
    DrSample.apply) - guards the fused kernel's DR path by default
    (test_pallas_substep.py's DR case is opt-in)."""
    from massive_marl_tpu.phys import dr as drmod
    sys = ant_model.system
    consts = sp.bake_consts(sys)
    qpos, qvel, tau = _state(sys, ant_model)
    spec = {"rigid_body_properties": {"mass": {"range": [0.7, 1.3],
                                               "operation": "scaling"}},
            "dof_properties": {
                "damping": {"range": [0.5, 1.5], "operation": "scaling"},
                "stiffness": {"range": [0.8, 1.2], "operation": "scaling",
                              "maps_to": "armature"},
                "lower": {"range": [-0.05, 0.05], "operation": "additive",
                          "distribution": "gaussian"},
                "upper": {"range": [-0.05, 0.05], "operation": "additive",
                          "distribution": "gaussian"}}}
    sample = drmod.sample_dr(sys, jax.random.PRNGKey(11), spec)
    sys_dr = sample.apply(sys)
    qp_e, qv_e = _engine_substep(sys_dr, qpos, qvel, tau)
    dr_operand = {
        "mass": [sample.mass[i] for i in range(sys.nb)],
        "damping": [sample.damping[i] for i in range(sys.nj)],
        "armature": [sample.armature[i] for i in range(sys.nj)],
        "jnt_lo": [sample.jnt_lo[i] for i in range(sys.nj)],
        "jnt_hi": [sample.jnt_hi[i] for i in range(sys.nj)],
    }
    qp_s, qv_s = _scalar_substep(consts, qpos, qvel, tau, dr=dr_operand)
    np.testing.assert_allclose(np.asarray(qp_s), np.asarray(qp_e),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qv_s), np.asarray(qv_e),
                               rtol=2e-4, atol=2e-4)
