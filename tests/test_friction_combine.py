"""Pairwise friction-combine semantics (VERDICT r3 missing item 1).

The reference zeroes only the BOX shape's material friction
(/root/reference/agents/tasks/ten_ant.py:548-550) and ships plane mu=1.0
(/root/reference/cfg/TenAnt.yaml:55-56); it never sets a PhysX combine mode,
so its sim uses PhysX's default eAVERAGE: box-ground mu ~0.5, ant-box
mu ~0.75, ant-ground mu ~1.25.  Rounds 1-3 combined multiplicatively
(box frictionless against everything).  The rule is now an explicit
AntSceneSpec.friction_combine option threaded through BOTH engine paths
(phys/engine.combine_mu for the array path, ops/scalar_phys._combine_mu_f
baked into the fused kernel); these tests pin the semantics and that the
option actually reaches the contact forces.  The default's justification is
the measured sensitivity study in BASELINE.md r4.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from massive_marl_tpu.envs.ant_scene import AntSceneSpec, AntSceneState, scene_step
from massive_marl_tpu.ops import scalar_phys as sp
from massive_marl_tpu.phys import engine, mjcf

ANT_MU, PLANE_MU, BOX_MU = 1.5, 1.0, 0.0  # the TenAnt scene's materials


@pytest.fixture(scope="module")
def ant_model():
    return mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))


def test_combine_mu_modes():
    """The four rules, and the pair-mu table they imply for TenAnt."""
    for f, a, b, want in [
        (engine.combine_mu, ANT_MU, PLANE_MU, {"multiply": 1.5, "average": 1.25,
                                               "max": 1.5, "min": 1.0}),
        (engine.combine_mu, ANT_MU, BOX_MU, {"multiply": 0.0, "average": 0.75,
                                             "max": 1.5, "min": 0.0}),
        (engine.combine_mu, BOX_MU, PLANE_MU, {"multiply": 0.0, "average": 0.5,
                                               "max": 1.0, "min": 0.0}),
    ]:
        for mode, w in want.items():
            assert float(f(a, b, mode)) == pytest.approx(w)
            assert sp._combine_mu_f(a, b, mode) == pytest.approx(w)
    with pytest.raises(ValueError):
        engine.combine_mu(1.0, 1.0, "geometric")
    with pytest.raises(ValueError):
        sp._combine_mu_f(1.0, 1.0, "geometric")


def _sliding_box_spec(ant_model, mode):
    """TenAnt-like scene: 1 ant parked far above (no contacts), the 28-mass
    box sliding on the ground - isolates the box-ground pair."""
    return AntSceneSpec(
        ant_sys=ant_model.system,
        box_sys=mjcf.make_box_system((0.5, 14.0, 0.5), density=1.0,
                                     friction=BOX_MU),
        box_half_extents=(0.5, 14.0, 0.5),
        num_ants=1, dt=0.0166, substeps=3,
        plane_friction=PLANE_MU, friction_combine=mode)


def _slide(spec, ant_model, steps=15, vx=2.0):
    sys = spec.ant_sys
    qpos = sys.init_qpos(jnp.array([0.0, 20.0, 50.0]))[None]  # parked high
    st = AntSceneState(
        ant_qpos=qpos, ant_qvel=jnp.zeros((1, sys.nv)),
        box_qpos=jnp.array([0.0, 0.0, 0.5, 0.0, 0.0, 0.0, 1.0]),
        box_qvel=jnp.zeros(6).at[0].set(vx),
        sensors=jnp.zeros((1, max(sys.num_sensors, 1), 6)))
    step = jax.jit(lambda s: scene_step(spec, s, jnp.zeros((1, sys.nj))))
    for _ in range(steps):
        st = step(st)
    return float(st.box_qvel[0])


def test_box_ground_pair_follows_combine_rule(ant_model):
    """The single most important contact in the benchmark (the 28-mass box on
    the plane): 'multiply' -> glides freely; 'average' -> Coulomb
    deceleration at ~mu g with mu = 0.5."""
    t = 15 * 0.0166  # short enough that the box is still sliding at the end
    vx_mult = _slide(_sliding_box_spec(ant_model, "multiply"), ant_model)
    vx_avg = _slide(_sliding_box_spec(ant_model, "average"), ant_model)
    assert vx_mult == pytest.approx(2.0, abs=0.02)         # frictionless glide
    dv = 2.0 - vx_avg
    assert dv == pytest.approx(0.5 * 9.81 * t, rel=0.15)   # ~mu g t


def test_ant_box_pair_follows_combine_rule(ant_model):
    """Ant standing on the box top with lateral velocity: under 'multiply'
    the pair is frictionless (box x-force ~0); under 'average' (mu=0.75)
    stiction drags the box.  One EAGER scalar substep (the fused kernel's
    math path), checking the box wrench the kernel returns."""
    sys = ant_model.system
    consts = sp.bake_consts(sys)
    he = (2.0, 14.0, 0.5)  # wide top face: every foot lands on the +z face
    bm = 8.0 * he[0] * he[1] * he[2]
    bI = np.diag([bm / 3.0 * (he[1] ** 2 + he[2] ** 2),
                  bm / 3.0 * (he[0] ** 2 + he[2] ** 2),
                  bm / 3.0 * (he[0] ** 2 + he[1] ** 2)])
    # lowest foot points sit 0.283 below the base at the init pose;
    # base 1.34 puts them ~0.02 into the box top (z=1.0, r=0.08)
    qpos = np.asarray(sys.init_qpos(jnp.array([0.0, 0.0, 1.34])))
    qvel = np.zeros(sys.nv)
    qvel[0] = 1.0  # lateral slide across the box top
    wrenches = {}
    for mode in ("multiply", "average"):
        _, _, wrench, _ = sp.substep(
            consts,
            [jnp.asarray(v) for v in qpos],
            [jnp.asarray(v) for v in qvel],
            [jnp.zeros(()) for _ in range(sys.nj)],
            [jnp.asarray(v) for v in [0.0, 0.0, 0.5, 0.0, 0.0, 0.0, 1.0]],
            [jnp.zeros(()) for _ in range(6)],
            he, (0.0, 0.0, -9.81), 0.0166 / 3,
            engine.ContactParams().stiffness, engine.ContactParams().damping,
            engine.ContactParams().friction_vel,
            friction_combine=mode,
            beta=engine.ContactParams().beta,
            hc_vel=engine.ContactParams().hc_vel,
            box_inv=(1.0 / bm, np.linalg.inv(bI).tolist()))
        wrenches[mode] = np.asarray([float(w) for w in wrench])
    # both modes: feet press down on the box (negative z force on the box)
    assert wrenches["multiply"][5] < -1.0
    assert wrenches["average"][5] < -1.0
    # tangential (x) force on the box only under 'average'
    assert abs(wrenches["multiply"][3]) < 1e-5
    assert abs(wrenches["average"][3]) > 0.5


def test_scalar_plane_combine_matches_engine(ant_model):
    """Non-trivial combine (average, plane mu 0.6) agrees between the array
    engine and the scalar kernel math - guards the new plumbing end-to-end
    on the ant-ground pair.  EAGER (default-suite cheap)."""
    sys = ant_model.system
    consts = sp.bake_consts(sys)
    h = 0.0166 / 3
    cp = engine.ContactParams()
    qpos = jnp.asarray(np.concatenate([[0.1, 0.0, 0.40], [0, 0, 0, 1.0],
                                       np.asarray(ant_model.init_hinge)]),
                       jnp.float32)
    rng = np.random.RandomState(5)
    qvel = jnp.asarray(0.5 * rng.randn(sys.nv), jnp.float32)
    tau = jnp.asarray(rng.uniform(-8, 8, sys.nj), jnp.float32)

    mu = engine.combine_mu(sys.point_friction, 0.6, "average")
    fk = engine.fwd_kinematics(sys, qpos, qvel)
    p_w, v_w, _ = engine.points_world(sys, fk)
    pi = engine.point_inertia(sys, fk, p_w)
    f_pts = engine.contact_plane(p_w, v_w, sys.point_radius, mu, cp, pi=pi, h=h)
    f_ext = engine.accumulate_body_forces(sys, p_w, f_pts, fk.base)
    t_lim, d_lim, k_lim = engine.joint_limit_spring(sys, qpos)
    qacc = engine.forward_dynamics(sys, fk, qvel, tau + t_lim, f_ext,
                                   jnp.array([0.0, 0.0, -9.81]),
                                   imp_damping=sys.damping + d_lim, h=h,
                                   imp_stiffness=k_lim)
    qp_e, qv_e = engine.integrate(sys, qpos, qvel, qacc, h)

    nqp, nqv, _, _ = sp.substep(
        consts, [qpos[i] for i in range(qpos.shape[0])],
        [qvel[i] for i in range(qvel.shape[0])],
        [tau[i] for i in range(tau.shape[0])],
        None, None, None, (0.0, 0.0, -9.81), h,
        cp.stiffness, cp.damping, cp.friction_vel,
        plane_friction=0.6, friction_combine="average",
        beta=cp.beta, max_depen_vel=cp.max_depen_vel, hc_vel=cp.hc_vel)
    np.testing.assert_allclose(np.asarray(jnp.stack(nqp)), np.asarray(qp_e),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jnp.stack(nqv)), np.asarray(qv_e),
                               rtol=2e-4, atol=2e-4)


def test_box_ground_override_reaches_contact(ant_model):
    """AntSceneSpec.box_ground_mu (r5 probe knob #2): 'average' combine with
    ONLY the box-ground pair forced to 0 must glide like 'multiply', and a
    forced non-zero mu must decelerate at ~mu g even under 'multiply'."""
    t = 15 * 0.0166
    spec0 = _sliding_box_spec(ant_model, "average")._replace(box_ground_mu=0.0)
    assert _slide(spec0, ant_model) == pytest.approx(2.0, abs=0.02)
    spec1 = _sliding_box_spec(ant_model, "multiply")._replace(box_ground_mu=0.5)
    dv = 2.0 - _slide(spec1, ant_model)
    assert dv == pytest.approx(0.5 * 9.81 * t, rel=0.15)


def test_box_ground_cfg_knob():
    """sim.box_ground_friction reaches the scene spec on both box tasks."""
    from massive_marl_tpu.envs.one_ant import OneAntEnv
    from massive_marl_tpu.envs.ten_ant import TenAntEnv
    for cls in (OneAntEnv, TenAntEnv):
        env = cls({"sim": {"box_ground_friction": 0.0,
                           "fused_kernel": False}})
        assert env.spec.box_ground_mu == 0.0
        env = cls({"sim": {"fused_kernel": False}})
        assert env.spec.box_ground_mu is None
