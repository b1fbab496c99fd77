"""Cross-engine validation of the ant articulated dynamics against MuJoCo
(SURVEY.md section 4.1: "MuJoCo reference trajectories for nv_ant.xml").

massive_marl_tpu/assets/ant.xml is a plain MJCF file, so MuJoCo loads the
IDENTICAL model our parser consumes: same bodies, joints (incl. the
non-normalized "-1 1 0" ankle axes), geoms, density-derived inertia,
armature and damping.  Contacts and joint limits are disabled on the MuJoCo
side and avoided on ours (the ant flies/falls far above the z=0 plane), so
the comparison isolates FK + CRBA + gravity/Coriolis + actuation +
semi-implicit Euler - the part of the engine that must be *exactly* right
for any contact model on top of it to mean anything.

These tests caught a real bug: the round-1 parser did not normalize joint
axes, doubling the ankle-axis inertia (|(-1,1,0)| = sqrt(2)) and skewing the
axis-angle rotation.  Post-fix agreement: mass matrix to ~2e-7, qacc to
~1e-4 absolute (values O(100)), 200-substep torque-driven trajectories to
~2e-6.
"""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from massive_marl_tpu.phys import engine, mjcf

H = 1e-3
GRAVITY = jnp.array([0.0, 0.0, -9.81])


@pytest.fixture(scope="module")
def ant():
    model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
    m = mujoco.MjModel.from_xml_path(mjcf.asset_path("ant.xml"))
    m.opt.disableflags |= (mujoco.mjtDisableBit.mjDSBL_LIMIT
                           | mujoco.mjtDisableBit.mjDSBL_CONTACT)
    m.opt.timestep = H
    m.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    return model.system, m


def _our_substep(sys, qpos, qvel, tau, with_damping=True):
    fk = engine.fwd_kinematics(sys, qpos, qvel)
    t = tau - sys.damping * qvel[6:] if with_damping else tau
    f_ext = [jnp.zeros(6)] * sys.nb
    qacc = engine.forward_dynamics(sys, fk, qvel, t, f_ext, GRAVITY)
    return engine.integrate(sys, qpos, qvel, qacc, H)


def test_mass_properties_match_mujoco(ant):
    sys, m = ant
    np.testing.assert_allclose(np.asarray(sys.mass), m.body_mass[1:], rtol=1e-5)
    # inertia tensors agree up to principal-frame choice: compare eigenvalues
    for b in range(sys.nb):
        ours = np.sort(np.linalg.eigvalsh(np.asarray(sys.inertia)[b]))
        theirs = np.sort(m.body_inertia[1 + b])
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sys.com), m.body_ipos[1:], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sys.armature), m.dof_armature[6:], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sys.damping), m.dof_damping[6:], rtol=1e-6)


def test_mass_matrix_matches_mujoco(ant):
    """CRBA M(q) vs mj_fullM at a random articulated configuration.  Probed
    through forward_dynamics (unit generalized forces, zero gravity), so the
    unrolled Cholesky solve is validated too."""
    sys, m = ant
    nj, nv = sys.nj, 6 + sys.nj
    rng = np.random.default_rng(0)
    hinge = rng.uniform(-0.3, 0.3, nj)

    d = mujoco.MjData(m)
    d.qpos[:] = 0
    d.qpos[2] = 5.0
    d.qpos[3] = 1.0          # identity quat (wxyz) - world frame == body frame
    d.qpos[7:] = hinge
    mujoco.mj_forward(m, d)
    M_mj = np.zeros((nv, nv))
    mujoco.mj_fullM(m, d, M_mj)

    qpos = jnp.concatenate([jnp.array([0.0, 0.0, 5.0]),
                            jnp.array([0.0, 0.0, 0.0, 1.0]),
                            jnp.asarray(hinge, jnp.float32)])
    qvel = jnp.zeros(nv)
    fk = engine.fwd_kinematics(sys, qpos, qvel)
    zerog = jnp.zeros(3)
    A = np.zeros((nv, nv))
    for i in range(nv):
        tau = jnp.zeros(nj)
        fe = [jnp.zeros(6) for _ in range(sys.nb)]
        if i < 3:        # unit world force at the base origin
            fe[0] = jnp.zeros(6).at[3 + i].set(1.0)
        elif i < 6:      # unit world torque
            fe[0] = jnp.zeros(6).at[i - 3].set(1.0)
        else:
            tau = tau.at[i - 6].set(1.0)
        A[:, i] = np.asarray(engine.forward_dynamics(sys, fk, qvel, tau, fe, zerog))
    M_ours = np.linalg.inv(A)
    np.testing.assert_allclose(M_ours, M_mj, atol=5e-6)


def test_qacc_matches_mujoco_with_velocity_and_damping(ant):
    """Instantaneous qacc under gravity + torques + damping + Coriolis at a
    moving articulated state (identity base quat keeps MuJoCo's body-frame
    angular dofs aligned with our world-frame ones)."""
    sys, m = ant
    nj, nv = sys.nj, 6 + sys.nj
    rng = np.random.default_rng(1)
    hinge = rng.uniform(-0.3, 0.3, nj)
    qd = rng.uniform(-1.0, 1.0, nv)
    tau = rng.uniform(-5.0, 5.0, nj)

    d = mujoco.MjData(m)
    d.qpos[:] = 0
    d.qpos[2] = 5.0
    d.qpos[3] = 1.0
    d.qpos[7:] = hinge
    d.qvel[:] = qd
    d.qfrc_applied[:] = 0
    d.qfrc_applied[6:] = tau
    mujoco.mj_forward(m, d)
    mj_qacc = d.qacc.copy()

    qpos = jnp.concatenate([jnp.array([0.0, 0.0, 5.0]),
                            jnp.array([0.0, 0.0, 0.0, 1.0]),
                            jnp.asarray(hinge, jnp.float32)])
    qvel = jnp.asarray(qd, jnp.float32)
    fk = engine.fwd_kinematics(sys, qpos, qvel)
    t = jnp.asarray(tau, jnp.float32) - sys.damping * qvel[6:]
    f_ext = [jnp.zeros(6)] * sys.nb
    qacc = np.asarray(engine.forward_dynamics(sys, fk, qvel, t, f_ext, GRAVITY))
    scale = np.maximum(np.abs(mj_qacc), 1.0)
    np.testing.assert_allclose(qacc / scale, mj_qacc / scale, atol=2e-3)


def test_torque_driven_trajectory_matches_mujoco(ant):
    """200 semi-implicit-Euler substeps under sinusoidal joint torques and
    gravity: base position, orientation and all 8 hinge trajectories must
    track MuJoCo (damping zeroed on both sides - MuJoCo's Euler integrates
    joint damping implicitly, which would otherwise inject an O(h*d)
    integrator difference unrelated to the dynamics)."""
    sys, m = ant
    nj = sys.nj
    sysz = sys.replace(damping=jnp.zeros(nj))
    m.dof_damping[:] = 0.0
    hinge0 = np.array([0.1, 1.0, -0.1, -1.0, 0.15, -1.1, -0.15, 1.1])
    T = 200
    tau_fn = lambda i: 3.0 * np.sin(2 * np.pi * 1.5 * i * H + np.arange(nj))

    d = mujoco.MjData(m)
    d.qpos[:] = 0
    d.qpos[2] = 5.0
    d.qpos[3] = 1.0
    d.qpos[7:] = hinge0
    d.qvel[:] = 0
    mj_qpos = []
    for i in range(T):
        d.qfrc_applied[:] = 0
        d.qfrc_applied[6:] = tau_fn(i)
        mujoco.mj_step(m, d)
        mj_qpos.append(d.qpos.copy())
    mj_qpos = np.array(mj_qpos)

    step = jax.jit(lambda q, v, t: _our_substep(sysz, q, v, t, with_damping=False))
    qpos = jnp.concatenate([jnp.array([0.0, 0.0, 5.0]),
                            jnp.array([0.0, 0.0, 0.0, 1.0]),
                            jnp.asarray(hinge0, jnp.float32)])
    qvel = jnp.zeros(6 + nj)
    ours = []
    for i in range(T):
        qpos, qvel = step(qpos, qvel, jnp.asarray(tau_fn(i), jnp.float32))
        ours.append(np.asarray(qpos))
    ours = np.array(ours)

    np.testing.assert_allclose(ours[:, :3], mj_qpos[:, :3], atol=1e-4)      # base pos
    mj_quat_xyzw = mj_qpos[:, 3:7][:, [1, 2, 3, 0]]
    # quats agree up to global sign
    dq = np.minimum(np.abs(ours[:, 3:7] - mj_quat_xyzw).max(axis=1),
                    np.abs(ours[:, 3:7] + mj_quat_xyzw).max(axis=1))
    assert dq.max() < 1e-4, dq.max()
    np.testing.assert_allclose(ours[:, 7:], mj_qpos[:, 7:], atol=1e-4)      # hinges


def test_energy_drift_bounded(ant):
    """Total mechanical energy (incl. armature rotor KE) drifts < 0.2%
    over 300 undamped substeps with the ant tumbling under gravity."""
    sys, _ = ant
    nj = sys.nj
    sysz = sys.replace(damping=jnp.zeros(nj))

    def energy(qpos, qvel):
        fk = engine.fwd_kinematics(sysz, qpos, qvel)
        ke, pe = 0.0, 0.0
        for b in range(sysz.nb):
            w, vo = fk.v[b][0:3], fk.v[b][3:6]
            vcom = vo + jnp.cross(w, fk.com_w[b] - fk.base)
            Iw = engine.mm(engine.mm(fk.R[b], sysz.inertia[b]),
                           jnp.swapaxes(fk.R[b], -1, -2))
            ke = ke + 0.5 * sysz.mass[b] * jnp.sum(vcom**2) + 0.5 * jnp.dot(w, Iw @ w)
            pe = pe + sysz.mass[b] * 9.81 * fk.com_w[b][2]
        return ke + pe + 0.5 * jnp.sum(sysz.armature * qvel[6:] ** 2)

    hinge0 = np.array([0.1, 1.0, -0.1, -1.0, 0.15, -1.1, -0.15, 1.1])
    qpos = jnp.concatenate([jnp.array([0.0, 0.0, 5.0]),
                            jnp.array([0.0, 0.0, 0.0, 1.0]),
                            jnp.asarray(hinge0, jnp.float32)])
    qvel = jnp.zeros(6 + nj).at[3].set(1.0).at[6:].set(0.5)
    e0 = float(energy(qpos, qvel))
    step = jax.jit(lambda q, v: _our_substep(sysz, q, v, jnp.zeros(nj),
                                             with_damping=False))
    for _ in range(300):
        qpos, qvel = step(qpos, qvel)
    e1 = float(energy(qpos, qvel))
    assert abs(e1 - e0) / abs(e0) < 2e-3, (e0, e1)
