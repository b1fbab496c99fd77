"""Physics unit tests against analytic cases (SURVEY.md section 4, item 1).

Everything is jitted + lax.scan'd: per-op eager dispatch is slow on the tiny
CI host, and jit-first is how the engine is meant to be driven anyway.
"""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from massive_marl_tpu.phys import engine, mjcf

GRAV = jnp.array([0.0, 0.0, -9.81])


def make_free_box():
    return mjcf.make_box_system((0.5, 0.5, 0.5), density=1.0, friction=0.5)


def rollout_free(sys, qpos, qvel, dt, n, f_ext=None, gravity=GRAV):
    fe = [jnp.zeros(6)] * sys.nb if f_ext is None else f_ext

    def step(carry, _):
        qpos, qvel = carry
        fk = engine.fwd_kinematics(sys, qpos, qvel)
        qacc = engine.forward_dynamics(sys, fk, qvel, jnp.zeros(sys.nj), fe, gravity)
        return engine.integrate(sys, qpos, qvel, qacc, dt), None

    (qpos, qvel), _ = jax.lax.scan(step, (qpos, qvel), None, length=n)
    return qpos, qvel


def test_free_fall():
    sys = make_free_box()
    qpos = sys.init_qpos(jnp.array([0.0, 0.0, 10.0]))
    qvel = jnp.zeros(6)
    dt = 0.01
    n = 100
    qpos, qvel = jax.jit(rollout_free, static_argnums=(4,))(sys, qpos, qvel, dt, n)
    # symplectic Euler free fall: z = z0 - g*dt^2*(n(n+1)/2)
    z_expect = 10.0 - 9.81 * dt * dt * (n * (n + 1) / 2)
    assert abs(float(qpos[2]) - z_expect) < 1e-3
    assert abs(float(qvel[2]) + 9.81 * 1.0) < 1e-3


def test_force_and_torque():
    sys = make_free_box()
    m = float(sys.mass[0])
    Izz = float(sys.inertia[0, 2, 2])
    qpos = sys.init_qpos(jnp.array([3.0, -2.0, 5.0]))  # away from origin
    qvel = jnp.zeros(6)
    # force through com + torque about z, in base-origin spatial coords
    F = jnp.array([m * 2.0, 0.0, 0.0])
    tau = jnp.array([0.0, 0.0, 1.0])
    f = [jnp.concatenate([tau, F])]
    qpos, qvel = jax.jit(rollout_free, static_argnums=(4,))(
        sys, qpos, qvel, 0.01, 1, f_ext=f, gravity=jnp.zeros(3))
    assert np.allclose(np.array(qvel[:3]), [0.02, 0.0, 0.0], atol=1e-5)
    assert np.allclose(np.array(qvel[3:6]), [0.0, 0.0, 0.01 / Izz], atol=1e-5)


def pendulum_system():
    """Unit-length arm on a y-axis hinge under a (welded) floating anchor."""
    xml = """
<mujoco model="pend">
  <compiler angle="degree" inertiafromgeom="true"/>
  <default><joint armature="0.0" damping="0.0" limited="false"/><geom density="1000"/></default>
  <worldbody>
    <body name="anchor" pos="0 0 0">
      <freejoint/>
      <geom type="sphere" size="0.01"/>
      <body name="arm" pos="0 0 0">
        <joint name="swing" type="hinge" axis="0 1 0" pos="0 0 0"/>
        <geom type="capsule" fromto="0 0 0 0 0 -1.0" size="0.02"/>
      </body>
    </body>
  </worldbody>
</mujoco>"""
    fd, path = tempfile.mkstemp(suffix=".xml")
    with os.fdopen(fd, "w") as f:
        f.write(xml)
    model = mjcf.parse_mjcf(path)
    os.unlink(path)
    return model.system


def test_pendulum_period_and_energy():
    sys = pendulum_system()
    qpos = sys.init_qpos(jnp.array([0.0, 0.0, 2.0]))
    qpos = qpos.at[7].set(0.3)  # initial swing angle
    qvel = jnp.zeros(sys.nv)
    dt = 0.001

    def step(carry, _):
        qpos, qvel = carry
        fk = engine.fwd_kinematics(sys, qpos, qvel)
        qacc = engine.forward_dynamics(sys, fk, qvel, jnp.zeros(sys.nj),
                                       [jnp.zeros(6)] * sys.nb, GRAV, fixed_base=True)
        (qpos2, qvel2) = engine.integrate(sys, qpos, qvel, qacc, dt)
        fk2 = engine.fwd_kinematics(sys, qpos2, qvel2)
        return (qpos2, qvel2), (qpos2[7], qvel2[6], fk2.com_w[1][2])

    @jax.jit
    def run(qpos, qvel):
        return jax.lax.scan(step, (qpos, qvel), None, length=3000)

    (qpos, qvel), (angles, rates, com_z) = run(qpos, qvel)
    angles, rates, com_z = np.array(angles), np.array(rates), np.array(com_z)

    m = float(sys.mass[1])
    d = abs(float(sys.com[1, 2]))
    I_arm = float(sys.inertia[1, 1, 1])
    I_pivot = I_arm + m * d * d

    energy = 0.5 * I_pivot * rates**2 + m * 9.81 * (com_z + 2.0)  # offset-free
    drift = abs(energy[-1] - energy[0])
    assert drift < 0.02 * abs(energy[0]) + 1e-3, f"energy drift {drift}"

    T_expect = 2 * np.pi * np.sqrt(I_pivot / (m * 9.81 * d))
    sgn = np.sign(angles)
    crossings = np.where((sgn[1:] < 0) & (sgn[:-1] >= 0))[0]
    assert len(crossings) >= 2
    T_meas = (crossings[1] - crossings[0]) * dt
    # 0.3 rad amplitude lengthens the period ~1.4%; allow 3%
    assert abs(T_meas - T_expect) / T_expect < 0.03, (T_meas, T_expect)


def test_ant_parses():
    model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
    sys = model.system
    assert sys.nb == 9
    assert sys.nj == 8
    assert sys.nv == 14
    assert sys.num_sensors == 4
    assert np.allclose(np.array(model.gear_dof), 15.0)
    r = np.array(sys.jnt_range) * 180 / np.pi
    assert np.allclose(r[0], [-40, 40], atol=1e-4)
    assert np.allclose(r[1], [30, 100], atol=1e-4)
    total = float(jnp.sum(sys.mass))
    assert 0.3 < total < 3.0


def test_ant_drop_settles_on_plane():
    model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
    sys = model.system
    qpos = sys.init_qpos(jnp.array([0.0, 0.0, 0.75]))
    qvel = jnp.zeros(sys.nv)
    dt = 1 / 480
    cp = engine.ContactParams()

    def step(carry, _):
        qpos, qvel = carry
        fk = engine.fwd_kinematics(sys, qpos, qvel)
        p_w, v_w, body = engine.points_world(sys, fk)
        # production path: implicit contact with the point effective mass
        pi = engine.point_inertia(sys, fk, p_w)
        f_pts = engine.contact_plane(p_w, v_w, sys.point_radius,
                                     sys.point_friction, cp, pi=pi, h=dt)
        f_ext = engine.accumulate_body_forces(sys, p_w, f_pts, fk.base)
        t_lim, d_lim, k_lim = engine.joint_limit_spring(sys, qpos)
        qacc = engine.forward_dynamics(sys, fk, qvel, t_lim, f_ext, GRAV,
                                       imp_damping=sys.damping + d_lim, h=dt,
                                       imp_stiffness=k_lim)
        qpos2, qvel2 = engine.integrate(sys, qpos, qvel, qacc, dt)
        return (qpos2, qvel2), qpos2[2]

    @jax.jit
    def run(qpos, qvel):
        return jax.lax.scan(step, (qpos, qvel), None, length=1440)

    (qpos, qvel), zs = run(qpos, qvel)
    zs = np.array(zs)
    # torso must settle at a standing height: above termination height 0.31
    # (cfg/TenAnt.yaml:51) and below start height.  MuJoCo ground truth for
    # this asset rests at z = 0.3612 (tests/test_mujoco_xval.py provenance).
    assert 0.31 < zs[-1] < 0.45, f"final z {zs[-1]}"
    assert abs(zs[-1] - zs[-60]) < 0.02
    assert np.isfinite(np.array(qpos)).all()
    assert np.isfinite(np.array(qvel)).all()
