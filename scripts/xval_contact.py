"""Diagnostic: our contact model vs MuJoCo, contacts + joint limits ENABLED.

Scenarios (VERDICT r2 next-round item 1):
  drop    - ant released above the plane, zero torque: torso z(t) through the
            landing transient, dip depth, rest height.
  stiction- settled ant under constant sub-slip hip torques: foot contact
            points must not creep tangentially.
  push    - ant shoves a frictionless box with scripted ankle torques: box
            displacement/velocity (engine.contact_box vs MuJoCo box).

Run: JAX_PLATFORMS=cpu python scripts/xval_contact.py [drop|stiction|push|all]
Prints per-scenario error metrics; the pytest versions live in
tests/test_mujoco_xval_contact.py with frozen tolerances.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import mujoco
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from massive_marl_tpu.phys import engine, mjcf

H_MJ = 1e-3


def mj_ant_with_plane(extra_xml: str = "", plane_friction="1.5 0.1 0.1"):
    """MuJoCo model of the IDENTICAL shipped ant.xml plus a ground plane
    (friction set so MuJoCo's max-combine matches our multiplicative
    point_friction * plane_friction = 1.5)."""
    xml = open(mjcf.asset_path("ant.xml")).read()
    plane = f'<geom name="floor" type="plane" size="40 40 1" friction="{plane_friction}"/>'
    xml = xml.replace("<worldbody>", "<worldbody>" + plane + extra_xml)
    m = mujoco.MjModel.from_xml_string(xml)
    m.opt.timestep = H_MJ
    m.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    return m


def our_scene(substeps, dt=0.0166, box=None, cp=None):
    from massive_marl_tpu.envs.ant_scene import AntSceneSpec, AntSceneState
    model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
    # friction_combine pinned to 'multiply': these scenes validate the
    # CONTACT MODEL against MuJoCo companions whose pair frictions are
    # constructed to equal the multiplicative values (ant-ground 1.5 via
    # MuJoCo max-combine, frictionless box via priority=2); the scene
    # DEFAULT elsewhere is 'average' (BASELINE.md r4 friction-combine study)
    spec = AntSceneSpec(
        ant_sys=model.system,
        box_sys=mjcf.make_box_system(box, density=1.0, friction=0.0) if box else None,
        box_half_extents=box,
        num_ants=1, dt=dt, substeps=substeps, friction_combine="multiply",
        **({"contact": cp} if cp is not None else {}))
    return model, spec


def run_ours(spec, model, z0, T_ctrl, tau_fn=None, box_start=None):
    """Step our scene; returns times, torso z, qpos history, box qpos history."""
    from massive_marl_tpu.envs.ant_scene import AntSceneState, scene_step
    sys = spec.ant_sys
    hinge = jnp.asarray(model.init_hinge)
    qpos = jnp.concatenate([jnp.array([0.0, 0.0, z0]),
                            jnp.array([0.0, 0.0, 0.0, 1.0]), hinge])[None]
    state = AntSceneState(
        ant_qpos=qpos, ant_qvel=jnp.zeros((1, sys.nv)),
        box_qpos=(jnp.concatenate([jnp.asarray(box_start), jnp.array([0., 0., 0., 1.])])
                  if box_start is not None else jnp.zeros(7).at[6].set(1.0)),
        box_qvel=jnp.zeros(6),
        sensors=jnp.zeros((1, max(sys.num_sensors, 1), 6)))
    step = jax.jit(lambda s, tau: scene_step(spec, s, tau))
    hist, bhist = [], []
    for i in range(T_ctrl):
        tau = jnp.zeros((1, sys.nj)) if tau_fn is None else jnp.asarray(tau_fn(i))[None]
        # actions enter as torque/gear since scene_step multiplies by gear
        state = step(state, tau / sys.gear)
        hist.append(np.asarray(state.ant_qpos[0]))
        bhist.append(np.asarray(state.box_qpos))
    return np.array(hist), np.array(bhist)


def run_mj(m, z0, T, tau_fn=None, nq_extra=0):
    """MuJoCo trajectory. Returns (ant qpos hist [T, nq_ant], full qpos hist)."""
    d = mujoco.MjData(m)
    mujoco.mj_resetData(m, d)   # qpos0: keeps any injected box at ITS pose
    # find ant joint addresses by name (the injected box's free joint comes
    # first in qpos; never zero it - an all-zero quat explodes the sim)
    root_adr = m.jnt_qposadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "root")]
    root_dof = m.jnt_dofadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "root")]
    hinge_names = [mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_JOINT, j)
                   for j in range(m.njnt)]
    hinge_ids = [j for j in range(m.njnt)
                 if m.jnt_type[j] == mujoco.mjtJoint.mjJNT_HINGE]
    d.qpos[root_adr:root_adr + 3] = [0, 0, z0]
    d.qpos[root_adr + 3] = 1.0
    for j in hinge_ids:
        lo, hi = m.jnt_range[j]
        d.qpos[m.jnt_qposadr[j]] = np.clip(0.0, lo, hi)
    hist = []
    full = []
    for i in range(T):
        d.qfrc_applied[:] = 0
        if tau_fn is not None:
            tau = tau_fn(i)
            for k, j in enumerate(hinge_ids):
                d.qfrc_applied[m.jnt_dofadr[j]] = tau[k]
        mujoco.mj_step(m, d)
        q = np.concatenate([d.qpos[root_adr:root_adr + 3],
                            d.qpos[root_adr + 3:root_adr + 7][[1, 2, 3, 0]],
                            [d.qpos[m.jnt_qposadr[j]] for j in hinge_ids]])
        hist.append(q)
        full.append(d.qpos.copy())
    return np.array(hist), np.array(full)


def scenario_drop(substeps=3, cp=None):
    T_s = 2.5
    model, spec = our_scene(substeps, cp=cp)
    h_ctrl = spec.dt
    ours, _ = run_ours(spec, model, 1.0, int(T_s / h_ctrl))
    m = mj_ant_with_plane()
    mj, _ = run_mj(m, 1.0, int(T_s / H_MJ))
    # both histories record the state AFTER step i+1: align at (i+1)*h
    t_o = np.arange(1, len(ours) + 1) * h_ctrl
    t_m = np.arange(1, len(mj) + 1) * H_MJ
    z_o, z_m = ours[:, 2], mj[:, 2]
    # resample MuJoCo z onto our control grid
    z_m_i = np.interp(t_o, t_m, z_m)
    dip_o, dip_m = z_o.min(), z_m.min()
    rest_o, rest_m = z_o[-30:].mean(), z_m_i[-30:].mean()
    # transient window: from 90% fall to 0.8 s
    land = np.argmax(z_o < 0.55)
    win = slice(max(land - 3, 0), int(0.9 / h_ctrl))
    traj_err = np.abs(z_o[win] - z_m_i[win]).max()
    print(f"[drop s={substeps}] dip ours {dip_o:.4f} mj {dip_m:.4f} "
          f"({100 * abs(dip_o - dip_m) / dip_m:.2f}%)  "
          f"rest ours {rest_o:.4f} mj {rest_m:.4f} "
          f"({100 * abs(rest_o - rest_m) / rest_m:.2f}%)  "
          f"transient max|dz| {traj_err:.4f}")
    # hinge trajectory error too (ankles hit the limits on landing)
    hj_o = ours[:, 7:]
    hj_m = np.stack([np.interp(t_o, t_m, mj[:, 7 + k]) for k in range(8)], 1)
    print(f"           hinge max|dq| {np.abs(hj_o - hj_m)[win].max():.4f} rad; "
          f"final hinge err {np.abs(hj_o[-1] - hj_m[-1]).max():.4f}")
    return dict(dip=(dip_o, dip_m), rest=(rest_o, rest_m), traj=traj_err)


def scenario_stiction(substeps=3, tau_mag=4.0):
    """Settle 1.2 s, then 1.3 s of constant hip torques (sub-slip): compare
    torso xy drift and foot creep."""
    model, spec = our_scene(substeps)
    h_ctrl = spec.dt
    T1, T2 = int(1.2 / h_ctrl), int(2.5 / h_ctrl)
    tau = np.zeros(8)
    tau[[0, 2, 4, 6]] = tau_mag  # hip torques, all same sign (yaw twist)

    def tau_fn(i):
        return tau if i >= T1 else np.zeros(8)

    ours, _ = run_ours(spec, model, 1.0, T2, tau_fn)
    m = mj_ant_with_plane()
    T1m, T2m = int(1.2 / H_MJ), int(2.5 / H_MJ)
    mj, _ = run_mj(m, 1.0, T2m, lambda i: tau if i >= T1m else np.zeros(8))
    dxy_o = np.linalg.norm(ours[-1, :2] - ours[T1, :2])
    dxy_m = np.linalg.norm(mj[-1, :2] - mj[T1m, :2])
    # yaw change of the torso (stiction should hold it nearly fixed)
    def yaw(q):  # xyzw
        x, y, z, w = q
        return np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    dyaw_o = yaw(ours[-1, 3:7]) - yaw(ours[T1, 3:7])
    dyaw_m = yaw(mj[-1, 3:7]) - yaw(mj[T1m, 3:7])
    print(f"[stiction s={substeps}] torso xy drift ours {dxy_o:.4f} mj {dxy_m:.4f}; "
          f"yaw drift ours {np.degrees(dyaw_o):.3f} deg mj {np.degrees(dyaw_m):.3f} deg")
    return dict(dxy=(dxy_o, dxy_m), dyaw=(dyaw_o, dyaw_m))


def scenario_push(substeps=3):
    """Ant dropped ONTO the frictionless 1x1x1 box (engine.contact_box is
    the force path every benchmark reward depends on): the ant lands on the
    box top, the box carries its weight down to the plane.  Deterministic -
    unlike a multi-second flailing push, which diverges chaotically on a
    frictionless plane.  Compare the torso z(t) landing trajectory ON the
    box, the rest height, and the box's displacement (near zero both sides:
    symmetric landing, frictionless contacts)."""
    # condim=1: a zero-friction contact with MuJoCo's default condim=3
    # friction cone is degenerate and explodes the solver (observed: the
    # box launched at 29 m/s); frictionless contacts are normal-only.
    # 2x2x1 box: the settled ant's feet span ~+-0.74 m, so a 1x1 box top
    # would leave them overhanging the edges - the benchmark pushes the box
    # SIDES; this validates the same contact_box force path under load with
    # the full stance supported
    box_he = (1.0, 1.0, 0.5)
    box_xml = ('<body name="pushbox" pos="0 0 0.5">'
               '<freejoint name="boxroot"/>'
               '<geom name="boxgeom" type="box" size="1.0 1.0 0.5" condim="1" '
               'friction="0 0 0" priority="2" density="1.0"/></body>')
    model, spec = our_scene(substeps, box=box_he)
    h_ctrl = spec.dt
    T_s = 2.5
    ours, box_o = run_ours(spec, model, 2.0, int(T_s / h_ctrl),
                           box_start=np.array([0.0, 0.0, 0.5]))
    m = mj_ant_with_plane(extra_xml=box_xml)
    mj, full = run_mj(m, 2.0, int(T_s / H_MJ))
    badr = m.jnt_qposadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "boxroot")]
    box_m = full[:, badr:badr + 3]
    t_o = np.arange(1, len(ours) + 1) * h_ctrl
    t_m = np.arange(1, len(mj) + 1) * H_MJ
    z_o, z_m = ours[:, 2], np.interp(t_o, t_m, mj[:, 2])
    dip_o, dip_m = z_o.min(), mj[:, 2].min()
    rest_o, rest_m = z_o[-30:].mean(), z_m[-30:].mean()
    dxy_o = np.linalg.norm(box_o[-1, :2])
    dxy_m = np.linalg.norm(box_m[-1, :2])
    print(f"[push s={substeps}] ON-BOX dip ours {dip_o:.4f} mj {dip_m:.4f} "
          f"({100 * abs(dip_o - dip_m) / dip_m:.2f}%)  rest ours {rest_o:.4f} "
          f"mj {rest_m:.4f} ({100 * abs(rest_o - rest_m) / rest_m:.2f}%)  "
          f"box |dxy| ours {dxy_o:.4f} mj {dxy_m:.4f}  "
          f"box z ours {box_o[-1, 2]:.4f} mj {box_m[-1, 2]:.4f}")
    return dict(dip=(dip_o, dip_m), rest=(rest_o, rest_m),
                box_dxy=(dxy_o, dxy_m), box_z=(box_o[-1, 2], box_m[-1, 2]))


def _dup_ant_xml(xml: str, suffix: str, pos: str) -> str:
    """The torso body subtree with every name suffixed and a new spawn pos
    (MuJoCo needs unique joint/geom names per ant)."""
    import re
    start = xml.index('<body name="torso"')
    depth, i = 0, start
    while True:
        m = re.compile(r"<body\b|</body>").search(xml, i)
        depth += 1 if xml[m.start()] == "<" and xml[m.start():m.start()+5] == "<body" else -1
        i = m.end()
        if depth == 0:
            break
    block = xml[start:i]
    block = re.sub(r'name="([^"]+)"', rf'name="\1{suffix}"', block)
    block = block.replace('pos="0 0 0.75"', f'pos="{pos}"', 1)
    return block


def mj_multi_ant_box(ant_poses, box_xml: str):
    """MuJoCo model: N copies of the shipped ant + ground plane + box."""
    xml = open(mjcf.asset_path("ant.xml")).read()
    plane = '<geom name="floor" type="plane" size="60 60 1" friction="1.5 0.1 0.1"/>'
    bodies = "".join(_dup_ant_xml(xml, f"_{k}", p)
                     for k, p in enumerate(ant_poses))
    start = xml.index('<body name="torso"')
    import re
    depth, i = 0, start
    while True:
        m = re.compile(r"<body\b|</body>").search(xml, i)
        depth += 1 if xml[m.start():m.start()+5] == "<body" else -1
        i = m.end()
        if depth == 0:
            break
    xml = xml[:start] + plane + box_xml + bodies + xml[i:]
    # drop the actuator block: it references the (replaced) single ant's
    # joint names, and the multi-ant scenarios apply zero torques anyway
    import re as _re
    xml = _re.sub(r"<actuator>.*?</actuator>", "", xml, flags=_re.S)
    m = mujoco.MjModel.from_xml_string(xml)
    m.opt.timestep = H_MJ
    m.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    return m


def scenario_multi_push(substeps=3, n_ants=2, vx=-2.0, T_s=1.5, cp=None):
    """TWO ants thrown at the long box's side face (the TenAnt interaction:
    multiple ants transferring momentum into the 28-mass box, which then
    slides on the plane) - deterministic: ballistic flight, side impact,
    frictionless box contacts in BOTH engines (our 'multiply' combine; the
    MuJoCo box geom carries priority=2 friction=0, which wins the MuJoCo
    combine).  Compares the box x(t) trajectory and final velocity.

    VERDICT r3 item 5a: the r3 xval scenarios were single-ant; this is the
    first multi-ant + box scene validated against MuJoCo."""
    he = (0.5, 14.0, 0.5)
    box_xml = ('<body name="pushbox" pos="0 0 0.5">'
               '<freejoint name="boxroot"/>'
               '<geom name="boxgeom" type="box" size="0.5 14.0 0.5" condim="1" '
               'friction="0 0 0" priority="2" density="1.0"/></body>')
    ys = np.linspace(-2.0, 2.0, n_ants)
    x0, z0 = 1.45, 0.6

    # ---- ours ----
    from massive_marl_tpu.envs.ant_scene import AntSceneSpec, AntSceneState, scene_step
    model = mjcf.parse_mjcf(mjcf.asset_path("ant.xml"))
    sys_ = model.system
    spec = AntSceneSpec(
        ant_sys=sys_, box_sys=mjcf.make_box_system(he, density=1.0, friction=0.0),
        box_half_extents=he, num_ants=n_ants, dt=0.0166, substeps=substeps,
        friction_combine="multiply",  # matches the MuJoCo scene's pair mus
        **({"contact": cp} if cp is not None else {}))
    qpos = jax.vmap(lambda y: sys_.init_qpos(jnp.array([x0, y, z0])))(jnp.asarray(ys))
    qvel = jnp.zeros((n_ants, sys_.nv)).at[:, 0].set(vx)
    st = AntSceneState(ant_qpos=qpos, ant_qvel=qvel,
                       box_qpos=jnp.array([0.0, 0.0, 0.5, 0.0, 0.0, 0.0, 1.0]),
                       box_qvel=jnp.zeros(6),
                       sensors=jnp.zeros((n_ants, max(sys_.num_sensors, 1), 6)))
    step = jax.jit(lambda s: scene_step(spec, s, jnp.zeros((n_ants, sys_.nj))))
    T_ctrl = int(T_s / spec.dt)
    box_o = []
    for _ in range(T_ctrl):
        st = step(st)
        box_o.append(np.asarray(st.box_qpos[0:3]))
    box_o = np.array(box_o)
    vx_o = float(st.box_qvel[0])

    # ---- MuJoCo ----
    m = mj_multi_ant_box([f"{x0} {y} {z0}" for y in ys], box_xml)
    d = mujoco.MjData(m)
    mujoco.mj_resetData(m, d)
    for k in range(n_ants):
        jid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, f"root_{k}")
        qadr, dadr = m.jnt_qposadr[jid], m.jnt_dofadr[jid]
        d.qpos[qadr:qadr + 3] = [x0, ys[k], z0]
        d.qpos[qadr + 3:qadr + 7] = [1, 0, 0, 0]
        d.qvel[dadr] = vx
    for j in range(m.njnt):
        if m.jnt_type[j] == mujoco.mjtJoint.mjJNT_HINGE:
            lo, hi = m.jnt_range[j]
            d.qpos[m.jnt_qposadr[j]] = np.clip(0.0, lo, hi)
    badr = m.jnt_qposadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "boxroot")]
    bdadr = m.jnt_dofadr[mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "boxroot")]
    T_mj = int(T_s / H_MJ)
    box_m = []
    for _ in range(T_mj):
        mujoco.mj_step(m, d)
        box_m.append(d.qpos[badr:badr + 3].copy())
    box_m = np.array(box_m)
    vx_m = float(d.qvel[bdadr])

    t_o = np.arange(1, T_ctrl + 1) * spec.dt
    t_m = np.arange(1, T_mj + 1) * H_MJ
    x_m_i = np.interp(t_o, t_m, box_m[:, 0])
    traj_err = np.abs(box_o[:, 0] - x_m_i).max()
    print(f"[multi_push s={substeps}] box dx ours {box_o[-1,0]:+.4f} "
          f"mj {box_m[-1,0]:+.4f}  final vx ours {vx_o:+.4f} mj {vx_m:+.4f}  "
          f"max|x err| {traj_err:.4f}  box z ours {box_o[-1,2]:.4f} "
          f"mj {box_m[-1,2]:.4f}")
    return dict(dx=(float(box_o[-1, 0]), float(box_m[-1, 0])),
                vx=(vx_o, vx_m), traj=float(traj_err),
                z=(float(box_o[-1, 2]), float(box_m[-1, 2])))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("drop", "all"):
        scenario_drop()
    if which in ("stiction", "all"):
        scenario_stiction()
    if which == "stiction_low":
        scenario_stiction(tau_mag=1.5)
    if which in ("push", "all"):
        scenario_push()
    if which in ("multi_push", "all"):
        scenario_multi_push()
