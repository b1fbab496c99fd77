"""Minimal MJCF parser producing a `System`.

Covers the subset used by the reference assets
(/root/reference/assets/mjcf/open_ai_assets/ant/nv_ant.xml,
 ingenuity/ingenuity.xml): nested <body> trees, <freejoint>/hinge <joint>,
sphere/capsule/box/cylinder <geom> (with fromto), <default> for joint/geom,
degree angles, density-derived inertia, and <actuator><motor gear=...>.

This replaces `gym.load_asset` (reference ten_ant.py:258-279).
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np

from .system import (
    BOX,
    CAPSULE,
    CYLINDER,
    SPHERE,
    GeomSpec,
    System,
    build_body_inertia,
    make_contact_points,
)

_GEOM_TYPES = {"sphere": SPHERE, "capsule": CAPSULE, "box": BOX, "cylinder": CYLINDER, "plane": -1, "mesh": -2}


def _fvec(s, n=None):
    v = np.array([float(x) for x in s.split()])
    if n is not None:
        assert len(v) == n, s
    return v


def _axis_to_quat(axis):
    """xyzw quat rotating +z onto `axis`."""
    axis = axis / np.linalg.norm(axis)
    z = np.array([0.0, 0.0, 1.0])
    c = float(np.dot(z, axis))
    if c > 1 - 1e-8:
        return np.array([0.0, 0.0, 0.0, 1.0])
    if c < -1 + 1e-8:
        return np.array([1.0, 0.0, 0.0, 0.0])  # 180 deg about x
    cr = np.cross(z, axis)
    s = np.linalg.norm(cr)
    half = np.arctan2(s, c) / 2.0
    u = cr / s
    return np.array([*(u * np.sin(half)), np.cos(half)])


def _mj_quat_to_xyzw(q):
    """MJCF stores quats wxyz."""
    w, x, y, z = q
    return np.array([x, y, z, w])


class MjcfModel:
    """Parsed MJCF: a System plus actuator/limit metadata."""

    def __init__(self, system: System, gear_dof: np.ndarray, dof_limits: np.ndarray,
                 foot_body_ids, init_hinge: np.ndarray):
        self.system = system
        self.gear_dof = gear_dof          # [nj] actuator gear per dof (dof order)
        self.dof_limits = dof_limits      # [nj,2]
        self.foot_body_ids = foot_body_ids
        self.init_hinge = init_hinge


def parse_mjcf(path: str) -> MjcfModel:
    tree = ET.parse(path)
    root = tree.getroot()

    compiler = root.find("compiler")
    degrees = compiler is None or compiler.get("angle", "degree") == "degree"
    ang = (np.pi / 180.0) if degrees else 1.0

    # defaults (single-level <default> as used by nv_ant.xml:6-9)
    jd = {"armature": 0.0, "damping": 0.0, "limited": "false"}
    gd = {"density": 1000.0, "friction": 1.0}
    default = root.find("default")
    if default is not None:
        dj = default.find("joint")
        if dj is not None:
            jd["armature"] = float(dj.get("armature", 0.0))
            jd["damping"] = float(dj.get("damping", 0.0))
            jd["limited"] = dj.get("limited", "false")
        dg = default.find("geom")
        if dg is not None:
            gd["density"] = float(dg.get("density", 1000.0))
            fr = dg.get("friction")
            if fr is not None:
                gd["friction"] = float(fr.split()[0])

    body_names = []
    parents = []
    body_pos = []
    body_quat = []
    geoms = []
    jnt_axis, jnt_pos, jnt_range, jnt_armature, jnt_damping, jnt_names = [], [], [], [], [], []

    def parse_geom(el, body_id):
        gtype = _GEOM_TYPES.get(el.get("type", "sphere"))
        if gtype is None or gtype < 0:
            return  # plane/mesh: not a body collision geom
        density = float(el.get("density", gd["density"]))
        fr = el.get("friction")
        friction = float(fr.split()[0]) if fr else gd["friction"]
        contact = el.get("contype", "1") != "0" or el.get("conaffinity", "1") != "0"
        if el.get("fromto") is not None:
            ft = _fvec(el.get("fromto"), 6)
            p1, p2 = ft[:3], ft[3:]
            mid = 0.5 * (p1 + p2)
            d = p2 - p1
            hl = 0.5 * np.linalg.norm(d)
            quat = _axis_to_quat(d) if hl > 1e-9 else np.array([0, 0, 0, 1.0])
            r = _fvec(el.get("size"))[0]
            size = np.array([r, hl, 0.0])
            pos = mid
        else:
            size_in = _fvec(el.get("size", "0.1"))
            size = np.zeros(3)
            size[: len(size_in)] = size_in
            pos = _fvec(el.get("pos", "0 0 0"), 3)
            quat = _mj_quat_to_xyzw(_fvec(el.get("quat", "1 0 0 0"), 4))
        geoms.append(GeomSpec(body=body_id, gtype=gtype, size=size, pos=pos, quat=quat,
                              density=density, friction=friction, contact=contact))

    def parse_body(el, parent_id):
        body_id = len(body_names)
        body_names.append(el.get("name", f"body{body_id}"))
        parents.append(parent_id)
        body_pos.append(_fvec(el.get("pos", "0 0 0"), 3))
        body_quat.append(_mj_quat_to_xyzw(_fvec(el.get("quat", "1 0 0 0"), 4)))
        has_free = el.find("freejoint") is not None
        for j in el.findall("joint"):
            if j.get("type", "hinge") == "free":
                has_free = True
                continue
            rng = j.get("range")
            locked = rng is not None and _fvec(rng)[0] == _fvec(rng)[1] == 0.0
            if parent_id == -1:
                # hinge on the base (ingenuity's locked root_joint): ignore;
                # base is always modelled as free
                continue
            if locked:
                continue
            jnt_names.append(j.get("name", f"joint{len(jnt_names)}"))
            # normalize: MJCF axes need not be unit (nv_ant ankles are
            # "-1 1 0"); the engine's axis-angle math assumes |axis| = 1
            ax = _fvec(j.get("axis", "0 0 1"), 3)
            jnt_axis.append(ax / np.linalg.norm(ax))
            jnt_pos.append(_fvec(j.get("pos", "0 0 0"), 3))
            if rng is not None:
                jnt_range.append(_fvec(rng, 2) * ang)
            else:
                jnt_range.append(np.array([-1e6, 1e6]))
            jnt_armature.append(float(j.get("armature", jd["armature"])))
            jnt_damping.append(float(j.get("damping", jd["damping"])))
        for g in el.findall("geom"):
            parse_geom(g, body_id)
        for child in el.findall("body"):
            parse_body(child, body_id)
        return has_free

    worldbody = root.find("worldbody")
    top_bodies = worldbody.findall("body")
    assert len(top_bodies) == 1, "one root body per asset"
    parse_body(top_bodies[0], -1)

    nb = len(body_names)
    nj = len(jnt_names)
    # in our topology every non-base body carries exactly one hinge; bodies with
    # zero joints are welded: merge is not implemented, instead give them a
    # locked-range hinge.  nv_ant satisfies one-hinge-per-body; ingenuity's
    # rotor bodies have locked joints which we weld below.
    # Weld pass: bodies whose joints were all locked/skipped get merged into parent.
    if nj != nb - 1:
        # weld: recompute by merging jointless non-base bodies into their parent
        keep = [0]
        body_of_joint = []
        # map: which body owns hinge i. Re-walk: joints were appended in body order
        # so reconstruct ownership by re-parsing is complex; instead require
        # assets be either fully jointed trees or single-free-body after weld.
        # Merge all geoms into the base body.
        merged_geoms = []
        # accumulate transform from base to each body (fixed, since joints locked)
        X = {0: (np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))}

        def compose(p, q, p2, q2):
            from .system import _quat_to_mat_np
            R = _quat_to_mat_np(q)
            return p + R @ p2, _quat_mul_np(q, q2)

        def _quat_mul_np(a, b):
            ax, ay, az, aw = a
            bx, by, bz, bw = b
            return np.array([
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
                aw * bw - ax * bx - ay * by - az * bz,
            ])

        from .system import _quat_to_mat_np
        for b in range(1, nb):
            pp, pq = X[parents[b]]
            R = _quat_to_mat_np(pq)
            X[b] = (pp + R @ body_pos[b], _quat_mul_np(pq, body_quat[b]))
        for g in geoms:
            p, q = X[g.body]
            R = _quat_to_mat_np(q)
            merged_geoms.append(GeomSpec(body=0, gtype=g.gtype, size=g.size,
                                         pos=p + R @ g.pos, quat=_quat_mul_np(q, g.quat),
                                         density=g.density, friction=g.friction,
                                         contact=g.contact))
        body_names = [body_names[0]]
        parents = [-1]
        body_pos = [body_pos[0]]
        body_quat = [body_quat[0]]
        geoms = merged_geoms
        nb, nj = 1, 0
        jnt_axis, jnt_pos, jnt_range, jnt_armature, jnt_damping, jnt_names = [], [], [], [], [], []

    # foot bodies & force sensors (reference: feet carry force sensors,
    # ten_ant.py:414-438; obs uses 4 sensors x 6 dims)
    foot_body_ids = [i for i, n in enumerate(body_names) if "foot" in n]
    for g in geoms:
        g.sensor = foot_body_ids.index(g.body) if g.body in foot_body_ids else -1

    mass, com, inertia = build_body_inertia(geoms, nb)
    pb, ps, pl, pr, pf = make_contact_points(geoms)

    # actuators: map joint name -> dof index; gear per dof
    gear_dof = np.zeros(max(nj, 1), np.float32)
    actuator = root.find("actuator")
    if actuator is not None and nj > 0:
        for m in actuator.findall("motor"):
            jname = m.get("joint")
            if jname in jnt_names:
                gear_dof[jnt_names.index(jname)] = float(m.get("gear", 1.0))
    jnt_range_arr = np.array(jnt_range, np.float32).reshape(nj, 2) if nj else np.zeros((0, 2), np.float32)
    init_hinge = np.clip(0.0, jnt_range_arr[:, 0], jnt_range_arr[:, 1]) if nj else np.zeros((0,), np.float32)

    system = System(
        parent=tuple(parents),
        body_names=tuple(body_names),
        point_body=pb,
        point_sensor=ps,
        num_sensors=len(foot_body_ids),
        body_pos=jnp.array(np.array(body_pos), jnp.float32),
        body_quat=jnp.array(np.array(body_quat), jnp.float32),
        mass=jnp.array(mass, jnp.float32),
        com=jnp.array(com, jnp.float32),
        inertia=jnp.array(inertia, jnp.float32),
        jnt_axis=jnp.array(np.array(jnt_axis, np.float32).reshape(nj, 3)),
        jnt_pos=jnp.array(np.array(jnt_pos, np.float32).reshape(nj, 3)),
        jnt_range=jnp.array(jnt_range_arr),
        armature=jnp.array(np.array(jnt_armature, np.float32).reshape(nj)),
        damping=jnp.array(np.array(jnt_damping, np.float32).reshape(nj)),
        gear=jnp.array(gear_dof[:nj] if nj else gear_dof[:0]),
        point_local=jnp.array(pl.reshape(-1, 3)),
        point_radius=jnp.array(pr),
        point_friction=jnp.array(pf),
    )
    return MjcfModel(system, gear_dof[:nj], jnt_range_arr, foot_body_ids, init_hinge)


def make_box_system(half_extents, density=1.0, friction=0.0) -> System:
    """A single free box body (reference `gym.create_box`, ten_ant.py:490-496;
    the TenAnt box is 1x28x1 with friction forced to 0, ten_ant.py:548-552)."""
    hx, hy, hz = half_extents
    g = GeomSpec(body=0, gtype=BOX, size=np.array([hx, hy, hz]),
                 pos=np.zeros(3), quat=np.array([0, 0, 0, 1.0]),
                 density=density, friction=friction)
    g.sensor = -1
    mass, com, inertia = build_body_inertia([g], 1)
    pb, ps, pl, pr, pf = make_contact_points([g])
    return System(
        parent=(-1,),
        body_names=("box",),
        point_body=pb,
        point_sensor=ps,
        num_sensors=0,
        body_pos=jnp.zeros((1, 3)),
        body_quat=jnp.array([[0.0, 0.0, 0.0, 1.0]]),
        mass=jnp.array(mass, jnp.float32),
        com=jnp.array(com, jnp.float32),
        inertia=jnp.array(inertia, jnp.float32),
        jnt_axis=jnp.zeros((0, 3)),
        jnt_pos=jnp.zeros((0, 3)),
        jnt_range=jnp.zeros((0, 2)),
        armature=jnp.zeros((0,)),
        damping=jnp.zeros((0,)),
        gear=jnp.zeros((0,)),
        point_local=jnp.array(pl.reshape(-1, 3)),
        point_radius=jnp.array(pr),
        point_friction=jnp.array(pf),
    )


def asset_path(name: str) -> str:
    """Resolve an asset shipped with this package (assets/ mirrors the
    reference's assets/mjcf tree)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "assets", name)
