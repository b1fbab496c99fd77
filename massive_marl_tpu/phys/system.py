"""Static description of one articulated rigid-body system ("asset").

The TPU-native replacement for IsaacGym's asset/actor machinery
(/root/reference/agents/tasks/ten_ant.py:258-633 loads MJCF assets through
`gym.load_asset` into PhysX).  A `System` is a pytree: continuous physical
parameters are jnp arrays (so domain randomization can rewrite them inside
jit), topology/metadata are static python values.

Supported topology (covers every asset the reference uses): a free-joint base
body plus a tree of one-hinge bodies.  nq = 7 + nj, nv = 6 + nj.

qpos layout: [x, y, z, qx, qy, qz, qw, hinge_0, ... hinge_{nj-1}]
qvel layout: [vx, vy, vz, wx, wy, wz, hinge rates...]   (world-frame linear
velocity of the base origin + world-frame angular velocity - the same
convention as IsaacGym root state tensors, ten_ant.py:84-127).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# geom type codes
SPHERE = 0
CAPSULE = 1
BOX = 2
CYLINDER = 3


@struct.dataclass
class System:
    # --- static topology (not traced) ---
    parent: Tuple[int, ...] = struct.field(pytree_node=False)  # per body, -1 = world/base-free
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    # contact sample points: which body each point is attached to
    point_body: Tuple[int, ...] = struct.field(pytree_node=False)
    # force-sensor id per point (-1 = none); reference attaches 4 foot sensors
    # per ant (ten_ant.py:414-438)
    point_sensor: Tuple[int, ...] = struct.field(pytree_node=False)
    num_sensors: int = struct.field(pytree_node=False)

    # --- bodies (jnp, differentiable/randomizable) ---
    body_pos: jnp.ndarray   # [nb,3] fixed offset from parent frame
    body_quat: jnp.ndarray  # [nb,4] xyzw fixed rotation from parent frame
    mass: jnp.ndarray       # [nb]
    com: jnp.ndarray        # [nb,3] com in body frame
    inertia: jnp.ndarray    # [nb,3,3] about com, body frame

    # --- joints: one hinge per non-base body; index j <-> body j+1 ---
    jnt_axis: jnp.ndarray   # [nj,3] in child body frame
    jnt_pos: jnp.ndarray    # [nj,3] anchor in child body frame
    jnt_range: jnp.ndarray  # [nj,2] radians
    armature: jnp.ndarray   # [nj]
    damping: jnp.ndarray    # [nj]
    gear: jnp.ndarray       # [nj] actuator gear (motor_effort), ten_ant.py:293-337

    # --- contact sample points (body frame) ---
    point_local: jnp.ndarray     # [P,3]
    point_radius: jnp.ndarray    # [P]
    point_friction: jnp.ndarray  # [P]

    @property
    def nb(self) -> int:
        return len(self.parent)

    @property
    def nj(self) -> int:
        return self.nb - 1

    @property
    def nq(self) -> int:
        return 7 + self.nj

    @property
    def nv(self) -> int:
        return 6 + self.nj

    @property
    def np_points(self) -> int:
        return len(self.point_body)

    def init_qpos(self, base_pos, base_quat=None) -> jnp.ndarray:
        """Default qpos: base at `base_pos`, hinges at the IsaacGym default
        (0 clamped into the joint range - base_task-style init, see
        ten_ant.py:133-137)."""
        if base_quat is None:
            base_quat = jnp.array([0.0, 0.0, 0.0, 1.0])
        lo = self.jnt_range[:, 0]
        hi = self.jnt_range[:, 1]
        hinge = jnp.clip(0.0, lo, hi)
        return jnp.concatenate([jnp.asarray(base_pos, jnp.float32), base_quat, hinge])


def _geom_mass_com_inertia(gtype: int, size: np.ndarray, density: float):
    """Mass, com(local=0) and inertia about geom com in geom frame (z = axis)."""
    if gtype == SPHERE:
        r = size[0]
        m = density * 4.0 / 3.0 * np.pi * r**3
        i = 0.4 * m * r * r
        I = np.diag([i, i, i])
    elif gtype == CAPSULE:
        r, hl = size[0], size[1]  # radius, half-length of cylindrical part
        L = 2 * hl
        m_cyl = density * np.pi * r * r * L
        m_cap = density * 4.0 / 3.0 * np.pi * r**3  # both hemispheres
        m = m_cyl + m_cap
        # cylinder about its com
        ixx_cyl = m_cyl * (L * L / 12.0 + r * r / 4.0)
        izz_cyl = m_cyl * r * r / 2.0
        # two hemispheres: each mass m_cap/2, com at +-(hl + 3r/8)
        m_h = m_cap / 2.0
        izz_h = 0.4 * m_h * r * r
        # hemisphere inertia about its own com, transverse axis
        ixx_h_com = m_h * (0.4 * r * r - (3.0 * r / 8.0) ** 2)
        d = hl + 3.0 * r / 8.0
        ixx = ixx_cyl + 2.0 * (ixx_h_com + m_h * d * d)
        izz = izz_cyl + 2.0 * izz_h
        I = np.diag([ixx, ixx, izz])
    elif gtype == BOX:
        sx, sy, sz = size  # half-extents
        m = density * 8.0 * sx * sy * sz
        I = np.diag(
            [
                m / 3.0 * (sy * sy + sz * sz),
                m / 3.0 * (sx * sx + sz * sz),
                m / 3.0 * (sx * sx + sy * sy),
            ]
        )
    elif gtype == CYLINDER:
        r, hl = size[0], size[1]
        L = 2 * hl
        m = density * np.pi * r * r * L
        ixx = m * (L * L / 12.0 + r * r / 4.0)
        I = np.diag([ixx, ixx, m * r * r / 2.0])
    else:
        raise ValueError(f"unknown geom type {gtype}")
    return m, I


def _quat_to_mat_np(q):
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


@dataclasses.dataclass
class GeomSpec:
    """Host-side geom record used while building a System."""
    body: int
    gtype: int
    size: np.ndarray          # sphere:[r], capsule:[r,hl], box half-extents
    pos: np.ndarray           # geom frame origin in body frame
    quat: np.ndarray          # xyzw in body frame
    density: float
    friction: float
    contact: bool = True      # participates in collision


def build_body_inertia(geoms, nb: int):
    """Aggregate per-geom mass properties into per-body (mass, com, inertia).

    Mirrors MJCF `inertiafromgeom="true"` (nv_ant.xml:12).
    """
    mass = np.zeros(nb)
    first_moment = np.zeros((nb, 3))
    for g in geoms:
        m, _ = _geom_mass_com_inertia(g.gtype, g.size, g.density)
        mass[g.body] += m
        first_moment[g.body] += m * g.pos
    com = np.where(mass[:, None] > 0, first_moment / np.maximum(mass[:, None], 1e-12), 0.0)
    inertia = np.zeros((nb, 3, 3))
    for g in geoms:
        m, I_geom = _geom_mass_com_inertia(g.gtype, g.size, g.density)
        R = _quat_to_mat_np(g.quat)
        I_rot = R @ I_geom @ R.T
        d = g.pos - com[g.body]
        # parallel axis to the body com
        inertia[g.body] += I_rot + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
    # guard against zero-mass bodies
    mass = np.maximum(mass, 1e-9)
    for b in range(nb):
        if np.trace(inertia[b]) <= 0:
            inertia[b] = np.eye(3) * 1e-9
    return mass, com, inertia


def make_contact_points(geoms, samples_per_capsule: int = 3):
    """Sample collision points from geoms (body frame).

    Capsules are represented by `samples_per_capsule` spheres along the axis,
    spheres by one point, boxes by their 8 corners (radius 0).  This fixed
    point set keeps all contact shapes static for XLA.
    """
    body_ids, sensors, locals_, radii, frictions = [], [], [], [], []
    for g in geoms:
        if not g.contact:
            continue
        sensor = getattr(g, "sensor", -1)
        if g.gtype == SPHERE:
            pts = [g.pos]
            r = g.size[0]
        elif g.gtype == CAPSULE:
            R = _quat_to_mat_np(g.quat)
            axis = R[:, 2]
            hl = g.size[1]
            ts = np.linspace(-1.0, 1.0, samples_per_capsule)
            pts = [g.pos + t * hl * axis for t in ts]
            r = g.size[0]
        elif g.gtype == BOX:
            R = _quat_to_mat_np(g.quat)
            sx, sy, sz = g.size
            pts = [
                g.pos + R @ (np.array([ex * sx, ey * sy, ez * sz]))
                for ex in (-1, 1)
                for ey in (-1, 1)
                for ez in (-1, 1)
            ]
            r = 0.0
        elif g.gtype == CYLINDER:
            R = _quat_to_mat_np(g.quat)
            axis = R[:, 2]
            pts = [g.pos - g.size[1] * axis, g.pos + g.size[1] * axis]
            r = g.size[0]
        else:
            continue
        for p in pts:
            body_ids.append(g.body)
            sensors.append(sensor)
            locals_.append(p)
            radii.append(r)
            frictions.append(g.friction)
    return (
        tuple(body_ids),
        tuple(sensors),
        np.array(locals_, np.float32),
        np.array(radii, np.float32),
        np.array(frictions, np.float32),
    )
