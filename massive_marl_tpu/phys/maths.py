"""Quaternion / rotation math for the TPU physics engine.

Conventions follow the reference benchmark (IsaacGym `torch_utils`,
see /root/reference/agents/utils/torch_jit_utils.py and isaacgym usage in
agents/tasks/ten_ant.py:84-127): quaternions are stored **(x, y, z, w)**,
angular velocities are world-frame, and Euler angles use the XYZ
(roll, pitch, yaw) extraction.  All functions are pure jnp and batch over
leading axes.
"""
from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# quaternion basics (xyzw)
# ---------------------------------------------------------------------------


def quat_identity(shape=()):
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b for xyzw quaternions."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = aw * bx + ax * bw + ay * bz - az * by
    y = aw * by - ax * bz + ay * bw + az * bx
    z = aw * bz + ax * by - ay * bx + az * bw
    w = aw * bw - ax * bx - ay * by - az * bz
    return jnp.stack([x, y, z, w], axis=-1)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (body -> world for a body orientation)."""
    qvec = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + qw * t + jnp.cross(qvec, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conjugate(q), v)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """axis: (...,3) unit, angle: (...,) radians -> xyzw quaternion."""
    half = 0.5 * angle
    s = jnp.sin(half)[..., None]
    xyz = axis * s
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([xyz, w], axis=-1)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) xyzw -> (...,3,3) rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation with world-frame angular velocity: q' = exp(w dt/2) * q."""
    dq = jnp.concatenate([omega_world * (0.5 * dt), jnp.zeros_like(q[..., 3:4])], axis=-1)
    q_new = q + quat_mul(dq, q)
    return quat_normalize(q_new)


def get_euler_xyz(q: jnp.ndarray):
    """roll, pitch, yaw from xyzw quaternion (matches isaacgym.torch_utils.get_euler_xyz
    as consumed by compute_rot, torch_jit_utils.py:32-42)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # roll (x-axis rotation)
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    # pitch (y-axis rotation)
    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0, jnp.sign(sinp) * (jnp.pi / 2.0), jnp.arcsin(jnp.clip(sinp, -1.0, 1.0))
    )
    # yaw (z-axis rotation)
    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


# ---------------------------------------------------------------------------
# small helpers shared with env code
# ---------------------------------------------------------------------------


def normalize(v: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def unscale(x, lower, upper):
    """Map [lower, upper] -> [-1, 1] (isaacgym torch_utils.unscale)."""
    return (2.0 * x - upper - lower) / (upper - lower)


def scale(x, lower, upper):
    return 0.5 * (x + 1.0) * (upper - lower) + lower


def mv(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched small mat-vec without dot_general: (..., i, j) x (..., j).

    On TPU, tiny-contraction dot_generals pad the 3/6-sized axes onto the
    MXU; broadcast-multiply + unrolled reduce keeps them on the VPU where the
    big env batch fills the lanes."""
    return jnp.sum(m * v[..., None, :], axis=-1)


def mtv(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """m^T v for batched small matrices."""
    return jnp.sum(m * v[..., :, None], axis=-2)


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched small mat-mat: (..., i, k) x (..., k, j)."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) cross-product matrix: skew(v) @ u == v x u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))
