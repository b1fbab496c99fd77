"""Observation math shared by the ant tasks.

JAX re-derivation of the reference's torch kernels:
`compute_heading_and_up` / `compute_rot` (agents/utils/torch_jit_utils.py:13-42)
and `unscale` (isaacgym torch_utils).  All functions take a single env's data;
callers vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from massive_marl_tpu.phys.maths import (
    get_euler_xyz,
    normalize,
    quat_rotate,
    quat_rotate_inverse,
    unscale,
)


class BodyFrameObs(NamedTuple):
    up_proj: jnp.ndarray
    heading_proj: jnp.ndarray
    vel_loc: jnp.ndarray
    angvel_loc: jnp.ndarray
    roll: jnp.ndarray
    pitch: jnp.ndarray
    yaw: jnp.ndarray
    angle_to_target: jnp.ndarray


def heading_and_rot(torso_pos, torso_quat, velocity, ang_velocity, targets) -> BodyFrameObs:
    """Mirror of compute_heading_and_up + compute_rot (torch_jit_utils.py:13-42).

    The start rotation in every ant task is identity (ten_ant.py:364-366) so
    `torso_quat = quat_mul(rot, inv_start_rot)` collapses to the raw rotation.
    """
    to_target = (targets - torso_pos).at[2].set(0.0)
    target_dir = normalize(to_target)
    up_vec = quat_rotate(torso_quat, jnp.array([0.0, 0.0, 1.0]))
    heading_vec = quat_rotate(torso_quat, jnp.array([1.0, 0.0, 0.0]))
    up_proj = up_vec[2]
    heading_proj = jnp.dot(heading_vec, target_dir)

    vel_loc = quat_rotate_inverse(torso_quat, velocity)
    angvel_loc = quat_rotate_inverse(torso_quat, ang_velocity)
    roll, pitch, yaw = get_euler_xyz(torso_quat)
    # quirk preserved from the reference (torch_jit_utils.py:38-40): the walk
    # target angle uses the *z* delta in place of y
    walk_target_angle = jnp.arctan2(targets[2] - torso_pos[2], targets[0] - torso_pos[0])
    angle_to_target = walk_target_angle - yaw
    return BodyFrameObs(up_proj, heading_proj, vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target)


def ant_obs_38(qpos, qvel, actions, targets, dof_lower, dof_upper, dof_vel_scale):
    """Per-ant 38-dim observation (TenAnt layout, ten_ant.py:1306-1351):
    [pos3, vel_loc3, angvel_loc3, yaw, roll, angle_to_target, up_proj,
     heading_proj, dof_pos_scaled8, dof_vel*scale8, actions8]."""
    pos = qpos[0:3]
    quat = qpos[3:7]
    b = heading_and_rot(pos, quat, qvel[0:3], qvel[3:6], targets)
    dof_pos_scaled = unscale(qpos[7:], dof_lower, dof_upper)
    return jnp.concatenate([
        pos, b.vel_loc, b.angvel_loc,
        jnp.stack([b.yaw, b.roll, b.angle_to_target, b.up_proj, b.heading_proj]),
        dof_pos_scaled, qvel[6:] * dof_vel_scale, actions,
    ])


def ant_obs_60(qpos, qvel, actions, sensors, targets, dof_lower, dof_upper,
               dof_vel_scale, contact_force_scale):
    """OneAnt 60-dim observation (one_ant.py:566-627): [z, vel_loc3,
    angvel_loc3, yaw, roll, angle_to_target, up_proj, heading_proj,
    dof_pos_scaled8, dof_vel*scale8, foot_sensors24*scale, actions8]."""
    pos = qpos[0:3]
    quat = qpos[3:7]
    b = heading_and_rot(pos, quat, qvel[0:3], qvel[3:6], targets)
    dof_pos_scaled = unscale(qpos[7:], dof_lower, dof_upper)
    return jnp.concatenate([
        pos[2:3], b.vel_loc, b.angvel_loc,
        jnp.stack([b.yaw, b.roll, b.angle_to_target, b.up_proj, b.heading_proj]),
        dof_pos_scaled, qvel[6:] * dof_vel_scale,
        sensors.reshape(-1) * contact_force_scale, actions,
    ])


def box_yaw_goal_dir(box_quat):
    """(sin a, -cos a) with a = atan(2 qw qz / (1 - 2 qz^2)) - the reference's
    box-yaw goal direction (ten_ant.py:936-947, 1354-1371)."""
    qz = box_quat[2]
    qw = box_quat[3]
    angle = jnp.arctan(2 * qw * qz / (1 - 2 * qz * qz))
    return jnp.stack([jnp.sin(angle), -jnp.cos(angle)])


def box_quat_alignment(box_quat, goal_axis=(0.0, 1.0, 0.0)):
    """cos-similarity between the box's rotated y-axis and the goal axis
    (compute_box_quat/compute_box_quat_dist, ten_ant.py:951-973)."""
    qx, qy, qz, qw = box_quat[0], box_quat[1], box_quat[2], box_quat[3]
    x = 2 * (qx * qy + qw * qz)
    y = 1 - 2 * (qx * qx + qz * qz)
    z = 2 * (qy * qz - qw * qx)
    gx, gy, gz = goal_axis
    num = x * gx + y * gy + z * gz
    den = jnp.sqrt(x * x + y * y + z * z) * jnp.sqrt(gx * gx + gy * gy + gz * gz)
    return num / den


def l2_xy(a, b):
    d = a - b
    return jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2)
