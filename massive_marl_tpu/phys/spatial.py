"""6D spatial-vector algebra in *world-origin* coordinates.

All spatial motion vectors are v = [omega; v_O] and force vectors are
f = [tau_O; f], both expressed in the world frame about the world origin O.
Working in a single global frame means composing velocities down a kinematic
tree is plain addition (no frame transforms), which turns the whole
Featherstone pipeline into dense batched einsums - the idiomatic XLA/TPU
formulation of what the reference delegates to PhysX
(/root/reference/agents/tasks/agent_base/base_task.py:137-139).

Ordering convention: index 0:3 = angular part, 3:6 = linear part.
"""
from __future__ import annotations

import jax.numpy as jnp

from .maths import mm, skew


def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """v x_m m  (spatial cross product of motion vectors).

    [w1;p1] x [w2;p2] = [w1 x w2 ; w1 x p2 + p1 x w2]
    """
    w1, p1 = v[..., :3], v[..., 3:]
    w2, p2 = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, w2), jnp.cross(w1, p2) + jnp.cross(p1, w2)], axis=-1
    )


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """v x_f f  (motion-vector cross force-vector).

    [w;p] x* [t;f] = [w x t + p x f ; w x f]
    """
    w, p = v[..., :3], v[..., 3:]
    t, fo = f[..., :3], f[..., 3:]
    return jnp.concatenate([jnp.cross(w, t) + jnp.cross(p, fo), jnp.cross(w, fo)], axis=-1)


def spatial_inertia(mass: jnp.ndarray, com: jnp.ndarray, inertia_com: jnp.ndarray) -> jnp.ndarray:
    """Spatial inertia (6x6) about the world origin.

    mass: (...,), com: (...,3) world-frame center of mass position,
    inertia_com: (...,3,3) rotational inertia about the com in world frame.

    I_O = [[I_c - m cx cx,  m cx],
           [-m cx,          m 1 ]]
    with cx = skew(com); derived from KE = 1/2 w I_c w + 1/2 m |v_O + w x c|^2.
    """
    cx = skew(com)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    top = jnp.concatenate([inertia_com - m * mm(cx, cx), m * cx], axis=-1)
    bot = jnp.concatenate([-m * cx, m * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def point_force_to_spatial(point: jnp.ndarray, force: jnp.ndarray) -> jnp.ndarray:
    """Linear force applied at a world point -> spatial force about origin."""
    return jnp.concatenate([jnp.cross(point, force), force], axis=-1)


def point_velocity(v_spatial: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """World velocity of a body-fixed point located at `point`, given the
    body's origin-spatial velocity [w; v_O]:  v(p) = v_O + w x p."""
    w, v0 = v_spatial[..., :3], v_spatial[..., 3:]
    return v0 + jnp.cross(w, point)
