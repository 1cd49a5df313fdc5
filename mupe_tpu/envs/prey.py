"""Scripted evader: potential-field escape policy.

Counterpart of HideAndSeek._get_dummy_policy_prey
(omni_drones/envs/hide_and_seek/hideandseek.py:1067-1141): the evader is a
kinematic sphere whose velocity is the normalized sum of repulsive forces
from unblocked pursuers in detection range, the arena wall/ceiling/floor,
and active cylinders, scaled to a fixed speed (hideandseek.py:737-744).
"""
from __future__ import annotations

import jax.numpy as jnp

from .geometry import line_blocked_by_cylinder


def prey_force(
    drone_pos: jnp.ndarray,      # [E, n, 3]
    target_pos: jnp.ndarray,     # [E, 1, 3]
    cylinder_pos: jnp.ndarray,   # [E, C, 3]
    cylinder_size: float,
    arena_size: float,
    max_height: float,
    target_detect_radius: float,
) -> jnp.ndarray:
    """Total potential-field force on the evader → [E, 1, 3]."""
    # pursuer repulsion (hideandseek.py:1077-1089)
    # rpos per reference: cpos(drone_pos, target_pos) = drone − target
    rpos = drone_pos[:, :, None, :] - target_pos[:, None, :, :]  # [E, n, 1, 3]
    dist = jnp.linalg.norm(rpos, axis=-1)                        # [E, n, 1]

    blocked = line_blocked_by_cylinder(
        drone_pos, target_pos, cylinder_pos, cylinder_size
    )  # [E, n]
    detect = dist < target_detect_radius
    active = detect & (~blocked[..., None])                      # [E, n, 1]

    direction = -rpos / (dist[..., None] + 1e-5)
    force_p = direction * (1.0 / (dist[..., None] + 1e-5)) * active[..., None]
    force = jnp.sum(force_p, axis=1)                             # [E, 1, 3]

    # arena wall (hideandseek.py:1091-1113)
    xy = target_pos[..., :2]
    origin_dist = jnp.linalg.norm(xy, axis=-1)                   # [E, 1]
    dir_xy = -xy / (origin_dist[..., None] + 1e-5)
    out = jnp.square(xy[..., 0]) + jnp.square(xy[..., 1]) > arena_size**2
    mag = jnp.where(
        out, 1.0 / 1e-5, 1.0 / (arena_size - origin_dist + 1e-5)
    )
    force_r_xy = dir_xy * mag[..., None]

    z = target_pos[..., 2]
    higher = z > max_height
    dz_top = max_height - z
    f_top = jnp.where(higher, -1.0 / 1e-5, -dz_top / (jnp.square(dz_top) + 1e-5))
    lower = z < 0.0
    f_bot = jnp.where(lower, 1.0 / 1e-5, z / (jnp.square(z) + 1e-5))
    force_r = jnp.concatenate([force_r_xy, (f_top + f_bot)[..., None]], axis=-1)
    force = force + force_r

    # cylinder repulsion from all active cylinders (hideandseek.py:1127-1139)
    t_c_rpos = target_pos[:, :, None, :2] - cylinder_pos[:, None, :, :2]  # [E,1,C,2]
    d_c = jnp.linalg.norm(t_c_rpos, axis=-1)                              # [E,1,C]
    d_c_boundary = d_c - cylinder_size
    detect_c = d_c < target_detect_radius
    inactive = (cylinder_pos[..., 2] < 0.0)[:, None, :]                   # [E,1,C]
    active_c = ((~inactive) & detect_c).astype(drone_pos.dtype)[..., None]
    dir_c = t_c_rpos / (d_c[..., None] + 1e-5)
    # d_c_boundary crosses zero when the evader stands ON the cylinder
    # wall: unlike the strictly-positive denominators above, d_c_boundary
    # + 1e-5 can be EXACTLY zero (observed once in ~10^12 f32 samples,
    # NaN-collapsing a 275M-frame run: 1/0 = inf, then inf·0 for parked
    # cylinders or inf/inf in prey_velocity = NaN).  Clamp the magnitude
    # away from zero, keeping the sign (repulsion flips inward→outward
    # exactly as the reference's unguarded 1/x does around the wall).
    denom = d_c_boundary[..., None] + 1e-5
    denom = jnp.where(jnp.abs(denom) < 1e-6, jnp.where(denom < 0, -1e-6, 1e-6), denom)
    force_c_xy = jnp.sum(active_c * dir_c * (1.0 / denom), axis=2)  # [E, 1, 2]
    force = force + jnp.concatenate(
        [force_c_xy, jnp.zeros_like(force_c_xy[..., :1])], axis=-1
    )
    return force


def prey_velocity(
    force: jnp.ndarray, v_prey, componentwise: bool = True
) -> jnp.ndarray:
    """Velocity from the summed force (hideandseek.py:740-742).

    The reference normalizes by ``norm(force, dim=1)`` on a [E, 1, 3] tensor —
    dim=1 is the singleton agent axis, so each *component* is divided by its
    own magnitude, i.e. v = v_prey·sign(f) per axis (speed up to √3·v_prey).
    ``componentwise=True`` reproduces that trained-against behavior exactly;
    ``False`` gives the presumably intended unit-vector normalization.
    """
    if componentwise:
        norm = jnp.abs(force)
    else:
        norm = jnp.linalg.norm(force, axis=-1, keepdims=True)
    v = jnp.asarray(v_prey)
    if v.ndim > 0:
        v = v.reshape(v.shape + (1,) * (force.ndim - v.ndim))
    return v * force / (norm + 1e-5)
