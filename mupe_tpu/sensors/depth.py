"""Analytic depth camera: batched ray-cast renderer for drone-mounted views.

TPU-native counterpart of the reference camera sensor
(omni_drones/sensors/camera.py:40-210, sensors/config.py:29-120), which
attaches an omni.replicator RTX annotator to a USD prim and is used for
depth/rgb visualization.  On TPU there is no RTX renderer; the scene is
analytic (ground plane, arena cylinder wall + ceiling, obstacle cylinders,
target sphere), so an exact closed-form ray cast produces the same depth
channel the reference exposes (`data_types=["distance_to_camera"]`) as one
fused batch of elementwise ops — jit/vmap-friendly, no scalar loops.

The output feeds `transforms.obs.depth_image_norm` (the reference's
`DepthImageNorm`, utils/torchrl/transforms.py:250-270) for vision-based
policies, and doubles as an eval-time visualization channel.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core import quat_rotate


@dataclasses.dataclass(frozen=True)
class DepthCameraCfg:
    """Pinhole camera intrinsics (reference PinholeCameraCfg,
    sensors/config.py:88-120: 640×480, focal 24mm, aperture 20.955mm —
    defaults here are RL-sized rather than viz-sized)."""

    width: int = 64
    height: int = 48
    # horizontal FOV in radians; reference: 2·atan(20.955 / (2·24)) ≈ 47.2°
    hfov: float = 2.0 * float(np.arctan(20.955 / (2.0 * 24.0)))
    max_range: float = 10.0
    min_range: float = 0.02


def pinhole_rays(cfg: DepthCameraCfg) -> np.ndarray:
    """Unit ray directions in the camera body frame, [H, W, 3].

    Camera convention matches the drone body frame: +x forward (optical
    axis), +y left, +z up — the mount pose of the reference's onboard
    camera prim (camera.py:119-131 attaches at the base link).
    """
    w, h = cfg.width, cfg.height
    tan_h = np.tan(cfg.hfov / 2.0)
    tan_v = tan_h * h / w                    # square pixels assumed
    # sample at pixel centers ((i+0.5)/n convention) so the FOV spans the
    # pixel grid's outer edges, matching the standard pinhole model
    ys = tan_h * (1.0 - (2.0 * np.arange(w) + 1.0) / w)   # left → right
    zs = tan_v * (1.0 - (2.0 * np.arange(h) + 1.0) / h)   # top → bottom
    yy, zz = np.meshgrid(ys, zs)             # [H, W]
    dirs = np.stack([np.ones_like(yy), yy, zz], axis=-1)
    return (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)).astype(
        np.float32
    )


def _ray_ground(o, d, z0: float):
    """Distance to horizontal plane z=z0 (inf when parallel/behind)."""
    t = (z0 - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) < 1e-9, 1e-9, d[..., 2])
    return jnp.where(t > 0.0, t, jnp.inf)


def _ray_cylinder_inner(o, d, radius: float):
    """Distance to the arena wall (infinite cylinder at origin): the
    smallest positive root, so cameras inside the arena get the forward
    wall and a camera that overshot the wall still renders the nearest
    wall surface instead of a bogus far-side distance."""
    ox, oy = o[..., 0], o[..., 1]
    dx, dy = d[..., 0], d[..., 1]
    a = dx * dx + dy * dy
    b = 2.0 * (ox * dx + oy * dy)
    c = ox * ox + oy * oy - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    denom = jnp.where(a < 1e-12, 1e-12, 2.0 * a)
    t_near = (-b - sq) / denom
    t_far = (-b + sq) / denom
    t = jnp.where(t_near > 0.0, t_near, t_far)
    valid = (disc >= 0.0) & (t > 0.0)
    return jnp.where(valid, t, jnp.inf)


def _ray_cylinder_outer(o, d, centers, radius: float, z_top):
    """Distance to the nearest finite obstacle cylinder, hit from outside.

    o, d: [..., 3]; centers: [..., C, 3] with z < 0 marking inactive
    (the parked-cylinder convention, hideandseek.py:451,759); z_top: scalar
    cylinder top.  Returns min over C of the near root whose hit point lies
    within the cylinder's height.
    """
    rel = o[..., None, :2] - centers[..., :2]       # [..., C, 2]
    dx = d[..., None, 0]
    dy = d[..., None, 1]
    a = dx * dx + dy * dy
    b = 2.0 * (rel[..., 0] * dx + rel[..., 1] * dy)
    c = rel[..., 0] ** 2 + rel[..., 1] ** 2 - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / jnp.where(a < 1e-12, 1e-12, 2.0 * a)  # near root
    zhit = o[..., None, 2] + t * d[..., None, 2]
    active = centers[..., 2] >= 0.0
    valid = (
        (disc >= 0.0) & (t > 0.0) & active & (zhit >= 0.0) & (zhit <= z_top)
    )
    return jnp.min(jnp.where(valid, t, jnp.inf), axis=-1)


def _ray_sphere(o, d, center, radius: float):
    """Distance to a sphere (the evader target), near root."""
    rel = o - center
    b = 2.0 * jnp.sum(rel * d, axis=-1)
    c = jnp.sum(rel * rel, axis=-1) - radius * radius
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / 2.0
    return jnp.where((disc >= 0.0) & (t > 0.0), t, jnp.inf)


def depth_image(
    cfg: DepthCameraCfg,
    cam_pos: jnp.ndarray,                 # [..., 3]
    cam_quat: jnp.ndarray,                # [..., 4] wxyz body→world
    cylinders: Optional[jnp.ndarray] = None,   # [..., C, 3]
    cylinder_size: float = 0.1,
    arena_size: Optional[float] = None,
    max_height: Optional[float] = None,
    target_pos: Optional[jnp.ndarray] = None,  # [..., 3]
    target_radius: float = 0.05,
    rays: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Render [..., H, W] depth (distance_to_camera) for batched cameras.

    Every term is closed-form ray-primitive intersection, vectorized over
    leading batch dims and the pixel grid — one fused elementwise program
    under jit, no gather/scatter (cf. the reference's external RTX render
    pass, camera.py:150-176).
    """
    if rays is None:
        rays = jnp.asarray(pinhole_rays(cfg))
    batch = cam_pos.shape[:-1]
    d_world = quat_rotate(
        cam_quat[..., None, :],
        rays.reshape(-1, 3).reshape((1,) * len(batch) + (-1, 3)),
    )                                                # [..., H·W, 3]
    o = cam_pos[..., None, :]
    t = _ray_ground(o, d_world, 0.0)
    if max_height is not None:
        t = jnp.minimum(t, _ray_ground(o, d_world, max_height))
    if arena_size is not None:
        t = jnp.minimum(t, _ray_cylinder_inner(o, d_world, arena_size))
    if cylinders is not None:
        z_top = max_height if max_height is not None else jnp.inf
        t = jnp.minimum(
            t,
            _ray_cylinder_outer(
                o, d_world, cylinders[..., None, :, :], cylinder_size, z_top
            ),
        )
    if target_pos is not None:
        t = jnp.minimum(
            t, _ray_sphere(o, d_world, target_pos[..., None, :], target_radius)
        )
    t = jnp.clip(t, cfg.min_range, cfg.max_range)
    return t.reshape(batch + (cfg.height, cfg.width))
