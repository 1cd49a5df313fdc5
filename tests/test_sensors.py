"""Depth camera sensor: golden-geometry checks (reference camera.py is
viz-only; here the depth channel is exact so we can assert distances)."""
import jax.numpy as jnp
import numpy as np

from mupe_tpu.core import euler_to_quaternion
from mupe_tpu.sensors import DepthCameraCfg, depth_image, pinhole_rays


CFG = DepthCameraCfg(width=9, height=7, max_range=50.0)


def _quat(roll=0.0, pitch=0.0, yaw=0.0):
    return euler_to_quaternion(jnp.asarray([roll, pitch, yaw]))


def test_rays_unit_and_center():
    rays = pinhole_rays(CFG)
    assert rays.shape == (7, 9, 3)
    np.testing.assert_allclose(
        np.linalg.norm(rays, axis=-1), 1.0, atol=1e-6
    )
    # center pixel looks straight along +x
    np.testing.assert_allclose(rays[3, 4], [1.0, 0.0, 0.0], atol=1e-6)


def test_ground_depth_pitch_down():
    # camera at z=1 pitched 90° down: center ray hits ground at exactly 1m
    pos = jnp.asarray([0.0, 0.0, 1.0])
    quat = _quat(pitch=jnp.pi / 2)
    img = depth_image(CFG, pos, quat)
    assert img.shape == (7, 9)
    np.testing.assert_allclose(float(img[3, 4]), 1.0, atol=1e-5)


def test_arena_wall_depth():
    # level camera at center looking +x: wall at arena_size
    pos = jnp.asarray([0.0, 0.0, 0.6])
    img = depth_image(CFG, pos, _quat(), arena_size=0.9, max_height=1.2)
    np.testing.assert_allclose(float(img[3, 4]), 0.9, atol=1e-5)


def test_cylinder_occludes_wall():
    pos = jnp.asarray([0.0, 0.0, 0.6])
    cyl = jnp.asarray([[0.5, 0.0, 0.6], [0.0, 0.5, -20.0]])  # 2nd inactive
    img = depth_image(
        CFG, pos, _quat(), cylinders=cyl, cylinder_size=0.1,
        arena_size=0.9, max_height=1.2,
    )
    # center ray hits the near face of the active cylinder: 0.5 − 0.1
    np.testing.assert_allclose(float(img[3, 4]), 0.4, atol=1e-5)
    # inactive (parked) cylinder must not occlude: ray along +y sees wall
    img_y = depth_image(
        CFG, pos, _quat(yaw=jnp.pi / 2), cylinders=cyl,
        cylinder_size=0.1, arena_size=0.9, max_height=1.2,
    )
    np.testing.assert_allclose(float(img_y[3, 4]), 0.9, atol=1e-5)


def test_target_sphere_depth():
    pos = jnp.asarray([0.0, 0.0, 0.6])
    img = depth_image(
        CFG, pos, _quat(), target_pos=jnp.asarray([0.4, 0.0, 0.6]),
        target_radius=0.05,
    )
    np.testing.assert_allclose(float(img[3, 4]), 0.35, atol=1e-5)


def test_batched_shapes():
    e, n = 4, 3
    pos = jnp.zeros((e, n, 3)).at[..., 2].set(0.6)
    quat = jnp.broadcast_to(_quat(), (e, n, 4))
    cyl = jnp.zeros((e, 5, 3)).at[..., 2].set(-20.0)
    img = depth_image(
        CFG, pos, quat, cylinders=cyl[:, None], cylinder_size=0.1,
        arena_size=0.9, max_height=1.2,
    )
    assert img.shape == (e, n, 7, 9)
    assert bool(jnp.all(jnp.isfinite(img)))
