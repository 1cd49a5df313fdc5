"""End-to-end vision path: Hover depth observations → ppo_vision policy.

Covers the sensors/depth.py → transforms.obs.depth_image_norm →
MixedObsEncoder chain the reference only ships as disconnected pieces
(camera is viz-only there, sensors/camera.py:40; MixedEncoder untrained,
networks.py:322-368)."""
import jax
import jax.numpy as jnp
import numpy as np

from mupe_tpu.envs.hover import Hover, HoverCfg
from mupe_tpu.learning import init_carry, make_train_iter
from mupe_tpu.learning.registry import make_policy


def _env(n=8):
    return Hover(
        HoverCfg(
            num_envs=n, max_episode_length=32,
            obs_depth=True, depth_width=16, depth_height=12,
        )
    )


def test_hover_depth_obs_shape_and_range():
    env = _env()
    state = env.reset(jax.random.PRNGKey(0))
    obs = env.observe(state)
    assert set(obs.keys()) == {"observation", "depth"}
    assert obs["depth"].shape == (8, 1, 12, 16, 1)
    d = np.asarray(obs["depth"])
    assert np.all(d >= 0.0) and np.all(d <= 1.0)
    # the ground plane must appear: downward-looking pixels see finite
    # depth (> 0 after normalization) somewhere in the frame
    assert float(d.max()) > 0.0


def test_depth_sees_target_sphere():
    """A camera aimed straight at the target renders it closer (higher
    normalized value) than the same scene without the target."""
    from mupe_tpu.sensors.depth import DepthCameraCfg, depth_image
    from mupe_tpu.transforms.obs import depth_image_norm

    cam = DepthCameraCfg(width=16, height=12, max_range=8.0)
    pos = jnp.asarray([[0.0, 0.0, 1.0]])
    quat = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])  # identity: +x forward
    tgt = jnp.asarray([[2.0, 0.0, 1.0]])
    with_t = depth_image_norm(
        depth_image(cam, pos, quat, target_pos=tgt, target_radius=0.25),
        cam.min_range, cam.max_range,
    )
    without = depth_image_norm(
        depth_image(cam, pos, quat), cam.min_range, cam.max_range
    )
    assert float(jnp.max(with_t - without)) > 0.1


def test_ppo_vision_trains():
    env = _env()
    policy = make_policy(
        "ppo_vision", env, {"train_every": 8, "num_minibatches": 2}
    )
    carry = init_carry(env, policy, jax.random.PRNGKey(0))
    it = jax.jit(make_train_iter(env, policy))
    for _ in range(2):
        carry, metrics, stats = it(carry)
    assert np.isfinite(float(metrics["policy_loss"]))
    assert np.isfinite(float(metrics["value_loss"]))
    # gradient actually reached the conv vision branch
    leaf = jax.tree_util.tree_leaves(carry.ts.actor_params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaf)


def test_ppo_vision_from_harness():
    """scripts/train.py dispatch: task=Hover algo=ppo_vision e2e."""
    from mupe_tpu.harness import build

    env, policy, env_cfg, algo_cfg = build(
        "Hover",
        {"num_envs": 4, "max_episode_length": 16, "obs_depth": True,
         "depth_width": 16, "depth_height": 12},
        {"train_every": 4, "num_minibatches": 1},
        algo="ppo_vision",
    )
    carry = init_carry(env, policy, jax.random.PRNGKey(1))
    it = jax.jit(make_train_iter(env, policy))
    carry, metrics, _ = it(carry)
    assert np.isfinite(float(metrics["policy_loss"]))
