"""Observation adapters: history stacking, flattening, discretization.

Pure-function counterparts of the remaining torchrl transforms
(omni_drones/utils/torchrl/transforms.py): `History` (:493-553),
`ravel_composite` (:273-301), `FromDiscreteAction` (:160-204),
`FromMultiDiscreteAction` (:206-248), `DepthImageNorm` (:250-270).
State (the sliding window) is explicit and lives in the env/rollout carry.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp


def history_init(obs: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Fill a fresh window with the current frame → (..., steps, D)
    (History.reset semantics, transforms.py:540-553)."""
    return jnp.repeat(obs[..., None, :], steps, axis=-2)


def history_push(window: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    """Slide the window one step (transforms.py:520-538)."""
    return jnp.concatenate([window[..., 1:, :], obs[..., None, :]], axis=-2)


def ravel_composite(obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Flatten a dict observation's entity groups into one vector per agent
    (ravel_composite, transforms.py:273-301): each (..., k, d) group is
    flattened to (..., k·d) and all groups concatenated."""
    parts = [
        v.reshape(v.shape[:-2] + (v.shape[-2] * v.shape[-1],))
        for v in obs.values()
    ]
    return jnp.concatenate(parts, axis=-1)


def from_discrete_action(
    action_idx: jnp.ndarray, nbins: int, action_dim: int
) -> jnp.ndarray:
    """Map one categorical index to a continuous action grid point in
    [-1, 1]^action_dim (FromDiscreteAction, transforms.py:160-204).

    The grid enumerates nbins^action_dim lattice points; index decodes in
    row-major order.
    """
    coords = []
    idx = action_idx
    for _ in range(action_dim):
        coords.append(idx % nbins)
        idx = idx // nbins
    coords = jnp.stack(coords[::-1], axis=-1).astype(jnp.float32)
    return coords / (nbins - 1) * 2.0 - 1.0


def from_multidiscrete_action(
    action_idx: jnp.ndarray, nbins: Sequence[int]
) -> jnp.ndarray:
    """Per-dimension categorical indices → continuous [-1, 1] values
    (FromMultiDiscreteAction, transforms.py:206-248)."""
    n = jnp.asarray(nbins, jnp.float32)
    return action_idx.astype(jnp.float32) / (n - 1.0) * 2.0 - 1.0


def depth_image_norm(
    depth: jnp.ndarray, min_range: float, max_range: float
) -> jnp.ndarray:
    """Clip + normalize depth frames to [0, 1] (DepthImageNorm,
    transforms.py:250-270)."""
    x = jnp.clip(depth, min_range, max_range)
    return (max_range - x) / (max_range - min_range)
