"""Generalized Advantage Estimation as a reverse `lax.scan`.

Counterpart of omni_drones/learning/utils/gae.py:27-74 — identical recursion,
but compiled as one fused scan over the time axis instead of a Python loop.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_gae(
    reward: jnp.ndarray,      # [T, N, k]
    done: jnp.ndarray,        # [T, N, 1] (or [T, N, k])
    value: jnp.ndarray,       # [T, N, k]
    next_value: jnp.ndarray,  # [N, k] — V(s_T)
    gamma: float = 0.99,
    lmbda: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Time-major GAE (gae.py:54-74 `compute_gae_`).

    Returns (advantages, returns) with returns = advantages + value.
    """
    not_done = 1.0 - done.astype(reward.dtype)

    def body(carry, inp):
        gae, nxt_value = carry
        r, nd, v = inp
        delta = r + gamma * nxt_value * nd - v
        gae = delta + gamma * lmbda * nd * gae
        return (gae, v), gae

    (_, _), adv_rev = jax.lax.scan(
        body,
        (jnp.zeros_like(next_value), next_value),
        (reward[::-1], not_done[::-1], value[::-1]),
    )
    advantages = adv_rev[::-1]
    return advantages, advantages + value
