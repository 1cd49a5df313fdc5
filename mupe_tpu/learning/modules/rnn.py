"""Recurrent cores with episode-boundary masking.

Counterpart of omni_drones/learning/modules/rnn.py:32-129: a GRU whose hidden
state is zeroed wherever `is_init` is set, with a LayerNorm residual output —
safe under vmap/scan because state is explicit.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


class MaskedGRU(nn.Module):
    """Single-step GRU cell + LayerNorm residual (rnn.py:32-129)."""

    hidden_size: int = 128

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                   # (..., D)
        state: Optional[jnp.ndarray],     # (..., H) or None
        is_init: Optional[jnp.ndarray] = None,  # (..., 1) bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if state is None:
            state = jnp.zeros(x.shape[:-1] + (self.hidden_size,), x.dtype)
        if is_init is not None:
            state = jnp.where(is_init.astype(bool), 0.0, state)
        new_state, out = nn.GRUCell(self.hidden_size)(state, x)
        out = nn.LayerNorm()(out + nn.Dense(self.hidden_size)(x))
        return out, new_state
