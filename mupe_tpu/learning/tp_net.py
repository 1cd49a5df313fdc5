"""TP-net: the Evader Prediction-Enhanced Network (paper contribution #1).

LSTM(input→64) over a 10-frame masked observation history, linear head, tanh
— predicting `future_prediction_step` normalized future evader positions.
Counterpart of omni_drones/learning/mappo.py:572-589 (`TP_net`), wired into
observations at hideandseek.py:805-854.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class TPNet(nn.Module):
    """LSTM encoder over the history window → tanh-normalized predictions.

    The LSTM matmuls run in bfloat16 (params and the head stay float32):
    the supervised update processes ~240 K windows per training iteration
    and the matmul tower is its entire cost; tanh-bounded activations make
    bf16 safe here, matching the policy trunks' precision policy.
    """

    output_dim: int            # 3 * future_prediction_step
    hidden_dim: int = 64
    future_prediction_step: int = 5
    window_step: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., history_step, input_dim) → (..., output_dim) in (−1, 1)."""
        batch_shape = x.shape[:-2]
        t = x.shape[-2]
        xf = x.reshape((-1, t, x.shape[-1]))
        # unroll the (short, fixed) history window: removes a nested while
        # loop from the enclosing rollout scan, which costs disproportionate
        # XLA compile time and serializes tiny matmuls at run time
        outs = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden_dim, dtype=self.dtype),
            unroll=16, name="lstm",
        )(xf)
        last = outs[:, -1, :].astype(jnp.float32)
        y = nn.Dense(self.output_dim, name="fc")(last)
        return jnp.tanh(y).reshape(batch_shape + (self.output_dim,))


def denormalize_predictions(
    pred: jnp.ndarray, arena_size: float, max_height: float
) -> jnp.ndarray:
    """Map tanh outputs to arena coordinates (hideandseek.py:835-836):
    x, y ∈ [−arena/2·… scaled by 0.5·arena], z ∈ [0, max_height]."""
    xy = pred[..., :2] * 0.5 * arena_size
    z = (pred[..., 2:3] + 1.0) / 2.0 * max_height
    return jnp.concatenate([xy, z], axis=-1)


def normalize_groundtruth(
    pos: jnp.ndarray, arena_size: float, max_height: float
) -> jnp.ndarray:
    """Inverse mapping for supervision targets (hideandseek.py:840-842)."""
    xy = pos[..., :2] / (0.5 * arena_size)
    z = pos[..., 2:3] / max_height * 2.0 - 1.0
    return jnp.concatenate([xy, z], axis=-1)
