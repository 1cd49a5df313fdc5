"""TP-net: the Evader Prediction-Enhanced Network (paper contribution #1).

LSTM(input→64) over a 10-frame masked observation history, linear head, tanh
— predicting `future_prediction_step` normalized future evader positions.
Counterpart of omni_drones/learning/mappo.py:572-589 (`TP_net`), wired into
observations at hideandseek.py:805-854.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_GATES = ("i", "f", "g", "o")


class _GateParams(nn.Module):
    """Param holder replicating one OptimizedLSTMCell gate Dense's tree
    ({'kernel'[, 'bias']}) so the fused path below shares checkpoints with
    the nn.RNN(OptimizedLSTMCell) reference path bit-for-bit."""

    in_dim: int
    out_dim: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.out_dim),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_dim,))
            if self.use_bias
            else None
        )
        return k, b


class _FusedLSTM(nn.Module):
    """LSTM over a short fixed window with the INPUT projections of all
    steps hoisted into one matmul.

    nn.RNN(OptimizedLSTMCell) issues 2 small matmuls per step (K = input
    dim 16 and K = hidden 64 — mostly MXU padding at these contraction
    widths); here x@W_i for every gate and every step is ONE
    [B·T, F] × [F, 4H] matmul, and only the [B, H] × [H, 4H] recurrence
    stays sequential.  Same math, same param tree (scope name pinned to
    OptimizedLSTMCell_0), measured ~2x faster at the TP update's 240K-row
    batches."""

    hidden_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, xf: jnp.ndarray) -> jnp.ndarray:
        """xf: [B, T, F] → last hidden state [B, H]."""
        b, t, f = xf.shape
        h = self.hidden_dim
        iks, hks, hbs = [], [], []
        for g in _GATES:
            ik, _ = _GateParams(f, h, use_bias=False, name=f"i{g}")()
            hk, hb = _GateParams(h, h, use_bias=True, name=f"h{g}")()
            iks.append(ik)
            hks.append(hk)
            hbs.append(hb)
        wi = jnp.concatenate(iks, axis=1).astype(self.dtype)   # [F, 4H]
        wh = jnp.concatenate(hks, axis=1).astype(self.dtype)   # [H, 4H]
        bh = jnp.concatenate(hbs, axis=0).astype(self.dtype)   # [4H]
        xw = (
            xf.reshape(b * t, f).astype(self.dtype) @ wi
        ).reshape(b, t, 4 * h)

        c0 = jnp.zeros((b, h), self.dtype)
        h0 = jnp.zeros((b, h), self.dtype)
        carry = (c0, h0)
        # unrolled python loop: T is small and static (10); matches the
        # RNN path's unroll=16 and keeps XLA free to pipeline
        for step in range(t):
            c, hh = carry
            gates = xw[:, step] + hh @ wh + bh
            gi = nn.sigmoid(gates[:, :h])
            gf = nn.sigmoid(gates[:, h : 2 * h])
            gg = jnp.tanh(gates[:, 2 * h : 3 * h])
            go = nn.sigmoid(gates[:, 3 * h :])
            c = gf * c + gi * gg
            hh = go * jnp.tanh(c)
            carry = (c, hh)
        return carry[1]


class TPNet(nn.Module):
    """LSTM encoder over the history window → tanh-normalized predictions.

    The LSTM matmuls run in bfloat16 (params and the head stay float32):
    the supervised update processes ~240 K windows per training iteration
    and the matmul tower is its entire cost; tanh-bounded activations make
    bf16 safe here, matching the policy trunks' precision policy.

    `fused_input_proj` (default) hoists all per-step input projections
    into one matmul (see _FusedLSTM) — same math and the SAME param tree
    as the nn.RNN(OptimizedLSTMCell) reference path (kept for the
    equivalence test), so checkpoints are interchangeable.
    """

    output_dim: int            # 3 * future_prediction_step
    hidden_dim: int = 64
    future_prediction_step: int = 5
    window_step: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    fused_input_proj: bool = bool(int(__import__("os").environ.get("MUPE_TP_FUSED", "0")))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., history_step, input_dim) → (..., output_dim) in (−1, 1)."""
        batch_shape = x.shape[:-2]
        t = x.shape[-2]
        xf = x.reshape((-1, t, x.shape[-1]))
        if self.fused_input_proj:
            last = _FusedLSTM(
                self.hidden_dim, self.dtype, name="OptimizedLSTMCell_0"
            )(xf).astype(jnp.float32)
        else:
            # unroll the (short, fixed) history window: removes a nested
            # while loop from the enclosing rollout scan, which costs
            # disproportionate XLA compile time and serializes tiny matmuls
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
