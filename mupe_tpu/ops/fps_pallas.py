"""Pallas TPU kernel for farthest-point sampling.

The jnp fallback (`ops.fps.farthest_point_sampling`) runs K sequential
argmax/update rounds as separate XLA ops over HBM-resident arrays.  This
kernel keeps the whole working set — points [N, D], the running
min-distance vector, and the selection list — in VMEM and runs the K rounds
in one `fori_loop` inside a single kernel: no per-round kernel launches, no
HBM traffic after the initial load.

Capacity: N·D·4 bytes plus two [8, N] f32 rows must fit in ~16 MB VMEM —
N=8192, D=32 uses ~1.3 MB, far below the AEG buffer's worst case need
(hideandseek_envgen.py buffer_length 5000, task_dim 27).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(points_ref, mask_ref, start_ref, out_ref, mind_ref):
    """points [N, D] f32; mask [1, N] f32 (1=valid); start [1,1] i32;
    out [1, K] i32; scratch mind [1, N] f32."""
    n = points_ref.shape[0]
    k = out_ref.shape[1]
    neg = jnp.float32(-3.0e38)

    start = start_ref[0, 0]
    first = points_ref[pl.ds(start, 1), :]                      # [1, D]
    d0 = jnp.sum(jnp.square(points_ref[:, :] - first), axis=1)  # [N]
    valid = mask_ref[0, :] > 0.5
    mind_ref[0, :] = jnp.where(valid, d0, neg)
    out_ref[0, 0] = start

    def body(i, _):
        nxt = jnp.argmax(mind_ref[0, :]).astype(jnp.int32)
        out_ref[0, i] = nxt
        row = points_ref[pl.ds(nxt, 1), :]                      # [1, D]
        d = jnp.sum(jnp.square(points_ref[:, :] - row), axis=1)
        d = jnp.where(valid, d, neg)
        mind_ref[0, :] = jnp.minimum(mind_ref[0, :], d)
        return 0

    jax.lax.fori_loop(1, k, body, 0)


@functools.partial(jax.jit, static_argnames=("k",))
def farthest_point_sampling_pallas(
    points: jnp.ndarray,                 # [N, D] float32
    k: int,
    valid: jnp.ndarray | None = None,    # [N] bool
    start_index: int | jnp.ndarray = 0,
) -> jnp.ndarray:
    """Drop-in Pallas variant of `farthest_point_sampling` → indices [k]."""
    n, d = points.shape
    # pad feature dim to the 128-lane boundary for clean VMEM tiling
    d_pad = int(np.ceil(d / 128.0)) * 128
    if d_pad != d:
        points = jnp.pad(points, ((0, 0), (0, d_pad - d)))
    if valid is None:
        valid = jnp.ones((n,), bool)
    mask = valid.astype(jnp.float32)[None, :]
    start = jnp.asarray(start_index, jnp.int32).reshape(1, 1)

    out = pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
    )(points.astype(jnp.float32), mask, start)
    return out[0]
