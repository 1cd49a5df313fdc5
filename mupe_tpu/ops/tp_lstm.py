"""Fused Pallas TPU kernel for the TP-net LSTM (fwd + bwd).

The TP-net supervised update (learning/mappo.py `_update_tp`, reference
omni_drones/learning/mappo.py:407-443) runs a 10-step LSTM(16→64) + linear
head over ~240K windows per training iteration.  XLA executes the
recurrence as 10 sequential step programs whose [240K, 64] hidden/cell
activations round-trip HBM every step — ~2 GB of traffic fwd and twice
that in the backward, measured 15.8 ms of the 290 ms iteration (round-4
profile).  Here the whole window runs in ONE kernel per direction: a row
tile's h/c live in VMEM across all 10 steps, the only HBM traffic is the
input window (read once) and the prediction (written once), and the
backward recomputes the forward per tile (the per-step tensors stay in
VMEM) before backpropagating through time in-kernel, accumulating the
parameter gradients across sequential grid steps.

Layout notes (Mosaic): the LSTM's hidden width 64 is half a native lane
tile, so every gate slice at a 64-lane offset would mis-align.  All
parameters are therefore LANE-PADDED to hidden 128 (gate blocks at
0/128/256/384 of a 512-wide gate buffer): `wh` rows 64-127 are zero, so
padded hidden lanes stay exactly 0 through the recurrence (c_pad = 0.5 *
c_pad + 0.5 * tanh(0) = 0, h_pad = sigmoid(0) * tanh(0) = 0) and the
padded math is bit-equivalent to the 64-wide reference.  The padding and
un-padding live OUTSIDE the custom_vjp, so `jax.grad` slices the padded
parameter gradients back to the true shapes automatically.

`tp_apply` is the public entry: the TPNet flax param tree + windows
[N, T, F] → tanh predictions [N, O], differentiable wrt the params (the
cotangent for x is zero — windows are data).  Off-TPU it falls back to
`reference_tp_apply`, the same math in plain jnp (also the golden model
for the equivalence tests).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GATES = ("i", "f", "g", "o")
_HPAD = 128  # lane-padded hidden width (real hidden = spec.hidden)


@dataclasses.dataclass(frozen=True)
class TPLSTMSpec:
    input_dim: int            # F (tp_input_dim, 16 for HideAndSeek)
    hidden: int               # true hidden width (64)
    t_steps: int              # history window length (10)
    out_dim: int              # 3 * future_prediction_step (15)
    tile: int = int(os.environ.get("MUPE_TP_TILE", "512"))


# ------------------------------------------------------------------ params
def extract_tp_leaves(params) -> Tuple[jnp.ndarray, ...]:
    """TPNet param tree → canonical tuple (wi [F,4H], wh [H,4H], b [4H],
    wfc [H,O], bfc [O]), gates concatenated in (i, f, g, o) order.

    Supports both TPNet param layouts (same leaves, different scopes):
    the nn.RNN(OptimizedLSTMCell) default (`lstm`) and the fused-input
    variant (`OptimizedLSTMCell_0`)."""
    p = params["params"]
    cell = p.get("OptimizedLSTMCell_0")
    if cell is None:
        cell = p["lstm"]
        while "ii" not in cell:  # nn.RNN nests the cell one level down
            cell = cell[next(iter(cell))]
    iks = [cell[f"i{g}"]["kernel"] for g in _GATES]
    hks = [cell[f"h{g}"]["kernel"] for g in _GATES]
    hbs = [cell[f"h{g}"]["bias"] for g in _GATES]
    wi = jnp.concatenate(iks, axis=1)
    wh = jnp.concatenate(hks, axis=1)
    b = jnp.concatenate(hbs, axis=0)
    return wi, wh, b, p["fc"]["kernel"], p["fc"]["bias"]


def _pad_leaves(spec: TPLSTMSpec, leaves):
    """Lane-pad hidden 64 → 128: gate blocks land at 128-lane offsets.

    wi [F, 4h] → [F, 4*128]; wh [h, 4h] → [128, 4*128] (pad rows AND the
    per-gate columns); b [4h] → [512]; wfc [h, O] → [128, O]."""
    h = spec.hidden
    wi, wh, b, wfc, bfc = leaves

    def pad_gates(m):  # [..., 4h] → [..., 4*_HPAD]
        parts = [m[..., g * h : (g + 1) * h] for g in range(4)]
        parts = [
            jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, _HPAD - h)])
            for x in parts
        ]
        return jnp.concatenate(parts, axis=-1)

    wi_p = pad_gates(wi)
    wh_p = jnp.pad(pad_gates(wh), ((0, _HPAD - h), (0, 0)))
    b_p = pad_gates(b)
    wfc_p = jnp.pad(wfc, ((0, _HPAD - h), (0, 0)))
    return wi_p, wh_p, b_p, wfc_p, bfc


# ------------------------------------------------------------------ kernels
def _fwd_steps(spec: TPLSTMSpec, x, wi, wh, b):
    """Shared recurrence: returns per-step (i, f, g, o, c, h) lists.
    x [tile, T, F] f32; params padded (f32 in-kernel, bf16 matmuls)."""
    tile = x.shape[0]
    h_st = jnp.zeros((tile, _HPAD), jnp.float32)
    c_st = jnp.zeros((tile, _HPAD), jnp.float32)
    wi_b = wi.astype(jnp.bfloat16)
    wh_b = wh.astype(jnp.bfloat16)
    acts, cs, hs = [], [c_st], [h_st]
    for t in range(spec.t_steps):
        xt = x[:, t, :].astype(jnp.bfloat16)          # [tile, F]
        g_all = (
            jnp.dot(xt, wi_b, preferred_element_type=jnp.float32)
            + jnp.dot(
                h_st.astype(jnp.bfloat16), wh_b,
                preferred_element_type=jnp.float32,
            )
            + b
        )                                              # [tile, 4*_HPAD]
        gi = jax.nn.sigmoid(g_all[:, 0 * _HPAD : 1 * _HPAD])
        gf = jax.nn.sigmoid(g_all[:, 1 * _HPAD : 2 * _HPAD])
        gg = jnp.tanh(g_all[:, 2 * _HPAD : 3 * _HPAD])
        go = jax.nn.sigmoid(g_all[:, 3 * _HPAD : 4 * _HPAD])
        c_st = gf * c_st + gi * gg
        h_st = go * jnp.tanh(c_st)
        acts.append((gi, gf, gg, go))
        cs.append(c_st)
        hs.append(h_st)
    return acts, cs, hs


def _head(h_last, wfc, bfc):
    z = (
        jnp.dot(
            h_last.astype(jnp.bfloat16), wfc.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + bfc
    )
    return jnp.tanh(z)


def _tp_fwd_kernel(spec: TPLSTMSpec, x_ref, wi, wh, b, wfc, bfc, y_ref):
    x = x_ref[...].astype(jnp.float32)
    _, _, hs = _fwd_steps(spec, x, wi[...], wh[...], b[...])
    y_ref[...] = _head(hs[-1], wfc[...], bfc[...])


def _tp_bwd_kernel(
    spec: TPLSTMSpec,
    x_ref, dy_ref, wi_r, wh_r, b_r, wfc_r, bfc_r,
    dwi_ref, dwh_ref, db_ref, dwfc_ref, dbfc_ref,
):
    x = x_ref[...].astype(jnp.float32)
    wi, wh, b = wi_r[...], wh_r[...], b_r[...]
    wfc, bfc = wfc_r[...], bfc_r[...]
    acts, cs, hs = _fwd_steps(spec, x, wi, wh, b)

    y = _head(hs[-1], wfc, bfc)
    dy = dy_ref[...].astype(jnp.float32)
    dz = dy * (1.0 - y * y)                            # [tile, O]
    hb = hs[-1].astype(jnp.bfloat16)
    dwfc = jax.lax.dot_general(
        hb, dz.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [_HPAD, O]
    dbfc = jnp.sum(dz, axis=0)
    dh = jax.lax.dot_general(
        dz.astype(jnp.bfloat16), wfc.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [tile, _HPAD]
    dc = jnp.zeros_like(dh)
    dwi = jnp.zeros((spec.input_dim, 4 * _HPAD), jnp.float32)
    dwh = jnp.zeros((_HPAD, 4 * _HPAD), jnp.float32)
    db = jnp.zeros((4 * _HPAD,), jnp.float32)
    wh_b = wh.astype(jnp.bfloat16)
    for t in reversed(range(spec.t_steps)):
        gi, gf, gg, go = acts[t]
        c_t, c_prev, h_prev = cs[t + 1], cs[t], hs[t]
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc + dh * go * (1.0 - tc * tc)
        di = dc * gg
        dgg = dc * gi
        df = dc * c_prev
        dc = dc * gf                                   # carry to t-1
        dg_all = jnp.concatenate(
            [
                di * gi * (1.0 - gi),
                df * gf * (1.0 - gf),
                dgg * (1.0 - gg * gg),
                do * go * (1.0 - go),
            ],
            axis=1,
        )                                              # [tile, 4*_HPAD]
        db = db + jnp.sum(dg_all, axis=0)
        dgb = dg_all.astype(jnp.bfloat16)
        dwh = dwh + jax.lax.dot_general(
            h_prev.astype(jnp.bfloat16), dgb,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xt = x[:, t, :].astype(jnp.bfloat16)
        dwi = dwi + jax.lax.dot_general(
            xt, dgb,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh = jax.lax.dot_general(
            dgb, wh_b,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [tile, _HPAD]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for gr in (dwi_ref, dwh_ref, db_ref, dwfc_ref, dbfc_ref):
            gr[...] = jnp.zeros(gr.shape, jnp.float32)

    dwi_ref[...] = dwi_ref[...] + dwi
    dwh_ref[...] = dwh_ref[...] + dwh
    db_ref[...] = db_ref[...] + db
    dwfc_ref[...] = dwfc_ref[...] + dwfc
    dbfc_ref[...] = dbfc_ref[...] + dbfc


# ------------------------------------------------------------------ calls
def _const_spec(shape):
    return pl.BlockSpec(
        shape, lambda i, _s=shape: (0,) * len(_s), memory_space=pltpu.VMEM
    )


@functools.lru_cache(maxsize=None)
def _build_tp_calls(spec: TPLSTMSpec, n_padded: int, interpret: bool):
    assert n_padded % spec.tile == 0, (n_padded, spec.tile)
    grid = (n_padded // spec.tile,)
    f, t, o = spec.input_dim, spec.t_steps, spec.out_dim
    x_spec = pl.BlockSpec(
        (spec.tile, t, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (spec.tile, o), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    pshapes = [
        (f, 4 * _HPAD), (_HPAD, 4 * _HPAD), (4 * _HPAD,), (_HPAD, o), (o,)
    ]
    pspecs = [_const_spec(s) for s in pshapes]

    def fwd(x, *leaves):
        return pl.pallas_call(
            functools.partial(_tp_fwd_kernel, spec),
            grid=grid,
            in_specs=[x_spec] + pspecs,
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((n_padded, o), jnp.float32),
            interpret=interpret,
        )(x, *leaves)

    def bwd(x, dy, *leaves):
        return pl.pallas_call(
            functools.partial(_tp_bwd_kernel, spec),
            grid=grid,
            in_specs=[x_spec, row_spec] + pspecs,
            out_specs=pspecs,
            out_shape=[
                jax.ShapeDtypeStruct(s, jnp.float32) for s in pshapes
            ],
            interpret=interpret,
        )(x, dy, *leaves)

    return fwd, bwd


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pad_rows3(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0
        )
    return x


# ------------------------------------------------------------- public entry
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tp_core(spec: TPLSTMSpec, padded_leaves, x):
    """Padded-param LSTM+head forward: x [N, T, F] → y [N, O]."""
    if not _on_tpu():
        return _reference_padded(spec, padded_leaves, x)
    n = x.shape[0]
    xp = _pad_rows3(x.astype(jnp.float32), spec.tile)
    fwd, _ = _build_tp_calls(spec, xp.shape[0], False)
    return fwd(xp, *padded_leaves)[:n]


def _reference_padded(spec, padded_leaves, x):
    wi, wh, b, wfc, bfc = padded_leaves
    n = x.shape[0]
    h = jnp.zeros((n, _HPAD), jnp.float32)
    c = jnp.zeros((n, _HPAD), jnp.float32)
    for t in range(spec.t_steps):
        g_all = x[:, t, :].astype(jnp.float32) @ wi + h @ wh + b
        gi = jax.nn.sigmoid(g_all[:, :_HPAD])
        gf = jax.nn.sigmoid(g_all[:, _HPAD : 2 * _HPAD])
        gg = jnp.tanh(g_all[:, 2 * _HPAD : 3 * _HPAD])
        go = jax.nn.sigmoid(g_all[:, 3 * _HPAD :])
        c = gf * c + gi * gg
        h = go * jnp.tanh(c)
    return jnp.tanh(h @ wfc + bfc)


def _tp_vjp_fwd(spec, padded_leaves, x):
    return _tp_core(spec, padded_leaves, x), (padded_leaves, x)


def _tp_vjp_bwd(spec, resids, dy):
    padded_leaves, x = resids
    if not _on_tpu():
        _, pullback = jax.vjp(
            lambda lv: _reference_padded(spec, lv, x), padded_leaves
        )
        return pullback(dy)[0], jnp.zeros_like(x)
    n = x.shape[0]
    xp = _pad_rows3(x.astype(jnp.float32), spec.tile)
    dyp = _pad_rows3(dy.astype(jnp.float32), spec.tile)
    _, bwd = _build_tp_calls(spec, xp.shape[0], False)
    grads = bwd(xp, dyp, *padded_leaves)
    grads = tuple(
        g.astype(l.dtype) for g, l in zip(grads, padded_leaves)
    )
    return grads, jnp.zeros_like(x)


_tp_core.defvjp(_tp_vjp_fwd, _tp_vjp_bwd)


def tp_apply(spec: TPLSTMSpec, params, x):
    """TPNet forward through the fused kernel: params (flax tree) +
    x [..., T, F] → [..., O].  Differentiable wrt params; same math as
    `TPNet.apply` (equivalence-tested), so checkpoints are unaffected."""
    batch_shape = x.shape[:-2]
    xf = x.reshape((-1,) + x.shape[-2:])
    leaves = _pad_leaves(spec, extract_tp_leaves(params))
    y = _tp_core(spec, leaves, xf)
    return y.reshape(batch_shape + (spec.out_dim,))


# ================================================================ transposed
# Batch-in-LANES layout: the padded-lane kernels above waste 3.6x the LSTM
# FLOPs because hidden 64 is half a lane tile (every gate slice must sit at
# a 128-lane boundary, so all params are lane-padded to 128).  SUBLANE
# granularity is 8, not 128 — with hidden/gates in sublanes and samples in
# lanes, gate blocks slice at their true 64-row offsets and the matmuls run
# at the real [4H, H+F] sizes.  Same math, ~3.6x fewer MACs.
# lane-tile sweep (e2e bench at 4096x64): 512 -> 949.5K, 1024 -> 954.3K,
# 1536 -> 950.5K env-steps/s; 1024 is the sweet spot under the 27 MB
# update-program scoped-VMEM limit
_TILE_T = int(os.environ.get("MUPE_TP_TILE_T", "1024"))


def _opad(o: int) -> int:
    return -(-o // 8) * 8


def _fwd_steps_t(spec: TPLSTMSpec, xt, wiT, whT, bT):
    """Transposed recurrence: xt [T·F, n]; params transposed & unpadded
    (wiT [4H, F], whT [4H, H], bT [4H, 1]).  Returns per-step gate/state
    lists of [H, n] ([4H] blocks in (i, f, g, o) row order)."""
    h_dim, f = spec.hidden, spec.input_dim
    n = xt.shape[1]
    h_st = jnp.zeros((h_dim, n), jnp.float32)
    c_st = jnp.zeros((h_dim, n), jnp.float32)
    wi_b = wiT.astype(jnp.bfloat16)
    wh_b = whT.astype(jnp.bfloat16)
    acts, cs, hs = [], [c_st], [h_st]
    for t in range(spec.t_steps):
        xb = xt[t * f : (t + 1) * f, :].astype(jnp.bfloat16)   # [F, n]
        g_all = (
            jnp.dot(wi_b, xb, preferred_element_type=jnp.float32)
            + jnp.dot(
                wh_b, h_st.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            + bT
        )                                                      # [4H, n]
        gi = jax.nn.sigmoid(g_all[0 * h_dim : 1 * h_dim])
        gf = jax.nn.sigmoid(g_all[1 * h_dim : 2 * h_dim])
        gg = jnp.tanh(g_all[2 * h_dim : 3 * h_dim])
        go = jax.nn.sigmoid(g_all[3 * h_dim : 4 * h_dim])
        c_st = gf * c_st + gi * gg
        h_st = go * jnp.tanh(c_st)
        acts.append((gi, gf, gg, go))
        cs.append(c_st)
        hs.append(h_st)
    return acts, cs, hs


def _head_t(h_last, wfcT, bfcT):
    """[Opad, n] head (pad rows of wfcT/bfcT are zero → pad outputs 0)."""
    z = (
        jnp.dot(
            wfcT.astype(jnp.bfloat16), h_last.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + bfcT
    )
    return jnp.tanh(z)


def _tp_fwd_kernel_t(spec: TPLSTMSpec, x_ref, wiT, whT, bT, wfcT, bfcT, y_ref):
    xt = x_ref[...].astype(jnp.float32)
    _, _, hs = _fwd_steps_t(spec, xt, wiT[...], whT[...], bT[...])
    y_ref[...] = _head_t(hs[-1], wfcT[...], bfcT[...])


def _tp_bwd_kernel_t(
    spec: TPLSTMSpec,
    x_ref, dy_ref, wi_r, wh_r, b_r, wfc_r, bfc_r,
    dwi_ref, dwh_ref, db_ref, dwfc_ref, dbfc_ref,
):
    h_dim, f = spec.hidden, spec.input_dim
    xt = x_ref[...].astype(jnp.float32)
    wiT, whT, bT = wi_r[...], wh_r[...], b_r[...]
    wfcT, bfcT = wfc_r[...], bfc_r[...]
    acts, cs, hs = _fwd_steps_t(spec, xt, wiT, whT, bT)

    y = _head_t(hs[-1], wfcT, bfcT)                    # [Opad, n]
    dy = dy_ref[...].astype(jnp.float32)
    dz = dy * (1.0 - y * y)
    dzb = dz.astype(jnp.bfloat16)
    hb = hs[-1].astype(jnp.bfloat16)
    dwfc = jax.lax.dot_general(
        dzb, hb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [Opad, H]
    dbfc = jnp.sum(dz, axis=1, keepdims=True)          # [Opad, 1]
    dh = jax.lax.dot_general(
        wfcT.astype(jnp.bfloat16), dzb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [H, n]
    dc = jnp.zeros_like(dh)
    dwi = jnp.zeros((4 * h_dim, f), jnp.float32)
    dwh = jnp.zeros((4 * h_dim, h_dim), jnp.float32)
    db = jnp.zeros((4 * h_dim, 1), jnp.float32)
    wh_b = whT.astype(jnp.bfloat16)
    for t in reversed(range(spec.t_steps)):
        gi, gf, gg, go = acts[t]
        c_t, c_prev, h_prev = cs[t + 1], cs[t], hs[t]
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc + dh * go * (1.0 - tc * tc)
        di = dc * gg
        dgg = dc * gi
        df = dc * c_prev
        dc = dc * gf                                   # carry to t-1
        dg_all = jnp.concatenate(
            [
                di * gi * (1.0 - gi),
                df * gf * (1.0 - gf),
                dgg * (1.0 - gg * gg),
                do * go * (1.0 - go),
            ],
            axis=0,
        )                                              # [4H, n]
        db = db + jnp.sum(dg_all, axis=1, keepdims=True)
        dgb = dg_all.astype(jnp.bfloat16)
        dwh = dwh + jax.lax.dot_general(
            dgb, h_prev.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xb = xt[t * f : (t + 1) * f, :].astype(jnp.bfloat16)
        dwi = dwi + jax.lax.dot_general(
            dgb, xb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh = jax.lax.dot_general(
            wh_b, dgb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [H, n]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for gr in (dwi_ref, dwh_ref, db_ref, dwfc_ref, dbfc_ref):
            gr[...] = jnp.zeros(gr.shape, jnp.float32)

    dwi_ref[...] = dwi_ref[...] + dwi
    dwh_ref[...] = dwh_ref[...] + dwh
    db_ref[...] = db_ref[...] + db
    dwfc_ref[...] = dwfc_ref[...] + dwfc
    dbfc_ref[...] = dbfc_ref[...] + dbfc


@functools.lru_cache(maxsize=None)
def _build_tp_calls_t(spec: TPLSTMSpec, n_padded: int, interpret: bool):
    tile = _TILE_T if not interpret else max(8, n_padded)
    assert n_padded % tile == 0, (n_padded, tile)
    grid = (n_padded // tile,)
    h_dim, f, t, o = spec.hidden, spec.input_dim, spec.t_steps, spec.out_dim
    op = _opad(o)
    x_spec = pl.BlockSpec(
        (t * f, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    y_spec = pl.BlockSpec((op, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    pshapes = [
        (4 * h_dim, f), (4 * h_dim, h_dim), (4 * h_dim, 1), (op, h_dim), (op, 1)
    ]
    pspecs = [_const_spec(s) for s in pshapes]

    def fwd(xt, *tleaves):
        return pl.pallas_call(
            functools.partial(_tp_fwd_kernel_t, spec),
            grid=grid,
            in_specs=[x_spec] + pspecs,
            out_specs=y_spec,
            out_shape=jax.ShapeDtypeStruct((op, n_padded), jnp.float32),
            interpret=interpret,
        )(xt, *tleaves)

    def bwd(xt, dy, *tleaves):
        return pl.pallas_call(
            functools.partial(_tp_bwd_kernel_t, spec),
            grid=grid,
            in_specs=[x_spec, y_spec] + pspecs,
            out_specs=pspecs,
            out_shape=[
                jax.ShapeDtypeStruct(s, jnp.float32) for s in pshapes
            ],
            interpret=interpret,
        )(xt, dy, *tleaves)

    return fwd, bwd


def _pad_lanes(x, tile):
    n = x.shape[1]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:1] + (pad,), x.dtype)], axis=1
        )
    return x


def _reference_t(spec: TPLSTMSpec, tleaves, xt):
    """Transposed-layout golden model in plain jnp (f32)."""
    wiT, whT, bT, wfcT, bfcT = tleaves
    _, _, hs = _fwd_steps_t(spec, xt.astype(jnp.float32), wiT, whT, bT)
    return _head_t(hs[-1], wfcT, bfcT)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tp_core_t(spec: TPLSTMSpec, tleaves, xt):
    """Transposed LSTM+head forward: xt [T·F, N] → y [Opad, N]."""
    if not _on_tpu():
        return _reference_t(spec, tleaves, xt)
    n = xt.shape[1]
    xp = _pad_lanes(xt.astype(jnp.float32), _TILE_T)
    fwd, _ = _build_tp_calls_t(spec, xp.shape[1], False)
    return fwd(xp, *tleaves)[:, :n]


def _tp_t_vjp_fwd(spec, tleaves, xt):
    return _tp_core_t(spec, tleaves, xt), (tleaves, xt)


def _tp_t_vjp_bwd(spec, resids, dy):
    tleaves, xt = resids
    if not _on_tpu():
        _, pullback = jax.vjp(
            lambda lv: _reference_t(spec, lv, xt), tleaves
        )
        return pullback(dy)[0], jnp.zeros_like(xt)
    xp = _pad_lanes(xt.astype(jnp.float32), _TILE_T)
    dyp = _pad_lanes(dy.astype(jnp.float32), _TILE_T)
    _, bwd = _build_tp_calls_t(spec, xp.shape[1], False)
    grads = bwd(xp, dyp, *tleaves)
    grads = tuple(g.astype(l.dtype) for g, l in zip(grads, tleaves))
    return grads, jnp.zeros_like(xt)


_tp_core_t.defvjp(_tp_t_vjp_fwd, _tp_t_vjp_bwd)


def tp_apply_t(spec: TPLSTMSpec, params, x):
    """`tp_apply` in the transposed (batch-in-lanes) layout: params (flax
    tree) + x [..., T, F] → [..., O].  Differentiable wrt params; the
    entry/exit transposes are XLA ops outside the kernels, so parameter
    gradients transpose back automatically."""
    batch_shape = x.shape[:-2]
    t, f, o = spec.t_steps, spec.input_dim, spec.out_dim
    op = _opad(o)
    xf = x.reshape((-1,) + x.shape[-2:])
    wi, wh, b, wfc, bfc = extract_tp_leaves(params)
    wfc_t = wfc.T
    bfc_t = bfc[:, None]
    if op != o:
        wfc_t = jnp.concatenate(
            [wfc_t, jnp.zeros((op - o, spec.hidden), wfc_t.dtype)], axis=0
        )
        bfc_t = jnp.concatenate(
            [bfc_t, jnp.zeros((op - o, 1), bfc_t.dtype)], axis=0
        )
    tleaves = (wi.T, wh.T, b[:, None], wfc_t, bfc_t)
    xt = xf.transpose(1, 2, 0).reshape(t * f, -1)
    y = _tp_core_t(spec, tleaves, xt)[:o].T            # [N, O]
    return y.reshape(batch_shape + (spec.out_dim,))
