#!/usr/bin/env python
"""On-chip Pallas compile smoke: every production kernel, fwd AND bwd, at
production shapes.  MUST be green on the real TPU before any snapshot —
interpreter-mode CI cannot catch Mosaic lowering failures (round 2 shipped
a kernel that failed `Invalid relayout` on the chip while all CPU tests
passed, zeroing the round's headline benchmark).

Runs in ~1-2 min (compiles dominate).  Exit code 0 = all kernels compile
and execute; prints per-kernel wall times (host-read synced — on the axon
relay backend `block_until_ready` returns immediately, only a device→host
transfer drains the queue).

Usage:  python scripts/pallas_smoke.py            # production shapes
        MUPE_FUSED_TILE=1024 python scripts/pallas_smoke.py   # tile sweep
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def _timed(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    _sync(out)
    t_compile = time.time() - t0
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    t_run = (time.time() - t0) / reps
    print(f"  {name:<28s} compile+1st {t_compile:7.2f}s   steady {t_run*1e3:8.2f} ms")
    return out


def main() -> int:
    backend = jax.default_backend()
    print(f"backend: {backend}  devices: {jax.devices()}")
    if backend != "tpu":
        print("WARNING: not on TPU — this smoke only proves anything on-chip")

    from mupe_tpu.learning.mappo import Actor, Critic
    from mupe_tpu.utils.jit import mupe_jit, tpu_compiler_options
    from mupe_tpu.ops.fused_encoder import (
        EncoderSpec,
        _build_calls,
        _build_pair_calls,
        extract_leaves,
        pack_obs,
    )

    # HideAndSeek production shapes: 3 entity groups -> 6 tokens; minibatch
    # (4096*64/16) rows x 3 agents = 49152 encoder rows.
    GROUPS = ((1, 35), (2, 3), (3, 5))
    NAMES = ["state_self", "state_others", "cylinders"]
    S = (4096 * 64 // 16) * 3
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    obs = {
        "state_self": jax.random.normal(ks[0], (S, 1, 35)),
        "state_others": jax.random.normal(ks[1], (S, 2, 3)),
        "cylinders": jax.random.normal(ks[2], (S, 3, 5)),
    }
    spec_a = EncoderSpec(groups=GROUPS, head_dim=4)
    spec_c = EncoderSpec(groups=GROUPS, head_dim=1)
    opts = tpu_compiler_options("update")
    print(f"rows={S} tile={spec_a.tile} fwd_tile={spec_a.fwd_tile} update_compiler_options={opts}")
    actor = Actor(
        action_dim=4, hidden_units=(256,),
        attn_encoder="PartialAttentionEncoder", obs_is_dict=True,
        dtype=jnp.bfloat16,
    )
    critic = Critic(
        out_dim=1, hidden_units=(256,),
        attn_encoder="PartialAttentionEncoder", obs_is_dict=True,
        dtype=jnp.bfloat16,
    )
    obs1 = jax.tree_util.tree_map(lambda x: x[:1], obs)
    pa = actor.init(ks[3], obs1)
    pc = critic.init(jax.random.PRNGKey(5), obs1)
    la = extract_leaves(spec_a, pa, NAMES)
    lc = extract_leaves(spec_c, pc, NAMES)
    x, _ = pack_obs(spec_a, obs, NAMES)
    dout_a = jnp.ones((S, 4), jnp.float32)
    dout_c = jnp.ones((S, 1), jnp.float32)

    fwd_a, bwd_a = _build_calls(spec_a, S, False)
    fwd_p, bwd_p = _build_pair_calls(spec_a, spec_c, S, False)

    from mupe_tpu.ops.fused_encoder import PPOLossCfg, fused_pair_ppo_grads

    loss_cfg = PPOLossCfg(
        clip_param=0.1, huber_delta=10.0, action_dim=4, n_rows=S
    )
    aux = jax.random.normal(jax.random.PRNGKey(11), (S, 8)) * 0.3
    log_std = jnp.zeros((4,))

    def ppo_grads(x, aux, log_std):
        return fused_pair_ppo_grads(
            spec_a, spec_c, loss_cfg, la, lc, log_std, x,
            aux[:, :4], aux[:, 4:5], aux[:, 5:6], aux[:, 6:7], aux[:, 7:8],
        )

    fails = []
    cases = [
        ("encoder fwd (actor)", mupe_jit(fwd_a, role="update"), (x,) + la),
        ("encoder bwd (actor)", mupe_jit(bwd_a, role="update"), (x, dout_a) + la),
        ("pair fwd (actor+critic)", mupe_jit(fwd_p, role="update"), (x, la, lc)),
        ("pair bwd (actor+critic)", mupe_jit(bwd_p, role="update"), (x, dout_a, dout_c, la, lc)),
        ("pair fwd+loss+bwd (PPO)", mupe_jit(ppo_grads, role="update"), (x, aux, log_std)),
    ]
    for name, fn, args in cases:
        try:
            _timed(name, fn, *args)
        except Exception as e:  # noqa: BLE001 — report every kernel
            fails.append(name)
            print(f"  {name:<28s} FAILED: {type(e).__name__}: {e}")

    # Split pair-bwd row coverage at a row count that is a fwd-tile
    # multiple but NOT a bwd-tile multiple (49152 = 32*1536, but
    # 49152/640 = 76.8): the round-4 advisor found the one-field tile
    # replace kept pad_tile at 1536 while launching the bwd grid at 640,
    # silently dropping the trailing 512 rows from the parameter
    # gradients.  Checked by value against the pure-jnp reference vjp.
    try:
        from mupe_tpu.ops.fused_encoder import (
            fused_pair_encoder_head,
            reference_apply,
        )

        assert S % spec_a.fwd_tile == 0 and S % 640 != 0, (
            "smoke shape no longer exercises the bwd-tile remainder"
        )

        def pair_loss(leaves):
            oa, oc = fused_pair_encoder_head(
                spec_a, spec_c, leaves[0], leaves[1], x
            )
            return jnp.sum(oa) + jnp.sum(oc)

        def ref_loss(leaves):
            oa = reference_apply(spec_a, leaves[0], x)
            oc = reference_apply(spec_c, leaves[1], x)
            return jnp.sum(oa) + jnp.sum(oc)

        gk = _timed(
            "split pair-bwd (public vjp)",
            mupe_jit(jax.grad(pair_loss), role="update"), (la, lc),
        )
        gr = jax.jit(jax.grad(ref_loss))((la, lc))
        # the sum() loss makes the HEAD BIAS gradients exactly the row
        # count — the sharpest row-coverage probe (a launch that drops
        # the 512-row bwd remainder reports 48640 here, measured before
        # the fix).  Leaves: actor head bias = last actor leaf, critic
        # head bias = last critic leaf.
        for name_b, g in (("actor", gk[0][-1]), ("critic", gk[1][-1])):
            got = float(jnp.max(jnp.abs(g)))
            if abs(got - S) > 0.001 * S:
                fails.append(
                    f"split pair-bwd row coverage ({name_b} head-bias "
                    f"grad {got:.0f} != n_rows {S})"
                )
        # value agreement per leaf; near-zero reference leaves (layernorm
        # bias grads that cancel over the batch) get a denominator floor
        # so precision noise on them doesn't read as a mismatch
        gmax = max(
            float(jnp.max(jnp.abs(b)))
            for b in jax.tree_util.tree_leaves(gr)
        )
        worst = 0.0
        for a, b in zip(
            jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)
        ):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-4 * gmax)
            worst = max(
                worst, float(jnp.max(jnp.abs(a - b))) / scale
            )
        print(f"  split pair-bwd grad rel err vs reference: {worst:.4f}")
        if worst > 0.05:
            fails.append("split pair-bwd row coverage (grad mismatch)")
    except Exception as e:  # noqa: BLE001
        fails.append("split pair-bwd row coverage")
        print(f"  split pair-bwd             FAILED: {type(e).__name__}: {e}")

    # TP-LSTM fused kernel (ops/tp_lstm.py) at the production update
    # shape (59 windows x 4096 envs) — fwd + vjp-bwd, grads checked
    # against the padded-jnp reference
    try:
        from mupe_tpu.learning.tp_net import TPNet
        from mupe_tpu.ops.tp_lstm import (
            TPLSTMSpec,
            _reference_padded,
            extract_tp_leaves,
            _pad_leaves,
            tp_apply,
        )

        n_tp, t_tp, f_tp, o_tp = 59 * 4096, 10, 16, 15
        tp_net = TPNet(output_dim=o_tp, hidden_dim=64, dtype=jnp.bfloat16)
        x_tp = jax.random.normal(
            jax.random.PRNGKey(21), (n_tp, t_tp, f_tp)
        ) * 0.5
        tp_params = tp_net.init(jax.random.PRNGKey(22), x_tp[:1])
        tp_spec = TPLSTMSpec(
            input_dim=f_tp, hidden=64, t_steps=t_tp, out_dim=o_tp
        )
        tgt_tp = jax.random.normal(jax.random.PRNGKey(23), (n_tp, o_tp))

        def tp_loss(p):
            return jnp.mean(
                jnp.square(tp_apply(tp_spec, p, x_tp) - tgt_tp)
            )

        _timed("tp_lstm fwd", mupe_jit(
            lambda p: tp_apply(tp_spec, p, x_tp), role="update"), tp_params)
        gk = _timed(
            "tp_lstm fwd+bwd (vjp)",
            mupe_jit(jax.grad(tp_loss), role="update"), tp_params,
        )
        pl_ref = _pad_leaves(tp_spec, extract_tp_leaves(tp_params))

        def tp_loss_ref(lv):
            return jnp.mean(
                jnp.square(_reference_padded(tp_spec, lv, x_tp) - tgt_tp)
            )

        gr_pad = jax.jit(jax.grad(tp_loss_ref))(pl_ref)
        gk_pad = _pad_leaves(
            tp_spec, extract_tp_leaves(jax.tree_util.tree_map(lambda a: a, gk))
        )
        worst_tp = 0.0
        gmax_tp = max(
            float(jnp.max(jnp.abs(b)))
            for b in jax.tree_util.tree_leaves(gr_pad)
        )
        for a, b in zip(gk_pad, gr_pad):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-4 * gmax_tp)
            worst_tp = max(
                worst_tp, float(jnp.max(jnp.abs(a - b))) / scale
            )
        print(f"  tp_lstm grad rel err vs reference: {worst_tp:.4f}")
        if worst_tp > 0.05:
            fails.append("tp_lstm (grad mismatch)")
    except Exception as e:  # noqa: BLE001
        fails.append("tp_lstm")
        print(f"  tp_lstm                    FAILED: {type(e).__name__}: {e}")

    # Transposed (batch-in-lanes) TP-LSTM — the production default
    # (MUPE_TP_LAYOUT=t): fwd + vjp-bwd, grads vs the padded reference
    try:
        from mupe_tpu.ops.tp_lstm import tp_apply_t

        def tp_loss_t(p):
            return jnp.mean(
                jnp.square(tp_apply_t(tp_spec, p, x_tp) - tgt_tp)
            )

        _timed("tp_lstm_t fwd", mupe_jit(
            lambda p: tp_apply_t(tp_spec, p, x_tp), role="update"), tp_params)
        gk_t = _timed(
            "tp_lstm_t fwd+bwd (vjp)",
            mupe_jit(jax.grad(tp_loss_t), role="update"), tp_params,
        )
        gk_t_pad = _pad_leaves(tp_spec, extract_tp_leaves(gk_t))
        worst_t = 0.0
        for a, b in zip(gk_t_pad, gr_pad):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-4 * gmax_tp)
            worst_t = max(worst_t, float(jnp.max(jnp.abs(a - b))) / scale)
        print(f"  tp_lstm_t grad rel err vs reference: {worst_t:.4f}")
        if worst_t > 0.05:
            fails.append("tp_lstm_t (grad mismatch)")
    except Exception as e:  # noqa: BLE001
        fails.append("tp_lstm_t")
        print(f"  tp_lstm_t                  FAILED: {type(e).__name__}: {e}")

    # Pallas FPS (AEG buffer downsampling path)
    try:
        from mupe_tpu.ops.fps_pallas import farthest_point_sampling_pallas

        pts = jax.random.normal(jax.random.PRNGKey(9), (1024, 3))
        mask = jnp.ones((1024,), bool)
        _timed(
            "fps_pallas (1024 -> 64)",
            jax.jit(lambda p, m: farthest_point_sampling_pallas(p, 64, valid=m)),
            pts, mask,
        )
    except Exception as e:  # noqa: BLE001
        fails.append("fps_pallas")
        print(f"  fps_pallas                 FAILED: {type(e).__name__}: {e}")

    if fails:
        print(f"SMOKE FAILED: {fails}")
        return 1
    print("SMOKE OK: all Pallas kernels compile and run")
    return 0


if __name__ == "__main__":
    sys.exit(main())
