"""Fused Pallas encoder kernels vs the flax modules and jnp reference.

On CPU the production path uses `reference_apply`; the Pallas kernels
themselves are exercised here in interpreter mode (`_build_calls(...,
interpret=True)`) so CI validates the exact kernel code without a TPU.
"""
import jax
import jax.numpy as jnp
import pytest

from mupe_tpu.learning.mappo import Actor, Critic
from mupe_tpu.ops.fused_encoder import (
    EncoderSpec,
    _build_calls,
    _build_pair_calls,
    extract_leaves,
    fused_encoder_head,
    fused_pair_encoder_head,
    pack_obs,
    reference_apply,
)

NAMES = ["state_self", "state_others", "cylinders"]


def _setup(head_dim=4, s=96, tile=32):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    obs = {
        "state_self": jax.random.normal(ks[0], (s, 1, 35)),
        "state_others": jax.random.normal(ks[1], (s, 2, 3)),
        "cylinders": jax.random.normal(ks[2], (s, 3, 5)),
    }
    spec = EncoderSpec(
        groups=((1, 35), (2, 3), (3, 5)), head_dim=head_dim, tile=tile
    )
    return spec, obs, ks[3]


def test_reference_matches_flax_actor():
    spec, obs, k = _setup()
    actor = Actor(
        action_dim=4, hidden_units=(256,),
        attn_encoder="PartialAttentionEncoder", obs_is_dict=True,
        dtype=jnp.bfloat16,
    )
    p = actor.init(k, obs)
    leaves = extract_leaves(spec, p, NAMES)
    x, lead = pack_obs(spec, obs, NAMES)
    ref = reference_apply(spec, leaves, x).reshape(lead + (4,))
    fl = actor.apply(p, obs).mean
    scale = float(jnp.max(jnp.abs(fl))) + 1e-6
    assert float(jnp.max(jnp.abs(ref - fl))) / scale < 0.05


def test_reference_matches_flax_critic():
    spec, obs, k = _setup(head_dim=1)
    critic = Critic(
        out_dim=1, hidden_units=(256,),
        attn_encoder="PartialAttentionEncoder", obs_is_dict=True,
        dtype=jnp.bfloat16,
    )
    p = critic.init(k, obs)
    leaves = extract_leaves(spec, p, NAMES)
    x, lead = pack_obs(spec, obs, NAMES)
    ref = reference_apply(spec, leaves, x).reshape(lead + (1,))
    fl = critic.apply(p, obs)
    scale = float(jnp.max(jnp.abs(fl))) + 1e-6
    assert float(jnp.max(jnp.abs(ref - fl))) / scale < 0.05


def test_kernel_interpret_fwd_and_grads_match_reference():
    spec, obs, k = _setup(s=80, tile=32)  # padding path: 80 → 96 rows
    actor = Actor(
        action_dim=4, hidden_units=(256,),
        attn_encoder="PartialAttentionEncoder", obs_is_dict=True,
        dtype=jnp.bfloat16,
    )
    p = actor.init(k, obs)
    leaves = extract_leaves(spec, p, NAMES)
    x, _ = pack_obs(spec, obs, NAMES)
    s = x.shape[0]
    pad = (-s) % spec.pad_tile
    xpad = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]))], 0)
    fwd, bwd = _build_calls(spec, xpad.shape[0], True)  # interpret mode
    out_k = fwd(xpad, *leaves)[:s]
    out_r = reference_apply(spec, leaves, x)
    assert float(jnp.max(jnp.abs(out_k - out_r))) < 5e-3

    cot = jax.random.normal(jax.random.PRNGKey(7), out_r.shape)
    cpad = jnp.concatenate([cot, jnp.zeros((pad, cot.shape[1]))], 0)
    gk = bwd(xpad, cpad, *leaves)
    gr = jax.grad(lambda lv: jnp.sum(reference_apply(spec, lv, x) * cot))(
        leaves
    )
    for a, b in zip(gk, gr):
        scale = float(jnp.max(jnp.abs(b)))
        # abs term absorbs analytically-zero leaves (softmax bias null-space:
        # sum_t dss_t == 0 makes dbk exactly zero; both sides are noise)
        assert float(jnp.max(jnp.abs(a - b))) < 0.03 * scale + 1e-4


def test_pair_kernel_interpret_matches_reference():
    """The dual actor+critic kernel (one launch per direction) matches the
    two single-network references, fwd and bwd, including the padding path."""
    spec_a, obs, k = _setup(head_dim=4, s=80, tile=32)
    spec_c = EncoderSpec(groups=spec_a.groups, head_dim=1, tile=32)
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
    pa = actor.init(k, obs)
    pc = critic.init(jax.random.PRNGKey(5), obs)
    la = extract_leaves(spec_a, pa, NAMES)
    lc = extract_leaves(spec_c, pc, NAMES)
    x, _ = pack_obs(spec_a, obs, NAMES)
    s = x.shape[0]
    pad = (-s) % spec_a.pad_tile
    xpad = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]))], 0)
    fwd, bwd = _build_pair_calls(spec_a, spec_c, xpad.shape[0], True)
    out_a, out_c = fwd(xpad, la, lc)
    ref_a = reference_apply(spec_a, la, x)
    ref_c = reference_apply(spec_c, lc, x)
    assert float(jnp.max(jnp.abs(out_a[:s] - ref_a))) < 5e-3
    assert float(jnp.max(jnp.abs(out_c[:s] - ref_c))) < 5e-3

    cot_a = jax.random.normal(jax.random.PRNGKey(7), ref_a.shape)
    cot_c = jax.random.normal(jax.random.PRNGKey(8), ref_c.shape)
    ca = jnp.concatenate([cot_a, jnp.zeros((pad, cot_a.shape[1]))], 0)
    cc = jnp.concatenate([cot_c, jnp.zeros((pad, cot_c.shape[1]))], 0)
    gk = bwd(xpad, ca, cc, la, lc)
    gr_a = jax.grad(lambda lv: jnp.sum(reference_apply(spec_a, lv, x) * cot_a))(la)
    gr_c = jax.grad(lambda lv: jnp.sum(reference_apply(spec_c, lv, x) * cot_c))(lc)
    for a, b in zip(gk, tuple(gr_a) + tuple(gr_c)):
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) < 0.03 * scale + 1e-4


def test_pair_public_entry_pad_grid_interaction(monkeypatch):
    """The PUBLIC fused_pair_encoder_head (production padding logic) with a
    row count that is a multiple of `tile` but NOT of `fwd_tile` (96 rows,
    tile=32, fwd_tile=64).  Padding to `tile` instead of `pad_tile` here
    leaves the fwd grid short one step and the tail rows uninitialized —
    the round-3 advisor's high-severity finding.  Kernel path is forced via
    interpret mode so this runs in CPU CI."""
    import mupe_tpu.ops.fused_encoder as fe

    monkeypatch.setattr(fe, "_on_tpu", lambda: True)
    orig_pair = fe._build_pair_calls
    monkeypatch.setattr(
        fe,
        "_build_pair_calls",
        lambda sa, sb, sp, interp: orig_pair(sa, sb, sp, True),
    )
    orig_single = fe._build_calls
    monkeypatch.setattr(
        fe,
        "_build_calls",
        lambda s, sp, interp: orig_single(s, sp, True),
    )
    # the split-bwd production tile (640) assumes TPU VMEM; pin the
    # interpret-mode bwd to a small tile that MISMATCHES tile_fwd (48 vs
    # 64) — the round-4 advisor's high-severity finding was that pinning
    # only `tile` keeps pad_tile at tile_fwd, so the bwd grid
    # (s_padded // 48) silently drops trailing rows from the gradients
    # whenever s_padded is a tile_fwd-multiple but not a 48-multiple.
    # _split_bwd_spec must pin BOTH so the pad unit equals the launch
    # tile; with the old one-field replace this test fails via the
    # _build_calls divisibility assert (96 pads to 128 under the stale
    # pad_tile=64, and 128 is not a 48-multiple).
    monkeypatch.setattr(fe, "_PAIR_BWD_TILE", 48)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    s = 96  # 3*tile, 1.5*fwd_tile, 2*bwd_tile
    obs = {
        "state_self": jax.random.normal(ks[0], (s, 1, 35)),
        "state_others": jax.random.normal(ks[1], (s, 2, 3)),
        "cylinders": jax.random.normal(ks[2], (s, 3, 5)),
    }
    spec_a = EncoderSpec(
        groups=((1, 35), (2, 3), (3, 5)), head_dim=4, tile=32, tile_fwd=64
    )
    spec_c = EncoderSpec(groups=spec_a.groups, head_dim=1, tile=32, tile_fwd=64)
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
    pa = actor.init(ks[3], obs)
    pc = critic.init(jax.random.PRNGKey(5), obs)
    la = extract_leaves(spec_a, pa, NAMES)
    lc = extract_leaves(spec_c, pc, NAMES)
    x, _ = pack_obs(spec_a, obs, NAMES)

    out_a, out_c = fe.fused_pair_encoder_head(spec_a, spec_c, la, lc, x)
    ref_a = reference_apply(spec_a, la, x)
    ref_c = reference_apply(spec_c, lc, x)
    assert float(jnp.max(jnp.abs(out_a - ref_a))) < 5e-3
    assert float(jnp.max(jnp.abs(out_c - ref_c))) < 5e-3

    # and jax.grad through the public custom_vjp (exercises _pair_vjp_bwd)
    def loss(leaves):
        oa, oc = fe.fused_pair_encoder_head(spec_a, spec_c, leaves[0], leaves[1], x)
        return jnp.sum(jnp.square(oa)) + jnp.sum(jnp.square(oc))

    ga, gc = jax.grad(loss)((la, lc))
    gr_a = jax.grad(
        lambda lv: jnp.sum(jnp.square(reference_apply(spec_a, lv, x)))
    )(la)
    gr_c = jax.grad(
        lambda lv: jnp.sum(jnp.square(reference_apply(spec_c, lv, x)))
    )(lc)
    for a, b in zip(tuple(ga) + tuple(gc), tuple(gr_a) + tuple(gr_c)):
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) < 0.03 * scale + 1e-3


def test_pair_custom_vjp_cpu_fallback():
    """fused_pair_encoder_head falls back to reference math off-TPU and its
    grads land in both param trees."""
    spec_a, obs, k = _setup()
    spec_c = EncoderSpec(groups=spec_a.groups, head_dim=1, tile=spec_a.tile)
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
    pa = actor.init(k, obs)
    pc = critic.init(jax.random.PRNGKey(5), obs)
    x, _ = pack_obs(spec_a, obs, NAMES)

    def loss(params):
        la = extract_leaves(spec_a, params[0], NAMES)
        lc = extract_leaves(spec_c, params[1], NAMES)
        out_a, out_c = fused_pair_encoder_head(spec_a, spec_c, la, lc, x)
        return jnp.sum(jnp.square(out_a)) + jnp.sum(jnp.square(out_c))

    ga, gc = jax.grad(loss)((pa, pc))
    for g in (ga, gc):
        norms = [float(jnp.linalg.norm(l)) for l in jax.tree_util.tree_leaves(g)]
        assert sum(n > 0 for n in norms) >= len(norms) - 1


def test_direct_grad_joint_update_matches_value_and_grad():
    """The in-kernel PPO loss path (_update_joint_direct, interpret mode)
    produces the same updated params and metrics as the jax.value_and_grad
    path (_update_joint) — including the clipped-Huber branch select and
    the entropy gradient on log_std, on a padded (non-tile-multiple) batch
    (40 rows pad to one 512-row tile — exercises the in-kernel row mask)."""
    from mupe_tpu.learning.mappo import MAPPOCfg, MAPPOPolicy

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    mbn, n, a_dim = 20, 2, 4  # 40 rows -> pads to 64 at tile 32
    obs = {
        "state_self": jax.random.normal(ks[0], (mbn, n, 1, 35)),
        "state_others": jax.random.normal(ks[1], (mbn, n, 2, 3)),
        "cylinders": jax.random.normal(ks[2], (mbn, n, 3, 5)),
    }
    cfg = MAPPOCfg(use_tp_net=False)
    policy = MAPPOPolicy(cfg, n_agents=n, action_dim=a_dim, obs_is_dict=True)
    ts = policy.init(ks[3], jax.tree_util.tree_map(lambda x: x[:1], obs))
    mb = {
        "obs": obs,
        "action": jax.random.normal(ks[4], (mbn, n, a_dim)) * 0.5,
        "logp": jax.random.normal(ks[5], (mbn, n, 1)) * 0.2 - 5.5,
        "advantages": jax.random.normal(ks[6], (mbn, n, 1)),
        "value": jax.random.normal(ks[7], (mbn, n, 1)) * 0.3,
        "returns": jax.random.normal(jax.random.PRNGKey(9), (mbn, n, 1)) * 0.3,
    }
    ts_ref, info_ref = policy._update_joint(ts, mb)
    ts_dir, info_dir = policy._update_joint_direct(ts, mb, interpret=True)
    for k in ("policy_loss", "value_loss", "ESS", "explained_var", "entropy"):
        ref, got = float(info_ref[k]), float(info_dir[k])
        assert abs(ref - got) < 5e-3 * max(1.0, abs(ref)), (k, ref, got)
    for k in ("actor_grad_norm", "critic_grad_norm"):
        ref, got = float(info_ref[k]), float(info_dir[k])
        assert abs(ref - got) < 2e-3 * max(1.0, abs(ref)), (k, ref, got)
    for pref, pdir in zip(
        jax.tree_util.tree_leaves((ts_ref.actor_params, ts_ref.critic_params)),
        jax.tree_util.tree_leaves((ts_dir.actor_params, ts_dir.critic_params)),
    ):
        # adam's m̂/√v̂ is ±1-ish at step one, so a bf16-noise-level grad
        # difference on a near-zero entry flips the sign of one lr-sized
        # step — bound is 2·lr, not grad tolerance
        assert float(jnp.max(jnp.abs(pref - pdir))) < 2.5e-3


def test_direct_grad_joint_update_matches_on_saturated_ratio():
    """With |logp − logp_old| > 20 the log-ratio clamp saturates; autodiff
    gives ZERO gradient through jnp.clip at the rails, and the in-kernel
    hand gradient must mask the same way (round-3 advisor medium finding:
    an unmasked saturated row emits a ~e^20-scale gradient)."""
    from mupe_tpu.learning.mappo import MAPPOCfg, MAPPOPolicy

    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    mbn, n, a_dim = 20, 2, 4
    obs = {
        "state_self": jax.random.normal(ks[0], (mbn, n, 1, 35)),
        "state_others": jax.random.normal(ks[1], (mbn, n, 2, 3)),
        "cylinders": jax.random.normal(ks[2], (mbn, n, 3, 5)),
    }
    cfg = MAPPOCfg(use_tp_net=False)
    policy = MAPPOPolicy(cfg, n_agents=n, action_dim=a_dim, obs_is_dict=True)
    ts = policy.init(ks[3], jax.tree_util.tree_map(lambda x: x[:1], obs))
    logp_old = jax.random.normal(ks[5], (mbn, n, 1)) * 0.2 - 5.5
    # saturate a third of the rows in each direction
    logp_old = logp_old.at[:6].add(40.0).at[-6:].add(-40.0)
    mb = {
        "obs": obs,
        "action": jax.random.normal(ks[4], (mbn, n, a_dim)) * 0.5,
        "logp": logp_old,
        "advantages": jax.random.normal(ks[6], (mbn, n, 1)),
        "value": jax.random.normal(ks[7], (mbn, n, 1)) * 0.3,
        "returns": jax.random.normal(jax.random.PRNGKey(9), (mbn, n, 1)) * 0.3,
    }
    ts_ref, info_ref = policy._update_joint(ts, mb)
    ts_dir, info_dir = policy._update_joint_direct(ts, mb, interpret=True)
    for k in ("actor_grad_norm", "critic_grad_norm"):
        ref, got = float(info_ref[k]), float(info_dir[k])
        assert abs(ref - got) < 2e-3 * max(1.0, abs(ref)), (k, ref, got)
    for pref, pdir in zip(
        jax.tree_util.tree_leaves((ts_ref.actor_params, ts_ref.critic_params)),
        jax.tree_util.tree_leaves((ts_dir.actor_params, ts_dir.critic_params)),
    ):
        assert float(jnp.max(jnp.abs(pref - pdir))) < 2.5e-3


def test_custom_vjp_grads_flow_into_flax_tree():
    """jax.grad through extract_leaves + fused op lands in the param tree."""
    spec, obs, k = _setup()
    actor = Actor(
        action_dim=4, hidden_units=(256,),
        attn_encoder="PartialAttentionEncoder", obs_is_dict=True,
        dtype=jnp.bfloat16,
    )
    p = actor.init(k, obs)
    x, _ = pack_obs(spec, obs, NAMES)

    def loss(params):
        leaves = extract_leaves(spec, params, NAMES)
        return jnp.sum(jnp.square(fused_encoder_head(spec, leaves, x)))

    g = jax.grad(loss)(p)
    flat = jax.tree_util.tree_leaves(g)
    norms = [float(jnp.linalg.norm(l)) for l in flat]
    # every encoder/head weight receives gradient except log_std (unused)
    assert sum(n > 0 for n in norms) >= len(norms) - 1


def test_tp_lstm_kernel_matches_tpnet(monkeypatch):
    """ops/tp_lstm.py: the fused TP-LSTM kernel (interpret mode) and its
    padded-jnp reference must both match TPNet.apply, and jax.grad through
    the custom_vjp must match autodiff through the flax module (the TPU
    update path swaps TPNet.apply for tp_apply — same math required)."""
    import mupe_tpu.ops.tp_lstm as tl
    from mupe_tpu.learning.tp_net import TPNet

    n, t, f, o = 96, 10, 16, 15
    net = TPNet(output_dim=o, hidden_dim=64, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, t, f)) * 0.5
    params = net.init(jax.random.PRNGKey(1), x[:1])
    y_ref = net.apply(params, x)

    spec = tl.TPLSTMSpec(input_dim=f, hidden=64, t_steps=t, out_dim=o, tile=32)
    # padded-jnp reference path (the CPU fallback)
    y_pad = tl.tp_apply(spec, params, x)
    assert float(jnp.max(jnp.abs(y_pad - y_ref))) < 0.03  # bf16 vs f32 math

    # kernel path in interpreter mode
    monkeypatch.setattr(tl, "_on_tpu", lambda: True)
    orig = tl._build_tp_calls
    monkeypatch.setattr(
        tl, "_build_tp_calls", lambda s, np_, interp: orig(s, np_, True)
    )
    y_k = tl.tp_apply(spec, params, x)
    assert float(jnp.max(jnp.abs(y_k - y_pad))) < 5e-3

    # gradients: kernel vjp vs autodiff through the flax module
    tgt = jax.random.normal(jax.random.PRNGKey(2), (n, o))

    def loss_k(p):
        return jnp.mean(jnp.square(tl.tp_apply(spec, p, x) - tgt))

    def loss_ref(p):
        return jnp.mean(jnp.square(net.apply(p, x) - tgt))

    gk = jax.grad(loss_k)(params)
    gr = jax.grad(loss_ref)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)
    ):
        scale = float(jnp.max(jnp.abs(b))) + 1e-5
        assert float(jnp.max(jnp.abs(a - b))) < 0.05 * scale + 1e-5


def test_tp_lstm_transposed_matches_tpnet(monkeypatch):
    """ops/tp_lstm.py transposed (batch-in-lanes) layout: `tp_apply_t`
    must match TPNet.apply in value and parameter gradients — it is the
    default TPU update path (MUPE_TP_LAYOUT=t), where the hidden lives in
    sublanes so the LSTM matmuls run unpadded."""
    import mupe_tpu.ops.tp_lstm as tl
    from mupe_tpu.learning.tp_net import TPNet

    n, t, f, o = 96, 10, 16, 15
    net = TPNet(output_dim=o, hidden_dim=64, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, t, f)) * 0.5
    params = net.init(jax.random.PRNGKey(1), x[:1])
    y_ref = net.apply(params, x)

    spec = tl.TPLSTMSpec(input_dim=f, hidden=64, t_steps=t, out_dim=o)
    # transposed reference path (the CPU fallback)
    y_t = tl.tp_apply_t(spec, params, x)
    assert float(jnp.max(jnp.abs(y_t - y_ref))) < 0.03  # bf16 vs f32 math

    # kernel path in interpreter mode
    monkeypatch.setattr(tl, "_on_tpu", lambda: True)
    orig = tl._build_tp_calls_t
    monkeypatch.setattr(
        tl, "_build_tp_calls_t", lambda s, np_, interp: orig(s, np_, True)
    )
    y_k = tl.tp_apply_t(spec, params, x)
    assert float(jnp.max(jnp.abs(y_k - y_t))) < 5e-3

    # gradients: kernel vjp vs autodiff through the flax module
    tgt = jax.random.normal(jax.random.PRNGKey(2), (n, o))

    def loss_k(p):
        return jnp.mean(jnp.square(tl.tp_apply_t(spec, p, x) - tgt))

    def loss_ref(p):
        return jnp.mean(jnp.square(net.apply(p, x) - tgt))

    gk = jax.grad(loss_k)(params)
    gr = jax.grad(loss_ref)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)
    ):
        scale = float(jnp.max(jnp.abs(b))) + 1e-5
        assert float(jnp.max(jnp.abs(a - b))) < 0.05 * scale + 1e-5
