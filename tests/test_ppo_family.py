"""PPO variant family: forward-pass shapes and one update step each."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mupe_tpu.learning.ppo import (
    PPOAdaptivePolicy,
    PPOCfg,
    PPOPolicy,
    PPORNNPolicy,
    PPOSDFNavPolicy,
    PPOTConvPolicy,
    TransformerPPOPolicy,
)
from mupe_tpu.learning.ppo.ppo_adapt import PPOAdaptCfg
from mupe_tpu.learning.ppo.ppo_rnn import PPORNNCfg, RNNRollout

KEY = jax.random.PRNGKey(0)


def test_ppo_priv_branches():
    p = PPOPolicy(PPOCfg(priv_actor=True, priv_critic=True), obs_is_dict=True)
    obs = {
        "observation": jnp.zeros((4, 1, 20)),
        "intrinsics": jnp.zeros((4, 1, 9)),
    }
    ts = p.init(KEY, obs)
    a, lp, v = p.act(ts, obs, KEY)
    assert a.shape == (4, 1, 4) and v.shape == (4, 1, 1)
    assert np.isfinite(np.asarray(lp)).all()


def test_ppo_flat():
    p = PPOPolicy(PPOCfg())
    obs = jnp.zeros((4, 1, 20))
    ts = p.init(KEY, obs)
    a, lp, v = p.act(ts, obs, KEY)
    assert a.shape == (4, 1, 4) and v.shape == (4, 1, 1)


def test_ppo_tconv():
    p = PPOTConvPolicy()
    obs = jnp.zeros((4, 1, 32, 20))  # 32-frame history stack
    ts = p.init(KEY, obs)
    a, _, v = p.act(ts, obs, KEY)
    assert a.shape == (4, 1, 4) and v.shape == (4, 1, 1)


def test_ppo_sdf_nav():
    p = PPOSDFNavPolicy()
    obs = {
        "observation": jnp.zeros((4, 1, 20)),
        "sdf_points": jnp.zeros((4, 1, 64, 3)),
    }
    ts = p.init(KEY, obs)
    a, _, v = p.act(ts, obs, KEY)
    assert a.shape == (4, 1, 4) and v.shape == (4, 1, 1)


def test_transformer_ppo():
    p = TransformerPPOPolicy(n_agents=3)
    obs = {"agents": jnp.zeros((4, 3, 16)), "obstacles": jnp.zeros((4, 5, 8))}
    ts = p.init(KEY, obs)
    a, lp, v = p.act(ts, obs, KEY)
    assert a.shape == (4, 3, 4)
    assert v.shape == (4, 3, 1)


def test_ppo_adapt_phases_share_update():
    cfg = PPOAdaptCfg(phase="encoder")
    p = PPOAdaptivePolicy(cfg)
    obs = {
        "observation": jnp.zeros((4, 1, 20)),
        "intrinsics": jnp.zeros((4, 1, 9)),
        "observation_h": jnp.zeros((4, 1, 32, 20)),
    }
    ts = p.init(KEY, obs)
    a, _, v = p.act(ts, obs, KEY)
    assert a.shape == (4, 1, 4)
    # adaptation supervised step runs and returns finite loss
    enc_params = {"params": ts.actor_params["params"]["_ContextActorWrapper_0"]
                  if "_ContextActorWrapper_0" in ts.actor_params["params"]
                  else ts.actor_params["params"]["encoder"]}
    ad_params = p.adaptation.init(KEY, obs["observation_h"])
    opt = p.adapt_tx.init(ad_params)
    enc_p = p.encoder.init(KEY, obs["intrinsics"])
    new_params, new_opt, loss = p.update_adaptation(
        ad_params, opt, enc_p, obs["observation_h"], obs["intrinsics"]
    )
    assert np.isfinite(float(loss))


def test_ppo_adapt_loss_variants():
    """action / value / action_value / gan / lsgan adaptation losses
    (reference ppo_adapt.py:454-666)."""
    e, n, d = 4, 1, 20
    obs_flat = jnp.ones((e, n, d)) * 0.1
    obs_h = jnp.ones((e, n, 32, d)) * 0.1
    intr = jnp.ones((e, n, 9)) * 0.3

    for variant in ("action", "value", "action_value", "gan", "lsgan"):
        cfg = PPOAdaptCfg(phase="adaptation", adaptation_loss=variant)
        p = PPOAdaptivePolicy(cfg)
        enc_p = p.encoder.init(KEY, intr)
        ad_p = p.adaptation.init(KEY, obs_h)
        opt = p.adapt_tx.init(ad_p)
        ctx = jnp.zeros((e, n, cfg.context_dim))
        actor_p = p.actor_body.init(KEY, obs_flat, ctx)
        critic_p = p.critic_body.init(KEY, obs_flat, ctx)
        if variant in ("gan", "lsgan"):
            disc_p = p.discriminator.init(KEY, ctx)
            disc_opt = p.disc_tx.init(disc_p)
            ad_p2, _, loss_g, disc_p2, _, loss_d = p.update_adaptation(
                ad_p, opt, enc_p, obs_h, intr,
                disc_params=disc_p, disc_opt=disc_opt,
            )
            assert np.isfinite(float(loss_g)) and np.isfinite(float(loss_d))
            # both generator and discriminator moved
            leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
            assert np.abs(np.asarray(leaf(disc_p2) - leaf(disc_p))).max() > 0
        else:
            ad_p2, _, loss = p.update_adaptation(
                ad_p, opt, enc_p, obs_h, intr, obs=obs_flat,
                actor_params=actor_p, critic_params=critic_p,
            )
            assert np.isfinite(float(loss))
        leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
        assert np.abs(np.asarray(leaf(ad_p2) - leaf(ad_p))).max() >= 0


def test_ppo_rnn_act_and_train():
    cfg = PPORNNCfg(train_seq_len=4, num_minibatches=2, ppo_epochs=1,
                    rnn_hidden=32)
    p = PPORNNPolicy(cfg)
    e, n, d, t = 8, 1, 12, 8
    obs = jnp.zeros((e, n, d))
    ts = p.init(KEY, obs)
    h = p.zero_state((e, n))
    ii = jnp.zeros((e, n, 1), bool)
    a, lp, v, ha, hc = p.act(ts, obs, h, h, ii, KEY)
    assert a.shape == (e, n, 4) and ha.shape == (e, n, 32)

    rng = np.random.default_rng(0)
    batch = RNNRollout(
        obs=jnp.asarray(rng.normal(size=(t, e, n, d)).astype(np.float32)),
        action=jnp.asarray(rng.normal(size=(t, e, n, 4)).astype(np.float32)),
        logp=jnp.zeros((t, e, n, 1)),
        value=jnp.zeros((t, e, n, 1)),
        reward=jnp.ones((t, e, n, 1)),
        done=jnp.zeros((t, e, 1), bool),
        is_init=jnp.zeros((t, e, n, 1), bool),
        actor_rnn=jnp.zeros((t, e, n, 32)),
        critic_rnn=jnp.zeros((t, e, n, 32)),
        last_obs=obs,
        last_actor_rnn=h,
        last_critic_rnn=h,
        last_is_init=ii,
    )
    ts2, info = jax.jit(p.train_op)(ts, batch, KEY)
    assert np.isfinite(float(info["policy_loss"]))
    assert np.isfinite(float(info["value_loss"]))
    before = jax.tree_util.tree_leaves(ts["actor_params"])[0]
    after = jax.tree_util.tree_leaves(ts2["actor_params"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
