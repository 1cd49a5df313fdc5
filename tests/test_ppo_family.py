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
