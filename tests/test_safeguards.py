"""Long-horizon training safeguards (round-3 reproduction finding: both
billion-frame runs collapse under the reference's fixed entropy_coef=0.001;
reference baseline semantics preserved by default —
omni_drones/learning/mappo.py:271-324).

Covers: adaptive entropy coefficient (entropy_target), PPO target-KL early
stop (target_kl), and the hard log_std floor (min_log_std).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mupe_tpu.envs.hover import Hover, HoverCfg
from mupe_tpu.learning import MAPPOCfg, MAPPOPolicy, init_carry, make_train_iter


def _run(cfg_kwargs, iters=3, seed=0):
    env = Hover(HoverCfg(num_envs=8, max_episode_length=16))
    cfg = MAPPOCfg(
        train_every=8, num_minibatches=2, ppo_epochs=2, hidden_units=(32, 32),
        **cfg_kwargs,
    )
    policy = MAPPOPolicy(cfg, n_agents=1, action_dim=4, obs_is_dict=False)
    carry = init_carry(env, policy, jax.random.PRNGKey(seed))
    train_iter = jax.jit(make_train_iter(env, policy))
    metrics = None
    for _ in range(iters):
        carry, metrics, _ = train_iter(carry)
    return carry, metrics


def test_optional_float_cli_coercion():
    """`algo.entropy_target=1.5`-style overrides must land as floats even
    though the Optional field defaults to None (annotation sniffing)."""
    from mupe_tpu.utils.config import apply_overrides

    cfg = apply_overrides(
        MAPPOCfg(),
        {"entropy_target": "1.5", "target_kl": "0.02", "min_log_std": "-1.2"},
    )
    assert cfg.entropy_target == 1.5 and isinstance(cfg.entropy_target, float)
    assert cfg.target_kl == 0.02
    assert cfg.min_log_std == -1.2
    assert apply_overrides(cfg, {"target_kl": "none"}).target_kl is None


def test_defaults_have_no_safeguard_state():
    carry, metrics = _run({}, iters=1)
    assert carry.ts.entropy_coef is None
    assert "entropy_coef" not in metrics
    assert "kl_stop" not in metrics


def test_entropy_target_adapts_coef_upward():
    """With an unreachable entropy target the coefficient must grow
    (multiplicative dual ascent) and stay within its clip bounds."""
    carry, metrics = _run(
        {"entropy_target": 50.0, "entropy_adapt_speed": 0.5}, iters=4
    )
    coef = float(carry.ts.entropy_coef)
    assert coef > 0.001, coef  # grew from the reference default
    assert coef <= 0.1 * (1 + 1e-6)  # f32 representation of the clip bound
    assert np.isfinite(float(metrics["policy_loss"]))
    assert "entropy_coef" in metrics


def test_entropy_target_shrinks_when_above():
    carry, _ = _run(
        {"entropy_target": -50.0, "entropy_adapt_speed": 0.5}, iters=4
    )
    coef = float(carry.ts.entropy_coef)
    assert coef < 0.001, coef
    assert coef >= 1e-5 - 1e-12


def test_min_log_std_floor_holds():
    floor = 0.3  # above init (log_std starts at 0 → would clamp upward fast)
    carry, metrics = _run({"min_log_std": floor}, iters=2)
    ls = carry.ts.actor_params["params"]["DiagGaussianHead_0"]["log_std"]
    assert float(jnp.min(ls)) >= floor - 1e-6
    assert np.isfinite(float(metrics["policy_loss"]))


def test_target_kl_huge_is_noop():
    """An unreachable KL target must reproduce the default path exactly —
    the freeze `where`s select the new params everywhere."""
    c_ref, _ = _run({}, iters=2)
    c_kl, m_kl = _run({"target_kl": 1e9}, iters=2)
    assert float(m_kl["kl_stop"]) == 0.0
    for a, b in zip(
        jax.tree_util.tree_leaves(c_ref.ts.actor_params),
        jax.tree_util.tree_leaves(c_kl.ts.actor_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_target_kl_immediate_stop_freezes_updates():
    """target_kl below the k3 estimator's floor (≥0) stops after the first
    minibatch: every minibatch reports the stopped flag and fewer updates
    land than in the unconstrained run."""
    c_stop, m_stop = _run({"target_kl": -1.0}, iters=2)
    c_free, _ = _run({}, iters=2)
    assert float(m_stop["kl_stop"]) == 1.0
    diff = 0.0
    for a, b in zip(
        jax.tree_util.tree_leaves(c_stop.ts.actor_params),
        jax.tree_util.tree_leaves(c_free.ts.actor_params),
    ):
        diff += float(jnp.sum(jnp.abs(a - b)))
    assert diff > 0.0  # the frozen run really applied fewer updates
    assert np.isfinite(float(m_stop["policy_loss"]))


def test_entropy_deadband_freezes_near_target():
    """Controller shaping (round-4 VERDICT weak #4): inside the deadband
    the coefficient must NOT move; the per-iter log step is bounded by
    entropy_err_clip * entropy_adapt_speed even for huge errors."""
    # target set exactly achievable: freeze by construction via a huge
    # deadband — the coefficient must stay at its initial value
    carry, metrics = _run(
        {"entropy_target": 1.0, "entropy_deadband": 1e9}, iters=3
    )
    assert abs(float(carry.ts.entropy_coef) - 0.001) < 1e-9  # f32 repr
    # err_clip bounds the slew: with speed 0.5 and clip 1.0, 2 iters can
    # scale the coefficient by at most e ~ 2.72 per iter
    carry2, _ = _run(
        {"entropy_target": 1e6, "entropy_adapt_speed": 0.5,
         "entropy_err_clip": 1.0, "entropy_deadband": 0.0}, iters=2
    )
    coef2 = float(carry2.ts.entropy_coef)
    assert coef2 <= 0.001 * np.exp(0.5 * 1.0) ** 2 * (1 + 1e-5), coef2
    assert coef2 > 0.001
