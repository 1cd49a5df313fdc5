"""End-to-end algo dispatch: `harness.train` over the PPO variant family.

Each case mirrors the reference entry-point dispatch
(scripts/train.py:176-186, omni_drones/learning/__init__.py:20-40) on tiny
configs: training must run, produce finite losses, and not leak NaNs.
"""
import numpy as np
import pytest

from mupe_tpu.harness import build, train
from mupe_tpu.learning.registry import ALGOS, make_policy

TINY_HOVER = [
    "env.num_envs=8",
    "env.max_episode_length=16",
    "max_iters=2",
    "log_interval=1",
    "save_interval=-1",
    "run_dir=/tmp/mupe_algo_tests",
]


def test_registry_lists_all_algos():
    assert {
        "mappo", "ppo", "ppo_adapt", "ppo_rnn", "ppo_tconv", "ppo_sdf",
        "transformer",
    } <= set(ALGOS)


@pytest.mark.parametrize("algo", ["ppo", "ppo_rnn"])
def test_train_hover_flat_algos(algo):
    extra = ["algo.train_seq_len=4"] if algo == "ppo_rnn" else []
    m = train(TINY_HOVER + [f"algo={algo}", "algo.train_every=8",
                            "algo.num_minibatches=2"] + extra,
              default_task="Hover")
    assert np.isfinite(m["policy_loss"])
    assert np.isfinite(m["value_loss"])


def test_train_hover_ppo_priv():
    m = train(
        TINY_HOVER
        + [
            "algo=ppo", "algo.train_every=8", "algo.num_minibatches=2",
            "algo.priv_actor=true", "algo.priv_critic=true",
            "algo.use_fused_encoder=false",
            "env.dr_mass_scale=[0.8,1.2]", "env.dr_t2w_scale=[0.9,1.1]",
        ],
        default_task="Hover",
    )
    assert np.isfinite(m["policy_loss"])


def test_train_hover_ppo_tconv():
    m = train(
        TINY_HOVER
        + [
            "algo=ppo_tconv", "algo.train_every=8", "algo.num_minibatches=2",
            "algo.use_fused_encoder=false", "env.obs_history_len=32",
        ],
        default_task="Hover",
    )
    assert np.isfinite(m["policy_loss"])


def test_train_hover_rma_three_phases():
    """ppo_adapt runs encoder → adaptation → finetune in one command and the
    adaptation loss is finite (reference ppo_adapt.py phase pipeline)."""
    m = train(
        TINY_HOVER
        + [
            "algo=ppo_adapt", "max_iters=8", "algo.train_every=8",
            "algo.num_minibatches=2", "algo.use_fused_encoder=false",
            "env.obs_history_len=32",
        ],
        default_task="Hover",
    )
    # the last logged row comes from phase 3 (finetune) — PPO metrics again
    assert m["rma_phase"] == 3
    assert np.isfinite(m["policy_loss"])


def test_build_transformer_on_hideandseek():
    env, policy, env_cfg, algo_cfg = build(
        "HideAndSeek",
        {"num_envs": 4, "max_episode_length": 8},
        {"train_every": 4, "num_minibatches": 2},
        algo="transformer",
    )
    import jax

    from mupe_tpu.learning import init_carry, make_train_iter

    carry = init_carry(env, policy, jax.random.PRNGKey(0))
    it = jax.jit(make_train_iter(env, policy))
    carry, metrics, _ = it(carry)
    assert np.isfinite(float(metrics["policy_loss"]))


def test_make_policy_unknown_raises():
    env, _, _, _ = build("Hover", {"num_envs": 4})
    with pytest.raises(KeyError):
        make_policy("nope", env)
