#!/usr/bin/env python
"""Time update_prog under config variants to find the fastest path."""
import sys
import time

import jax

sys.path.insert(0, ".")

NUM_ENVS = 4096
T = 64


def main():
    from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg
    from mupe_tpu.learning import MAPPOCfg, MAPPOPolicy, init_carry
    from mupe_tpu.learning.rollout import make_split_train_iter

    env_cfg = HideAndSeekCfg(num_envs=NUM_ENVS, max_episode_length=800)
    env = HideAndSeek(env_cfg)

    variants = {
        "fused+bf16 (current)": dict(use_fused_encoder=True, compute_dtype="bfloat16"),
        "xla+bf16": dict(use_fused_encoder=False, compute_dtype="bfloat16"),
        "xla+f32": dict(use_fused_encoder=False, compute_dtype="float32"),
    }
    for name, kw in variants.items():
        algo_cfg = MAPPOCfg(train_every=T, use_tp_net=True, **kw)
        policy = MAPPOPolicy(
            algo_cfg, n_agents=env.num_agents, action_dim=4, obs_is_dict=True,
            tp_input_dim=env_cfg.tp_input_dim,
        )
        carry = init_carry(env, policy, jax.random.PRNGKey(0))
        ti = make_split_train_iter(env, policy)
        for _ in range(2):
            carry, m, _ = ti(carry)
        jax.block_until_ready(m["policy_loss"])
        t0 = time.time()
        for _ in range(5):
            carry, m, _ = ti(carry)
        jax.block_until_ready(m["policy_loss"])
        dt = (time.time() - t0) / 5
        print(f"{name}: {dt*1e3:.1f} ms/iter "
              f"({NUM_ENVS*T/dt/1e6:.3f} M steps/s)")


if __name__ == "__main__":
    main()
