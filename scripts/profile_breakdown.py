#!/usr/bin/env python
"""Perf breakdown: time rollout vs update vs env-step vs policy-act
separately on the flagship HideAndSeek MAPPO workload (one chip)."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

NUM_ENVS = 4096
T = 64


def timeit(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg
    from mupe_tpu.learning import MAPPOCfg, MAPPOPolicy, init_carry
    from mupe_tpu.learning.rollout import make_split_train_iter

    env_cfg = HideAndSeekCfg(num_envs=NUM_ENVS, max_episode_length=800)
    env = HideAndSeek(env_cfg)
    algo_cfg = MAPPOCfg(train_every=T, use_tp_net=True)
    policy = MAPPOPolicy(
        algo_cfg, n_agents=env.num_agents, action_dim=4, obs_is_dict=True,
        tp_input_dim=env_cfg.tp_input_dim,
    )
    carry = init_carry(env, policy, jax.random.PRNGKey(0))

    # --- split train iter: time the two programs separately
    ti = make_split_train_iter(env, policy)
    # grab the inner progs by rebuilding them (they're closures)
    from mupe_tpu.learning import rollout as RO

    # time the full train_iter
    t_full = timeit(lambda c: ti(c)[0], carry)
    print(f"full train_iter: {t_full*1e3:.1f} ms  "
          f"({NUM_ENVS*T/t_full/1e6:.3f} M steps/s)")

    # time rollout program alone via a scan of rollout_step
    uses_tp = True

    def rollout_step(rc, key):
        ts, env_state, obs, state = rc
        k_act, k_env = jax.random.split(key)
        action, logp, value = policy.act(ts, obs, k_act, state=state)
        env_state, tr = env.step(env_state, action, k_env, ts.tp_params)
        return (ts, env_state, tr.obs, tr.info.get("state")), None

    @jax.jit
    def rollout_only(c):
        keys = jax.random.split(c.key, T)
        out, _ = jax.lax.scan(
            rollout_step, (c.ts, c.env_state, c.obs, c.state), keys
        )
        return out[1].progress

    t_roll = timeit(rollout_only, carry)
    print(f"rollout only ({T} steps): {t_roll*1e3:.1f} ms  "
          f"({NUM_ENVS*T/t_roll/1e6:.3f} M steps/s)")
    print(f"update (by difference): {(t_full-t_roll)*1e3:.1f} ms")

    # env.step alone (no policy)
    action = jnp.zeros((NUM_ENVS, env.num_agents, 4))

    def env_step_only(rc, key):
        env_state = rc
        env_state, tr = env.step(env_state, action, key, carry.ts.tp_params)
        return env_state, None

    @jax.jit
    def env_only(c):
        keys = jax.random.split(c.key, T)
        out, _ = jax.lax.scan(env_step_only, c.env_state, keys)
        return out.progress

    t_env = timeit(env_only, carry)
    print(f"env.step only ({T} steps): {t_env*1e3:.1f} ms")

    # policy act alone
    @jax.jit
    def act_only(c):
        def body(k, _):
            k, ka = jax.random.split(k)
            a, lp, v = policy.act(c.ts, c.obs, ka, state=c.state)
            return k, (a.sum() + lp.sum() + v.sum())
        k, outs = jax.lax.scan(body, c.key, None, length=T)
        return outs

    t_act = timeit(act_only, carry)
    print(f"policy.act only ({T} steps): {t_act*1e3:.1f} ms")

    # TP-net forward alone
    @jax.jit
    def tp_only(c):
        def body(k, _):
            p = env.tp_net.apply(c.ts.tp_params, c.env_state.history)
            return k, p.sum()
        _, outs = jax.lax.scan(body, c.key, None, length=T)
        return outs

    t_tp = timeit(tp_only, carry)
    print(f"tp_net forward only ({T} steps): {t_tp*1e3:.1f} ms")


if __name__ == "__main__":
    main()
