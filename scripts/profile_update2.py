#!/usr/bin/env python
"""Attribute update time: TP vs actor vs critic vs minibatch gather."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    from mupe_tpu.learning.mappo import RolloutBatch

    env_cfg = HideAndSeekCfg(num_envs=NUM_ENVS, max_episode_length=800)
    env = HideAndSeek(env_cfg)
    cfg = MAPPOCfg(train_every=T, use_tp_net=True)
    policy = MAPPOPolicy(
        cfg, n_agents=env.num_agents, action_dim=4, obs_is_dict=True,
        tp_input_dim=env_cfg.tp_input_dim,
    )
    carry = init_carry(env, policy, jax.random.PRNGKey(0))
    ts = carry.ts

    e, n = NUM_ENVS, env.num_agents
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    obs = {
        "state_self": f32(T, e, n, 1, env_cfg.state_self_dim),
        "state_others": f32(T, e, n, n - 1, 3),
        "cylinders": f32(T, e, n, env_cfg.obs_max_cylinder, 5),
    }
    batch = RolloutBatch(
        obs=obs,
        action=f32(T, e, n, 4),
        logp=f32(T, e, n, 1),
        value=f32(T, e, n, 1),
        reward=f32(T, e, n, 1),
        done=jnp.zeros((T, e, 1), bool),
        last_obs=jax.tree_util.tree_map(lambda x: x[0], obs),
        tp_input=f32(T, e, env_cfg.history_step, env_cfg.tp_input_dim),
        tp_gt=f32(T, e, 3),
        tp_done=jnp.ones((T, e, 1)),
    )

    t_full = timeit(jax.jit(policy.train_op), ts, batch, jax.random.PRNGKey(1))
    print(f"train_op total: {t_full*1e3:.1f} ms")

    # TP update alone
    t_tp = timeit(
        jax.jit(lambda ts, b, k: policy._update_tp(ts, b, k)[0].tp_params),
        ts, batch, jax.random.PRNGKey(1),
    )
    print(f"TP update: {t_tp*1e3:.1f} ms")

    # one minibatch's data, reused 64x
    b = T * e
    mb_size = b // cfg.num_minibatches
    mb = {
        "obs": jax.tree_util.tree_map(
            lambda x: x.reshape((b,) + x.shape[2:])[:mb_size], obs
        ),
        "action": batch.action.reshape(b, n, 4)[:mb_size],
        "logp": batch.logp.reshape(b, n, 1)[:mb_size],
        "value": batch.value.reshape(b, n, 1)[:mb_size],
        "advantages": batch.reward.reshape(b, n, 1)[:mb_size],
        "returns": batch.reward.reshape(b, n, 1)[:mb_size],
    }

    @jax.jit
    def actors_only(ts, mb):
        def body(ts, _):
            ts, info = policy._update_actor(ts, mb)
            return ts, info["policy_loss"]
        ts, pl_ = jax.lax.scan(body, ts, None, length=64)
        return pl_

    t_act = timeit(actors_only, ts, mb)
    print(f"64x actor update: {t_act*1e3:.1f} ms ({t_act/64*1e3:.2f} ms each)")

    @jax.jit
    def critics_only(ts, mb):
        def body(ts, _):
            ts, info = policy._update_critic(ts, mb)
            return ts, info["value_loss"]
        ts, vl = jax.lax.scan(body, ts, None, length=64)
        return vl

    t_cri = timeit(critics_only, ts, mb)
    print(f"64x critic update: {t_cri*1e3:.1f} ms ({t_cri/64*1e3:.2f} ms each)")

    # gather: pack once + 64 wide-row gathers
    flat = {
        "obs": obs, "action": batch.action, "logp": batch.logp,
        "value": batch.value, "advantages": batch.reward,
        "returns": batch.reward,
    }
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((b,) + x.shape[2:]), flat
    )
    leaves, _ = jax.tree_util.tree_flatten(flat)
    packed = jnp.concatenate([l.reshape(b, -1) for l in leaves], axis=1)

    @jax.jit
    def gathers_only(packed, key):
        def body(c, ek):
            perm = jax.random.permutation(ek, b)[: mb_size * 16]
            idx = perm.reshape(16, mb_size)
            def mbody(c2, i):
                rows = packed[i]
                return c2 + rows[0, 0], None
            c, _ = jax.lax.scan(mbody, c, idx)
            return c, None
        c, _ = jax.lax.scan(body, 0.0, jax.random.split(key, 4))
        return c

    t_g = timeit(gathers_only, packed, jax.random.PRNGKey(2))
    print(f"pack+64 gathers: {t_g*1e3:.1f} ms")
    print(f"sum of parts: {(t_tp+t_act+t_cri+t_g)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
