#!/usr/bin/env python
"""Attribute the PPO minibatch-scan glue (everything around the Pallas
kernels): gather+unpack, optimizer step, XLA loss chain.  Companion to
profile_breakdown.py.  Usage: JAX_PLATFORMS=axon python scripts/profile_glue.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 64
MB = 16384
B = 262144


def _sync(out):
    return float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])


def timeit(fn, *args, warmup=1, iters=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def main():
    from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg
    from mupe_tpu.learning import MAPPOCfg, MAPPOPolicy, init_carry

    env_cfg = HideAndSeekCfg(num_envs=128, max_episode_length=800)
    env = HideAndSeek(env_cfg)
    algo_cfg = MAPPOCfg(train_every=16, use_tp_net=True)
    policy = MAPPOPolicy(
        algo_cfg, n_agents=env.num_agents, action_dim=4, obs_is_dict=True,
        tp_input_dim=env_cfg.tp_input_dim,
    )
    carry = init_carry(env, policy, jax.random.PRNGKey(0))
    ts = carry.ts

    # ---- gather + unpack scan (packed width ~198 like production)
    packed = jnp.zeros((B, 198), jnp.float32)

    @jax.jit
    def scan_gather(packed, key):
        idx = jax.random.randint(key, (N_STEPS, MB), 0, B)

        def body(c, ix):
            rows = packed[ix]
            return c + rows[0, 0], None

        out, _ = jax.lax.scan(body, 0.0, idx)
        return out

    t_gather = timeit(scan_gather, packed, jax.random.PRNGKey(0))
    print(f"  {N_STEPS}x gather [{MB}x198]       {t_gather*1e3:7.1f} ms")

    # ---- optimizer-only scan (both nets, flattened adam, fixed grads)
    ga = jax.tree_util.tree_map(jnp.ones_like, ts.actor_params)
    gc = jax.tree_util.tree_map(jnp.ones_like, ts.critic_params)

    @jax.jit
    def scan_opt(ts):
        def body(c, _):
            ap, ao, cp, co = c
            import optax

            ua, ao = policy.actor_tx.update(ga, ao, ap)
            ap = optax.apply_updates(ap, ua)
            uc, co = policy.critic_tx.update(gc, co, cp)
            cp = optax.apply_updates(cp, uc)
            gn = (jnp.float32(0.0) + jax.tree_util.tree_leaves(ua)[0][0].reshape(-1)[0])
            return (ap, ao, cp, co), gn

        (_, _, _, _), out = jax.lax.scan(
            body,
            (ts.actor_params, ts.actor_opt, ts.critic_params, ts.critic_opt),
            None, length=N_STEPS,
        )
        return out[-1]

    t_opt = timeit(scan_opt, ts)
    print(f"  {N_STEPS}x optimizer (2 nets)     {t_opt*1e3:7.1f} ms")

    # ---- extract_leaves plumbing: grads through extract + rebuild per step
    from mupe_tpu.ops.fused_encoder import EncoderSpec, extract_leaves

    names = ["state_self", "state_others", "cylinders"]
    spec_a = EncoderSpec(groups=((1, 35), (2, 3), (3, 5)), head_dim=4)

    @jax.jit
    def scan_extract(ts):
        def body(c, _):
            def f(p):
                lv = extract_leaves(spec_a, p, names)
                return sum(jnp.sum(l) for l in lv)

            g = jax.grad(f)(ts.actor_params)
            return c + jax.tree_util.tree_leaves(g)[0].reshape(-1)[0], None

        out, _ = jax.lax.scan(body, 0.0, None, length=N_STEPS)
        return out

    t_ex = timeit(scan_extract, ts)
    print(f"  {N_STEPS}x extract+transpose      {t_ex*1e3:7.1f} ms")


if __name__ == "__main__":
    sys.exit(main())
