#!/usr/bin/env python
"""Perf attribution for the flagship HideAndSeek MAPPO iteration (one chip).

The ONE profiling tool (consolidates the round-2 profile_update*.py
scratch scripts): times rollout vs update, then decomposes the update into
its three phases — GAE/pack prep + TP supervision, the 64-step minibatch
scan (gather + pair-kernel fwd/bwd + optimizer), and the bare pair-kernel
fwd+bwd — so regressions point at a component, not a blob.

Timing hygiene for the axon relay backend: `jax.block_until_ready` returns
immediately there, so every measurement chains its ops and ends with an
explicit device→host read (`float(np.asarray(...))`), which provably
drains the queue.  Totals over N calls are correct; per-call attribution
comes from separate programs, not from syncing inside a loop.

Usage: JAX_PLATFORMS=axon python scripts/profile_breakdown.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NUM_ENVS = int(os.environ.get("PROF_NUM_ENVS", 4096))
T = int(os.environ.get("PROF_TRAIN_EVERY", 64))
ITERS = int(os.environ.get("PROF_ITERS", 5))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


def timeit(fn, *args, warmup=2, iters=ITERS):
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
    from mupe_tpu.learning.rollout import make_rollout_update_progs

    env_cfg = HideAndSeekCfg(num_envs=NUM_ENVS, max_episode_length=800)
    env = HideAndSeek(env_cfg)
    algo_cfg = MAPPOCfg(train_every=T, use_tp_net=True)
    policy = MAPPOPolicy(
        algo_cfg, n_agents=env.num_agents, action_dim=4, obs_is_dict=True,
        tp_input_dim=env_cfg.tp_input_dim,
    )
    carry = init_carry(env, policy, jax.random.PRNGKey(0))
    rollout_prog, update_prog = make_rollout_update_progs(env, policy)

    print(f"{NUM_ENVS} envs x {T} steps, fused pair update")
    t_roll = timeit(rollout_prog, carry)
    carry2, batch, _ = rollout_prog(carry)
    t_upd = timeit(update_prog, carry2, batch)
    print(f"  rollout            {t_roll*1e3:8.1f} ms")
    print(f"  update             {t_upd*1e3:8.1f} ms")
    print(f"  iter total         {(t_roll+t_upd)*1e3:8.1f} ms "
          f"-> {NUM_ENVS*T/(t_roll+t_upd)/1e6:.3f} M env-steps/s")

    # ---- decompose the update: minibatch scan alone (gather+kernels+opt)
    b = T * NUM_ENVS
    mb = b // algo_cfg.num_minibatches

    flat_obs = jax.tree_util.tree_map(
        lambda x: x.reshape((b,) + x.shape[2:]), batch["obs"]
    )
    val = batch["value"].reshape(b, *batch["value"].shape[2:])
    dummy = {
        "obs": flat_obs,
        "action": batch["action"].reshape(b, *batch["action"].shape[2:]),
        "logp": batch["logp"].reshape(b, *batch["logp"].shape[2:]),
        "value": val,
        "advantages": val,
        "returns": val,
    }
    leaves, treedef = jax.tree_util.tree_flatten(dummy)
    sizes = [int(np.prod(l.shape[1:])) for l in leaves]
    shapes = [l.shape[1:] for l in leaves]
    packed = jnp.concatenate([l.reshape(b, -1) for l in leaves], axis=1)

    def unpack(rows):
        out, off = [], 0
        for sz, shp in zip(sizes, shapes):
            out.append(rows[:, off : off + sz].reshape((rows.shape[0],) + shp))
            off += sz
        return jax.tree_util.tree_unflatten(treedef, out)

    n_steps = algo_cfg.ppo_epochs * algo_cfg.num_minibatches

    @jax.jit
    def scan_joint(ts, packed, key):
        idx = jax.random.randint(key, (n_steps, mb), 0, b)

        def body(ts, ix):
            return policy._update_joint(ts, unpack(packed[ix]))

        ts, infos = jax.lax.scan(body, ts, idx)
        return infos["policy_loss"][-1]

    t_scan = timeit(scan_joint, carry2.ts, packed, jax.random.PRNGKey(1))
    print(f"  {n_steps}x joint mb scan  {t_scan*1e3:8.1f} ms "
          f"({t_scan/n_steps*1e3:.2f} ms/minibatch)")

    # ---- bare pair kernel fwd+bwd (no gather, no optimizer)
    from mupe_tpu.ops.fused_encoder import (
        EncoderSpec, extract_leaves, fused_pair_encoder_head, pack_obs,
    )
    from mupe_tpu.learning.modules.networks import entity_group_order

    names = entity_group_order(flat_obs.keys())
    groups = tuple(
        (flat_obs[n].shape[-2], flat_obs[n].shape[-1]) for n in names
    )
    spec_a = EncoderSpec(groups=groups, head_dim=4)
    spec_c = EncoderSpec(groups=groups, head_dim=1)
    mb_obs = jax.tree_util.tree_map(lambda x: x[:mb], flat_obs)
    x, _ = pack_obs(spec_a, mb_obs, names)

    @jax.jit
    def scan_pair(ap, cp, x):
        la = extract_leaves(spec_a, ap, names)
        lc = extract_leaves(spec_c, cp, names)

        def loss(lla, llc):
            oa, oc = fused_pair_encoder_head(spec_a, spec_c, lla, llc, x)
            return jnp.sum(oa) + jnp.sum(oc)

        def body(c, _):
            ga, gc = jax.grad(loss, argnums=(0, 1))(la, lc)
            return c + ga[0][0, 0] + gc[0][0, 0], None

        out, _ = jax.lax.scan(body, 0.0, None, length=n_steps)
        return out

    t_pair = timeit(scan_pair, carry2.ts.actor_params, carry2.ts.critic_params, x)
    print(f"  {n_steps}x pair fwd+bwd   {t_pair*1e3:8.1f} ms "
          f"({t_pair/n_steps*1e3:.2f} ms/minibatch)")
    print(f"  => prep+TP ~ {(t_upd-t_scan)*1e3:.1f} ms, "
          f"gather+opt ~ {(t_scan-t_pair)*1e3:.1f} ms, "
          f"kernels ~ {t_pair*1e3:.1f} ms")


if __name__ == "__main__":
    sys.exit(main())
