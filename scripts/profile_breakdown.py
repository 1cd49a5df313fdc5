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
# comma-separated subset of {full,scan,glue,direct,tp,pair,pairsplit} to
# skip the multi-minute compiles of sections you aren't iterating on
SECTIONS = set(
    os.environ.get(
        "PROF_SECTIONS", "full,scan,glue,direct,tp,pair,pairsplit"
    ).split(",")
)


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


class _SkipSection(Exception):
    pass


def main():
    from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg
    from mupe_tpu.learning import MAPPOCfg, MAPPOPolicy, init_carry
    from mupe_tpu.learning.rollout import make_rollout_update_progs
    from mupe_tpu.utils.jit import mupe_jit
    import functools
    ujit = functools.partial(mupe_jit, role="update")

    env_cfg = HideAndSeekCfg(num_envs=NUM_ENVS, max_episode_length=800)
    env = HideAndSeek(env_cfg)
    # pack_rollout off: this script does its own packing and reads the
    # legacy traj dict fields for component isolation
    algo_cfg = MAPPOCfg(train_every=T, use_tp_net=True, pack_rollout=False)
    policy = MAPPOPolicy(
        algo_cfg, n_agents=env.num_agents, action_dim=4, obs_is_dict=True,
        tp_input_dim=env_cfg.tp_input_dim,
    )
    carry = init_carry(env, policy, jax.random.PRNGKey(0))
    rollout_prog, update_prog = make_rollout_update_progs(env, policy)

    print(f"{NUM_ENVS} envs x {T} steps, fused pair update")
    carry2, batch, _ = rollout_prog(carry)
    if "full" in SECTIONS:
        t_roll = timeit(rollout_prog, carry)
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

    @ujit
    def scan_joint(ts, packed, key):
        idx = jax.random.randint(key, (n_steps, mb), 0, b)

        def body(ts, ix):
            return policy._update_joint(ts, unpack(packed[ix]))

        ts, infos = jax.lax.scan(body, ts, idx)
        return infos["policy_loss"][-1]

    if "scan" in SECTIONS:
        t_scan = timeit(scan_joint, carry2.ts, packed, jax.random.PRNGKey(1))
        print(f"  {n_steps}x joint mb scan  {t_scan*1e3:8.1f} ms "
              f"({t_scan/n_steps*1e3:.2f} ms/minibatch)")

    # ---- glue-only: same joint scan with the pair kernel stubbed to a
    # trivial slice, isolating gather+unpack+XLA-loss+transpose+optimizer
    import mupe_tpu.ops.fused_encoder as fe

    orig_pair = fe.fused_pair_encoder_head

    def _stub(sa, sc, la_, lc_, xx):
        return (
            xx[:, :4] * jnp.sum(la_[0][0]) * 0.001,
            xx[:, :1] * jnp.sum(lc_[0][0]) * 0.001,
        )

    fe.fused_pair_encoder_head = _stub
    try:
        if "glue" not in SECTIONS:
            raise _SkipSection()
        @ujit
        def scan_glue(ts, packed, key):
            idx = jax.random.randint(key, (n_steps, mb), 0, b)

            def body(ts, ix):
                return policy._update_joint(ts, unpack(packed[ix]))

            ts, infos = jax.lax.scan(body, ts, idx)
            return infos["policy_loss"][-1]

        t_glue = timeit(scan_glue, carry2.ts, packed, jax.random.PRNGKey(1))
        print(f"  {n_steps}x glue-only scan {t_glue*1e3:8.1f} ms "
              f"({t_glue/n_steps*1e3:.2f} ms/minibatch)")
    except _SkipSection:
        pass
    finally:
        fe.fused_pair_encoder_head = orig_pair

    # ---- optimizer share: same joint scan with a no-op optimizer (the
    # kernels/gather/loss still run; clip+adam+flatten+global_norm cost
    # is the delta vs the "scan" section)
    if "scanopt" in SECTIONS:
        import optax as _optax

        noop = _optax.GradientTransformation(
            lambda params: _optax.EmptyState(),
            lambda updates, state, params=None: (
                jax.tree_util.tree_map(jnp.zeros_like, updates), state,
            ),
        )
        orig_txs = policy.actor_tx, policy.critic_tx
        policy.actor_tx = noop
        policy.critic_tx = noop

        @ujit
        def scan_noopt(ts, packed, key):
            idx = jax.random.randint(key, (n_steps, mb), 0, b)

            def body(ts, ix):
                return policy._update_joint(ts, unpack(packed[ix]))

            ts, infos = jax.lax.scan(body, ts, idx)
            return infos["policy_loss"][-1]

        t_noopt = timeit(scan_noopt, carry2.ts, packed, jax.random.PRNGKey(1))
        policy.actor_tx, policy.critic_tx = orig_txs
        print(f"  {n_steps}x no-opt mb scan {t_noopt*1e3:8.1f} ms "
              f"({t_noopt/n_steps*1e3:.2f} ms/minibatch)")

    @ujit
    def scan_joint_direct(ts, packed, key):
        idx = jax.random.randint(key, (n_steps, mb), 0, b)

        def body(ts, ix):
            return policy._update_joint_direct(ts, unpack(packed[ix]))

        ts, infos = jax.lax.scan(body, ts, idx)
        return infos["policy_loss"][-1]

    if "direct" in SECTIONS:
        t_dir = timeit(scan_joint_direct, carry2.ts, packed, jax.random.PRNGKey(1))
        print(f"  {n_steps}x direct mb scan {t_dir*1e3:8.1f} ms "
              f"({t_dir/n_steps*1e3:.2f} ms/minibatch)")

    # ---- TP-net supervised update alone (the only non-PPO learner cost)
    from mupe_tpu.learning.mappo import RolloutBatch

    rb = RolloutBatch(
        obs=batch["obs"], action=batch["action"], logp=batch["logp"],
        value=batch["value"], reward=batch["reward"], done=batch["done"],
        last_obs=carry2.obs, tp_input=batch.get("tp_input"),
        tp_gt=batch.get("tp_gt"), tp_done=batch.get("tp_done"),
    )

    @ujit
    def tp_only(ts, rb, key):
        ts2, m = policy._update_tp(ts, rb, key)
        return m["TP_loss"]

    if "tp" in SECTIONS:
        t_tp = timeit(tp_only, carry2.ts, rb, jax.random.PRNGKey(2))
        print(f"  TP update alone    {t_tp*1e3:8.1f} ms")

    # ---- prep decomposition: GAE+norms, packing concat, bootstrap value
    if "prep" in SECTIONS:
        from mupe_tpu.learning.gae import compute_gae

        @ujit
        def prep_gae(ts, batch):
            nv = policy.value_op(ts, carry2.obs, None, fused=True)
            values = ts.value_norm.denormalize(batch["value"])
            nv = ts.value_norm.denormalize(nv)
            adv, ret = compute_gae(
                batch["reward"], batch["done"][..., None, :], values, nv,
                algo_cfg.gamma, algo_cfg.gae_lambda,
            )
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
            vn = ts.value_norm.update(ret)
            return vn.normalize(ret)[0, 0, 0] + adv[0, 0, 0]

        t_prep = timeit(prep_gae, carry2.ts, batch)
        print(f"  GAE+norms+bootstrap{t_prep*1e3:8.1f} ms")

        @ujit
        def prep_pack(batch):
            flat = {
                "obs": batch["obs"], "action": batch["action"],
                "logp": batch["logp"], "value": batch["value"],
                "advantages": batch["value"], "returns": batch["value"],
            }
            flat = jax.tree_util.tree_map(
                lambda x: x.reshape((b,) + x.shape[2:]), flat
            )
            lv, _ = jax.tree_util.tree_flatten(flat)
            return jnp.concatenate([l.reshape(b, -1) for l in lv], axis=1)[0, 0]

        t_pack = timeit(prep_pack, batch)
        print(f"  pack concat        {t_pack*1e3:8.1f} ms")

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

    @ujit
    def scan_pair(ap, cp, x):
        la = extract_leaves(spec_a, ap, names)
        lc = extract_leaves(spec_c, cp, names)

        def loss(lla, llc, xx):
            oa, oc = fused_pair_encoder_head(spec_a, spec_c, lla, llc, xx)
            return jnp.sum(oa) + jnp.sum(oc)

        def body(c, _):
            # thread the carry into x: a loop-INVARIANT body would be
            # hoisted out of the scan by XLA and measure one call, not 64
            ga, gc = jax.grad(loss, argnums=(0, 1))(la, lc, x + c * 1e-20)
            return c + ga[0][0, 0] * 1e-12 + gc[0][0, 0] * 1e-12, None

        out, _ = jax.lax.scan(body, 0.0, None, length=n_steps)
        return out

    if "pair" in SECTIONS:
        t_pair = timeit(
            scan_pair, carry2.ts.actor_params, carry2.ts.critic_params, x
        )
        print(f"  {n_steps}x pair fwd+bwd   {t_pair*1e3:8.1f} ms "
              f"({t_pair/n_steps*1e3:.2f} ms/minibatch)")

    # ---- pair fwd-only vs bwd-only launches (attribution for kernel work)
    if "pairsplit" in SECTIONS:
        from mupe_tpu.ops.fused_encoder import _build_pair_calls, _pad_rows

        xp_const = _pad_rows(x, spec_a.pad_tile)
        fwd_call, bwd_call = _build_pair_calls(
            spec_a, spec_c, xp_const.shape[0], False
        )
        da = jnp.ones((xp_const.shape[0], 4), jnp.float32)
        dc = jnp.ones((xp_const.shape[0], 1), jnp.float32)

        @ujit
        def scan_fwd_only(ap, cp, xx):
            la = extract_leaves(spec_a, ap, names)
            lc = extract_leaves(spec_c, cp, names)

            def body(c, _):
                oa, oc = fwd_call(xx + c * 1e-20, la, lc)
                return c + oa[0, 0] * 1e-12 + oc[0, 0] * 1e-12, None

            out, _ = jax.lax.scan(body, 0.0, None, length=n_steps)
            return out

        @ujit
        def scan_bwd_only(ap, cp, xx):
            la = extract_leaves(spec_a, ap, names)
            lc = extract_leaves(spec_c, cp, names)

            def body(c, _):
                gl = bwd_call(xx + c * 1e-20, da, dc, la, lc)
                return c + gl[0][0, 0] * 1e-12, None

            out, _ = jax.lax.scan(body, 0.0, None, length=n_steps)
            return out

        t_f = timeit(
            scan_fwd_only, carry2.ts.actor_params, carry2.ts.critic_params,
            xp_const,
        )
        t_b = timeit(
            scan_bwd_only, carry2.ts.actor_params, carry2.ts.critic_params,
            xp_const,
        )
        print(f"  {n_steps}x pair fwd only  {t_f*1e3:8.1f} ms "
              f"({t_f/n_steps*1e3:.2f} ms/minibatch)")
        print(f"  {n_steps}x pair bwd only  {t_b*1e3:8.1f} ms "
              f"({t_b/n_steps*1e3:.2f} ms/minibatch)")


if __name__ == "__main__":
    sys.exit(main())
