#!/usr/bin/env python
"""Scaling-efficiency benchmark: fused HideAndSeek MAPPO iteration vs mesh size.

Measures aggregate env-steps/s of the full training iteration while doubling
the device mesh, reporting efficiency = speedup / ideal (BASELINE.json north
star: >= 0.8 at N >= 2).  On a real TPU slice this exercises ICI collectives;
with no multi-chip hardware attached, run it on a virtual CPU mesh to
validate the sharding (numbers are then *not* performance):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py

Prints one JSON line per mesh size.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root
import time

import jax

# the axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; the programmatic override wins (same as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 512))
TRAIN_EVERY = int(os.environ.get("BENCH_TRAIN_EVERY", 16))
ITERS = int(os.environ.get("BENCH_ITERS", 5))


def bench(n_dev: int) -> float:
    from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg
    from mupe_tpu.learning import (
        MAPPOCfg, MAPPOPolicy, init_carry, make_split_train_iter,
    )
    from mupe_tpu.parallel import make_mesh, shard_carry

    env = HideAndSeek(HideAndSeekCfg(num_envs=NUM_ENVS, max_episode_length=800))
    policy = MAPPOPolicy(
        MAPPOCfg(train_every=TRAIN_EVERY, use_tp_net=True),
        n_agents=env.num_agents, action_dim=4, obs_is_dict=True,
        tp_input_dim=env.cfg.tp_input_dim,
    )
    carry = init_carry(env, policy, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices()[:n_dev])
    carry = shard_carry(carry, mesh)
    train_iter = make_split_train_iter(env, policy)
    for _ in range(2):
        carry, metrics, _ = train_iter(carry)
    jax.block_until_ready(metrics["policy_loss"])
    t0 = time.time()
    for _ in range(ITERS):
        carry, metrics, _ = train_iter(carry)
    jax.block_until_ready(metrics["policy_loss"])
    return NUM_ENVS * TRAIN_EVERY * ITERS / (time.time() - t0)


def main():
    n = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    base = None
    for s in sizes:
        sps = bench(s)
        base = sps if base is None else base
        eff = sps / (base * s)
        print(json.dumps({
            "metric": "scaling_env_steps_per_s",
            "devices": s,
            "value": round(sps, 1),
            "unit": "env-steps/s",
            "efficiency": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
