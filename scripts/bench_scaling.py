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
    mesh = make_mesh(jax.devices()[:n_dev])
    carry = init_carry(
        env, policy, jax.random.PRNGKey(0),
        mesh=mesh if n_dev > 1 else None,
    )
    if n_dev == 1:
        mesh = None
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
    # multi-host: join the runtime when a coordinator is configured
    # (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env
    # vars); devices() is then the global list
    from mupe_tpu.parallel import init_distributed

    init_distributed()
    n = len(jax.devices())
    if jax.process_count() > 1:
        # sub-meshes would exclude some process's devices; bench the full
        # global mesh only
        sizes = [n]
    else:
        sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    base = None
    for s in sizes:
        sps = bench(s)
        if s == 1:
            base = sps
        row = {
            "metric": "scaling_env_steps_per_s",
            "devices": s,
            "processes": jax.process_count(),
            "value": round(sps, 1),
            "unit": "env-steps/s",
        }
        if base is not None:
            row["efficiency"] = round(sps / (base * s), 3)
        if jax.process_index() == 0:
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
