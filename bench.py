#!/usr/bin/env python
"""Headline benchmark: HideAndSeek MAPPO env-steps/s on one TPU chip.

Measures the reference's headline workload (BASELINE.md): 3-agent
HideAndSeek with random cylinders, TP-net, and the full fused MAPPO
training iteration (rollout 64 steps × num_envs arenas + PPO update),
end-to-end on device.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the driver-set north star of 1M aggregate
env-steps/s per host (BASELINE.json; the reference publishes no numbers).
"""
import json
import os
import sys
import time

# NOTE: do not set JAX_COMPILATION_CACHE_DIR here — executable
# serialization stalls compilation on the axon remote-compile backend.

import jax
import numpy as np

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
TRAIN_EVERY = int(os.environ.get("BENCH_TRAIN_EVERY", 64))
WARMUP = 2
ITERS = int(os.environ.get("BENCH_ITERS", 10))
# Escape hatch: BENCH_FUSED=0 runs the pure-XLA (flax) update so a Pallas
# kernel regression can never zero out the round's headline metric.
FUSED = os.environ.get("BENCH_FUSED", "1") != "0"
# BENCH_INKERNEL=1 switches to the fwd+loss+actor-bwd combined kernel
# (use_inkernel_loss) — competitive only with a raised scoped-VMEM limit
# (MUPE_SCOPED_VMEM_KIB) that admits large agrad tiles.
INKERNEL = os.environ.get("BENCH_INKERNEL", "0") == "1"


def main():
    from mupe_tpu.envs.hideandseek import HideAndSeek, HideAndSeekCfg
    from mupe_tpu.learning import (
        MAPPOCfg,
        MAPPOPolicy,
        init_carry,
        make_split_train_iter,
    )
    from mupe_tpu.parallel import make_mesh, shard_carry

    env_cfg = HideAndSeekCfg(num_envs=NUM_ENVS, max_episode_length=800)
    env = HideAndSeek(env_cfg)
    algo_cfg = MAPPOCfg(
        train_every=TRAIN_EVERY, use_tp_net=True, use_fused_encoder=FUSED,
        use_inkernel_loss=INKERNEL,
        use_fused_act=os.environ.get("BENCH_FUSED_ACT", "0") == "1",
    )
    policy = MAPPOPolicy(
        algo_cfg,
        n_agents=env.num_agents,
        action_dim=4,
        obs_is_dict=True,
        tp_input_dim=env_cfg.tp_input_dim,
    )
    carry = init_carry(env, policy, jax.random.PRNGKey(0))
    mesh = make_mesh()
    if mesh.devices.size > 1:
        carry = shard_carry(carry, mesh)
    train_iter = make_split_train_iter(env, policy)

    # Explicit host reads, NOT jax.block_until_ready: on the axon relay
    # backend block_until_ready returns immediately (relay buffers resolve
    # lazily); only a device→host transfer provably drains the queue.
    for _ in range(WARMUP):
        carry, metrics, _ = train_iter(carry)
    float(np.asarray(metrics["policy_loss"]))

    t0 = time.time()
    for _ in range(ITERS):
        carry, metrics, _ = train_iter(carry)
    float(np.asarray(metrics["policy_loss"]))
    dt = time.time() - t0

    steps_per_s = NUM_ENVS * TRAIN_EVERY * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "hideandseek_mappo_env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s (1 chip, rollout+update, "
                f"{NUM_ENVS} arenas x {TRAIN_EVERY} steps)",
                "vs_baseline": round(steps_per_s / 1_000_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
