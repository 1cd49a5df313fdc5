"""Device-mesh sharding of the environment axis.

The reference's only parallelism is vectorized arenas on one GPU
(SURVEY §2.6; cfg/base/env_base.yaml num_envs=4096).  Here the same arena
axis is sharded across a `jax.sharding.Mesh` of TPU chips/hosts: every leaf
of the env/rollout state carries the env axis first, policy/optimizer state
is replicated, and XLA's SPMD partitioner inserts the collectives (gradient
`psum` across the data axis, gathers for global minibatch shuffling) over
ICI/DCN.  The networks are tiny (≤256 hidden), so tensor/pipeline/sequence
parallelism is intentionally out of scope — the env/batch axis is the only
sharded dimension, exactly mirroring (and scaling out) the reference.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env) axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_tree(tree: Any, mesh: Mesh) -> Any:
    """Place every array leaf with leading env axis on the mesh; scalars and
    sub-env-sized leaves are replicated."""
    num = mesh.devices.size
    es, rep = env_sharding(mesh), replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % num == 0 and x.shape[0] > 0:
            return jax.device_put(x, es)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, tree)


def shard_carry(carry, mesh: Mesh):
    """Shard an `IterCarry`: env state/obs by env axis, learner state
    replicated."""
    return carry.replace(
        ts=jax.device_put(carry.ts, replicated(mesh)),
        env_state=shard_env_tree(carry.env_state, mesh),
        obs=shard_env_tree(carry.obs, mesh),
        state=(
            shard_env_tree(carry.state, mesh)
            if carry.state is not None
            else None
        ),
        key=jax.device_put(carry.key, replicated(mesh)),
    )
