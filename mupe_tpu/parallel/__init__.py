from .mesh import (
    ENV_AXIS,
    env_sharding,
    init_distributed,
    local_env_slice,
    make_mesh,
    replicated,
    shard_carry,
    shard_env_tree,
    sharded_init_jit,
)
