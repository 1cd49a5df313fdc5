from .mesh import ENV_AXIS, env_sharding, make_mesh, replicated, shard_carry, shard_env_tree
