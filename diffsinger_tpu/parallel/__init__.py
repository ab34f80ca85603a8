from .mesh import create_mesh, batch_sharding, replicated_sharding, shard_batch

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
