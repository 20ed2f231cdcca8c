from .mesh import batch_sharding, get_mesh, init_distributed, replicated, shard_batch
