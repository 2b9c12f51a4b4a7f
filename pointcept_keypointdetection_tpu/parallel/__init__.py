from .mesh import create_mesh, shard_batch, replicate, local_batch_sharding
