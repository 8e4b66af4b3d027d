from .mesh import (make_mesh, shard_batch, shard_stacked_batch,
                   replicate_state, batch_sharding)

__all__ = ["make_mesh", "shard_batch", "shard_stacked_batch",
           "replicate_state", "batch_sharding"]
