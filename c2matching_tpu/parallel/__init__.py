from .mesh import (batch_sharding, get_mesh, init_distributed,
                   pad_batch_to, replicate, replicated_sharding, shard_batch)

__all__ = [
    'batch_sharding', 'get_mesh', 'init_distributed', 'pad_batch_to',
    'replicate', 'replicated_sharding', 'shard_batch',
]
