from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate_state,
    prefetch_to_device,
    DataParallel,
)
