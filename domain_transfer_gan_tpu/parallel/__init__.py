from .mesh import (
    make_mesh,
    make_mesh_axes,
    batch_sharding,
    param_shardings,
    shard_params,
    replicated_sharding,
    shard_batch,
    replicate_state,
    prefetch_to_device,
    DataParallel,
)
from .pipeline import PipelineEngine, gpipe_apply, pipeline_hints
from . import multihost
