"""Device-mesh parallelism (no analog in the single-GPU reference —
SURVEY.md §2c mandates DP over ICI as the one implemented strategy, with the
mesh layer written so 2-D meshes are not precluded)."""

from .mesh import make_mesh, batch_sharding, replicated_sharding
from .dp import (
    make_parallel_scanned_train_step,
    make_parallel_train_step,
    make_shardmap_train_step,
    shard_batch,
)
from .distributed import (
    PerHostSampler,
    initialize_distributed,
    local_batch_slice,
    process_info,
    shard_host_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_parallel_train_step",
    "make_parallel_scanned_train_step",
    "make_shardmap_train_step",
    "initialize_distributed",
    "process_info",
    "local_batch_slice",
    "shard_host_batch",
    "PerHostSampler",
]
