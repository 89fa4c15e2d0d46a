from oswald_tpu.dist.shard import (
    DistributedSearchEngine, make_device_mesh, shard_groups,
    process_group_slice,
)

__all__ = ["DistributedSearchEngine", "make_device_mesh", "shard_groups",
           "process_group_slice"]
