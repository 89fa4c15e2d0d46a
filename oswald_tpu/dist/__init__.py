from oswald_tpu.dist.shard import (
    DistributedSearchEngine, make_device_mesh, shard_groups,
    process_group_slice,
)
from oswald_tpu.dist.bootstrap import bootstrap, shutdown, is_bootstrapped

__all__ = ["DistributedSearchEngine", "make_device_mesh", "shard_groups",
           "process_group_slice", "bootstrap", "shutdown",
           "is_bootstrapped"]
