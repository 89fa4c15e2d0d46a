from oswald_tpu.dist.shard import (
    DistributedSearchEngine, make_device_mesh, shard_groups,
)

__all__ = ["DistributedSearchEngine", "make_device_mesh", "shard_groups"]
