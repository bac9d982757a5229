from bndm_tpu.parallel.mesh import (
    make_mesh,
    auto_mesh,
    shard_batch,
    shard_host_local_batch,
    replicate,
    data_parallel_sharding,
)
from bndm_tpu.parallel.distributed import (
    init_distributed,
    global_mesh,
    hybrid_mesh,
    host_shard_info,
)

__all__ = [
    "make_mesh",
    "auto_mesh",
    "shard_batch",
    "shard_host_local_batch",
    "replicate",
    "data_parallel_sharding",
    "init_distributed",
    "global_mesh",
    "hybrid_mesh",
    "host_shard_info",
]
