from bndm_tpu.parallel.mesh import make_mesh, auto_mesh, shard_batch, replicate, data_parallel_sharding

__all__ = ["make_mesh", "auto_mesh", "shard_batch", "replicate", "data_parallel_sharding"]
