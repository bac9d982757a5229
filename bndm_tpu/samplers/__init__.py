from bndm_tpu.samplers.iadb import (
    sample_iadb, sample_iadb_cached, sample_iadb_microbatched,
    IADBScheduler, iadb_step,
)
from bndm_tpu.samplers.ddim import DDIMScheduler, sample_ddim

__all__ = [
    "sample_iadb", "sample_iadb_cached", "sample_iadb_microbatched",
    "IADBScheduler", "iadb_step", "DDIMScheduler", "sample_ddim",
]
