"""Multi-host initialization + global mesh construction.

The reference's multi-process story is ``accelerate launch`` + NCCL
(ddim_diffusers.py:295-301 with a 7200s timeout for big jobs). TPU-native:
``jax.distributed.initialize()`` (auto-discovers the slice topology on TPU
pods), then one global Mesh over all devices; each host feeds its own data
shard (``BatchLoader(shard_index=process_index, shard_count=process_count)``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Idempotent jax.distributed.initialize; no-op for single-process runs
    unless explicit coordination args are given."""
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and jax.distributed.is_initialized():
        return
    if coordinator_address is None and jax.process_count() == 1 and num_processes in (None, 1):
        return  # single host, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name="data"):
    """1-D mesh over ALL devices in the job (across hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_shard_info():
    """(shard_index, shard_count) for per-host data loading."""
    return jax.process_index(), jax.process_count()
