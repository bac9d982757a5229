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


def _devices_by_slice(devices):
    """Group devices by their TPU slice_index (multi-slice jobs expose it);
    returns None when the attribute is absent (CPU/GPU or single slice)."""
    ids = [getattr(d, "slice_index", None) for d in devices]
    if any(i is None for i in ids) or len(set(ids)) <= 1:
        return None
    groups = {}
    for d, i in zip(devices, ids):
        groups.setdefault(i, []).append(d)
    sizes = {len(v) for v in groups.values()}
    if len(sizes) != 1:
        return None  # ragged slices — fall back to an even split
    return [groups[i] for i in sorted(groups)]


def hybrid_mesh(num_slices=None, dcn_axis="replica", ici_axis="data", devices=None,
                groups=None):
    """2-D mesh for multi-slice TPU jobs: (dcn_axis over slices, ici_axis
    within a slice).

    The reference never scales past one node (NCCL DDP on a single machine,
    ddim_diffusers.py:295-301); this is the TPU-native story for going
    further: collectives along ``ici_axis`` ride the fast intra-slice ICI,
    while only the (much smaller, hierarchically-reduced) cross-slice
    gradient sum crosses DCN. Data-parallel use: shard the batch over BOTH
    axes — ``PartitionSpec((dcn_axis, ici_axis))`` — and replicate params;
    XLA lowers the gradient all-reduce to reduce-scatter/all-gather on ICI
    plus a per-shard all-reduce on DCN.

    On real multi-slice TPU the grouping comes from each device's
    ``slice_index``; elsewhere (CPU test meshes, single slice) pass
    ``num_slices`` to split the device list evenly — the collective layout
    is identical, which is what the 8-virtual-device tests validate.
    """
    if groups is not None:
        if len({len(g) for g in groups}) != 1:
            raise ValueError("groups must be equally sized")
        num_slices = None  # caller-specified grouping wins
        devices = [d for g in groups for d in g]
    if devices is None:
        devices = jax.devices()
    if groups is None:
        groups = _devices_by_slice(devices)
    if groups is None:
        if num_slices is None:
            num_slices = 1
        if len(devices) % num_slices != 0:
            raise ValueError(
                f"{len(devices)} devices do not split into {num_slices} slices"
            )
        per = len(devices) // num_slices
        groups = [devices[i * per : (i + 1) * per] for i in range(num_slices)]
    elif num_slices is not None and num_slices != len(groups):
        raise ValueError(
            f"num_slices={num_slices} but topology reports {len(groups)} slices"
        )
    arr = np.empty((len(groups), len(groups[0])), dtype=object)
    for i, g in enumerate(groups):
        arr[i, :] = g
    return Mesh(arr, (dcn_axis, ici_axis))


def host_shard_info():
    """(shard_index, shard_count) for per-host data loading."""
    return jax.process_index(), jax.process_count()
