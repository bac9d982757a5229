"""Device mesh + sharding helpers (TPU-native data parallelism).

Replaces the reference's two DP mechanisms — torch ``DataParallel``
(iadb_bn.py:573,716,838) and HF accelerate DDP over NCCL
(ddim_diffusers.py:570-572, latent_...:426-428) — with the idiomatic JAX
stack (SURVEY.md S2.4): a 1-D ``Mesh('data')`` over ICI, batches sharded via
``NamedSharding(P('data'))``, parameters replicated; under ``jit`` XLA
partitions the step and inserts the gradient all-reduce automatically (the
pjit data-parallel recipe). Multi-host: call ``jax.distributed.initialize``
before building the mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """1-D mesh over the first n devices (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def auto_mesh(batch_size, axis_name="data"):
    """Mesh over the largest device count that divides the batch size.

    On a multi-slice TPU job (devices report distinct ``slice_index``) this
    returns the hybrid 2-D (replica=DCN, data=ICI) mesh instead, shrinking
    the per-slice device count until slices x per_slice divides the batch —
    slices are kept whole so cross-slice traffic stays a pure DCN all-reduce.
    """
    from bndm_tpu.parallel.distributed import _devices_by_slice, hybrid_mesh

    devices = jax.devices()
    groups = _devices_by_slice(devices)
    if groups is not None:
        s, per = len(groups), len(groups[0])
        while per > 1 and batch_size % (s * per) != 0:
            per -= 1
        if batch_size % (s * per) == 0:
            return hybrid_mesh(groups=[g[:per] for g in groups])
        # batch doesn't even split across slices — fall back to 1-D below
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n, axis_name)


def _batch_axes(mesh, axis_name):
    """axis_name=None (the default) -> shard the batch over ALL mesh axes, so
    the same call sites work for the 1-D ('data',) mesh and the hybrid
    ('replica', 'data') DCN x ICI mesh from ``parallel.distributed.hybrid_mesh``."""
    return tuple(mesh.axis_names) if axis_name is None else axis_name


def data_parallel_sharding(mesh, axis_name=None):
    """(batch_sharding, replicated_sharding) for the mesh."""
    return NamedSharding(mesh, P(_batch_axes(mesh, axis_name))), NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name=None):
    """Place a host array sharded along its leading (batch) axis.

    Single-process only (every device addressable); multi-host jobs feed
    per-host slices through :func:`shard_host_local_batch`."""
    sh = NamedSharding(mesh, P(_batch_axes(mesh, axis_name)))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_host_local_batch(mesh, local_batch, axis_name=None):
    """Multi-host data path: each process passes ITS OWN rows of the global
    batch (``BatchLoader(shard_index=process_index, shard_count=process_count)``)
    and gets back one global array sharded along the batch axis over the whole
    mesh — the jax.make_array_from_process_local_data recipe that replaces
    the reference's accelerate-DDP per-rank DataLoader
    (ddim_diffusers.py:570-572). Single-process: identical to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch, axis_name)
    sh = NamedSharding(mesh, P(_batch_axes(mesh, axis_name)))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch)


def replicate(mesh, tree):
    """Replicate a pytree (params/optimizer state) across the mesh.

    Multi-host: every process must hold the same values (true for
    deterministic init from the same seed, or a restored checkpoint)."""
    sh = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
