"""Data-parallel correctness on the 8-virtual-device CPU mesh.

The TPU-native replacement for DataParallel/accelerate-DDP (SURVEY.md S2.4):
batch sharded over Mesh('data'), params replicated, XLA inserts the gradient
all-reduce. These tests pin down (a) that the sharded step runs on 8 devices
and (b) that it is numerically identical to the unsharded step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig
from bndm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from bndm_tpu.train.pixel import PixelTrainer, TrainConfig

TINY = UNet2DConfig(
    in_channels=3,
    out_channels=6,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    attention_head_dim=4,
    norm_num_groups=4,
)


@pytest.fixture(scope="module")
def L():
    rng = np.random.default_rng(7)
    n = 4096
    m = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.01)
    np.fill_diagonal(m, 1.0)
    return m


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_step_matches_unsharded(L):
    """Loss and gradients computed on the sharded batch must equal the
    unsharded ones (up to reduction-reordering float noise, measured
    relative to the gradient norm — Adam-updated params are NOT compared
    elementwise because Adam turns near-zero gradient sign flips into
    full-size update flips)."""
    mesh = make_mesh(8)
    cfg = TrainConfig(nb_steps=100, noise_type="gaussianBN", scheduler_gamma="sigmoid",
                      gamma_defaults=(0.2, 0.0, 3.0), out_channel=6)
    model = UNet2D(TINY)
    tr = PixelTrainer(model, cfg, L, jax.random.PRNGKey(0))
    batch = jnp.asarray(
        np.random.default_rng(3).uniform(0.2, 0.8, (16, 3, 64, 64)).astype(np.float32)
    )
    x1 = batch * 2.0 - 1.0
    t = jnp.linspace(1.0, 100.0, 16)
    nkey = jax.random.PRNGKey(5)

    grad_fn = jax.jit(jax.value_and_grad(tr.train_step.loss_fn, argnums=(0, 1), has_aux=True))
    (loss1, _), (g1, gs1) = grad_fn(tr.state.params, tr.state.sched_params, x1, t, nkey)

    params_r = replicate(mesh, tr.state.params)
    (loss2, _), (g2, gs2) = grad_fn(params_r, tr.state.sched_params, shard_batch(mesh, x1),
                                    shard_batch(mesh, t), nkey)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    norm1 = float(optax_global_norm(g1))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff < 1e-4 * max(norm1, 1.0), diff
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2), rtol=1e-3, atol=1e-5)


def optax_global_norm(tree):
    import optax

    return optax.global_norm(tree)


def test_sharded_sampling(L):
    """Gallery-scale sampling shards the batch across the mesh (replacing the
    reference's DataParallel scatter/gather, iadb_bn.py:716)."""
    from bndm_tpu.samplers.iadb import sample_iadb

    mesh = make_mesh(8)
    model = UNet2D(TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)), jnp.zeros((1,)))
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((16, 3, 16, 16)), jnp.float32)

    out1, _ = sample_iadb(model.apply, params, x0, nb_steps=8, two_head=True)
    out2, _ = sample_iadb(
        model.apply, replicate(mesh, params), shard_batch(mesh, x0), nb_steps=8, two_head=True
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Multi-slice (DCN) hybrid mesh: 2 virtual "slices" x 4 devices. The
# reference never scales past one node; this validates the TPU-native
# cross-slice story — batch sharded over BOTH mesh axes, params replicated,
# hierarchical (ICI + DCN) gradient all-reduce inserted by XLA.
# ---------------------------------------------------------------------------


def test_hybrid_mesh_construction():
    from bndm_tpu.parallel.distributed import hybrid_mesh

    mesh = hybrid_mesh(num_slices=2)
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        hybrid_mesh(num_slices=3)  # 8 devices don't split into 3 slices


def test_hybrid_mesh_groups_by_slice_index():
    """On real multi-slice TPU, grouping comes from device.slice_index —
    simulated here with stand-in objects (Mesh construction itself needs
    real devices, so only the grouping helper is exercised)."""
    from bndm_tpu.parallel.distributed import _devices_by_slice

    class D:
        def __init__(self, i, slice_index):
            self.id = i
            self.slice_index = slice_index

    devs = [D(i, slice_index=i % 2) for i in range(8)]  # interleaved slices
    groups = _devices_by_slice(devs)
    assert [len(g) for g in groups] == [4, 4]
    assert all(d.slice_index == si for si, g in enumerate(groups) for d in g)
    # single slice / no attribute -> None (caller falls back to even split)
    assert _devices_by_slice([D(i, 0) for i in range(4)]) is None
    assert _devices_by_slice([object()] * 4) is None


def test_hybrid_sharded_step_matches_unsharded(L):
    """Gradient parity: batch sharded over the 2-D (replica, data) mesh must
    reproduce the unsharded loss/gradients, same criterion as the 1-D test."""
    from bndm_tpu.parallel.distributed import hybrid_mesh

    mesh = hybrid_mesh(num_slices=2)
    cfg = TrainConfig(nb_steps=100, noise_type="gaussianBN", scheduler_gamma="sigmoid",
                      gamma_defaults=(0.2, 0.0, 3.0), out_channel=6)
    model = UNet2D(TINY)
    tr = PixelTrainer(model, cfg, L, jax.random.PRNGKey(0))
    batch = jnp.asarray(
        np.random.default_rng(3).uniform(0.2, 0.8, (16, 3, 64, 64)).astype(np.float32)
    )
    x1 = batch * 2.0 - 1.0
    t = jnp.linspace(1.0, 100.0, 16)
    nkey = jax.random.PRNGKey(5)

    grad_fn = jax.jit(jax.value_and_grad(tr.train_step.loss_fn, argnums=(0, 1), has_aux=True))
    (loss1, _), (g1, gs1) = grad_fn(tr.state.params, tr.state.sched_params, x1, t, nkey)

    params_r = replicate(mesh, tr.state.params)
    (loss2, _), (g2, gs2) = grad_fn(
        params_r, tr.state.sched_params,
        shard_batch(mesh, x1, axis_name=None), shard_batch(mesh, t, axis_name=None), nkey,
    )

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    norm1 = float(optax_global_norm(g1))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff < 1e-4 * max(norm1, 1.0), diff
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2), rtol=1e-3, atol=1e-5)


def test_auto_mesh_multislice(monkeypatch):
    """auto_mesh returns the hybrid mesh on multi-slice topologies, keeping
    slices whole and trimming per-slice devices to divide the batch."""
    from bndm_tpu.parallel import distributed, mesh as mesh_mod

    devs = jax.devices()

    def fake_groups(devices):
        return [list(devices[:4]), list(devices[4:8])]

    monkeypatch.setattr(distributed, "_devices_by_slice", fake_groups)

    m = mesh_mod.auto_mesh(16)
    assert m.axis_names == ("replica", "data") and m.devices.shape == (2, 4)
    # batch 12: 12 % 8 != 0 -> trim per-slice to 3 -> 2x3 mesh
    m = mesh_mod.auto_mesh(12)
    assert m.devices.shape == (2, 3)
    # batch 3: cannot split across 2 whole slices -> 1-D fallback
    m = mesh_mod.auto_mesh(3)
    assert m.axis_names == ("data",) and m.devices.shape == (3,)
    # the sharding helpers' new default (all axes) covers both mesh kinds
    x = shard_batch(mesh_mod.auto_mesh(16), jnp.ones((16, 2)))
    assert x.sharding.spec[0] == ("replica", "data")
    x = shard_batch(make_mesh(8), jnp.ones((16, 2)))
    assert x.sharding.spec[0] in ("data", ("data",))
