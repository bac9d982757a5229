"""Multi-process gradient-parity worker (run by tests/test_multiprocess.py).

One OS process per simulated host: ``jax.distributed.initialize`` over a
localhost coordinator (the TPU-native replacement for the reference's
``accelerate launch`` NCCL rendezvous, ddim_diffusers.py:295-301), a global
1-D mesh over both processes' CPU devices, per-host data fed through
``shard_host_local_batch`` — exactly the multi-host path the CLIs wire via
--coordinator_address/--num_processes/--process_id. Asserts the multi-process
sharded loss/gradients equal the locally-computed unsharded ones.

Usage: python tests/mp_gradparity_worker.py <process_id> <num_processes> <port>
Prints "PARITY_OK <max_rel_err>" and exits 0 on success.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig
    from bndm_tpu.parallel.distributed import global_mesh, host_shard_info
    from bndm_tpu.parallel.mesh import replicate, shard_host_local_batch
    from bndm_tpu.train.pixel import PixelTrainer, TrainConfig

    tiny = UNet2DConfig(
        in_channels=3, out_channels=6, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        attention_head_dim=4, norm_num_groups=4)
    rng = np.random.default_rng(7)
    n = 4096
    L = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.01)
    np.fill_diagonal(L, 1.0)
    cfg = TrainConfig(nb_steps=100, noise_type="gaussianBN",
                      scheduler_gamma="sigmoid", gamma_defaults=(0.2, 0.0, 3.0),
                      out_channel=6)
    # same seed on every process -> identical params (the replicate() contract)
    tr = PixelTrainer(UNet2D(tiny), cfg, L, jax.random.PRNGKey(0))

    batch = np.random.default_rng(3).uniform(
        0.2, 0.8, (8, 3, 64, 64)).astype(np.float32)
    x1 = batch * 2.0 - 1.0
    t = np.linspace(1.0, 100.0, 8, dtype=np.float32)
    nkey = jax.random.PRNGKey(5)

    grad_fn = jax.jit(jax.value_and_grad(tr.train_step.loss_fn, argnums=(0, 1),
                                         has_aux=True))

    # local single-device reference on the FULL batch
    (loss1, _), (g1, gs1) = grad_fn(tr.state.params, tr.state.sched_params,
                                    jnp.asarray(x1), jnp.asarray(t), nkey)

    # multi-process: global mesh, per-host slice of the batch
    mesh = global_mesh()
    assert mesh.devices.size == nproc, mesh.devices
    shard_index, shard_count = host_shard_info()
    assert shard_count == nproc
    local_x1 = x1[shard_index::shard_count]
    local_t = t[shard_index::shard_count]
    # shard_host_local_batch builds the global batch from per-host rows;
    # interleaved row order == BatchLoader's idx[shard::count] convention,
    # so rebuild the reference in the same order
    ref_order = np.concatenate([np.arange(len(x1))[s::shard_count]
                                for s in range(shard_count)])
    (loss_ref, _), (g_ref, gs_ref) = grad_fn(
        tr.state.params, tr.state.sched_params,
        jnp.asarray(x1[ref_order]), jnp.asarray(t[ref_order]), nkey)

    params_r = replicate(mesh, tr.state.params)
    gx = shard_host_local_batch(mesh, local_x1)
    gt = shard_host_local_batch(mesh, local_t)
    (loss2, _), (g2, gs2) = grad_fn(params_r, tr.state.sched_params, gx, gt, nkey)

    np.testing.assert_allclose(float(loss_ref), float(loss2), rtol=1e-5)
    flat1 = jax.tree.leaves(g_ref)
    norm1 = float(jnp.sqrt(sum(jnp.sum(jnp.square(a)) for a in flat1)))
    max_rel = 0.0
    for a, b in zip(flat1, jax.tree.leaves(g2)):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        max_rel = max(max_rel, diff / max(norm1, 1.0))
        assert diff < 1e-4 * max(norm1, 1.0), diff
    np.testing.assert_allclose(np.asarray(gs_ref), np.asarray(gs2),
                               rtol=1e-3, atol=1e-5)
    # unsliced-vs-sliced noise keys differ per permutation only through data
    # order; sanity: full-batch loss is finite and close in scale
    assert np.isfinite(float(loss1))
    print(f"PARITY_OK {max_rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
