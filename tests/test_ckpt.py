import jax
import jax.numpy as jnp
import numpy as np

from bndm_tpu.ckpt.manager import CheckpointManager
from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig
from bndm_tpu.train.pixel import PixelTrainer, TrainConfig

TINY = UNet2DConfig(
    in_channels=3, out_channels=6, block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    attention_head_dim=4, norm_num_groups=4,
)


def _small_L():
    rng = np.random.default_rng(7)
    n = 4096
    L = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.01)
    np.fill_diagonal(L, 1.0)
    return L


def test_full_state_roundtrip(tmp_path):
    cfg = TrainConfig(nb_steps=50, noise_type="gaussianBN", scheduler_gamma="sigmoid",
                      gamma_defaults=(0.2, 0.0, 3.0), out_channel=6,
                      optimize_scheduler_param=True)
    tr = PixelTrainer(UNet2D(TINY), cfg, _small_L(), jax.random.PRNGKey(0))
    batch = jnp.full((2, 3, 64, 64), 0.4)
    tr.step(batch, jax.random.PRNGKey(1))
    tr.step(batch, jax.random.PRNGKey(2))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(2, tr.state, wait=True)
    assert mgr.latest_step() == 2

    restored = mgr.restore(tr.state)
    # exact: params, optimizer state, sched params, step
    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_resume_continues_identically(tmp_path):
    """step -> save -> step == restore -> step (true full-state resume,
    unlike the reference's weights-only resume)."""
    cfg = TrainConfig(nb_steps=50, noise_type="gaussian", scheduler_gamma="linear",
                      out_channel=3)
    tiny3 = UNet2DConfig(**{**TINY.__dict__, "out_channels": 3})
    tr = PixelTrainer(UNet2D(tiny3), cfg, _small_L(), jax.random.PRNGKey(0))
    batch = jnp.full((2, 3, 64, 64), 0.4)
    tr.step(batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "c"))
    mgr.save(1, tr.state, wait=True)

    state_a, _ = tr.train_step(tr.state, batch, jax.random.PRNGKey(9))
    restored = mgr.restore(tr.state)
    state_b, _ = tr.train_step(restored, batch, jax.random.PRNGKey(9))
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_keep_limit(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "k"), max_to_keep=2)
    state = {"w": jnp.arange(4.0)}
    for s in (1, 2, 3):
        mgr.save(s, state, wait=True)
    assert mgr.latest_step() == 3
    assert mgr.restore({"w": jnp.zeros(4)}, step=3) is not None
    mgr.close()
