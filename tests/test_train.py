import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig
from bndm_tpu.train.ema import ema_decay, ema_init, ema_update
from bndm_tpu.train.losses import (
    antithetic_timesteps,
    antithetic_timesteps_ddim,
    remap_batch,
)
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
def L16():
    # engine requires the res-64 L; use banded lower-tri for speed
    rng = np.random.default_rng(7)
    n = 4096
    L = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.01)
    np.fill_diagonal(L, 1.0)
    return L


def test_antithetic():
    t = np.asarray(antithetic_timesteps(jax.random.PRNGKey(0), 64, 1000))
    assert t.shape == (64,)
    assert t.min() >= 1 and t.max() <= 1000
    np.testing.assert_array_equal(t[32:], 1000 - t[:32] + 1)
    td = np.asarray(antithetic_timesteps_ddim(jax.random.PRNGKey(0), 64, 1000))
    assert td.min() >= 0 and td.max() <= 999
    np.testing.assert_array_equal(td[32:], 1000 - td[:32] - 1)


def test_remap_greedy_oracle():
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((6, 3, 4, 4)).astype(np.float32)
    x1 = rng.standard_normal((6, 3, 4, 4)).astype(np.float32)
    got = np.asarray(remap_batch(jnp.asarray(x0), jnp.asarray(x1)))
    # numpy greedy oracle
    d = np.linalg.norm(x0.reshape(6, -1)[:, None] - x1.reshape(6, -1)[None], axis=-1)
    want = np.zeros(6, np.int64)
    for i in range(6):
        want[i] = np.argmin(d[i])
        d[:, want[i]] = 10000.0
    np.testing.assert_array_equal(got, want)


def test_ema_warmup_decay():
    assert float(ema_decay(jnp.int32(1))) < 0.6
    assert abs(float(ema_decay(jnp.int32(10_000_000))) - 0.9999) < 1e-6
    s = ema_init({"w": jnp.zeros(3)})
    s = ema_update(s, {"w": jnp.ones(3)})
    assert 0.0 < float(s.params["w"][0]) <= 1.0


def test_ema_init_does_not_alias():
    """Regression: ema_init must COPY the params. If the EMA tree aliases the
    live params, a donated train step donates the same buffer twice — XLA
    fails one partition and the surviving ones deadlock in the gradient
    all-reduce (hard process abort on the CPU mesh)."""
    p = {"w": jnp.ones((4,), jnp.float32)}
    e = ema_init(p)
    assert e.params["w"].unsafe_buffer_pointer() != p["w"].unsafe_buffer_pointer()


def test_train_loss_decreases(L16):
    cfg = TrainConfig(
        nb_steps=100, noise_type="gaussianBN", scheduler_gamma="sigmoid",
        gamma_defaults=(0.2, 0.0, 3.0), optimize_scheduler_param=True,
        out_channel=6, lr=2e-3, grad_clip=1.0,
    )
    model = UNet2D(TINY)
    tr = PixelTrainer(model, cfg, L16, jax.random.PRNGKey(0))
    batch = jnp.asarray(
        np.random.default_rng(1).uniform(0.3, 0.7, (4, 3, 64, 64)).astype(np.float32)
    )
    losses = []
    for i in range(12):
        m = tr.step(batch, jax.random.PRNGKey(100))  # fixed key: same noise/t
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    # sched params stayed inside the sigmoid optimize ranges
    sp = np.asarray(tr.state.sched_params)
    assert 0.01 <= sp[0] <= 10.0 and -3.0 <= sp[1] <= -0.01 and 0.01 <= sp[2] <= 3.0


def test_fixed_sched_params_stay_fixed(L16):
    cfg = TrainConfig(
        nb_steps=100, noise_type="gaussianBN", scheduler_gamma="sigmoid",
        gamma_defaults=(0.2, 0.0, 3.0), optimize_scheduler_param=False, out_channel=6,
    )
    model = UNet2D(TINY)
    tr = PixelTrainer(model, cfg, L16, jax.random.PRNGKey(0))
    batch = jnp.full((2, 3, 64, 64), 0.5)
    tr.step(batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(tr.state.sched_params), [0.2, 0.0, 3.0], atol=1e-6)


def test_gaussian_path_trains(L16):
    cfg = TrainConfig(nb_steps=100, noise_type="gaussian", scheduler_gamma="linear",
                      out_channel=3)
    tiny3 = TINY.__class__(**{**TINY.__dict__, "out_channels": 3})
    model = UNet2D(tiny3)
    tr = PixelTrainer(model, cfg, L16, jax.random.PRNGKey(0))
    m = tr.step(jnp.full((2, 3, 64, 64), 0.5), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_remat_grads_match(L16):
    """jax.checkpoint must not change gradients, only memory."""
    import jax.numpy as jnp
    from bndm_tpu.train.pixel import make_train_step

    model = UNet2D(TINY)
    base = TrainConfig(nb_steps=100, noise_type="gaussianBN", scheduler_gamma="sigmoid",
                       gamma_defaults=(0.2, 0.0, 3.0), out_channel=6)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)), jnp.zeros((1,)))
    x1 = jnp.full((2, 3, 64, 64), 0.3)
    t = jnp.array([10.0, 91.0])
    nkey = jax.random.PRNGKey(3)
    sp = jnp.array([0.2, 0.0, 3.0])

    grads = {}
    for remat in (False, True):
        cfg = TrainConfig(**{**base.__dict__, "remat": remat})
        step, _ = make_train_step(model.apply, cfg, jnp.asarray(L16))
        (_, _), (g, _) = jax.value_and_grad(step.loss_fn, argnums=(0, 1), has_aux=True)(
            params, sp, x1, t, nkey)
        grads[remat] = g
    for a, b in zip(jax.tree.leaves(grads[False]), jax.tree.leaves(grads[True])):
        # recompute changes fusion/reduction order -> small float drift
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-3)


def test_red_noise_and_gbn_paths(L16):
    """gaussianRN and GBN train paths (RN uses the red L; GBN uses pure-blue
    noise with the plain IADB loss, iadb_bn.py:973)."""
    for ntype, outc in [("gaussianRN", 6), ("GBN", 3)]:
        cfg = TrainConfig(nb_steps=50, noise_type=ntype, scheduler_gamma="sigmoid",
                          gamma_defaults=(0.2, 0.0, 3.0), out_channel=outc)
        tiny = UNet2DConfig(**{**TINY.__dict__, "out_channels": outc})
        tr = PixelTrainer(UNet2D(tiny), cfg, L16, jax.random.PRNGKey(0))
        m = tr.step(jnp.full((2, 3, 64, 64), 0.5), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"])), ntype


def test_uniform_noise_path(L16):
    cfg = TrainConfig(nb_steps=50, noise_type="uniform", scheduler_gamma="linear",
                      out_channel=3)
    tiny = UNet2DConfig(**{**TINY.__dict__, "out_channels": 3})
    tr = PixelTrainer(UNet2D(tiny), cfg, L16, jax.random.PRNGKey(0))
    m = tr.step(jnp.full((2, 3, 64, 64), 0.5), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_remap_training_runs(L16):
    cfg = TrainConfig(nb_steps=50, noise_type="gaussianBN", scheduler_gamma="sigmoid",
                      gamma_defaults=(0.2, 0.0, 3.0), out_channel=6, remap=True)
    tr = PixelTrainer(UNet2D(TINY), cfg, L16, jax.random.PRNGKey(0))
    batch = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (4, 3, 64, 64)),
                        jnp.float32)
    m = tr.step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
