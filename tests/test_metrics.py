import numpy as np
import jax.numpy as jnp

from bndm_tpu.utils.metrics import ssim, psnr
from bndm_tpu.utils.spectrum import radial_power_profile


def test_psnr_known_value():
    x = jnp.zeros((1, 3, 32, 32))
    y = jnp.full((1, 3, 32, 32), 0.1)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20 dB
    np.testing.assert_allclose(np.asarray(psnr(x, y)), [20.0], rtol=1e-5)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 3, 64, 64)).astype(np.float32))
    s = np.asarray(ssim(x, x))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_ssim_orders_degradations():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
    small = x + 0.02 * jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
    big = x + 0.2 * jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
    s_small = float(ssim(jnp.clip(small, 0, 1), x)[0])
    s_big = float(ssim(jnp.clip(big, 0, 1), x)[0])
    assert 1.0 > s_small > s_big > 0.0


def test_radial_profile_white_noise_flat():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 3, 64, 64)).astype(np.float32))
    _, prof = radial_power_profile(x, nbins=8)
    assert np.nanmax(prof) / np.nanmin(prof) < 1.3
