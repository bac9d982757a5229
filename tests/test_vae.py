import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bndm_tpu.models.vae import SD_SCALING, AutoencoderKL, VAEConfig

TINY = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)


@pytest.fixture(scope="module")
def vae():
    m = AutoencoderKL(TINY)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)),
                    method=AutoencoderKL.encode)
    # decoder params too
    params2 = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    return m, params2


def test_encode_decode_shapes(vae):
    m, params = vae
    x = jnp.zeros((2, 3, 32, 32))
    z = m.apply(params, x, method=AutoencoderKL.encode)
    assert z.shape == (2, 4, 16, 16)  # two blocks -> one downsample: /2
    img = m.apply(params, z, method=AutoencoderKL.decode)
    assert img.shape == (2, 3, 32, 32)


def test_encode_mean_vs_sample(vae):
    m, params = vae
    x = jnp.ones((1, 3, 32, 32)) * 0.5
    z_mean = m.apply(params, x, method=AutoencoderKL.encode)
    z_s1 = m.apply(params, x, jax.random.PRNGKey(1), method=AutoencoderKL.encode)
    z_s2 = m.apply(params, x, jax.random.PRNGKey(2), method=AutoencoderKL.encode)
    assert not np.allclose(np.asarray(z_s1), np.asarray(z_s2))
    # samples scatter around the mean
    assert np.abs(np.asarray(z_s1 - z_mean)).mean() > 0


def test_scaling_constant(vae):
    m, params = vae
    x = jnp.ones((1, 3, 32, 32)) * 0.3
    mean, _ = m.apply(params, x, method=AutoencoderKL.encode_moments)
    z = m.apply(params, x, method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(z), SD_SCALING * np.asarray(mean), rtol=1e-6)


def test_sd_vae_param_count():
    """The full SD AutoencoderKL is ~83.65M params — structural parity check."""
    cfg = VAEConfig()
    m = AutoencoderKL(cfg)
    shapes = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 3, 64, 64))), jax.random.PRNGKey(0)
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))
    assert 83e6 < n < 84.5e6, n


def test_converter_names_roundtrip(vae):
    from bndm_tpu.models.convert import convert_flax_params, convert_torch_state_dict

    m, params = vae
    sd = convert_flax_params(params)
    assert any(k.startswith("encoder.down_blocks.0.resnets.0.") for k in sd)
    assert "quant_conv.weight" in sd and "post_quant_conv.bias" in sd
    assert any(".downsamplers.0.conv." in k for k in sd)
    assert any(k.startswith("decoder.up_blocks.") and ".upsamplers.0.conv." in k for k in sd)
    back = convert_torch_state_dict(sd)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 32, 32)), jnp.float32)
    out1 = m.apply(params, x)
    out2 = m.apply(back, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6, atol=1e-6)


def test_make_decoder_microbatched_exact(vae):
    """make_decoder(mb): lax.map-chunked decode is bit-exact vs full-batch
    (decode is per-sample — GroupNorm normalizes within each sample), incl.
    a batch the microbatch does not divide (pad + slice-back path)."""
    from bndm_tpu.models.vae import make_decoder

    m, params = vae
    z = jnp.asarray(np.random.default_rng(3).standard_normal((5, 4, 16, 16)),
                    jnp.float32)
    full = make_decoder(m)(params, z)
    for mb in (2, 5, 8):  # non-dividing, exact, mb > batch
        out = make_decoder(m, mb)(params, z)
        assert out.shape == full.shape
        np.testing.assert_array_equal(np.asarray(out), np.asarray(full))
