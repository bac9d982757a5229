"""Fused Pallas noise-kernel tests — run only on a real TPU.

The hermetic suite forces CPU (conftest), so these are skipped there; run
manually with `JAX_PLATFORMS=axon pytest tests/test_fused_noise_tpu.py`
or on any TPU host. The same checks are exercised by /tmp-level scripts
during development; keeping them here documents the contract:
  wn ~ N(0,1); bn == L @ wn exactly; noise == bn*(1-g) + wn*g; deterministic.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="fused kernel is TPU-only"
)


def test_fused_contract():
    import jax.numpy as jnp

    from bndm_tpu.ops.pallas_bluenoise import fused_bluenoise

    rng = np.random.default_rng(0)
    n = 4096
    L = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.02)
    np.fill_diagonal(L, 1.0)
    Lj = jnp.asarray(L)
    B, C = 8, 3
    gamma = jnp.linspace(0.1, 0.9, B)
    key = jax.random.PRNGKey(0)
    noise, bn, wn = map(np.asarray, fused_bluenoise(key, B, C, Lj, gamma))

    assert abs(wn.mean()) < 0.02 and abs(wn.var() - 1.0) < 0.02
    wf = np.transpose(wn.reshape(B, C, n), (0, 2, 1))
    want_bn = np.matmul(L.astype(np.float64), wf.astype(np.float64))
    got_bn = np.transpose(bn.reshape(B, C, n), (0, 2, 1))
    assert np.abs(got_bn - want_bn).max() < 1e-5
    g = np.asarray(gamma).reshape(-1, 1, 1, 1)
    np.testing.assert_array_equal(noise, bn * (1 - g) + wn * g)

    noise2 = np.asarray(fused_bluenoise(key, B, C, Lj, gamma)[0])
    np.testing.assert_array_equal(noise, noise2)


def test_fused_gamma_gradient():
    """The custom JVP (r4): gradients flow through gamma — required because
    the training loss differentiates the noise mix w.r.t. the learnable
    gamma schedule (train/pixel.py). d noise/d gamma must equal wn - bn
    exactly (the in-kernel mix is bn*(1-g) + wn*g)."""
    import jax.numpy as jnp

    from bndm_tpu.ops.pallas_bluenoise import fused_bluenoise

    rng = np.random.default_rng(1)
    n = 4096
    L = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.02)
    np.fill_diagonal(L, 1.0)
    Lj = jnp.asarray(L)
    B, C = 4, 3
    gamma = jnp.linspace(0.2, 0.8, B)
    key = jax.random.PRNGKey(1)

    def f(g):
        noise, _, _ = fused_bluenoise(key, B, C, Lj, g)
        return noise

    noise, bn, wn = fused_bluenoise(key, B, C, Lj, gamma)
    _, tangent = jax.jvp(f, (gamma,), (jnp.ones_like(gamma),))
    np.testing.assert_allclose(np.asarray(tangent),
                               np.asarray(wn - bn), rtol=1e-6, atol=1e-6)

    # and through a scalar loss (the training usage pattern)
    grad = jax.grad(lambda g: jnp.sum(f(g) ** 2))(gamma)
    want = 2.0 * jnp.sum(noise * (wn - bn), axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want),
                               rtol=1e-3, atol=1e-2)
