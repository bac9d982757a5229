import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bndm_tpu.ops.noise import get_noise, get_noise_v2, noise_padding


# ---------- numpy oracles (element-indexed, independent of the impl) ----------


def _oracle_padding(tiles):
    """Transposed quadrant stitch: t2 below t1, t3 right of t1."""
    b, _, c, h, w = tiles.shape
    out = np.zeros((b, c, 2 * h, 2 * w), tiles.dtype)
    out[:, :, :h, :w] = tiles[:, 0]
    out[:, :, h:, :w] = tiles[:, 1]
    out[:, :, :h, w:] = tiles[:, 2]
    out[:, :, h:, w:] = tiles[:, 3]
    return out


def _oracle_scramble(xf, h, w):
    """Reinterpret the row-major (HW, C) buffer as (C, H, W), per batch."""
    b, hw, c = xf.shape
    out = np.zeros((b, c, h, w), xf.dtype)
    for bi in range(b):
        buf = np.ascontiguousarray(xf[bi]).reshape(-1)  # hw-major, then c
        for ci in range(c):
            for p in range(hw):
                out[bi, ci, p // w, p % w] = buf[ci * hw + p]
    return out


def _oracle_flatten(x):
    """(B,C,H,W) -> (B,HW,C)."""
    b, c, h, w = x.shape
    return np.transpose(x.reshape(b, c, h * w), (0, 2, 1))


# ------------------------------- tests ---------------------------------------


def test_noise_padding_layout(rng):
    tiles = rng.standard_normal((2, 4, 3, 4, 4)).astype(np.float32)
    got = np.asarray(noise_padding(jnp.asarray(tiles)))
    np.testing.assert_array_equal(got, _oracle_padding(tiles))


def test_res64_bn_exact(small_L, rng):
    """inplace=True makes the path deterministic: noise_bn == L @ white."""
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    gamma = np.array([0.25, 0.75], np.float32)
    n, bn, wn = get_noise(
        jnp.asarray(x), jnp.asarray(small_L), jnp.asarray(gamma),
        noise_type="gaussianBN", inplace=True,
    )
    xf = _oracle_flatten(x)
    want_bn = np.matmul(small_L.astype(np.float64), xf.astype(np.float64)).astype(np.float32)
    want_bn = np.transpose(want_bn, (0, 2, 1)).reshape(2, 3, 64, 64)
    np.testing.assert_allclose(np.asarray(bn), want_bn, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(wn), x)
    want_mix = want_bn * (1 - gamma.reshape(-1, 1, 1, 1)) + x * gamma.reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(n), want_mix, rtol=2e-5, atol=2e-5)


def test_res64_gbn_is_pure_blue(small_L, rng):
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    gamma = np.array([0.5], np.float32)
    n, bn, _ = get_noise(
        jnp.asarray(x), jnp.asarray(small_L), jnp.asarray(gamma),
        noise_type="GBN", inplace=True,
    )
    np.testing.assert_array_equal(np.asarray(n), np.asarray(bn))


def test_res128_quirks_exact(small_L, rng):
    """Full res-128 path vs oracle: quadrant split (reading order), per-tile
    L matmul, the noise_wn buffer scramble, and the transposed stitch."""
    b = 2
    x = rng.standard_normal((b, 3, 128, 128)).astype(np.float32)
    gamma = np.array([0.3, 0.9], np.float32)
    n, bn, wn = get_noise(
        jnp.asarray(x), jnp.asarray(small_L), jnp.asarray(gamma),
        noise_type="gaussianBN", inplace=True,
    )
    # oracle: tiles in reading order TL,TR,BL,BR stacked along batch
    t = np.concatenate(
        [x[:, :, :64, :64], x[:, :, :64, 64:], x[:, :, 64:, :64], x[:, :, 64:, 64:]], axis=0
    )
    tf = _oracle_flatten(t)  # (4b, 4096, 3)
    want_wn = _oracle_padding(_oracle_scramble(tf, 64, 64).reshape(b, 4, 3, 64, 64))
    bn_t = np.matmul(small_L.astype(np.float64), tf.astype(np.float64)).astype(np.float32)
    bn_t = np.transpose(bn_t, (0, 2, 1)).reshape(b, 4, 3, 64, 64)
    want_bn = _oracle_padding(bn_t)
    np.testing.assert_array_equal(np.asarray(wn), want_wn)
    np.testing.assert_allclose(np.asarray(bn), want_bn, rtol=2e-5, atol=2e-5)
    g = gamma.reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(
        np.asarray(n), want_bn * (1 - g) + want_wn * g, rtol=2e-5, atol=2e-5
    )
    # note: tiles are stacked batch-major in _split_quadrants (tile-major
    # ordering t[b*? ] ); verify the reshape(b,4,...) grouping used above is
    # consistent with the engine by the equality assertions themselves.


def test_res128_tile_order_grouping(small_L, rng):
    """The reference concatenates tiles along dim=0 as [t1;t2;t3;t4] (tile-
    major), then views as (bs, 4, ...) — which regroups *batch-major*. That
    cross-sample shuffle is itself a quirk worth pinning down: with b=1 the
    two orders coincide; with b>1 they do not. The engine must match the
    torch view semantics."""
    b = 2
    x = rng.standard_normal((b, 3, 128, 128)).astype(np.float32)
    gamma = np.zeros((b,), np.float32)
    _, bn, _ = get_noise(
        jnp.asarray(x), jnp.asarray(small_L), jnp.asarray(gamma),
        noise_type="gaussianBN", inplace=True,
    )
    # torch: cat([t1,t2,t3,t4], dim=0) gives tile-major stacking; the later
    # .view(bs, 4, C, 64, 64) then takes consecutive groups of 4 from that
    # stack: group 0 = [t1(b0), t1(b1), t2(b0), t2(b1)][0:4]? No — groups are
    # consecutive rows: [t1(b0), t1(b1), t2(b0), t2(b1)] for b=2. So sample 0
    # of the output is stitched from t1(b0), t1(b1), t2(b0), t2(b1).
    t = np.concatenate(
        [x[:, :, :64, :64], x[:, :, :64, 64:], x[:, :, 64:, :64], x[:, :, 64:, 64:]], axis=0
    )
    tf = _oracle_flatten(t)
    bn_t = np.matmul(small_L.astype(np.float64), tf.astype(np.float64)).astype(np.float32)
    bn_t = np.transpose(bn_t, (0, 2, 1)).reshape(4 * b, 3, 64, 64)
    want_sample0 = _oracle_padding(bn_t.reshape(b, 4, 3, 64, 64))[0]
    np.testing.assert_allclose(np.asarray(bn)[0], want_sample0, rtol=2e-5, atol=2e-5)


def test_res32_tile_and_crop(small_L, rng):
    x = rng.standard_normal((2, 4, 32, 32)).astype(np.float32)
    gamma = np.array([0.0, 1.0], np.float32)
    n, bn, wn = get_noise(
        jnp.asarray(x), jnp.asarray(small_L), jnp.asarray(gamma),
        noise_type="gaussianBN", inplace=True,
    )
    assert n.shape == (2, 4, 32, 32)
    # the tiled-up 64x64 white noise is x repeated 2x2; crop returns x itself
    np.testing.assert_array_equal(np.asarray(wn), x)
    # oracle for bn: tile x to 64, correlate, crop
    x64 = np.tile(x, (1, 1, 2, 2))
    xf = _oracle_flatten(x64)
    want = np.matmul(small_L.astype(np.float64), xf.astype(np.float64)).astype(np.float32)
    want = np.transpose(want, (0, 2, 1)).reshape(2, 4, 64, 64)[:, :, :32, :32]
    np.testing.assert_allclose(np.asarray(bn), want, rtol=2e-5, atol=2e-5)
    # gamma=0 -> pure bn; gamma=1 -> pure wn
    np.testing.assert_allclose(np.asarray(n)[0], np.asarray(bn)[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n)[1], np.asarray(wn)[1], rtol=1e-6)


def test_gaussian_res128_test_reshuffle(small_L, rng):
    """gaussian + res128 + test: output is a deterministic reshuffle of x
    through the same scramble+stitch path as gaussianBN (RNG fairness)."""
    x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    gamma = np.zeros((1,), np.float32)
    n, bn, wn = get_noise(
        jnp.asarray(x), jnp.asarray(small_L), jnp.asarray(gamma),
        noise_type="gaussian", train=False, inplace=True,
    )
    t = np.concatenate(
        [x[:, :, :64, :64], x[:, :, :64, 64:], x[:, :, 64:, :64], x[:, :, 64:, 64:]], axis=0
    )
    tf = _oracle_flatten(t)
    want = _oracle_padding(_oracle_scramble(tf, 64, 64).reshape(1, 4, 3, 64, 64))
    np.testing.assert_array_equal(np.asarray(n), want)
    # gaussian returns the same array for all three outputs
    np.testing.assert_array_equal(np.asarray(bn), np.asarray(n))
    np.testing.assert_array_equal(np.asarray(wn), np.asarray(n))


def test_gaussian_res64_train_passthrough(small_L):
    x = np.ones((2, 3, 64, 64), np.float32)
    n, _, _ = get_noise(
        jnp.asarray(x), jnp.asarray(small_L), jnp.zeros((2,)),
        noise_type="gaussian", inplace=True,
    )
    np.testing.assert_array_equal(np.asarray(n), x)


def test_fresh_noise_statistics(small_L):
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((64, 3, 64, 64))
    n, _, _ = get_noise(
        x, jnp.asarray(small_L), jnp.full((64,), 1.0),
        noise_type="gaussianBN", inplace=False, key=key,
    )
    # gamma=1 -> pure white noise: mean ~ 0, var ~ 1
    assert abs(float(jnp.mean(n))) < 0.01
    assert abs(float(jnp.var(n)) - 1.0) < 0.02


def test_uniform_statistics():
    key = jax.random.PRNGKey(1)
    x = jnp.zeros((32, 3, 64, 64))
    n, _, _ = get_noise(x, None, jnp.zeros((32,)), noise_type="uniform", key=key)
    assert abs(float(jnp.mean(n))) < 0.01
    assert abs(float(jnp.var(n)) - 1.0) < 0.02  # (u*2-1)*sqrt(3) has unit variance
    assert float(jnp.max(jnp.abs(n))) <= np.sqrt(3) + 1e-6


def test_missing_key_raises_valueerror():
    """key=None must fail with the intended ValueError (not a cryptic JAX
    error), including 'uniform' (which always draws fresh noise, even
    inplace=True — reference get_noise_recent.py:69-71)."""
    x = jnp.zeros((2, 3, 64, 64))
    with pytest.raises(ValueError, match="key is required"):
        get_noise(x, None, jnp.zeros((2,)), noise_type="uniform", key=None)
    with pytest.raises(ValueError, match="key is required"):
        get_noise(x, None, jnp.zeros((2,)), noise_type="uniform",
                  inplace=True, key=None)
    with pytest.raises(ValueError, match="key is required"):
        get_noise(x, None, jnp.zeros((2,)), noise_type="gaussian", key=None)


def test_v2_adapter_signature(small_L, rng):
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    out = get_noise_v2(
        None, jnp.asarray(x), jnp.asarray(small_L), jnp.array([0.5]), None,
        noise_type="gaussianBN", train_or_test="test", inplace=True,
    )
    assert isinstance(out, tuple) and len(out) == 3


def test_jit_compatible(small_L):
    @jax.jit
    def f(x, gamma, key):
        return get_noise(
            x, jnp.asarray(small_L), gamma, noise_type="gaussianBN", key=key
        ).noise

    out = f(jnp.zeros((2, 3, 64, 64)), jnp.array([0.2, 0.8]), jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 64, 64)


def test_missing_key_raises(small_L):
    with pytest.raises(ValueError):
        get_noise(jnp.zeros((1, 3, 64, 64)), jnp.asarray(small_L), jnp.zeros((1,)),
                  noise_type="gaussianBN", inplace=False, key=None)
