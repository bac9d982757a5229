"""Feature-reuse (block-caching) serving tier, cf. "Cache Me if You Can"
(arXiv:2312.03209) / DeepCache: UNet2D's return_deep / deep_feature split
(models/unet2d.py) and samplers.iadb.sample_iadb_cached.

Exactness contract: a shallow forward spliced with the deep feature captured
at the SAME (x, t) must reproduce the full forward bit-for-bit — the shell
modules see identical inputs (same skips, same trunk output), so any
difference is an indexing bug in the skip bookkeeping."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig
from bndm_tpu.samplers.iadb import sample_iadb, sample_iadb_cached

TINY = UNet2DConfig(
    in_channels=3, out_channels=6, block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    attention_head_dim=4, norm_num_groups=4)

TINY3 = UNet2DConfig(
    in_channels=3, out_channels=3, block_out_channels=(8, 8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
    attention_head_dim=4, norm_num_groups=4)


@pytest.fixture(scope="module")
def tiny_params():
    m = UNet2D(TINY)
    return m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)),
                  jnp.zeros((1,)))


def _x(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


@pytest.mark.parametrize("depth", [1, 2])
def test_shallow_equals_full_at_same_xt(depth):
    """Full forward == shallow forward given the deep feature from the same
    (x, t), for every legal cache_depth of a 3-level UNet."""
    cfg = dataclasses.replace(TINY3, cache_depth=depth)
    m = UNet2D(cfg)
    x = _x((2, 3, 32, 32), seed=1)
    t = jnp.full((2,), 0.7, jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x, t)
    full, deep = m.apply(params, x, t, return_deep=True)
    assert deep.shape[0] == 2 and deep.ndim == 4  # NHWC trunk output
    shallow = m.apply(params, x, t, deep_feature=deep)
    np.testing.assert_array_equal(np.asarray(shallow), np.asarray(full))
    # and both equal the plain call
    plain = m.apply(params, x, t)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(plain))


def test_shallow_call_validation(tiny_params):
    m = UNet2D(TINY)
    x = _x((1, 3, 16, 16))
    t = jnp.zeros((1,))
    _, deep = m.apply(tiny_params, x, t, return_deep=True)
    with pytest.raises(ValueError, match="cannot return_deep"):
        m.apply(tiny_params, x, t, deep_feature=deep, return_deep=True)
    bad = UNet2D(dataclasses.replace(TINY, cache_depth=2))
    p_bad = bad.init(jax.random.PRNGKey(0), x, t)  # init runs the full path
    with pytest.raises(ValueError, match="cache_depth"):
        bad.apply(p_bad, x, t, return_deep=True)


def test_cached_interval1_equals_plain(tiny_params):
    """cache_interval=1 is the plain sampler (every step full)."""
    m = UNet2D(TINY)

    def apply_full(p, x, t):
        return m.apply(p, x, t, return_deep=True)

    def apply_shallow(p, x, t, deep):
        return m.apply(p, x, t, deep_feature=deep)

    x0 = _x((2, 3, 16, 16), seed=2)
    want, _ = sample_iadb(m.apply, tiny_params, x0, nb_steps=5, two_head=True)
    got = sample_iadb_cached(apply_full, apply_shallow, tiny_params, x0,
                             nb_steps=5, cache_interval=1, two_head=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nb_steps,interval", [(6, 2), (7, 3), (2, 5)])
def test_cached_chain_runs(tiny_params, nb_steps, interval):
    """Macro-group scan covers every step incl. the remainder group and the
    interval > nb_steps edge (empty scan, one trailing short group)."""
    m = UNet2D(TINY)

    def apply_full(p, x, t):
        return m.apply(p, x, t, return_deep=True)

    def apply_shallow(p, x, t, deep):
        return m.apply(p, x, t, deep_feature=deep)

    x0 = _x((2, 3, 16, 16), seed=3)
    out = sample_iadb_cached(apply_full, apply_shallow, tiny_params, x0,
                             nb_steps=nb_steps, cache_interval=interval,
                             two_head=True)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()
    # the cached chain ran real updates (not a no-op)
    assert not np.allclose(np.asarray(out), np.asarray(x0))


def test_cached_matches_eager_oracle(tiny_params):
    """The scan-over-macro-groups chain equals an eager python loop that
    refreshes the deep feature every `interval` steps."""
    m = UNet2D(TINY)
    nb_steps, interval = 5, 2
    x0 = _x((1, 3, 16, 16), seed=4)

    from bndm_tpu.ops.schedules import alpha_schedule, gamma_schedule
    gp = jnp.asarray((1.0, 0.0, 3.0), jnp.float32)

    x, deep = x0, None
    for t in range(nb_steps - 1, -1, -1):
        a_s = alpha_schedule(jnp.float32(t + 1), nb_steps, "linear", 0.02)
        a_e = alpha_schedule(jnp.float32(t), nb_steps, "linear", 0.02)
        g_s = gamma_schedule(jnp.float32(t + 1), nb_steps, "linear", gp)
        g_e = gamma_schedule(jnp.float32(t), nb_steps, "linear", gp)
        tt = jnp.broadcast_to(a_s, (x.shape[0],))
        # group starts where the remaining step count hits a group boundary:
        # t = nb-1, nb-1-interval, ... plus the remainder group start
        steps_done = nb_steps - 1 - t
        rem = nb_steps % interval
        is_full = (steps_done % interval == 0) if t >= rem else (t == rem - 1)
        if is_full:
            d, deep = m.apply(tiny_params, x, tt, return_deep=True)
        else:
            d = m.apply(tiny_params, x, tt, deep_feature=deep)
        c = x.shape[1]
        x = x + (a_s - a_e) * d[:, :c] + (g_s - g_e) * d[:, c:]

    def apply_full(p, xx, t):
        return m.apply(p, xx, t, return_deep=True)

    def apply_shallow(p, xx, t, deep):
        return m.apply(p, xx, t, deep_feature=deep)

    got = sample_iadb_cached(apply_full, apply_shallow, tiny_params, x0,
                             nb_steps=nb_steps, cache_interval=interval,
                             two_head=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-5,
                               atol=1e-5)


def test_serving_cache_interval(tiny_params):
    """make_serving_sampler(cache_interval=2) composes with int8-static +
    static-GN, both full-batch and microbatched."""
    from bndm_tpu.serving import make_serving_sampler

    sample = make_serving_sampler(TINY, tiny_params, nb_steps=6,
                                  conv_int8=True, static_gn=True,
                                  microbatch=2, cache_interval=2)
    x0 = _x((4, 3, 16, 16), seed=5)
    out = sample(jnp.array(x0))  # microbatched path donates the buffer
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()
    out2 = sample(x0[:2])  # full-batch cached path
    assert out2.shape == (2, 3, 16, 16)
    assert np.isfinite(np.asarray(out2)).all()


TINY_COND = dataclasses.replace(TINY, in_channels=6, out_channels=6)


def test_cached_xc_conditioning(tiny_params):
    """r4: the cached chain threads channel-concat x_c (super-res,
    iadb_bn.py:406) through full AND shallow forwards. interval=1 must equal
    the plain conditional sampler; interval=2 must equal the eager oracle."""
    m = UNet2D(TINY_COND)
    x = _x((2, 3, 16, 16), seed=6)
    x_c = _x((2, 3, 16, 16), seed=7)
    t = jnp.zeros((2,))
    params = m.init(jax.random.PRNGKey(2),
                    jnp.concatenate([x, x_c], axis=1), t)

    def apply_full(p, xx, t):
        return m.apply(p, xx, t, return_deep=True)

    def apply_shallow(p, xx, t, deep):
        return m.apply(p, xx, t, deep_feature=deep)

    want, _ = sample_iadb(m.apply, params, x, nb_steps=5, two_head=True,
                          x_c=x_c)
    got = sample_iadb_cached(apply_full, apply_shallow, params, x,
                             nb_steps=5, cache_interval=1, two_head=True,
                             x_c=x_c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # interval=2 eager oracle with conditioning
    from bndm_tpu.ops.schedules import alpha_schedule, gamma_schedule
    gp = jnp.asarray((1.0, 0.0, 3.0), jnp.float32)
    nb_steps, interval = 5, 2
    xx, deep = x, None
    for tstep in range(nb_steps - 1, -1, -1):
        a_s = alpha_schedule(jnp.float32(tstep + 1), nb_steps, "linear", 0.02)
        a_e = alpha_schedule(jnp.float32(tstep), nb_steps, "linear", 0.02)
        g_s = gamma_schedule(jnp.float32(tstep + 1), nb_steps, "linear", gp)
        g_e = gamma_schedule(jnp.float32(tstep), nb_steps, "linear", gp)
        tt = jnp.broadcast_to(a_s, (xx.shape[0],))
        inp = jnp.concatenate([xx, x_c], axis=1)
        steps_done = nb_steps - 1 - tstep
        rem = nb_steps % interval
        is_full = (steps_done % interval == 0) if tstep >= rem \
            else (tstep == rem - 1)
        if is_full:
            d, deep = m.apply(params, inp, tt, return_deep=True)
        else:
            d = m.apply(params, inp, tt, deep_feature=deep)
        c = xx.shape[1]
        xx = xx + (a_s - a_e) * d[:, :c] + (g_s - g_e) * d[:, c:]
    got2 = sample_iadb_cached(apply_full, apply_shallow, params, x,
                              nb_steps=nb_steps, cache_interval=interval,
                              two_head=True, x_c=x_c)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(xx),
                               rtol=1e-5, atol=1e-5)


def test_serving_xc_cached(tiny_params):
    """make_serving_sampler(x_c=..., cache_interval=2) calibrates through
    the concat conditioning and serves the conditional cached chain; x_c
    with microbatch is rejected."""
    from bndm_tpu.serving import make_serving_sampler

    x0 = _x((4, 3, 16, 16), seed=8)
    x_c = _x((4, 3, 16, 16), seed=9)
    params = UNet2D(TINY_COND).init(
        jax.random.PRNGKey(3),
        jnp.concatenate([x0[:1], x_c[:1]], axis=1), jnp.zeros((1,)))
    sample = make_serving_sampler(TINY_COND, params, nb_steps=6,
                                  conv_int8=True, static_gn=True,
                                  cache_interval=2, two_head=True, x_c=x_c)
    out = sample(x0)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="microbatch"):
        make_serving_sampler(TINY_COND, params, nb_steps=6, microbatch=2,
                             two_head=True, x_c=x_c)


def test_cached_interval_validation(tiny_params):
    m = UNet2D(TINY)
    x0 = _x((1, 3, 16, 16))
    with pytest.raises(ValueError, match="cache_interval"):
        sample_iadb_cached(lambda p, x, t: m.apply(p, x, t, return_deep=True),
                           lambda p, x, t, d: m.apply(p, x, t, deep_feature=d),
                           tiny_params, x0, nb_steps=4, cache_interval=0,
                           two_head=True)


# ---- DDIM cached sampler (r4, samplers/ddim.py::sample_ddim_cached) ----

TINY_DDIM = dataclasses.replace(TINY, out_channels=3)


@pytest.fixture(scope="module")
def ddim_params():
    m = UNet2D(TINY_DDIM)
    return m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)),
                  jnp.zeros((1,)))


@pytest.mark.parametrize("steps,interval", [(6, 2), (5, 2), (2, 5)])
def test_ddim_cached_matches_eager_oracle(ddim_params, steps, interval):
    """sample_ddim_cached equals an eager python loop that refreshes the
    deep feature at every position i with i % interval == 0 (the macro-group
    starts, including the trailing remainder group), for dividing,
    non-dividing, and interval > steps cases."""
    from bndm_tpu.samplers.ddim import DDIMScheduler, sample_ddim_cached

    m = UNet2D(TINY_DDIM)
    scheduler = DDIMScheduler(num_train_timesteps=24)
    scheduler.set_timesteps(steps)
    x0 = _x((2, 3, 16, 16), seed=7)

    x, deep = x0, None
    for i, t in enumerate(scheduler.timesteps_np):
        tt = jnp.full((x.shape[0],), float(t), jnp.float32)
        if i % interval == 0:
            d, deep = m.apply(ddim_params, x, tt, return_deep=True)
        else:
            d = m.apply(ddim_params, x, tt, deep_feature=deep)
        x = scheduler.step(d, int(t), x)

    def apply_full(p, xx, t):
        return m.apply(p, xx, t, return_deep=True)

    def apply_shallow(p, xx, t, deep):
        return m.apply(p, xx, t, deep_feature=deep)

    got = sample_ddim_cached(apply_full, apply_shallow, ddim_params, x0,
                             scheduler=scheduler, num_inference_steps=steps,
                             cache_interval=interval)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-5,
                               atol=1e-5)


def test_ddim_cached_step_idx_threading():
    """pass_step_idx=True threads the ABSOLUTE scan position into both the
    full and shallow calls (the key the static-GN tables use): a fake model
    whose output depends only on step_idx must reproduce an eager loop over
    positions 0..n-1 exactly."""
    from bndm_tpu.samplers.ddim import DDIMScheduler, sample_ddim_cached

    scheduler = DDIMScheduler(num_train_timesteps=24)
    steps, interval = 5, 2
    x0 = _x((1, 3, 16, 16), seed=8)

    def d_of(x, step_idx):
        return jnp.full_like(x, 0.01) * (step_idx.astype(jnp.float32) + 1.0)

    def apply_full(p, x, t, step_idx=None):
        return d_of(x, step_idx), jnp.zeros((1,), jnp.float32)

    def apply_shallow(p, x, t, deep, step_idx=None):
        return d_of(x, step_idx)

    out = sample_ddim_cached(apply_full, apply_shallow, {}, x0,
                             scheduler=scheduler, num_inference_steps=steps,
                             cache_interval=interval, pass_step_idx=True)
    scheduler.set_timesteps(steps)
    x = x0
    for i, t in enumerate(scheduler.timesteps_np):
        x = scheduler.step(jnp.full_like(x, 0.01) * (i + 1.0), int(t), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6,
                               atol=1e-6)


def test_ddim_cached_validation(ddim_params):
    from bndm_tpu.samplers.ddim import DDIMScheduler, sample_ddim_cached

    m = UNet2D(TINY_DDIM)
    scheduler = DDIMScheduler(num_train_timesteps=24)
    with pytest.raises(ValueError, match="cache_interval"):
        sample_ddim_cached(
            lambda p, x, t: m.apply(p, x, t, return_deep=True),
            lambda p, x, t, d: m.apply(p, x, t, deep_feature=d),
            ddim_params, _x((1, 3, 16, 16)), scheduler=scheduler,
            num_inference_steps=4, cache_interval=1)


def test_ddim_serving_cache_interval(ddim_params):
    """make_serving_sampler_ddim(cache_interval=2) composes with int8-static
    + static-GN (step_idx keyed GN tables through the cached chain)."""
    from bndm_tpu.samplers.ddim import DDIMScheduler
    from bndm_tpu.serving import make_serving_sampler_ddim

    scheduler = DDIMScheduler(num_train_timesteps=24)
    sample = make_serving_sampler_ddim(TINY_DDIM, ddim_params, scheduler, 6,
                                       conv_int8=True, static_gn=True,
                                       cache_interval=2)
    x0 = _x((2, 3, 16, 16), seed=9)
    out = sample(x0)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cached_bf16_carry_close_to_fp32(tiny_params):
    """carry_dtype="bfloat16" (r5 serving experiment): the sample buffer is
    stored bf16 between steps while the update arithmetic stays fp32 — the
    result must track the fp32 carry within bf16 rounding accumulation, and
    carry_dtype=None must remain the exact default path."""
    def apply_full(p, x, t):
        return UNet2D(TINY).apply(p, x, t, return_deep=True)

    def apply_shallow(p, x, t, deep):
        return UNet2D(TINY).apply(p, x, t, deep_feature=deep)

    x0 = _x((2, 3, 16, 16), 11)
    kw = dict(nb_steps=8, cache_interval=3, two_head=True)
    ref = sample_iadb_cached(apply_full, apply_shallow, tiny_params, x0, **kw)
    default = sample_iadb_cached(apply_full, apply_shallow, tiny_params, x0,
                                 carry_dtype=None, **kw)
    np.testing.assert_array_equal(np.asarray(default), np.asarray(ref))
    bf16 = sample_iadb_cached(apply_full, apply_shallow, tiny_params, x0,
                              carry_dtype="bfloat16", **kw)
    assert bf16.dtype == x0.dtype  # cast back to the caller's dtype
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_microbatched_bf16_carry(tiny_params):
    """The microbatched gallery path threads carry_dtype into every
    microbatch's cached chain."""
    from bndm_tpu.samplers.iadb import sample_iadb_microbatched

    def apply_full(p, x, t):
        return UNet2D(TINY).apply(p, x, t, return_deep=True)

    def apply_shallow(p, x, t, deep):
        return UNet2D(TINY).apply(p, x, t, deep_feature=deep)

    x0 = _x((4, 3, 16, 16), 12)
    kw = dict(microbatch=2, nb_steps=6, cache_interval=3, two_head=True,
              apply_shallow_fn=apply_shallow)
    ref = sample_iadb_microbatched(apply_full, tiny_params, jnp.array(x0),
                                   **kw)
    bf16 = sample_iadb_microbatched(apply_full, tiny_params, jnp.array(x0),
                                    carry_dtype="bfloat16", **kw)
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(ref),
                               rtol=0.05, atol=0.05)
