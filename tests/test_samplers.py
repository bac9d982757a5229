import jax
import jax.numpy as jnp
import numpy as np

from bndm_tpu.ops.schedules import alpha_schedule, gamma_schedule
from bndm_tpu.samplers.ddim import DDIMScheduler, sample_ddim
from bndm_tpu.samplers.iadb import (IADBScheduler, sample_iadb,
                                    sample_iadb_microbatched)


def _toy_apply(params, x, t):
    """Deterministic stand-in model: depends on x, t, and params['w']."""
    w = params["w"]
    d = jnp.tanh(x * w) + t.reshape(-1, 1, 1, 1) * 0.1
    return jnp.concatenate([d, -0.5 * d], axis=1)  # 2C out (two-head)


def _toy_apply_single(params, x, t):
    return jnp.tanh(x * params["w"]) + t.reshape(-1, 1, 1, 1) * 0.1


def test_scan_matches_python_loop_two_head():
    params = {"w": jnp.float32(0.7)}
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 8, 8)), jnp.float32)
    nb = 10
    gp = jnp.array([0.2, 0.0, 3.0])
    got, _ = sample_iadb(
        _toy_apply, params, x0, nb_steps=nb,
        scheduler_gamma="sigmoid", gamma_params=gp, two_head=True,
    )
    # independent python loop
    x = x0
    for t in reversed(range(nb)):
        a_s = alpha_schedule(jnp.float32(t + 1), nb, "linear")
        a_e = alpha_schedule(jnp.float32(t), nb, "linear")
        g_s = gamma_schedule(jnp.float32(t + 1), nb, "sigmoid", gp)
        g_e = gamma_schedule(jnp.float32(t), nb, "sigmoid", gp)
        d = _toy_apply(params, x, jnp.broadcast_to(a_s, (2,)))
        x = x + (a_s - a_e) * d[:, :3] + (g_s - g_e) * d[:, 3:]
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_microbatched_matches_full_batch():
    """The gallery-scale microbatched scan must produce bit-identical samples
    to the validated full-batch sampler run per microbatch."""
    params = {"w": jnp.float32(0.7)}
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((6, 3, 8, 8)), jnp.float32)
    gp = jnp.array([0.2, 0.0, 3.0])
    kw = dict(nb_steps=10, scheduler_gamma="sigmoid", gamma_params=gp,
              two_head=True)
    # x0 is DONATED (serving path frees the input buffer) -> pass a copy
    got = sample_iadb_microbatched(_toy_apply, params, jnp.array(x0),
                                   microbatch=2, **kw)
    assert got.shape == x0.shape
    for k in range(3):
        want, _ = sample_iadb(_toy_apply, params, x0[2 * k:2 * k + 2], **kw)
        np.testing.assert_array_equal(np.asarray(got[2 * k:2 * k + 2]),
                                      np.asarray(want))


def test_microbatched_5d_layout_and_divisibility():
    params = {"w": jnp.float32(0.5)}
    x0 = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 3, 8, 8)),
                     jnp.float32)
    out = sample_iadb_microbatched(_toy_apply_single, params, x0, microbatch=3,
                                   nb_steps=5)
    assert out.shape == x0.shape
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        sample_iadb_microbatched(
            _toy_apply_single, params,
            jnp.zeros((5, 3, 8, 8), jnp.float32), microbatch=2, nb_steps=5)


def test_constant_field_integrates_to_target():
    """If the model predicts a constant d = x1 - x0, linear-alpha sampling
    must move x0 exactly to x1 (telescoping Euler sum)."""
    x0 = jnp.zeros((1, 3, 4, 4))
    x1 = jnp.ones((1, 3, 4, 4)) * 2.0

    def apply_fn(params, x, t):
        return jnp.broadcast_to(x1 - x0, x.shape)

    out, _ = sample_iadb(apply_fn, {}, x0, nb_steps=25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x1), rtol=1e-5, atol=1e-5)


def test_conditional_concat():
    calls = {}

    def apply_fn(params, x, t):
        calls["channels"] = x.shape[1]
        return x[:, :3] * 0.0

    x0 = jnp.zeros((1, 3, 4, 4))
    x_c = jnp.ones((1, 3, 4, 4))
    sample_iadb(apply_fn, {}, x0, nb_steps=4, x_c=x_c)
    assert calls["channels"] == 6


def test_frames_layout():
    def apply_fn(params, x, t):
        return jnp.ones_like(x)

    x0 = jnp.zeros((2, 3, 4, 4))
    nb = 250
    out, frames = sample_iadb(apply_fn, {}, x0, nb_steps=nb, collect_frames=True)
    # log_freq=25 -> t in {249, 225, 200, ..., 0}: 10 multiples + t=249
    assert frames.shape == (11, 1, 3, 4, 4)
    # first frame is the state after the first update (t = 249):
    # x0 + (250/250 - 249/250) * 1
    np.testing.assert_allclose(np.asarray(frames[0]), 1.0 / nb, rtol=1e-4)
    # last frame (t=0) equals the final sample's first element
    np.testing.assert_allclose(np.asarray(frames[-1][0]), np.asarray(out[0]), rtol=1e-5)


def test_iadb_scheduler_facade():
    s = IADBScheduler(1000)
    s.set_timesteps(4)
    x = jnp.zeros((1, 4, 8, 8))
    noise = jnp.ones((1, 4, 8, 8))
    noisy = s.add_noise(x, noise, jnp.array([0.25]))
    np.testing.assert_allclose(np.asarray(noisy), 0.25, rtol=1e-6)
    # two-head step splits channels at the midpoint
    d = jnp.concatenate([jnp.ones((1, 4, 8, 8)), jnp.zeros((1, 4, 8, 8))], axis=1)
    out = s.step(d, 3, x, two_head=True)
    np.testing.assert_allclose(np.asarray(out), 0.25, rtol=1e-6)


def test_ddim_timesteps_leading():
    s = DDIMScheduler(num_train_timesteps=1000)
    ts = np.asarray(s.set_timesteps(250))
    assert ts.shape == (250,)
    assert ts[0] == 996 and ts[-1] == 0
    assert np.all(np.diff(ts) == -4)


def test_ddim_scan_matches_python_loop():
    s = DDIMScheduler(num_train_timesteps=100)
    params = {"w": jnp.float32(0.3)}
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((2, 3, 4, 4)), jnp.float32)
    got, _ = sample_ddim(_toy_apply_single, params, x0, scheduler=s, num_inference_steps=10)
    x = x0
    for t in np.asarray(s.set_timesteps(10)):
        d = _toy_apply_single(params, x, jnp.full((2,), float(t)))
        x = s.step(d, int(t), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_ddim_add_noise_endpoints():
    s = DDIMScheduler(num_train_timesteps=1000)
    x = jnp.ones((1, 3, 4, 4))
    eps = jnp.full((1, 3, 4, 4), 2.0)
    early = np.asarray(s.add_noise(x, eps, jnp.array([0])))
    late = np.asarray(s.add_noise(x, eps, jnp.array([999])))
    # t=0: nearly clean; t=999: nearly pure (scaled) noise
    assert abs(early.mean() - 1.0) < 0.05
    assert abs(late.mean() - 2.0) < 0.3


def test_ddim_perfect_model_recovers_x0():
    """With a model that returns the exact epsilon for a fixed (x0*, eps*)
    pair, DDIM must walk any noisy start back toward x0*."""
    s = DDIMScheduler(num_train_timesteps=1000, clip_sample=False)
    x_target = jnp.full((1, 3, 4, 4), 0.5)

    def apply_fn(params, x, t):
        ti = t[0].astype(jnp.int32)
        acp = s.alphas_cumprod[jnp.clip(ti, 0, 999)]
        # epsilon consistent with x == sqrt(acp)*x_target + sqrt(1-acp)*eps
        return (x - acp**0.5 * x_target) / jnp.maximum((1 - acp) ** 0.5, 1e-4)

    start = s.add_noise(x_target, jnp.ones_like(x_target), jnp.array([999]))
    out, _ = sample_ddim(apply_fn, {}, start, scheduler=s, num_inference_steps=50)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-2)
