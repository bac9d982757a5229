"""Library serving API (bndm_tpu.serving.make_serving_sampler): the
calibrate-once int8-static + static-GN + microbatched flow in one call."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig
from bndm_tpu.serving import make_serving_sampler

TINY = UNet2DConfig(
    in_channels=3, out_channels=6, block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    attention_head_dim=4, norm_num_groups=4)


@pytest.fixture(scope="module")
def tiny_params():
    m = UNet2D(TINY)
    return m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)),
                  jnp.zeros((1,)))


def test_full_serving_tier(tiny_params):
    sample = make_serving_sampler(TINY, tiny_params, nb_steps=6,
                                  conv_int8=True, static_gn=True,
                                  microbatch=2)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3, 16, 16)),
                     jnp.float32)
    out = sample(jnp.array(x0))  # microbatched path donates the buffer
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()
    # second call reuses the calibration (no recalibration crash, full-batch
    # path when the batch does not exceed the microbatch)
    out2 = sample(x0[:2])
    assert out2.shape == (2, 3, 16, 16)


def test_plain_tier_matches_sample_iadb(tiny_params):
    from bndm_tpu.samplers.iadb import sample_iadb

    sample = make_serving_sampler(TINY, tiny_params, nb_steps=5,
                                  conv_int8=False, static_gn=False)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((2, 3, 16, 16)),
                     jnp.float32)
    got = sample(x0)
    m = UNet2D(TINY)
    want, _ = sample_iadb(m.apply, tiny_params, x0, nb_steps=5, two_head=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_serving_model_pair_configs():
    """The shared (calibration, serving) pair builder: calibrate configs stay
    on the exact path, serving configs get the static modes + relaxations."""
    from bndm_tpu.serving import serving_model_pair

    m_cal, m_serve = serving_model_pair(
        TINY, conv_int8=True, int8_static=True, static_gn=True, gn_steps=6,
        relax_kw={"attn_softmax_dtype": "bfloat16"})
    assert m_cal.cfg.int8_mode == "calibrate"
    assert m_cal.cfg.gn_mode == "calibrate" and m_cal.cfg.gn_steps == 6
    assert m_cal.cfg.attn_softmax_dtype == "float32"  # calibration stays exact
    assert m_serve.cfg.int8_mode == "static" and m_serve.cfg.gn_mode == "static"
    assert m_serve.cfg.conv_int8 and m_serve.cfg.attn_softmax_dtype == "bfloat16"
    # no calibrated tier: no calibration model, relaxation still applied
    m_cal2, m_serve2 = serving_model_pair(
        TINY, relax_kw={"attn_softmax_dtype": "bfloat16"})
    assert m_cal2 is None
    assert m_serve2.cfg.attn_softmax_dtype == "bfloat16"
    # nothing at all: plain model of the input config
    m_cal3, m_serve3 = serving_model_pair(TINY)
    assert m_cal3 is None and m_serve3.cfg == TINY
    with pytest.raises(ValueError, match="gn_steps"):
        serving_model_pair(TINY, static_gn=True)


def test_microbatch_non_divisible_raises(tiny_params):
    """A batch larger than the microbatch but not divisible by it must raise
    — never silently fall back to the full-batch sampler (that is the
    documented bs>=1000 HBM-OOM path on v5e)."""
    sample = make_serving_sampler(TINY, tiny_params, nb_steps=4,
                                  conv_int8=False, static_gn=False,
                                  microbatch=2)
    x0 = jnp.zeros((5, 3, 16, 16), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        sample(x0)


def test_static_gn_needs_linear_alpha(tiny_params):
    with pytest.raises(ValueError, match="linear"):
        make_serving_sampler(TINY, tiny_params, nb_steps=5,
                             scheduler_alpha="sigmoid", static_gn=True)


def test_ddim_serving_tier():
    """make_serving_sampler_ddim: calibrate-once int8-static + static-GN over
    a DDIM trajectory (GN tables keyed on scan position)."""
    from bndm_tpu.samplers.ddim import DDIMScheduler
    from bndm_tpu.serving import make_serving_sampler_ddim

    cfg = UNet2DConfig(
        in_channels=3, out_channels=3, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        attention_head_dim=4, norm_num_groups=4)
    params = UNet2D(cfg).init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 3, 16, 16)), jnp.zeros((1,)))
    scheduler = DDIMScheduler(num_train_timesteps=8)
    # static_gn explicitly on: the mechanism stays tested even though the
    # DDIM serving default is now off (measured r4 gate fail, PARITY.md §6)
    sample = make_serving_sampler_ddim(cfg, params, scheduler,
                                       num_inference_steps=4, static_gn=True)
    x0 = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 16, 16)),
                     jnp.float32)
    out = sample(x0)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()
    out2 = sample(x0)  # reuses the calibration
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_attn_softmax_relaxation_tier(tiny_params):
    """attn_softmax_dtype='bfloat16' rides the serving tier: calibration runs
    the exact fp32-softmax model, serving relaxes, output stays close to the
    unrelaxed serving output."""
    x0 = jnp.asarray(np.random.default_rng(3).standard_normal((2, 3, 16, 16)),
                     jnp.float32)
    ref = make_serving_sampler(TINY, tiny_params, nb_steps=6,
                               conv_int8=True, static_gn=True)(x0)
    got = make_serving_sampler(TINY, tiny_params, nb_steps=6,
                               conv_int8=True, static_gn=True,
                               attn_softmax_dtype="bfloat16")(x0)
    assert got.shape == ref.shape
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    # and without any calibration tiers, the relaxation alone still samples
    out = make_serving_sampler(TINY, tiny_params, nb_steps=4,
                               conv_int8=False, static_gn=False,
                               attn_softmax_dtype="bfloat16")(x0)
    assert out.shape == x0.shape


def test_gn_carry_tier(tiny_params):
    """GN-stats-carry serving tier (gn_carry=True): runs end to end with the
    cached sampler (full batch AND microbatched), stays close to the exact-GN
    cached output, and the invalid combinations raise."""
    common = dict(nb_steps=6, conv_int8=False, static_gn=False,
                  cache_interval=2)
    x0 = jnp.asarray(np.random.default_rng(3).standard_normal((4, 3, 16, 16)),
                     jnp.float32)
    ref = make_serving_sampler(TINY, tiny_params, **common)(x0)
    got = make_serving_sampler(TINY, tiny_params, gn_carry=True, **common)(x0)
    assert got.shape == x0.shape and np.isfinite(np.asarray(got)).all()
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.15, (err, scale)

    mb = make_serving_sampler(TINY, tiny_params, gn_carry=True,
                              microbatch=2, **common)(jnp.array(x0))
    assert mb.shape == x0.shape and np.isfinite(np.asarray(mb)).all()

    # drift-corrected carry: calibrates GN tables, serves record/reuse with
    # the per-step batch-mean shift; must stay at least as close to the
    # exact-GN cached reference as the plain carry (the correction is the
    # identity when the tables are flat, a fix when they drift)
    drifted = make_serving_sampler(TINY, tiny_params, gn_carry="drift",
                                   **common)(x0)
    assert drifted.shape == x0.shape
    assert np.isfinite(np.asarray(drifted)).all()
    err_d = float(jnp.max(jnp.abs(drifted - ref)))
    assert err_d / scale < 0.15, (err_d, scale)

    with pytest.raises(ValueError, match="linear"):
        make_serving_sampler(TINY, tiny_params, nb_steps=6,
                             gn_carry="drift", conv_int8=False,
                             static_gn=False, cache_interval=2,
                             scheduler_alpha="cosine")
    with pytest.raises(ValueError, match="gn_carry"):
        make_serving_sampler(TINY, tiny_params, nb_steps=6,
                             gn_carry="bogus", conv_int8=False,
                             static_gn=False, cache_interval=2)
    with pytest.raises(ValueError, match="static_gn"):
        make_serving_sampler(TINY, tiny_params, nb_steps=6, gn_carry=True,
                             conv_int8=False, static_gn=True,
                             cache_interval=2)
    with pytest.raises(ValueError, match="cache_interval"):
        make_serving_sampler(TINY, tiny_params, nb_steps=6, gn_carry=True,
                             conv_int8=False, static_gn=False)


def test_validated_serving_trivial_gate_picks_fastest(tiny_params):
    """make_validated_serving_sampler walks the tier ladder fastest-first: a
    trivial gate accepts the first candidate (the full relaxation stack)."""
    from bndm_tpu.serving import make_validated_serving_sampler

    sample, report = make_validated_serving_sampler(
        TINY, tiny_params, nb_steps=5, res=16, probe_batch=2,
        gate_ssim=0.0, gate_psnr_db=0.0, cache_interval=2, verbose=False)
    assert report[-1]["chosen"].startswith("int8+staticGN")
    assert len(report) == 2  # one probe + the decision
    assert report[0]["gate"] == "pass"
    out = sample(jnp.zeros((2, 3, 16, 16), jnp.float32))
    assert out.shape == (2, 3, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_validated_serving_impossible_gate_falls_back_to_bf16(tiny_params):
    """An unreachable gate rejects every relaxed tier; the factory returns
    the bf16 parity path itself (never rejected) with a full fail report —
    the TRAINED_GATES.json scenario, where static-GN fails on real weights."""
    from bndm_tpu.samplers.iadb import sample_iadb
    from bndm_tpu.serving import make_validated_serving_sampler

    sample, report = make_validated_serving_sampler(
        TINY, tiny_params, nb_steps=5, res=16, probe_batch=2,
        gate_ssim=1.1, gate_psnr_db=500.0, cache_interval=2, verbose=False)
    probed = [r for r in report if "tier" in r]
    assert len(probed) == 6 and all(r["gate"] == "fail" for r in probed)
    assert any("gncarry" in r["tier"] for r in probed)  # r5 tiers probed
    assert any("gndrift" in r["tier"] for r in probed)
    assert report[-1]["chosen"] == "bf16 parity path"
    x0 = jnp.asarray(np.random.default_rng(7).standard_normal((2, 3, 16, 16)),
                     jnp.float32)
    want, _ = sample_iadb(UNet2D(TINY).apply, tiny_params, x0, nb_steps=5,
                          two_head=True)
    np.testing.assert_array_equal(np.asarray(sample(x0)), np.asarray(want))
