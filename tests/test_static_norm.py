"""Static-calibrated GroupNorm (ops/static_norm.py): correctness + the
calibrate->static serving flow on a tiny UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from bndm_tpu.ops.static_norm import CalGroupNorm


def _x(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


def test_calibrate_output_matches_flax_groupnorm():
    """Calibrate mode must compute EXACT GroupNorm (it defines the reference
    trajectory the static constants approximate)."""
    x = _x((3, 8, 8, 16), 1) * 3.0 + 0.5
    ref = nn.GroupNorm(4, epsilon=1e-5)
    rp = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(rp, x)

    m = CalGroupNorm(4, 1e-5, jnp.float32, "calibrate", steps=5)
    v = m.init(jax.random.PRNGKey(0), x)
    got, _ = m.apply({"params": rp["params"], "quant": v["quant"]}, x,
                     jnp.int32(2), mutable=["quant"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_calibrate_records_tables_and_static_reproduces_single_sample():
    """With batch=1 calibration, per-sample stats == the recorded batch mean,
    so static mode on the SAME sample must match exact GN to fp noise."""
    x = _x((1, 8, 8, 16), 2) * 2.0 - 1.0
    cal = CalGroupNorm(4, 1e-5, jnp.float32, "calibrate", steps=3)
    v = cal.init(jax.random.PRNGKey(0), x)
    params, quant = v["params"], v["quant"]
    want, mut = cal.apply({"params": params, "quant": quant}, x, jnp.int32(1),
                          mutable=["quant"])
    quant = mut["quant"]
    assert not np.allclose(np.asarray(quant["gn_mean"][1]), 0.0)
    assert np.allclose(np.asarray(quant["gn_mean"][0]), 0.0)  # untouched rows

    sta = CalGroupNorm(4, 1e-5, jnp.float32, "static", steps=3)
    got = sta.apply({"params": params, "quant": quant}, x, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_static_requires_step_idx():
    x = _x((1, 4, 4, 8))
    m = CalGroupNorm(4, 1e-5, jnp.float32, "static", steps=2)
    v = m.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="step_idx"):
        m.apply(v, x)


@pytest.fixture(scope="module")
def tiny_gn_models():
    from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig

    nb = 8
    kw = dict(in_channels=3, out_channels=6, block_out_channels=(8, 16),
              down_block_types=("DownBlock2D", "AttnDownBlock2D"),
              up_block_types=("AttnUpBlock2D", "UpBlock2D"),
              attention_head_dim=4, norm_num_groups=4)
    dyn = UNet2D(UNet2DConfig(**kw))
    cal = UNet2D(UNet2DConfig(**kw, gn_mode="calibrate", gn_steps=nb))
    sta = UNet2D(UNet2DConfig(**kw, gn_mode="static", gn_steps=nb))
    params = dyn.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)),
                      jnp.zeros((1,)))
    return nb, dyn, cal, sta, params


def test_unet_calibrate_then_static_sampling(tiny_gn_models):
    """End-to-end serving flow: calibrate_sampling populates the GN tables on
    one exact trajectory; static-GN sampling of the SAME single-sample x0
    then reproduces the dynamic-GN samples (batch-mean == per-sample stats
    for batch 1, so divergence is only fp noise), and a DIFFERENT x0 stays
    in a sane range (fidelity smoke — the real gate is on-TPU SSIM/PSNR,
    scripts/bench_static_gn.py)."""
    from bndm_tpu.ops.int8 import calibrate_sampling
    from bndm_tpu.samplers.iadb import sample_iadb

    nb, dyn, cal, sta, params = tiny_gn_models
    x0 = _x((1, 3, 16, 16), 5)

    quant = calibrate_sampling(cal, params, x0, nb, two_head=True)
    assert any("gn_mean" in str(p) or True for p in [0])  # tables exist below
    leaves = jax.tree_util.tree_leaves_with_path(quant)
    assert any("gn_mean" in jax.tree_util.keystr(p) for p, _ in leaves)

    want, _ = sample_iadb(dyn.apply, params, x0, nb_steps=nb, two_head=True)
    got, _ = sample_iadb(
        sta.apply, {"params": params["params"], "quant": quant}, x0,
        nb_steps=nb, two_head=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)

    x1 = _x((2, 3, 16, 16), 9)
    other, _ = sample_iadb(
        sta.apply, {"params": params["params"], "quant": quant}, x1,
        nb_steps=nb, two_head=True)
    assert np.isfinite(np.asarray(other)).all()


def test_ddim_calibrate_then_static_sampling():
    """DDIM static-GN serving flow (r3): the GN tables are keyed on scan
    position — calibrate_sampling_ddim records them at index i, and
    sample_ddim(pass_step_idx=True) reads them back at the same i — so with
    batch-1 calibration, static sampling of the SAME x0 reproduces the
    exact-GN DDIM samples (divergence is only fp noise)."""
    from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig
    from bndm_tpu.ops.int8 import calibrate_sampling_ddim
    from bndm_tpu.samplers.ddim import DDIMScheduler, sample_ddim

    steps = 4
    kw = dict(in_channels=3, out_channels=3, block_out_channels=(8, 16),
              down_block_types=("DownBlock2D", "AttnDownBlock2D"),
              up_block_types=("AttnUpBlock2D", "UpBlock2D"),
              attention_head_dim=4, norm_num_groups=4)
    dyn = UNet2D(UNet2DConfig(**kw))
    cal = UNet2D(UNet2DConfig(**kw, gn_mode="calibrate", gn_steps=steps))
    sta = UNet2D(UNet2DConfig(**kw, gn_mode="static", gn_steps=steps))
    params = dyn.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)),
                      jnp.zeros((1,)))
    x0 = _x((1, 3, 16, 16), 7)

    scheduler = DDIMScheduler(num_train_timesteps=8)
    quant = calibrate_sampling_ddim(cal, params, x0, scheduler,
                                    num_inference_steps=steps)
    leaves = jax.tree_util.tree_leaves_with_path(quant)
    assert any("gn_mean" in jax.tree_util.keystr(p) for p, _ in leaves)

    want, _ = sample_ddim(dyn.apply, params, x0, scheduler=scheduler,
                          num_inference_steps=steps)
    got, _ = sample_ddim(
        sta.apply, {"params": params["params"], "quant": quant}, x0,
        scheduler=scheduler, num_inference_steps=steps, pass_step_idx=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_record_mode_exact_and_reuse_roundtrip():
    """record mode must compute EXACT GroupNorm while exposing its per-sample
    stats; reuse with those stats on the SAME x is bitwise the same
    normalization (the GN-stats-carry tier's full/shallow contract)."""
    x = _x((3, 8, 8, 16), 11) * 2.0 + 0.3
    ref = nn.GroupNorm(4, epsilon=1e-5)
    rp = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(rp, x)

    rec = CalGroupNorm(4, 1e-5, jnp.float32, "record")
    got, mut = rec.apply({"params": rp["params"]}, x, mutable=["gnstats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    stats = mut["gnstats"]
    assert stats["mu"].shape == (3, 4) and stats["rstd"].shape == (3, 4)

    reu = CalGroupNorm(4, 1e-5, jnp.float32, "reuse")
    again = reu.apply({"params": rp["params"], "gnstats": stats}, x)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(got))

    # reuse on a DIFFERENT x applies the carried (stale) stats: finite, and
    # not the exact GN of the new input
    x2 = _x((3, 8, 8, 16), 12) * 5.0
    drifted = reu.apply({"params": rp["params"], "gnstats": stats}, x2)
    assert np.isfinite(np.asarray(drifted)).all()
    exact2 = ref.apply(rp, x2)
    assert not np.allclose(np.asarray(drifted), np.asarray(exact2))


def test_reuse_requires_gnstats():
    x = _x((1, 4, 4, 8))
    m = CalGroupNorm(4, 1e-5, jnp.float32, "reuse")
    v = m.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="gnstats"):
        m.apply({"params": v["params"]}, x)


def test_unet_gn_carry_cached_sampling(tiny_gn_models):
    """GN-stats-carry end to end on the tiny UNet: (1) a shallow forward at
    the SAME (x, t) with carried stats reproduces the full record-mode
    forward exactly (stats recorded at that x are exact); (2) the cached
    sampler with carry stays close to the exact-GN cached sampler (stale
    stats within a group are the only divergence)."""
    import dataclasses

    from bndm_tpu.models.unet2d import UNet2D
    from bndm_tpu.samplers.iadb import sample_iadb_cached

    nb, dyn, _, _, params = tiny_gn_models
    m_rec = UNet2D(dataclasses.replace(dyn.cfg, gn_mode="record"))
    m_reu = UNet2D(dataclasses.replace(dyn.cfg, gn_mode="reuse"))

    x = _x((2, 3, 16, 16), 21)
    t = jnp.full((2,), 0.5)
    (d_full, deep), gv = m_rec.apply(params, x, t, return_deep=True,
                                     mutable=["gnstats"])
    d_shallow = m_reu.apply(dict(params, gnstats=gv["gnstats"]), x, t,
                            deep_feature=deep)
    np.testing.assert_allclose(np.asarray(d_shallow), np.asarray(d_full),
                               rtol=1e-5, atol=1e-5)

    def full_carry(p, xx, tt):
        (d, dp), g = m_rec.apply(p, xx, tt, return_deep=True,
                                 mutable=["gnstats"])
        return d, (dp, g["gnstats"])

    def shallow_carry(p, xx, tt, pack):
        dp, stats = pack
        return m_reu.apply(dict(p, gnstats=stats), xx, tt, deep_feature=dp)

    def full_exact(p, xx, tt):
        return dyn.apply(p, xx, tt, return_deep=True)

    def shallow_exact(p, xx, tt, dp):
        return dyn.apply(p, xx, tt, deep_feature=dp)

    x0 = _x((2, 3, 16, 16), 22)
    want = sample_iadb_cached(full_exact, shallow_exact, params, x0,
                              nb_steps=nb, cache_interval=2, two_head=True)
    got = sample_iadb_cached(full_carry, shallow_carry, params, x0,
                             nb_steps=nb, cache_interval=2, two_head=True)
    assert np.isfinite(np.asarray(got)).all()
    # random-init tiny model: the carried stats drift only within each
    # 2-step group, so outputs stay close to the exact-GN cached chain
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-6
    assert err / scale < 0.15, (err, scale)


def test_drift_correct_gnstats():
    """Drift-corrected carry (r5): the per-sample stats recorded at the
    group's full step shift by the calibrated batch-mean drift — additive
    for mu, multiplicative (via the variance tables) for rstd; identity at
    idx_cur == idx_ref; sites without tables pass through unchanged."""
    from bndm_tpu.ops.static_norm import drift_correct_gnstats

    rng = np.random.default_rng(5)
    t_len, b, g, eps = 6, 3, 4, 1e-5
    mu = jnp.asarray(rng.standard_normal((b, g)), jnp.float32)
    rstd = jnp.asarray(rng.uniform(0.5, 2.0, (b, g)), jnp.float32)
    mean_t = jnp.asarray(rng.standard_normal((t_len, g)), jnp.float32)
    var_t = jnp.asarray(rng.uniform(0.2, 3.0, (t_len, g)), jnp.float32)
    gnstats = {"blk": {"gn": {"mu": mu, "rstd": rstd}},
               "orphan": {"gn": {"mu": mu, "rstd": rstd}}}
    quant = {"blk": {"gn": {"gn_mean": mean_t, "gn_var": var_t}}}

    got = drift_correct_gnstats(gnstats, quant, 4, 1, epsilon=eps)
    want_mu = mu + (mean_t[4] - mean_t[1])[None]
    want_rstd = rstd * jnp.sqrt((var_t[1] + eps) / (var_t[4] + eps))[None]
    np.testing.assert_allclose(np.asarray(got["blk"]["gn"]["mu"]),
                               np.asarray(want_mu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["blk"]["gn"]["rstd"]),
                               np.asarray(want_rstd), rtol=1e-6)
    # no tables for this site: untouched
    np.testing.assert_array_equal(np.asarray(got["orphan"]["gn"]["mu"]),
                                  np.asarray(mu))
    np.testing.assert_array_equal(np.asarray(got["orphan"]["gn"]["rstd"]),
                                  np.asarray(rstd))
    # identity when the shallow step IS the reference step
    same = drift_correct_gnstats(gnstats, quant, 2, 2, epsilon=eps)
    np.testing.assert_allclose(np.asarray(same["blk"]["gn"]["mu"]),
                               np.asarray(mu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(same["blk"]["gn"]["rstd"]),
                               np.asarray(rstd), rtol=1e-6)
    # out-of-range indices clip to the table ends
    clipped = drift_correct_gnstats(gnstats, quant, t_len + 3, -2,
                                    epsilon=eps)
    want_clip = mu + (mean_t[t_len - 1] - mean_t[0])[None]
    np.testing.assert_allclose(np.asarray(clipped["blk"]["gn"]["mu"]),
                               np.asarray(want_clip), rtol=1e-6)


def test_smooth_gn_tables():
    """smooth_gn_tables (r5 DDIM rescue): truncated box filter along the
    step axis of gn_mean/gn_var only; other leaves untouched; window<=1 is
    identity; interior rows equal the exact neighborhood mean."""
    from bndm_tpu.ops.static_norm import smooth_gn_tables

    t, g = 6, 2
    mean = np.arange(t * g, dtype=np.float32).reshape(t, g)
    var = np.ones((t, g), np.float32)
    var[3] = 7.0
    amax = np.float32(3.5)
    quant = {"site": {"gn_mean": mean.copy(), "gn_var": var.copy(),
                      "act_amax": amax}}

    same = smooth_gn_tables(quant, 1)
    np.testing.assert_array_equal(same["site"]["gn_mean"], mean)

    sm = smooth_gn_tables(quant, 3)
    # interior row = mean of rows i-1..i+1; linear ramp is invariant
    np.testing.assert_allclose(sm["site"]["gn_mean"][1:-1], mean[1:-1],
                               rtol=1e-6)
    # edges average the two available rows
    np.testing.assert_allclose(sm["site"]["gn_mean"][0],
                               mean[:2].mean(axis=0), rtol=1e-6)
    # the var spike spreads over its 3-row neighborhood
    np.testing.assert_allclose(sm["site"]["gn_var"][3], (1 + 7 + 1) / 3.0,
                               rtol=1e-6)
    assert sm["site"]["act_amax"] == amax
    # input tree not mutated
    np.testing.assert_array_equal(quant["site"]["gn_var"], var)
