"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.json): samples/sec/chip for IADB-BN sampling at the
reference's benchmark config — AFHQ-Cat 64x64, 250 inference steps, batch 500,
two-head BNDM UNet (113.7M params) — the whole 250-step reverse chain
compiled as one lax.scan (reference path: iadb_bn.py test branch +
scripts/sampling/cat_res64_test.sh). Also measures the blue-noise engine in
Mpix/s (secondary, reported in "extra").

vs_baseline: the reference commits NO numbers (BASELINE.md), so the baseline
is an analytic RTX-4090 estimate on the same workload, documented here:
UNet fwd FLOPs are taken from XLA's cost analysis of our model; the 4090 is
credited 40 TF/s effective throughput on this UNet (165 TF/s fp16 tensor peak
x ~25% achieved MFU — generous for eager diffusers inference at res 64).
baseline_samples_per_sec = 40e12 / (flops_per_image * 250 steps).
"""

import json
import os
import time

import numpy as np


def _setup_compile_cache():
    """Persistent XLA compilation cache: the first bench run on this machine
    pays the (remote) compile; later runs start in seconds."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _fetch(x):
    """Force real device completion: host-fetch a scalar (block_until_ready
    alone is unreliable through the axon relay)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _bench_sampling(batch=500, steps=250, res=64):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.samplers.iadb import sample_iadb

    # bf16 GroupNorm: +8% step time on v5e (flax computes the mean/var in
    # fp32 internally, so statistics stay accurate)
    cfg = unet_config_for_res(res, in_channels=3, out_channels=6, dtype="bfloat16",
                              norm_dtype="bfloat16")
    model = UNet2D(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res), jnp.float32), jnp.zeros((1,))
    )
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res), jnp.float32)

    def run(params, x0):
        out, _ = sample_iadb(
            model.apply, params, x0,
            nb_steps=steps, scheduler_gamma="sigmoid",
            gamma_params=(1000.0, 0.0, 3.0), two_head=True,
        )
        return out

    # FLOPs of one REFERENCE-equivalent UNet forward for the documented 4090
    # baseline estimate. Pinned to fast_upsample=False: the baseline is the
    # reference's torch workload (nearest-2x + full 3x3 convs), and our
    # FLOP-reducing rewrites must not inflate the estimated 4090 rate.
    import dataclasses

    ref_cfg = dataclasses.replace(cfg, fast_upsample=False)
    ref_model = UNet2D(ref_cfg)
    fwd = jax.jit(lambda p, x: ref_model.apply(p, x, jnp.full((x.shape[0],), 0.5)))
    try:
        cost = fwd.lower(params, x0[:1]).compile().cost_analysis()
        flops_per_image = float(cost.get("flops", 0.0))
    except Exception:
        flops_per_image = 0.0

    _fetch(run(params, x0))  # compile + warmup
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)
    t0 = time.perf_counter()
    _fetch(run(params, x1))  # fresh input defeats any relay-side result caching
    dt = time.perf_counter() - t0
    sps = batch / dt
    return sps, dt, flops_per_image


def _bench_sampling_int8(batch=500, steps=250, res=64, calib_batch=8):
    """Static-scale W8A8 serving path (r2): calibrate once on a short exact
    trajectory, then sample with constant activation scales. Validated
    vs bf16 on identical x0 at SSIM 1.0 / PSNR 49 dB
    (scripts/bench_int8_static.py); int8 sites chosen by profile — resnet
    conv1/conv2 + upsamplers; shortcut/conv_in/downsample/conv_out stay fp.
    Returns (sps, dt, model, params) for the follow-up serving legs."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.ops.int8 import calibrate_sampling
    from bndm_tpu.samplers.iadb import sample_iadb

    common = dict(in_channels=3, out_channels=6, dtype="bfloat16",
                  norm_dtype="bfloat16")
    m_cal = UNet2D(unet_config_for_res(res, **common, conv_int8=True,
                                       int8_mode="calibrate"))
    m_sta = UNet2D(unet_config_for_res(res, **common, conv_int8=True,
                                       int8_mode="static"))
    params = m_cal.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res), jnp.float32), jnp.zeros((1,))
    )
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res), jnp.float32)
    quant = calibrate_sampling(
        m_cal, {"params": params["params"]}, x0[:calib_batch], steps,
        scheduler_gamma="sigmoid", gamma_params=(1000.0, 0.0, 3.0), two_head=True)
    p_sta = {"params": params["params"], "quant": quant}

    def run(p, x):
        out, _ = sample_iadb(
            m_sta.apply, p, x,
            nb_steps=steps, scheduler_gamma="sigmoid",
            gamma_params=(1000.0, 0.0, 3.0), two_head=True,
        )
        return out

    _fetch(run(p_sta, x0))
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)
    t0 = time.perf_counter()
    _fetch(run(p_sta, x1))
    dt = time.perf_counter() - t0
    return batch / dt, dt, m_sta, p_sta


def _bench_sampling_static_gn(batch=500, steps=250, res=64, calib_batch=8):
    """int8-static + static-calibrated GroupNorm serving tier (r3): one joint
    conv+GN calibration trajectory, then every GroupNorm collapses to a fused
    FMA with per-(site, step) constants — attacks the GN/SiLU HBM wall that
    is 47% of the exact-GN step. Gate-passed on v5e: 20.93 vs 18.38
    samples/s = 1.139x, SSIM 0.9996 / PSNR 40.4 dB vs exact-GN int8-static
    on identical x0 (scripts/bench_static_gn.py). Returns (sps, dt, model,
    params) for the microbatched follow-up."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.ops.int8 import calibrate_sampling
    from bndm_tpu.samplers.iadb import sample_iadb

    base = unet_config_for_res(res, in_channels=3, out_channels=6,
                               dtype="bfloat16", norm_dtype="bfloat16",
                               conv_int8=True)
    m_cal = UNet2D(dataclasses.replace(base, int8_mode="calibrate",
                                       gn_mode="calibrate", gn_steps=steps))
    m_sta = UNet2D(dataclasses.replace(base, int8_mode="static",
                                       gn_mode="static", gn_steps=steps))
    params = m_cal.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res), jnp.float32),
        jnp.zeros((1,)))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res), jnp.float32)
    quant = calibrate_sampling(
        m_cal, {"params": params["params"]}, x0[:calib_batch], steps,
        scheduler_gamma="sigmoid", gamma_params=(1000.0, 0.0, 3.0), two_head=True)
    p_sta = {"params": params["params"], "quant": quant}

    def run(p, x):
        out, _ = sample_iadb(
            m_sta.apply, p, x,
            nb_steps=steps, scheduler_gamma="sigmoid",
            gamma_params=(1000.0, 0.0, 3.0), two_head=True,
        )
        return out

    _fetch(run(p_sta, x0))
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)
    t0 = time.perf_counter()
    _fetch(run(p_sta, x1))
    dt = time.perf_counter() - t0
    return batch / dt, dt, m_sta, p_sta


def _bench_resample(model, params, batch=500, steps=250, res=64):
    """Time sample_iadb for an already-calibrated (model, params) pair — used
    to measure config variants (e.g. the bf16-softmax relaxation) that share
    the same quant tree. Returns (sps, dt)."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.samplers.iadb import sample_iadb

    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res), jnp.float32)

    def run(p, x):
        out, _ = sample_iadb(
            model.apply, p, x,
            nb_steps=steps, scheduler_gamma="sigmoid",
            gamma_params=(1000.0, 0.0, 3.0), two_head=True,
        )
        return out

    _fetch(run(params, x0))
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)
    t0 = time.perf_counter()
    _fetch(run(params, x1))
    dt = time.perf_counter() - t0
    return batch / dt, dt


def _bench_sampling_cached(model, params, cache_interval, steps=250, res=64,
                           batch=500):
    """Feature-reuse (block-caching) tier on an already-calibrated serving
    (model, params) pair: every cache_interval-th step runs the full UNet,
    the steps between recompute only the outer shell around the cached trunk
    output (samplers.iadb.sample_iadb_cached, cf. DeepCache). Fidelity is
    measured IN-RUN: SSIM/PSNR vs the same model's uncached output on the
    identical timed input. Returns (sps, dt, ssim, psnr)."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.samplers.iadb import sample_iadb, sample_iadb_cached
    from bndm_tpu.utils.metrics import psnr, ssim

    def apply_full(p, x, t):
        return model.apply(p, x, t, return_deep=True)

    def apply_shallow(p, x, t, deep):
        return model.apply(p, x, t, deep_feature=deep)

    def run(p, x):
        return sample_iadb_cached(
            apply_full, apply_shallow, p, x, nb_steps=steps,
            cache_interval=cache_interval, scheduler_gamma="sigmoid",
            gamma_params=(1000.0, 0.0, 3.0), two_head=True,
        )

    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res), jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)
    _fetch(run(params, x0))  # compile + warmup
    t0 = time.perf_counter()
    out = run(params, x1)
    _fetch(out)
    dt = time.perf_counter() - t0
    ref, _ = sample_iadb(  # uncached reference on the identical input
        model.apply, params, x1, nb_steps=steps, scheduler_gamma="sigmoid",
        gamma_params=(1000.0, 0.0, 3.0), two_head=True)
    a = jnp.clip((ref + 1) / 2, 0, 1)
    b = jnp.clip((out + 1) / 2, 0, 1)
    return (batch / dt, dt, float(jnp.mean(ssim(b, a))),
            float(jnp.mean(psnr(b, a))))


def _bench_sampling_microbatched(model, params, total=1000, microbatch=500,
                                 steps=250, res=64, cache_interval=None):
    """Gallery serving at effective batch `total` via the microbatched scan
    (one compiled program, bs=500 activation watermark — r2's bs=1000
    full-batch attempt OOM'd the v5e worker). With ``cache_interval`` each
    microbatch's chain is the feature-reuse chain. Returns (sps, dt)."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.samplers.iadb import sample_iadb_microbatched

    caching = cache_interval is not None and cache_interval > 1

    def apply_full(p, x, t):
        return model.apply(p, x, t, return_deep=True)

    def apply_shallow(p, x, t, deep):
        return model.apply(p, x, t, deep_feature=deep)

    def run(key):
        # x0 generated fresh per call (the sample buffer is donated)
        x0 = jax.random.normal(key, (total, 3, res, res), jnp.float32)
        return sample_iadb_microbatched(
            apply_full if caching else model.apply, params, x0,
            microbatch=microbatch,
            nb_steps=steps, scheduler_gamma="sigmoid",
            gamma_params=(1000.0, 0.0, 3.0), two_head=True,
            apply_shallow_fn=apply_shallow if caching else None,
            cache_interval=cache_interval if caching else None,
        )

    _fetch(run(jax.random.PRNGKey(3)))  # compile + warmup
    t0 = time.perf_counter()
    _fetch(run(jax.random.PRNGKey(4)))
    dt = time.perf_counter() - t0
    return total / dt, dt


def _bench_noise(batch=500, res=64, inner=10):
    """Amortized in-jit throughput: in real use the noise engine runs inside
    the (jitted) train/sample step, so per-dispatch overhead is excluded by
    chaining ``inner`` generations in one compiled scan."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.ops.noise import get_noise

    rng = np.random.default_rng(7)
    L = np.tril(rng.standard_normal((4096, 4096)).astype(np.float32) * 0.01)
    np.fill_diagonal(L, 1.0)
    L = jnp.asarray(L)

    @jax.jit
    def gen_chain(key, gamma):
        def body(carry, i):
            r = get_noise(
                jnp.zeros((batch, 3, res, res), jnp.float32), L, gamma,
                noise_type="gaussianBN", train=True, key=jax.random.fold_in(key, i),
            )
            return carry + jnp.sum(r.noise), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(inner))
        return total

    key = jax.random.PRNGKey(0)
    gamma = jnp.full((batch,), 0.5)
    _fetch(gen_chain(key, gamma))
    t0 = time.perf_counter()
    _fetch(gen_chain(jax.random.PRNGKey(1), gamma))
    dt = (time.perf_counter() - t0) / inner
    mpix_s = batch * res * res / dt / 1e6
    return mpix_s, dt


def _bench_train(batch=64, res=64, inner=5):
    """BNDM train-step throughput, imgs/sec/chip (BENCH_TRAIN=0 skips)."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.train.pixel import PixelTrainer, TrainConfig

    rng = np.random.default_rng(7)
    L = np.tril(rng.standard_normal((4096, 4096)).astype(np.float32) * 0.01)
    np.fill_diagonal(L, 1.0)
    cfg = TrainConfig(noise_type="gaussianBN", scheduler_gamma="sigmoid",
                      gamma_defaults=(1000.0, 0.0, 3.0), out_channel=6,
                      optimize_scheduler_param=True, grad_clip=1.0)
    model = UNet2D(unet_config_for_res(res, 3, 6, dtype="bfloat16",
                                       norm_dtype="bfloat16"))
    tr = PixelTrainer(model, cfg, L, jax.random.PRNGKey(0))
    batch01 = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3, res, res))
    state = tr.state
    state, m = tr.train_step(state, batch01, jax.random.PRNGKey(2))  # compile
    _fetch(m["loss"])
    t0 = time.perf_counter()
    for i in range(inner):
        state, m = tr.train_step(state, batch01, jax.random.PRNGKey(3 + i))
    _fetch(m["loss"])
    dt = (time.perf_counter() - t0) / inner
    return batch / dt, dt


def main():
    import jax

    _setup_compile_cache()
    sps_bf16, sample_dt_bf16, flops_per_image = _bench_sampling()
    # int8-static serving path (r2): headline when it wins, since it is the
    # validated production-serving configuration (SSIM 1.0 / PSNR 49 dB vs
    # bf16 on identical x0 — scripts/bench_int8_static.py); BENCH_INT8=0
    # skips (e.g. to measure the pure bf16 parity path)
    sps_int8 = None
    m_sta = p_sta = None
    if os.environ.get("BENCH_INT8", "1") != "0":
        try:
            sps_int8, sample_dt_int8, m_sta, p_sta = _bench_sampling_int8()
        except Exception as e:  # noqa: BLE001 — never lose the round artifact
            print(f"int8 bench failed ({e}); reporting bf16", flush=True)
    if sps_int8 is not None and sps_int8 > sps_bf16:
        sps, sample_dt, mode = sps_int8, sample_dt_int8, "int8-static serving"
    else:
        sps, sample_dt, mode = sps_bf16, sample_dt_bf16, "bf16"
    # static-GN serving tier (r3, gate-passed: SSIM 0.9996 / PSNR 40.4 dB vs
    # exact-GN on identical x0 — scripts/bench_static_gn.py); BENCH_GN=0
    # drops back to the exact-GN serving path
    sps_gn = None
    if (sps_int8 is not None and os.environ.get("BENCH_GN", "1") != "0"
            and os.environ.get("BENCH_INT8", "1") != "0"):
        try:
            sps_gn, sample_dt_gn, m_gn, p_gn = _bench_sampling_static_gn()
            if sps_gn > sps:
                sps, sample_dt = sps_gn, sample_dt_gn
                mode = "int8-static + static-GN serving"
                m_sta, p_sta = m_gn, p_gn  # microbatch the fastest tier
        except Exception as e:  # noqa: BLE001
            print(f"static-GN bench failed ({e})", flush=True)
    # bf16 attention softmax on the fastest calibrated tier (r3, gate-passed:
    # 21.68 vs 20.93 samples/s = 1.036x at SSIM 0.9996 / PSNR 40.4 dB vs
    # exact-GN — the relaxation adds no measurable error on top of static-GN;
    # scripts/bench_static_gn.py ATTN_BF16 leg); BENCH_ATTN=0 skips
    sps_attn = None
    if (m_sta is not None and "serving" in mode
            and os.environ.get("BENCH_ATTN", "1") != "0"):
        try:
            import dataclasses

            from bndm_tpu.models.unet2d import UNet2D

            m_attn = UNet2D(dataclasses.replace(
                m_sta.cfg, attn_softmax_dtype="bfloat16"))
            sps_attn, sample_dt_attn = _bench_resample(m_attn, p_sta)
            if sps_attn > sps:
                sps, sample_dt = sps_attn, sample_dt_attn
                mode += " + bf16-softmax"
                m_sta = m_attn  # microbatch the fastest tier
        except Exception as e:  # noqa: BLE001
            print(f"attn-bf16 bench failed ({e})", flush=True)
    # feature-reuse (block-caching) tier on the fastest calibrated serving
    # configuration (r3, cf. DeepCache): every BENCH_CACHE_INTERVAL-th step
    # (default 3) runs the full UNet, the steps between recompute only the
    # full-resolution shell around the cached trunk output. Unlike the other
    # tiers the fidelity gate runs IN-RUN (SSIM>=0.99 / PSNR>=35 dB vs the
    # same model uncached on the identical timed input) — a failed gate drops
    # the tier for this run. Measured r3: interval=3 -> 32.28 vs 21.86
    # samples/s = 1.477x at SSIM 1.000 / PSNR 59.7 dB
    # (scripts/bench_deepcache.py). BENCH_CACHE=0 skips.
    sps_cache = None
    cache_fid = None
    cache_interval = None
    if (m_sta is not None and "serving" in mode
            and os.environ.get("BENCH_CACHE", "1") != "0"):
        try:
            iv = int(os.environ.get("BENCH_CACHE_INTERVAL", "3"))
            sps_c, dt_c, ssim_c, psnr_c = _bench_sampling_cached(
                m_sta, p_sta, iv)
            cache_fid = {"ssim": round(ssim_c, 4), "psnr_db": round(psnr_c, 2)}
            gate = ssim_c >= 0.99 and psnr_c >= 35.0
            print(f"cached(i={iv}): {sps_c:.2f} samples/s, SSIM {ssim_c:.4f} "
                  f"PSNR {psnr_c:.1f} dB gate={'pass' if gate else 'FAIL'}",
                  flush=True)
            if gate:
                sps_cache = sps_c
                if sps_c > sps:
                    sps, sample_dt = sps_c, dt_c
                    mode += f" + cached(i={iv})"
                    cache_interval = iv  # microbatch the cached tier
        except Exception as e:  # noqa: BLE001
            print(f"cached bench failed ({e})", flush=True)
    # gallery serving at effective batch 1000 (microbatched scan) on the
    # fastest serving configuration; BENCH_MB=0 skips
    sps_mb = None
    mb_batch = None
    # guarded on a *winning* serving tier like the attn leg: when bf16 beat
    # int8, m_sta still holds the int8 model and a microbatched measurement
    # of it must not be labeled "bf16 microbatched"
    if (m_sta is not None and "serving" in mode
            and os.environ.get("BENCH_MB", "1") != "0"):
        try:
            mb_batch = int(os.environ.get("BENCH_MB_TOTAL", "1000"))
            sps_mb, sample_dt_mb = _bench_sampling_microbatched(
                m_sta, p_sta, total=mb_batch, cache_interval=cache_interval)
            if sps_mb > sps:
                sps, sample_dt = sps_mb, sample_dt_mb
                mode += f" microbatched (eff. bs={mb_batch})"
        except Exception as e:  # noqa: BLE001
            print(f"microbatched bench failed ({e})", flush=True)
    mpix_s, noise_dt = _bench_noise()
    # train throughput is on by default so the round artifact records it
    # (the persistent compile cache keeps reruns cheap); BENCH_TRAIN=0 skips
    train_sps = None
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        train_sps, _ = _bench_train()

    # documented analytic 4090 baseline (see module docstring)
    eff_4090_flops = 40e12
    steps = 250
    if flops_per_image > 0:
        baseline_sps = eff_4090_flops / (flops_per_image * steps)
        vs_baseline = sps / baseline_sps
    else:
        baseline_sps = float("nan")
        vs_baseline = float("nan")

    eff_bs = mb_batch if "microbatched" in mode else 500
    # the microbatched run executes (total/500) sequential bs-500 chains, so
    # per-step time must divide by the true number of UNet step executions
    step_execs = steps * (mb_batch // 500 if "microbatched" in mode else 1)
    print(json.dumps({
        "metric": f"samples/sec/chip (IADB-BN res64, 250 steps, bs={eff_bs})",
        "value": round(sps, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs_baseline, 3) if np.isfinite(vs_baseline) else None,
        "extra": {
            "mode": mode,
            "bf16_sps": round(sps_bf16, 3),
            "int8_static_sps": round(sps_int8, 3) if sps_int8 else None,
            "static_gn_sps": round(sps_gn, 3) if sps_gn else None,
            # provenance ref, not measured in-run (scripts/bench_static_gn.py)
            "static_gn_fidelity_ref": ("SSIM 0.9996 / PSNR 40.4 dB vs "
                                       "exact-GN on identical x0 (r3, v5e)"
                                       if sps_gn else None),
            "attn_bf16_sps": round(sps_attn, 3) if sps_attn else None,
            # provenance ref (scripts/bench_static_gn.py ATTN_BF16 leg)
            "attn_bf16_fidelity_ref": ("SSIM 0.9996 / PSNR 40.4 dB vs "
                                       "exact-GN on identical x0 — no "
                                       "measurable error added (r3, v5e)"
                                       if sps_attn else None),
            "cached_sps": round(sps_cache, 3) if sps_cache else None,
            "cached_interval": cache_interval,
            # measured IN-RUN vs the same model uncached on the timed input
            "cached_fidelity": cache_fid,
            "microbatched_sps": round(sps_mb, 3) if sps_mb else None,
            "microbatched_effective_batch": mb_batch if sps_mb else None,
            # provenance reference, NOT measured in this run — the fidelity
            # gate lives in scripts/bench_int8_static.py (r2, v5e)
            "int8_fidelity_ref": "SSIM 1.0 / PSNR 49.2 dB on identical x0 "
                                 "(scripts/bench_int8_static.py, r2, v5e)",
            "sample_batch_seconds": round(sample_dt, 3),
            "per_unet_step_ms": round(sample_dt / step_execs * 1e3, 3),
            "unet_fwd_gflops_per_image": round(flops_per_image / 1e9, 2),
            "baseline_rtx4090_est_sps": round(baseline_sps, 3) if np.isfinite(baseline_sps) else None,
            "bluenoise_mpix_per_s": round(mpix_s, 1),
            "bluenoise_batch_ms": round(noise_dt * 1e3, 3),
            "train_imgs_per_sec": round(train_sps, 2) if train_sps else None,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
