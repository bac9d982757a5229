"""Benchmark harness — prints JSON lines for the driver (last line wins).

Primary metric (BASELINE.json): samples/sec/chip for IADB-BN sampling at the
reference's benchmark config — AFHQ-Cat 64x64, 250 inference steps, batch 500,
two-head BNDM UNet (113.7M params) — the whole 250-step reverse chain
compiled as one lax.scan (reference path: iadb_bn.py test branch +
scripts/sampling/cat_res64_test.sh).

Capture-proofing (r4 — the r3 run was killed by the driver before printing
its single JSON line, losing the round's headline): legs now run
fastest-value-first (the calibrated serving tier and its cached/feature-reuse
variant produce the headline) and a COMPLETE JSON line is re-printed after
every finished leg, so a timeout at any point still leaves the best
measurement so far on the last line. An internal wall-clock budget
(``BENCH_BUDGET_S``, default 1500 s) skips remaining optional legs when
exceeded.

Fidelity gates are measured IN-RUN (not provenance strings): the serving
tier stack (int8-static + static-GN + bf16-softmax) is gated against the
bf16 parity path on the identical timed input, and the cached
(feature-reuse) tier against the same serving model uncached. A failed gate
drops the tier from the headline for this run — so the ladder stays honest
when trained weights flow through.

Env toggles: BENCH_INT8 / BENCH_GN / BENCH_ATTN / BENCH_CACHE / BENCH_MB /
BENCH_TRAIN (=0 disables each tier/leg), BENCH_CACHE_INTERVAL (default 12 —
the r4 ladder knee: 39.2 samples/s at PSNR 50 dB; 25 still gate-passes at
43.8 dB but buys only +4%, see PARITY.md §6), BENCH_CACHE_DEPTH (default 1),
BENCH_MB_TOTAL (default 1000), BENCH_BUDGET_S (default 1500).

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

# full-scale defaults; BENCH_STEPS/BENCH_RES/BENCH_BATCH override for smoke
# runs of the harness logic (e.g. on CPU) — the driver runs the defaults
STEPS = int(os.environ.get("BENCH_STEPS", "250"))
RES = int(os.environ.get("BENCH_RES", "64"))
BATCH = int(os.environ.get("BENCH_BATCH", "500"))
# BENCH_TINY=1: 2-block toy UNet on 16x16 inputs — smoke-tests the full leg
# sequence + gating + JSON emission hermetically (CPU, seconds)
TINY = os.environ.get("BENCH_TINY", "0") == "1"
SPATIAL = 16 if TINY else RES
GAMMA = dict(scheduler_gamma="sigmoid", gamma_params=(1000.0, 0.0, 3.0),
             two_head=True)


def _unet_cfg(out_channels=6, **kw):
    from bndm_tpu.models.unet2d import UNet2DConfig, unet_config_for_res

    if TINY:
        return UNet2DConfig(
            in_channels=3, out_channels=out_channels,
            block_out_channels=(8, 16),
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
            attention_head_dim=4, norm_num_groups=4, **kw)
    return unet_config_for_res(RES, in_channels=3, out_channels=out_channels,
                               **kw)


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


def _flops_per_image(params, x1img):
    """FLOPs of one REFERENCE-equivalent UNet forward for the documented 4090
    baseline estimate. Pinned to fast_upsample=False: the baseline is the
    reference's torch workload (nearest-2x + full 3x3 convs), and our
    FLOP-reducing rewrites must not inflate the estimated 4090 rate."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D

    cfg = _unet_cfg(dtype="bfloat16", norm_dtype="bfloat16")
    ref_model = UNet2D(dataclasses.replace(cfg, fast_upsample=False))
    fwd = jax.jit(lambda p, x: ref_model.apply(p, x, jnp.full((x.shape[0],), 0.5)))
    try:
        cost = fwd.lower(params, x1img).compile().cost_analysis()
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _fidelity(out, ref):
    """Mean SSIM / PSNR between two sample batches in [-1, 1]."""
    import jax.numpy as jnp

    from bndm_tpu.utils.metrics import psnr, ssim

    a = jnp.clip((ref + 1) / 2, 0, 1)
    b = jnp.clip((out + 1) / 2, 0, 1)
    return float(jnp.mean(ssim(b, a))), float(jnp.mean(psnr(b, a)))


def _gate(ssim_v, psnr_v):
    return ssim_v >= 0.99 and psnr_v >= 35.0


class Bench:
    """Incremental headline state + capture-proof JSON emission."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
        self.sps = None
        self.dt = None
        self.mode = None
        self.eff_bs = BATCH
        self.step_execs = STEPS
        self.flops_per_image = 0.0
        self.extra = {}

    def elapsed(self):
        return time.perf_counter() - self.t0

    def over_budget(self, label):
        if self.elapsed() > self.budget:
            print(f"budget exceeded ({self.elapsed():.0f}s > "
                  f"{self.budget:.0f}s) — skipping {label}", flush=True)
            return True
        return False

    def promote(self, sps, dt, mode, eff_bs=BATCH, step_execs=STEPS):
        if self.sps is None or sps > self.sps:
            self.sps, self.dt, self.mode = sps, dt, mode
            self.eff_bs, self.step_execs = eff_bs, step_execs

    def emit(self):
        """Print ONE complete JSON line with the best headline so far."""
        import jax

        if self.flops_per_image > 0:
            baseline_sps = 40e12 / (self.flops_per_image * STEPS)
            vs_baseline = self.sps / baseline_sps
        else:
            baseline_sps = vs_baseline = None
        print(json.dumps({
            "metric": (f"samples/sec/chip (IADB-BN res{RES}, {STEPS} steps, "
                       f"bs={self.eff_bs})"),
            "value": round(self.sps, 3),
            "unit": "samples/s/chip",
            "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
            "extra": {
                "mode": self.mode,
                "sample_batch_seconds": round(self.dt, 3),
                "per_unet_step_ms": round(self.dt / self.step_execs * 1e3, 3),
                "unet_fwd_gflops_per_image": round(self.flops_per_image / 1e9, 2),
                "baseline_rtx4090_est_sps":
                    round(baseline_sps, 3) if baseline_sps else None,
                "bench_elapsed_s": round(self.elapsed(), 1),
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
                **self.extra,
            },
        }), flush=True)


def _timed_run(run, params, x0, x1, total):
    """Warm on x0, time on a fresh x1 (defeats relay-side result caching).
    Returns (sps, dt, out_on_x1)."""
    _fetch(run(params, x0))
    t0 = time.perf_counter()
    out = run(params, x1)
    _fetch(out)
    dt = time.perf_counter() - t0
    return total / dt, dt, out


def main():  # noqa: C901 — linear leg sequence, clearer flat
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D
    from bndm_tpu.ops.int8 import calibrate_sampling
    from bndm_tpu.samplers.iadb import (
        sample_iadb, sample_iadb_cached, sample_iadb_microbatched)

    _setup_compile_cache()
    B = Bench()

    # BASELINE configs #3-#5 (r5, VERDICT r4 #7): carry the last committed
    # ddim/superres/latent measurements (scripts/bench_baseline_configs.py
    # writes BASELINE_LEGS.json) so the driver artifact has the whole story.
    try:
        legs_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BASELINE_LEGS.json")
        with open(legs_path) as f:
            B.extra["baseline_configs"] = {
                leg: {"sps": v["best_sps"], "tier": v["best_tier"],
                      "provenance": v.get("provenance", "")}
                for leg, v in json.load(f).items()}
    except Exception:  # noqa: BLE001 — artifact optional
        pass

    # Trained-weight gate re-validation (r5, VERDICT r4 #3): carry the last
    # committed TRAINED_GATES.json summary — the one provenance axis the
    # in-run (random-init) gates below cannot cover. Key result: static-GN
    # fails on trained weights; int8+bf16sm+cached knee moves i=12 -> i=8.
    try:
        tg_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "TRAINED_GATES.json")
        with open(tg_path) as f:
            tg = json.load(f)
        B.extra["trained_gates"] = {
            "provenance": tg.get("provenance", {}).get("config", ""),
            "stacks": {
                stack: {leg: f"{v['sps']} sps {v['gate']}"
                        for leg, v in legs.items() if "gate" in v}
                for stack, legs in tg.get("stacks", {}).items()}}
    except Exception:  # noqa: BLE001 — artifact optional
        pass

    use_int8 = os.environ.get("BENCH_INT8", "1") != "0"
    use_gn = os.environ.get("BENCH_GN", "1") != "0"
    use_attn = os.environ.get("BENCH_ATTN", "1") != "0"
    use_cache = os.environ.get("BENCH_CACHE", "1") != "0"
    use_mb = os.environ.get("BENCH_MB", "1") != "0"
    use_train = os.environ.get("BENCH_TRAIN", "1") != "0"
    cache_iv = int(os.environ.get("BENCH_CACHE_INTERVAL", "12"))
    cache_depth = int(os.environ.get("BENCH_CACHE_DEPTH", "1"))
    mb_total = int(os.environ.get("BENCH_MB_TOTAL", "1000"))

    # shared params + inputs (bf16 GroupNorm: flax keeps mean/var in fp32)
    cfg_bf16 = _unet_cfg(dtype="bfloat16", norm_dtype="bfloat16")
    m_bf16 = UNet2D(cfg_bf16)
    params = m_bf16.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, SPATIAL, SPATIAL), jnp.float32),
        jnp.zeros((1,)))
    # BENCH_PARAMS=<train_out_dir>: run the whole ladder (and its in-run
    # gates) on TRAINED weights + the learned (tau, s, e) gamma params (r5 —
    # weights/gamma are runtime inputs, so programs and compile-cache entries
    # are identical to the random-init run; scripts/bench_trained_gates.py is
    # the committed-artifact variant). Default stays random-init: throughput
    # is shape-dependent, and the driver bench must not depend on artifacts.
    if os.environ.get("BENCH_PARAMS"):
        from bndm_tpu.cli.common import load_params

        tdir = os.environ["BENCH_PARAMS"]
        loaded = load_params(os.path.join(tdir, "model.npz"))
        params = {"params": loaded.get("params", loaded)}
        sp = np.loadtxt(os.path.join(tdir, "scheduler_params.txt"),
                        dtype=np.float32).reshape(3)
        GAMMA["gamma_params"] = tuple(float(v) for v in sp)
        B.extra["weights_provenance"] = f"trained: {tdir}"
        print(f"using trained weights from {tdir}, "
              f"(tau,s,e)={GAMMA['gamma_params']}", flush=True)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 3, SPATIAL, SPATIAL),
                           jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)
    B.flops_per_image = _flops_per_image(params, x0[:1])

    def run_plain(model):
        def run(p, x):
            out, _ = sample_iadb(model.apply, p, x, nb_steps=STEPS, **GAMMA)
            return out
        return run

    # ---- Leg A: the calibrated serving tier (fastest uncached config) ----
    # int8-static + static-GN + bf16-softmax, each toggleable; when all are
    # off this leg IS the bf16 parity path and leg C is skipped.
    serving_on = use_int8 or use_gn or use_attn
    m_serve, p_serve, out_serve = m_bf16, {"params": params["params"]}, None
    tier_names = []
    if serving_on:
        try:
            base = cfg_bf16
            cal_kw, sta_kw = {}, {}
            if use_int8:
                cal_kw.update(conv_int8=True, int8_mode="calibrate")
                sta_kw.update(conv_int8=True, int8_mode="static")
                tier_names.append("int8-static")
            if use_gn:
                cal_kw.update(gn_mode="calibrate", gn_steps=STEPS)
                sta_kw.update(gn_mode="static", gn_steps=STEPS)
                tier_names.append("static-GN")
            if use_attn:
                # calibration stays on the exact fp32-softmax path
                sta_kw.update(attn_softmax_dtype="bfloat16")
                tier_names.append("bf16-softmax")
            m_serve = UNet2D(dataclasses.replace(base, **sta_kw))
            if cal_kw:
                m_cal = UNet2D(dataclasses.replace(base, **cal_kw))
                quant = calibrate_sampling(
                    m_cal, {"params": params["params"]}, x0[:8], STEPS, **GAMMA)
                p_serve = {"params": params["params"], "quant": quant}
            sps_s, dt_s, out_serve = _timed_run(
                run_plain(m_serve), p_serve, x0, x1, BATCH)
            mode_serve = " + ".join(tier_names) + " serving"
            B.promote(sps_s, dt_s, mode_serve)
            B.extra["serving_sps"] = round(sps_s, 3)
            B.extra["serving_tiers"] = tier_names
            B.emit()
        except Exception as e:  # noqa: BLE001 — never lose the artifact
            print(f"serving leg failed ({e}); falling back to bf16", flush=True)
            serving_on = False
            m_serve, p_serve, out_serve = m_bf16, {"params": params["params"]}, None
    if not serving_on:  # pure bf16 measurement mode (all tiers off/failed)
        try:
            sps_b, dt_b, out_serve = _timed_run(
                run_plain(m_bf16), p_serve, x0, x1, BATCH)
            B.promote(sps_b, dt_b, "bf16")
            B.extra["bf16_sps"] = round(sps_b, 3)
            B.emit()
        except Exception as e:  # noqa: BLE001
            print(f"bf16 leg failed ({e})", flush=True)

    # ---- Leg B: feature-reuse (block-caching / DeepCache) on leg A ----
    # In-run gate: SSIM>=0.99 / PSNR>=35 dB vs the SAME model uncached on the
    # identical timed input; a failed gate drops the tier for this run.
    cached_headline = False
    if use_cache and B.sps is not None and not B.over_budget("cached leg"):
        try:
            m_c = (m_serve if cache_depth == cfg_bf16.cache_depth else
                   UNet2D(dataclasses.replace(m_serve.cfg,
                                              cache_depth=cache_depth)))

            def apply_full(p, x, t):
                return m_c.apply(p, x, t, return_deep=True)

            def apply_shallow(p, x, t, deep):
                return m_c.apply(p, x, t, deep_feature=deep)

            def run_c(p, x):
                return sample_iadb_cached(
                    apply_full, apply_shallow, p, x, nb_steps=STEPS,
                    cache_interval=cache_iv, **GAMMA)

            sps_c, dt_c, out_c = _timed_run(run_c, p_serve, x0, x1, BATCH)
            if out_serve is None:  # serving legs off: uncached ref = bf16
                _, _, out_serve = _timed_run(
                    run_plain(m_serve), p_serve, x0, x1, BATCH)
            ssim_c, psnr_c = _fidelity(out_c, out_serve)
            gate = _gate(ssim_c, psnr_c)
            print(f"cached(i={cache_iv},d={cache_depth}): {sps_c:.2f} "
                  f"samples/s, SSIM {ssim_c:.4f} PSNR {psnr_c:.1f} dB "
                  f"gate={'pass' if gate else 'FAIL'}", flush=True)
            B.extra["cached_sps"] = round(sps_c, 3)
            B.extra["cached_fidelity"] = {
                "ssim": round(ssim_c, 4), "psnr_db": round(psnr_c, 2),
                "vs": "same serving model uncached, identical input",
                "gate": "pass" if gate else "fail"}
            if gate:
                # ADVICE r3: record the interval whenever the gate passes,
                # not only when the tier wins the headline
                B.extra["cached_interval"] = cache_iv
                B.extra["cached_depth"] = cache_depth
                if sps_c > B.sps:
                    cached_headline = True
                    B.promote(sps_c, dt_c,
                              B.mode + f" + cached(i={cache_iv})"
                              if B.mode else f"cached(i={cache_iv})")
            B.emit()
        except Exception as e:  # noqa: BLE001
            print(f"cached leg failed ({e})", flush=True)

    # ---- Leg C: bf16 parity path + in-run gate for the serving stack ----
    sps_bf16 = None
    if serving_on and not B.over_budget("bf16 parity leg"):
        try:
            sps_bf16, dt_b, out_b = _timed_run(
                run_plain(m_bf16), {"params": params["params"]}, x0, x1, BATCH)
            B.extra["bf16_sps"] = round(sps_bf16, 3)
            if out_serve is not None:
                ssim_s, psnr_s = _fidelity(out_serve, out_b)
                gate_s = _gate(ssim_s, psnr_s)
                print(f"serving stack vs bf16: SSIM {ssim_s:.4f} PSNR "
                      f"{psnr_s:.1f} dB gate={'pass' if gate_s else 'FAIL'}",
                      flush=True)
                B.extra["serving_fidelity"] = {
                    "ssim": round(ssim_s, 4), "psnr_db": round(psnr_s, 2),
                    "vs": "bf16 parity path, identical input",
                    "gate": "pass" if gate_s else "fail"}
                if not gate_s:
                    # drop every tier built on the serving stack — including
                    # the cached tier, whose own gate compared against the
                    # now-invalid serving output
                    print("serving gate FAILED — headline reverts to bf16",
                          flush=True)
                    B.sps = None
                    B.promote(sps_bf16, dt_b, "bf16")
                    m_serve = m_bf16
                    p_serve = {"params": params["params"]}
                    cached_headline = False
                    B.extra.pop("cached_interval", None)
                    B.extra.pop("cached_depth", None)
                    if "cached_fidelity" in B.extra:
                        B.extra["cached_fidelity"]["gate"] = \
                            "fail (serving stack gate failed)"
            else:
                B.promote(sps_bf16, dt_b, "bf16")
            B.emit()
        except Exception as e:  # noqa: BLE001
            print(f"bf16 leg failed ({e})", flush=True)

    # ---- Leg D: microbatched gallery serving at effective bs=mb_total ----
    # (scan over mb=500 chains, donated in-place buffer — full-batch bs=1000
    # OOMs the v5e worker). Runs the fastest gate-passing configuration.
    if (use_mb and B.sps is not None and mb_total > BATCH
            and not B.over_budget("microbatched leg")):
        try:
            iv = cache_iv if cached_headline else None
            m_c = m_serve
            if cached_headline and cache_depth != cfg_bf16.cache_depth:
                m_c = UNet2D(dataclasses.replace(m_serve.cfg,
                                                 cache_depth=cache_depth))

            def apply_full(p, x, t):
                return m_c.apply(p, x, t, return_deep=True)

            def apply_shallow(p, x, t, deep):
                return m_c.apply(p, x, t, deep_feature=deep)

            def run_mb(key):
                # x0 generated fresh per call (the sample buffer is donated)
                xb = jax.random.normal(key, (mb_total, 3, SPATIAL, SPATIAL),
                                       jnp.float32)
                return sample_iadb_microbatched(
                    apply_full if iv else m_c.apply, p_serve, xb,
                    microbatch=BATCH, nb_steps=STEPS, **GAMMA,
                    apply_shallow_fn=apply_shallow if iv else None,
                    cache_interval=iv)

            _fetch(run_mb(jax.random.PRNGKey(3)))
            t0 = time.perf_counter()
            _fetch(run_mb(jax.random.PRNGKey(4)))
            dt_mb = time.perf_counter() - t0
            sps_mb = mb_total / dt_mb
            B.extra["microbatched_sps"] = round(sps_mb, 3)
            B.extra["microbatched_effective_batch"] = mb_total
            if sps_mb > B.sps:
                B.promote(sps_mb, dt_mb,
                          B.mode + f" microbatched (eff. bs={mb_total})",
                          eff_bs=mb_total,
                          step_execs=STEPS * (mb_total // BATCH))
            B.emit()
        except Exception as e:  # noqa: BLE001
            print(f"microbatched leg failed ({e})", flush=True)

    # ---- Leg E: blue-noise engine (secondary metric) ----
    if not B.over_budget("noise leg"):
        try:
            mpix_s, noise_dt = _bench_noise()
            B.extra["bluenoise_mpix_per_s"] = round(mpix_s, 1)
            B.extra["bluenoise_batch_ms"] = round(noise_dt * 1e3, 3)
            B.emit()
        except Exception as e:  # noqa: BLE001
            print(f"noise leg failed ({e})", flush=True)

    # ---- Leg F: train throughput ----
    if use_train and not B.over_budget("train leg"):
        try:
            train_sps, _ = _bench_train()
            B.extra["train_imgs_per_sec"] = round(train_sps, 2)
            B.emit()
        except Exception as e:  # noqa: BLE001
            print(f"train leg failed ({e})", flush=True)

    if B.sps is None:  # every sampling leg failed: still print a line
        B.promote(float("nan"), float("nan"), "ALL SAMPLING LEGS FAILED")
        B.emit()


def _bench_noise(batch=BATCH, res=RES, inner=10):
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


def _bench_train(batch=None, res=64, inner=5, engine=None):
    """BNDM train-step throughput, imgs/sec/chip (BENCH_TRAIN=0 skips).

    The noise engine needs a paper resolution (the L matrix is 64^2), so the
    tiny smoke keeps res=64 with a small batch. BENCH_TRAIN_NOISE=fused (or
    engine="fused") measures the Pallas fused RNG->matmul->mix engine
    instead of the XLA one (scripts/bench_fused_noise_train.py compares).
    """
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.train.pixel import PixelTrainer, TrainConfig

    if batch is None:
        batch = 4 if TINY else 64
    if engine is None:
        # "auto" = the r4 training default (fused noise kernel on TPU,
        # measured 1.059x at bs=64 — scripts/bench_fused_noise_train.py);
        # the fused bs=64 program is in the compile cache from that run
        engine = os.environ.get("BENCH_TRAIN_NOISE", "auto")
    rng = np.random.default_rng(7)
    L = np.tril(rng.standard_normal((4096, 4096)).astype(np.float32) * 0.01)
    np.fill_diagonal(L, 1.0)
    cfg = TrainConfig(noise_type="gaussianBN", scheduler_gamma="sigmoid",
                      gamma_defaults=(1000.0, 0.0, 3.0), out_channel=6,
                      optimize_scheduler_param=True, grad_clip=1.0,
                      noise_engine=engine)
    if TINY:
        model = UNet2D(_unet_cfg(dtype="bfloat16", norm_dtype="bfloat16"))
    else:
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


if __name__ == "__main__":
    main()
