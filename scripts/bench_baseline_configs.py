"""Measured throughput for the remaining BASELINE.json configs (r4,
VERDICT r3 missing #1): the repo's committed samples/s covered only the
noise engine (#1) and IADB-BN res64 (#2); this script measures

  ddim      #3  DDIM-BN sampling 64^2   (church_res64_test.sh: bs=500,
                250 steps, 3-channel UNet, ddim_diffusers.py:624-712)
  superres  #4  IADB super-res conditional 128^2 (iadb_church_superres_
                test.sh: bs=200, 250 steps, in=6/out=6 7-block UNet,
                iadb_bn.py:566-684, gamma sigmoid tau=0.2)
  latent    #5  Latent IADB-BN 512^2    (latent_iadb_cat_res512_test.sh:
                bs=50, 250 steps, 4->8ch latent UNet at 64^2 latents,
                incl. the VAE decode at t=0, latent_...:472-574)

Each leg measures the bf16 parity path and the calibrated serving tier
(int8-static + static-GN + bf16-softmax; + feature-reuse caching where the
sampler supports it), with the same in-run SSIM>=0.99 / PSNR>=35 dB gate as
bench.py — a tier that fails the gate is reported but not promoted.

Weights are random-init (no checkpoints offline) — throughput is
shape-dependent, not value-dependent, and every fidelity gate runs in-run.

Env:
  LEGS            comma list of ddim,superres,latent (default all three)
  TIERS           comma list of bf16,serving,cached (default bf16,serving)
  CACHE_INTERVAL  feature-reuse interval for the cached tier (per-leg default)
  CACHE_INTERVALS comma list — r5 knee search: measure the cached tier at
                  EVERY listed interval in one run (one calibration, one
                  serving reference), each gated vs the serving output
Args: [batch steps res] override the per-leg defaults for smoke runs.

One JSON line per leg (plus a summary line), so a timeout still leaves
completed legs on record. Completed legs are also merged into
``BASELINE_LEGS.json`` at the repo root (committed artifact; bench.py folds
it into the driver JSON's extra so BENCH_r{N} carries the whole perf story).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402

GATE_SSIM, GATE_PSNR = 0.99, 35.0
ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BASELINE_LEGS.json")


def _fidelity(out, ref):
    import jax.numpy as jnp

    from bndm_tpu.utils.metrics import psnr, ssim

    a = jnp.clip((ref + 1) / 2, 0, 1)
    b = jnp.clip((out + 1) / 2, 0, 1)
    return float(jnp.mean(ssim(b, a))), float(jnp.mean(psnr(b, a)))


def _timed(run, x0, x1, total, label):
    t0 = time.perf_counter()
    _fetch(run(x0))  # compile + warmup
    print(f"{label}: compile+warm {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    out = run(x1)
    _fetch(out)
    dt = time.perf_counter() - t0
    print(f"{label}: {total / dt:.2f} samples/s ({dt:.2f}s)", flush=True)
    return total / dt, dt, out


def _gated(r, out, ref):
    """Attach SSIM/PSNR + gate verdict vs the reference output (if any)."""
    if ref is not None:
        s, p = _fidelity(out, ref)
        r.update(ssim=round(s, 4), psnr_db=round(p, 2),
                 gate="pass" if s >= GATE_SSIM and p >= GATE_PSNR else "fail")
    return r


def _persist(leg, payload):
    """Merge this leg's measurements into BASELINE_LEGS.json (committed;
    bench.py embeds it so the driver artifact carries BASELINE #3-#5)."""
    try:
        data = {}
        if os.path.exists(ARTIFACT):
            with open(ARTIFACT) as f:
                data = json.load(f)
        data[leg] = payload
        with open(ARTIFACT, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
    except Exception as e:  # noqa: BLE001 — never lose the run over IO
        print(f"artifact write failed: {e}", flush=True)


def _report(leg, metric_suffix, results, batch, steps):
    """One JSON line per leg; tiers gated most-relaxed-first."""
    best = max((r for r in results.values()
                if r.get("gate", "pass") == "pass"),
               key=lambda r: r["sps"])
    metric = (f"samples/sec/chip ({metric_suffix}, {steps} steps, "
              f"bs={batch})")
    print(json.dumps({
        "metric": metric,
        "value": round(best["sps"], 3),
        "unit": "samples/s/chip",
        "extra": {"leg": leg, "best_tier": best["tier"], "tiers": results},
    }), flush=True)
    _persist(leg, {
        "metric": metric, "best_sps": round(best["sps"], 3),
        "best_tier": best["tier"], "tiers": results,
        "provenance": os.environ.get(
            "PROVENANCE", "random-init weights, in-run gates, 1x v5e"),
    })
    return best


def leg_ddim(batch, steps, res, tiers, cache_ivs):
    """BASELINE #3: DDIM-BN sampling (reference ddim_diffusers.py test
    branch at scripts/sampling/church_res64_test.sh)."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.samplers.ddim import DDIMScheduler, sample_ddim
    from bndm_tpu.serving import make_serving_sampler_ddim

    cfg = unet_config_for_res(res, in_channels=3, out_channels=3,
                              dtype="bfloat16", norm_dtype="bfloat16")
    model = UNet2D(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, res, res), jnp.float32),
                        jnp.zeros((1,)))
    scheduler = DDIMScheduler()  # diffusers defaults, T=1000
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res),
                           jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)

    # tier composition knobs (SERVING_INT8/SERVING_GN/SERVING_ATTN=0/1) to
    # isolate which relaxation moves a near-gate fidelity number.
    # static-GN defaults OFF for DDIM: measured on v5e (r4) the full stack
    # fails the gate (SSIM 0.9986 / PSNR 32.5 dB < 35) — DDIM's 1000-T
    # trajectories drift more per scan position than IADB's, so the
    # per-position GN tables mis-normalize; int8+bf16-softmax alone passes
    # at 40.3 dB (19.0 samples/s) and cached(i=5) on top at 37.3 dB.
    s_int8 = os.environ.get("SERVING_INT8", "1") != "0"
    s_gn = os.environ.get("SERVING_GN", "0") != "0"
    s_attn = os.environ.get("SERVING_ATTN", "1") != "0"
    tier_name = " + ".join(n for on, n in [(s_int8, "int8-static"),
                                           (s_gn, "static-GN"),
                                           (s_attn, "bf16-softmax")] if on)

    results = {}
    out_ref = out_serve = None
    if "bf16" in tiers:
        def run_bf16(x):
            out, _ = sample_ddim(model.apply, params, x, scheduler=scheduler,
                                 num_inference_steps=steps)
            return out

        sps, dt, out_ref = _timed(run_bf16, x0, x1, batch, "ddim bf16")
        results["bf16"] = {"tier": "bf16", "sps": round(sps, 3)}
    if "serving" in tiers:
        sample = make_serving_sampler_ddim(
            cfg, params, scheduler, steps, conv_int8=s_int8, static_gn=s_gn,
            attn_softmax_dtype="bfloat16" if s_attn else None)
        sps, dt, out_serve = _timed(sample, x0, x1, batch, "ddim serving")
        r = {"tier": tier_name, "sps": round(sps, 3)}
        if out_ref is not None:
            s, p = _fidelity(out_serve, out_ref)
            r.update(ssim=round(s, 4), psnr_db=round(p, 2),
                     gate="pass" if s >= GATE_SSIM and p >= GATE_PSNR
                     else "fail")
        results["serving"] = r
    if "cached" in tiers:
        ref = out_serve if out_serve is not None else out_ref
        for iv in cache_ivs:
            sample_c = make_serving_sampler_ddim(
                cfg, params, scheduler, steps, conv_int8=s_int8,
                static_gn=s_gn,
                attn_softmax_dtype="bfloat16" if s_attn else None,
                cache_interval=iv)
            sps, dt, out_c = _timed(sample_c, x0, x1, batch,
                                    f"ddim cached(i={iv})")
            results[f"cached_i{iv}"] = _gated(
                {"tier": f"serving + cached(i={iv})", "sps": round(sps, 3)},
                out_c, ref)
    return _report("ddim", f"DDIM-BN res{res}", results, batch, steps)


def leg_superres(batch, steps, res, tiers, cache_ivs):
    """BASELINE #4: conditional super-res sampling (reference
    iadb_bn.py:566-684 at scripts/sampling/iadb_church_superres_test.sh).
    r4: the cached chain threads x_c, so the feature-reuse tier applies."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.samplers.iadb import sample_iadb
    from bndm_tpu.serving import make_serving_sampler
    from bndm_tpu.utils.image import superres_condition

    gp = (0.2, 0.0, 3.0)  # sigmoid tau=0.2 (the script's BN run)
    cfg = unet_config_for_res(res, in_channels=6, out_channels=6,
                              dtype="bfloat16", norm_dtype="bfloat16")
    model = UNet2D(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 6, res, res), jnp.float32),
                        jnp.zeros((1,)))
    # conditioning: bilinear down-x4-then-up of a random image batch
    # (iadb_bn.py:624-626) — content doesn't matter for throughput
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (batch, 3, res, res),
                              jnp.float32) * 2 - 1
    x_c = superres_condition(imgs, downscale=4)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res),
                           jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)

    def sampler(m):
        def run(p):
            def go(x):
                out, _ = sample_iadb(
                    m.apply, p, x, nb_steps=steps, scheduler_gamma="sigmoid",
                    gamma_params=gp, two_head=True, x_c=x_c)
                return out
            return go
        return run

    results = {}
    out_ref = None
    if "bf16" in tiers:
        sps, dt, out_ref = _timed(sampler(model)(params), x0, x1, batch,
                                  "superres bf16")
        results["bf16"] = {"tier": "bf16", "sps": round(sps, 3)}

    def make_tier(iv):
        return make_serving_sampler(
            cfg, params, steps, conv_int8=True, static_gn=True,
            attn_softmax_dtype="bfloat16", scheduler_gamma="sigmoid",
            gamma_params=gp, two_head=True, x_c=x_c, cache_interval=iv)

    out_serve = None
    if "serving" in tiers:
        sps, dt, out_serve = _timed(make_tier(None), x0, x1, batch,
                                    "superres serving")
        results["serving"] = _gated(
            {"tier": "int8-static + static-GN + bf16-softmax",
             "sps": round(sps, 3)}, out_serve, out_ref)
    if "cached" in tiers:
        ref = out_serve if out_serve is not None else out_ref
        for iv in cache_ivs:
            sps, dt, out_c = _timed(make_tier(iv), x0, x1, batch,
                                    f"superres cached(i={iv})")
            results[f"cached_i{iv}"] = _gated(
                {"tier": f"serving + cached(i={iv})", "sps": round(sps, 3)},
                out_c, ref)
    return _report("superres", f"IADB super-res conditional res{res}",
                   results, batch, steps)


def leg_latent(batch, steps, res, tiers, cache_ivs):
    """BASELINE #5: latent IADB-BN sampling at 512^2 incl. the VAE decode at
    t=0 (reference latent_...:472-574; linear alpha=gamma=t/T :602-604)."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.models.vae import AutoencoderKL, VAEConfig, make_decoder
    from bndm_tpu.serving import make_serving_sampler

    lat = res // 8  # 512 -> 64 latents (SD VAE x8)
    # 256^2 pixels -> 32^2 latents use the reference's small 3-block config
    # (latent_...:348-354), keyed "latent32" in unet_config_for_res
    cfg = unet_config_for_res("latent32" if lat == 32 else lat,
                              in_channels=4, out_channels=8,
                              dtype="bfloat16", norm_dtype="bfloat16")
    model = UNet2D(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, lat, lat), jnp.float32),
                        jnp.zeros((1,)))
    vae = AutoencoderKL(VAEConfig(dtype="bfloat16"))
    vae_params = vae.init(jax.random.PRNGKey(4),
                          jnp.zeros((1, 3, res, res), jnp.float32))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, lat, lat),
                           jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)

    # microbatched decode (lax.map over chunks of 10): the full-batch bs=50
    # 512^2 decode allocates 2 x 6.25 GB bf16 temps and OOMs v5e HBM at
    # compile time (measured r4) — models/vae.py::make_decoder
    decode = make_decoder(vae, int(os.environ.get("DECODE_MB", "10")))

    results = {}
    out_ref = None

    def with_decode(sample_latents):
        def run(x):
            return decode(vae_params, sample_latents(x))
        return run

    def make_tier(conv_int8, static_gn, attn, iv):
        sample = make_serving_sampler(
            cfg, params, steps, conv_int8=conv_int8, static_gn=static_gn,
            attn_softmax_dtype=attn, cache_interval=iv, two_head=True)
        return with_decode(sample)

    if "bf16" in tiers:
        sps, dt, out_ref = _timed(
            make_tier(False, False, None, None), x0, x1, batch,
            "latent bf16 (+VAE decode)")
        results["bf16"] = {"tier": "bf16", "sps": round(sps, 3)}
    out_serve = None
    if "serving" in tiers:
        sps, dt, out_serve = _timed(
            make_tier(True, True, "bfloat16", None), x0, x1, batch,
            "latent serving (+VAE decode)")
        results["serving"] = _gated(
            {"tier": "int8-static + static-GN + bf16-softmax",
             "sps": round(sps, 3)}, out_serve, out_ref)
    if "cached" in tiers:
        ref = out_serve if out_serve is not None else out_ref
        for iv in cache_ivs:
            sps, dt, out_c = _timed(
                make_tier(True, True, "bfloat16", iv), x0, x1, batch,
                f"latent cached(i={iv}) (+VAE decode)")
            results[f"cached_i{iv}"] = _gated(
                {"tier": f"serving + cached(i={iv})", "sps": round(sps, 3)},
                out_c, ref)
    return _report("latent", f"latent IADB-BN {res}^2 incl. VAE decode",
                   results, batch, steps)


DEFAULTS = {  # (batch, steps, res) per reference sampling script
    "ddim": (500, 250, 64),
    "superres": (200, 250, 128),
    "latent": (50, 250, 512),
}
# per-leg feature-reuse interval when CACHE_INTERVAL is unset — the r5
# measured knees (BASELINE_LEGS.json): DDIM i=8 (37.5 dB, 2.5 dB margin;
# i=10 FAILS at 34.08 so the knee is sharp), superres/latent i=12 (the
# ladder saturates there with >40 dB margin)
DEFAULT_IV = {"ddim": 8, "superres": 12, "latent": 12}


def main():
    import jax

    _setup_compile_cache()
    legs = os.environ.get("LEGS", "ddim,superres,latent").split(",")
    tiers = os.environ.get("TIERS", "bf16,serving").split(",")
    env_iv = os.environ.get("CACHE_INTERVAL")
    env_ivs = os.environ.get("CACHE_INTERVALS")
    override = [int(a) for a in sys.argv[1:]]
    summary = {}
    for leg in legs:
        leg = leg.strip()
        batch, steps, res = override or DEFAULTS[leg]
        if env_ivs:
            cache_ivs = [int(v) for v in env_ivs.split(",")]
        else:
            cache_ivs = [int(env_iv) if env_iv else DEFAULT_IV[leg]]
        fn = {"ddim": leg_ddim, "superres": leg_superres,
              "latent": leg_latent}[leg]
        try:
            best = fn(batch, steps, res, tiers, cache_ivs)
            summary[leg] = {"sps": best["sps"], "tier": best["tier"]}
        except Exception as e:  # noqa: BLE001 — later legs still run
            print(f"{leg} leg failed: {e}", flush=True)
            summary[leg] = {"error": str(e)}
    print(json.dumps({
        "metric": "BASELINE configs #3-#5 measured throughput",
        "value": None,
        "unit": "samples/s/chip",
        "extra": {"summary": summary, "device": str(jax.devices()[0])},
    }), flush=True)


if __name__ == "__main__":
    main()
