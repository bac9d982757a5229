"""Feature-reuse (block-caching) serving experiment, cf. "Cache Me if You
Can" (arXiv:2312.03209) / DeepCache — the r3 algorithmic lever: the roofline
audit (docs/PERFORMANCE.md) shows the per-step kernels at 70-96% of their
HBM/MXU bounds, so the remaining wins must SKIP work, not schedule it better.

Flow (headline config: IADB-BN res64, 250 steps, bs=500, 113.7M UNet):
  1. baseline: the fastest uncached tier (int8-static + static-GN +
     bf16-softmax) via make_serving_sampler — the 21.8 samples/s path
  2. cached tiers: cache_interval in {2, 3} — every interval-th step runs
     the full UNet and captures the trunk output (UNet2D return_deep); the
     steps between recompute only the outer cfg.cache_depth shell around it
     (samplers.iadb.sample_iadb_cached, one lax.scan, no lax.cond)
  3. fidelity vs the uncached output on identical x0 (SSIM / PSNR /
     max|delta|) — the same gate as the int8 / static-GN / bf16-softmax tiers

Decision rule: a cached tier joins the serving ladder only if it beats the
uncached throughput AND holds SSIM >= 0.99 / PSNR >= 35 dB; otherwise the
negative result is recorded in PARITY.md with the numbers.

Shell-cost estimate (res64, 6 levels, cache_depth=1): conv FLOPs per level
scale as H*W*C^2 -> down0+up5 (the 64x64, 128-ch shell) is ~55-60% of the
step, so interval-2 projects to ~1.2x if fidelity holds. The deep feature at
bs=500 is (500, 64, 64, 128) bf16 = 524 MB — inside the bs=500 headroom.

Env: CACHE_INTERVALS="2,3" (comma list), CACHE_DEPTH=1.
Args: batch steps res [calib_batch] for smoke runs.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402


def main(batch=500, steps=250, res=64, calib_batch=8):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import unet_config_for_res
    from bndm_tpu.serving import make_serving_sampler
    from bndm_tpu.utils.metrics import psnr, ssim

    _setup_compile_cache()
    depth = int(os.environ.get("CACHE_DEPTH", "1"))
    intervals = [int(s) for s in
                 os.environ.get("CACHE_INTERVALS", "2,3").split(",")]

    cfg = dataclasses.replace(
        unet_config_for_res(res, out_channels=6, dtype="bfloat16",
                            norm_dtype="bfloat16"),
        cache_depth=depth)
    from bndm_tpu.models.unet2d import UNet2D
    params = UNet2D(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res), jnp.float32),
        jnp.zeros((1,)))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res),
                           jnp.float32)
    # measurement rule #2 (docs/PERFORMANCE.md): warm on x0, time on a fresh
    # x1; every leg times AND compares fidelity on the same x1.
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)

    def tier(cache_interval, label):
        sample = make_serving_sampler(
            cfg, params, steps, conv_int8=True, static_gn=True,
            attn_softmax_dtype="bfloat16", scheduler_gamma="sigmoid",
            gamma_params=(1000.0, 0.0, 3.0), two_head=True,
            cache_interval=cache_interval, calib_batch=calib_batch)
        t0 = time.perf_counter()
        _fetch(sample(x0))  # calibrate + compile + warmup
        print(f"{label}: calibrate+compile+warm "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        out = sample(x1)
        _fetch(out)
        dt = time.perf_counter() - t0
        print(f"{label}: {batch/dt:.2f} samples/s ({dt:.2f}s)", flush=True)
        return out, dt

    out_b, dt_b = tier(None, "uncached (int8+staticGN+bf16sm)")
    a = jnp.clip((out_b + 1) / 2, 0, 1)

    extra = {"uncached_sps": round(batch / dt_b, 3), "cache_depth": depth,
             "device": str(jax.devices()[0])}
    best = (batch / dt_b, "uncached")
    for iv in intervals:
        out_c, dt_c = tier(iv, f"cached interval={iv} depth={depth}")
        b = jnp.clip((out_c + 1) / 2, 0, 1)
        ssim_v = float(jnp.mean(ssim(b, a)))
        psnr_v = float(jnp.mean(psnr(b, a)))
        gate = (dt_b / dt_c > 1.0 and ssim_v >= 0.99 and psnr_v >= 35.0)
        extra[f"interval{iv}"] = {
            "sps": round(batch / dt_c, 3),
            "speedup_vs_uncached": round(dt_b / dt_c, 3),
            "ssim": round(ssim_v, 4),
            "psnr_db": round(psnr_v, 2),
            "max_abs_delta": round(float(jnp.max(jnp.abs(out_c - out_b))), 4),
            "gate": "pass" if gate else "fail",
        }
        print(f"interval={iv}: SSIM {ssim_v:.4f} PSNR {psnr_v:.1f} dB "
              f"gate={'pass' if gate else 'fail'}", flush=True)
        if gate and batch / dt_c > best[0]:
            best = (batch / dt_c, f"interval{iv}")

    print(json.dumps({
        "metric": "feature-reuse (DeepCache) serving vs uncached "
                  "(identical x0)",
        "value": round(best[0], 3),
        "unit": "samples/s/chip",
        "extra": {**extra, "best_tier": best[1]},
    }))


if __name__ == "__main__":
    main(*map(int, sys.argv[1:]))
