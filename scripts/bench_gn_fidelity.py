"""Quantify the bf16-GroupNorm relaxation in the bench headline (VERDICT r2
weak #7).

bench.py's headline config runs GroupNorm in bf16 (norm_dtype="bfloat16",
+8% step time if fp32) while the model default keeps fp32 GN for diffusers
parity — but the fidelity of that relaxation was never measured the way the
int8 path's was. This script samples identical x0 through the SAME params
with fp32-GN vs bf16-GN (both bf16 compute elsewhere) and reports
SSIM / PSNR / max|delta| plus both throughputs — the exact gate
scripts/bench_int8_static.py applies to int8.

Result is recorded in PARITY.md §6.
"""

import json
import sys
import time

sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402


def main(batch=500, steps=250, res=64):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.samplers.iadb import sample_iadb
    from bndm_tpu.utils.metrics import psnr, ssim

    _setup_compile_cache()
    m32 = UNet2D(unet_config_for_res(res, 3, 6, dtype="bfloat16",
                                     norm_dtype="float32"))
    m16 = UNet2D(unet_config_for_res(res, 3, 6, dtype="bfloat16",
                                     norm_dtype="bfloat16"))
    params = m32.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res), jnp.float32),
        jnp.zeros((1,)))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res),
                           jnp.float32)
    kw = dict(nb_steps=steps, scheduler_gamma="sigmoid",
              gamma_params=(1000.0, 0.0, 3.0), two_head=True)

    # warm on x0, time AND compare on a fresh x1 (measurement rule #2,
    # docs/PERFORMANCE.md: re-timing the warmup input risks relay-side
    # result caching); both legs use the same x1 so identical-x0 holds
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)

    def timed(apply_fn, label):
        out, _ = sample_iadb(apply_fn, params, x0, **kw)
        _fetch(out)  # compile + warmup
        t0 = time.perf_counter()
        out, _ = sample_iadb(apply_fn, params, x1, **kw)
        _fetch(out)
        dt = time.perf_counter() - t0
        print(f"{label}: {batch/dt:.2f} samples/s ({dt:.2f}s)", flush=True)
        return out, dt

    out32, dt32 = timed(m32.apply, "fp32-GN")
    out16, dt16 = timed(m16.apply, "bf16-GN")

    a = jnp.clip((out32 + 1) / 2, 0, 1)
    b = jnp.clip((out16 + 1) / 2, 0, 1)
    print(json.dumps({
        "metric": "bf16-GN vs fp32-GN sampling fidelity (identical x0)",
        "value": round(float(jnp.mean(ssim(b, a))), 4),
        "unit": "SSIM",
        "extra": {
            "psnr_db": round(float(jnp.mean(psnr(b, a))), 2),
            "max_abs_delta": round(float(jnp.max(jnp.abs(out16 - out32))), 4),
            "fp32_gn_sps": round(batch / dt32, 3),
            "bf16_gn_sps": round(batch / dt16, 3),
            "bf16_gn_speedup": round(dt32 / dt16, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    # optional size overrides for smoke runs: batch steps res
    main(*map(int, sys.argv[1:]))
