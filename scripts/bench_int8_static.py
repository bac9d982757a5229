"""Static-scale (calibrated) int8 sampling: the VERDICT-r1 follow-up to the
dynamic-quant negative result.

Flow (headline config: IADB-BN res64, 250 steps, bs=500, 113.7M UNet):
  1. bf16 baseline sampling (timing + reference output)
  2. calibration: one exact fp32-conv trajectory at small batch records each
     conv site's activation amax (ops/int8.py::calibrate_sampling)
  3. static-int8 sampling with the calibrated constant scales — the per-call
     activation amax reduction of the dynamic path is gone; quantize fuses
     into the preceding GN/SiLU, weight quant is hoisted out of the scan
  4. numerical fidelity of the int8 output vs bf16 on the SAME x0
     (SSIM / PSNR / max|delta| on [0,1] images)

Decision rule (VERDICT r1 #2): static int8 joins the headline path only if
it clears >= 1.2x bf16 end-to-end; otherwise the negative result is recorded
and bf16 stays the default.
"""

import json
import sys
import time

sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402


def main(batch=500, steps=250, res=64, calib_batch=8):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.ops.int8 import calibrate_sampling
    from bndm_tpu.samplers.iadb import sample_iadb
    from bndm_tpu.utils.metrics import psnr, ssim

    _setup_compile_cache()
    common = dict(in_channels=3, out_channels=6, dtype="bfloat16",
                  norm_dtype="bfloat16")
    m_f = UNet2D(unet_config_for_res(res, **common))
    m_cal = UNet2D(unet_config_for_res(res, **common, conv_int8=True,
                                       int8_mode="calibrate"))
    m_sta = UNet2D(unet_config_for_res(res, **common, conv_int8=True,
                                       int8_mode="static"))
    params = m_f.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res), jnp.float32), jnp.zeros((1,))
    )
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res), jnp.float32)
    kw = dict(nb_steps=steps, scheduler_gamma="sigmoid",
              gamma_params=(1000.0, 0.0, 3.0), two_head=True)

    def run(apply_fn, p, x):
        out, _ = sample_iadb(apply_fn, p, x, **kw)
        return out

    # warm on x0, time AND compare on a fresh x1 (measurement rule #2,
    # docs/PERFORMANCE.md); both legs use the same x1 so identical-x0 holds
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)

    # 1. bf16 baseline
    out_f = run(m_f.apply, params, x0)
    _fetch(out_f)
    t0 = time.perf_counter()
    out_f = run(m_f.apply, params, x1)
    _fetch(out_f)
    dt_f = time.perf_counter() - t0
    print(f"bf16: {batch/dt_f:.2f} samples/s ({dt_f:.2f}s)", flush=True)

    # 2. calibrate at small batch (one exact trajectory)
    t0 = time.perf_counter()
    quant = calibrate_sampling(
        m_cal, params, x0[:calib_batch], steps,
        scheduler_gamma="sigmoid", gamma_params=(1000.0, 0.0, 3.0), two_head=True)
    print(f"calibration: {time.perf_counter()-t0:.1f}s "
          f"({len(jax.tree_util.tree_leaves(quant))} conv sites)", flush=True)

    # 3. static int8 sampling
    p_sta = {"params": params["params"], "quant": quant}
    t0 = time.perf_counter()
    out_q = run(m_sta.apply, p_sta, x0)
    _fetch(out_q)
    print(f"int8-static compile+warmup: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out_q = run(m_sta.apply, p_sta, x1)
    _fetch(out_q)
    dt_q = time.perf_counter() - t0
    print(f"int8-static: {batch/dt_q:.2f} samples/s ({dt_q:.2f}s)", flush=True)

    # 4. fidelity vs bf16 on identical x0
    f01 = jnp.clip((out_f + 1) / 2, 0, 1)
    q01 = jnp.clip((out_q + 1) / 2, 0, 1)
    ssim_v = float(jnp.mean(ssim(q01, f01)))
    psnr_v = float(jnp.mean(psnr(q01, f01)))
    maxd = float(jnp.max(jnp.abs(out_q - out_f)))

    print(json.dumps({
        "metric": "samples/sec/chip (IADB-BN res64, 250 steps, bs=500, int8-static)",
        "value": round(batch / dt_q, 3),
        "unit": "samples/s/chip",
        "extra": {
            "bf16_sps": round(batch / dt_f, 3),
            "speedup_vs_bf16": round(dt_f / dt_q, 3),
            "per_unet_step_ms": round(dt_q / steps * 1e3, 3),
            "fidelity_ssim_vs_bf16": round(ssim_v, 4),
            "fidelity_psnr_vs_bf16": round(psnr_v, 2),
            "max_abs_delta": round(maxd, 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
