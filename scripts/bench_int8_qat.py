"""Wide int8 site policy + QAT follow-up (VERDICT r2 next #2).

r2 chose the int8 site policy by profile: resnet conv1/conv2 + upsamplers
int8; shortcut/conv_in/downsamplers fp, because their activation-quantize
passes cost more HBM traffic than the small convs save. This script MEASURES
that claim with static scales instead of trusting the analysis:

  1. int8-static baseline (narrow policy — the shipped serving path)
  2. int8-static WIDE (shortcut + downsamplers + conv_in also W8A8,
     UNet2DConfig.int8_wide): throughput + fidelity vs bf16 on identical x0
  3. QAT leg — only reached if wide WINS throughput but FAILS the fidelity
     gate (SSIM >= 0.99, PSNR >= 35 dB), since QAT exists to claw back
     fidelity, not speed (ops/int8.py int8_conv is STE-differentiable, so
     training with conv_int8 IS quantization-aware). Runs a short fine-tune
     of the 113M UNet with the wide dynamic-int8 forward, recalibrates
     static scales, and re-measures the int8<->bf16 gap with the tuned
     params. QAT=1 forces this leg for demonstration.

Outcome either way is recorded in PARITY.md §6.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402


def main(batch=500, steps=250, res=64, calib_batch=8, qat_steps=20):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.ops.int8 import calibrate_sampling
    from bndm_tpu.samplers.iadb import sample_iadb
    from bndm_tpu.utils.metrics import psnr, ssim

    _setup_compile_cache()
    common = dict(in_channels=3, out_channels=6, dtype="bfloat16",
                  norm_dtype="bfloat16", conv_int8=True)
    cfg_sta = unet_config_for_res(res, **common, int8_mode="static")
    m_f = UNet2D(unet_config_for_res(res, in_channels=3, out_channels=6,
                                     dtype="bfloat16", norm_dtype="bfloat16"))
    m_sta = UNet2D(cfg_sta)
    m_cal = UNet2D(dataclasses.replace(cfg_sta, int8_mode="calibrate"))
    m_staw = UNet2D(dataclasses.replace(cfg_sta, int8_wide=True))
    m_calw = UNet2D(dataclasses.replace(cfg_sta, int8_mode="calibrate",
                                       int8_wide=True))
    params = m_f.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, res, res), jnp.float32),
        jnp.zeros((1,)))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, res, res),
                           jnp.float32)
    kw = dict(nb_steps=steps, scheduler_gamma="sigmoid",
              gamma_params=(1000.0, 0.0, 3.0), two_head=True)
    ckw = dict(scheduler_gamma="sigmoid", gamma_params=(1000.0, 0.0, 3.0),
               two_head=True)

    # warm on x0, time AND compare on a fresh x1 (measurement rule #2,
    # docs/PERFORMANCE.md); all legs use the same x1 so identical-x0 holds
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)

    def timed(apply_fn, p, label):
        out, _ = sample_iadb(apply_fn, p, x0, **kw)
        _fetch(out)  # compile + warmup
        t0 = time.perf_counter()
        out, _ = sample_iadb(apply_fn, p, x1, **kw)
        _fetch(out)
        dt = time.perf_counter() - t0
        print(f"{label}: {batch/dt:.2f} samples/s ({dt:.2f}s)", flush=True)
        return out, dt

    def gap(out_q, out_f):
        a = jnp.clip((out_f + 1) / 2, 0, 1)
        b = jnp.clip((out_q + 1) / 2, 0, 1)
        return (float(jnp.mean(ssim(b, a))), float(jnp.mean(psnr(b, a))))

    def serve(pp, m_c, m_s, label):
        quant = calibrate_sampling(m_c, pp, x0[:calib_batch], steps, **ckw)
        return timed(m_s.apply, {"params": pp.get("params", pp),
                                 "quant": quant}, label)

    out_f, _ = timed(m_f.apply, params, "bf16")
    out_n, dt_n = serve(params, m_cal, m_sta, "int8-static narrow")
    out_w, dt_w = serve(params, m_calw, m_staw, "int8-static WIDE")
    ssim_n, psnr_n = gap(out_n, out_f)
    ssim_w, psnr_w = gap(out_w, out_f)
    print(f"narrow fidelity vs bf16: SSIM {ssim_n:.4f} PSNR {psnr_n:.1f} dB",
          flush=True)
    print(f"wide fidelity vs bf16:   SSIM {ssim_w:.4f} PSNR {psnr_w:.1f} dB",
          flush=True)

    wide_wins_speed = dt_w < dt_n
    wide_fidelity_ok = ssim_w >= 0.99 and psnr_w >= 35.0
    qat = {}
    if os.environ.get("QAT", "0") == "1" or (wide_wins_speed
                                             and not wide_fidelity_ok):
        # QAT: short fine-tune with the wide dynamic-int8 forward (STE bwd)
        from bndm_tpu.train.pixel import PixelTrainer, TrainConfig
        import numpy as np

        rng = np.random.default_rng(7)
        n = 4096
        L = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.01)
        np.fill_diagonal(L, 1.0)
        tcfg = TrainConfig(nb_steps=1000, noise_type="gaussianBN",
                           scheduler_gamma="sigmoid",
                           gamma_defaults=(1000.0, 0.0, 3.0), out_channel=6,
                           lr=1e-5, grad_clip=1.0)
        m_qat = UNet2D(dataclasses.replace(cfg_sta, int8_mode="dynamic",
                                           int8_wide=True))
        tr = PixelTrainer(m_qat, tcfg, L, jax.random.PRNGKey(2),
                          params=params)
        batch01 = jax.random.uniform(jax.random.PRNGKey(3), (64, 3, res, res))
        t0 = time.perf_counter()
        for i in range(qat_steps):
            m = tr.step(batch01, jax.random.PRNGKey(10 + i))
        _fetch(m["loss"])
        print(f"QAT fine-tune: {qat_steps} steps in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        # one host fetch of the 113M tree (dict.get's default arg is eager —
        # inlining device_get twice would transfer ~450 MB over the relay twice)
        host_params = jax.device_get(tr.state.params)
        p_qat = {"params": host_params.get("params", host_params)}
        out_fq, _ = timed(m_f.apply, p_qat, "bf16 (post-QAT params)")
        out_wq, dt_wq = serve(p_qat, m_calw, m_staw,
                              "int8-static WIDE (post-QAT)")
        ssim_q, psnr_q = gap(out_wq, out_fq)
        print(f"post-QAT wide fidelity: SSIM {ssim_q:.4f} PSNR {psnr_q:.1f}",
              flush=True)
        qat = {"qat_steps": qat_steps, "post_qat_wide_ssim": round(ssim_q, 4),
               "post_qat_wide_psnr_db": round(psnr_q, 2),
               "post_qat_wide_sps": round(batch / dt_wq, 3)}

    print(json.dumps({
        "metric": "int8 WIDE site policy vs narrow (static scales)",
        "value": round(batch / dt_w, 3),
        "unit": "samples/s/chip",
        "extra": {
            "narrow_sps": round(batch / dt_n, 3),
            "wide_vs_narrow": round(dt_n / dt_w, 3),
            "narrow_ssim_vs_bf16": round(ssim_n, 4),
            "wide_ssim_vs_bf16": round(ssim_w, 4),
            "narrow_psnr_db": round(psnr_n, 2),
            "wide_psnr_db": round(psnr_w, 2),
            "verdict": ("wide wins" if wide_wins_speed and wide_fidelity_ok
                        else "narrow stays (r2 policy confirmed)"),
            **qat,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    # optional size overrides for smoke runs: batch steps res calib qat_steps
    main(*map(int, sys.argv[1:]))
