"""DDIM static-GN rescue sweep (r5, VERDICT r4 #4).

The r4 measurement: the full serving stack (int8-static + static-GN +
bf16-softmax) FAILS the DDIM fidelity gate — SSIM 0.9986 / PSNR 32.5 dB < 35
vs bf16 on identical x0 (PARITY.md §6; reference workload
ddim_diffusers.py:624-712, scripts/sampling/church_res64_test.sh). Diagnosis:
DDIM's 1000-T trajectories drift more per scan position than IADB's 250
float-alpha ones, so the per-(site, step) GN tables — batch means recorded on
ONE 8-sample calibration trajectory — mis-normalize.

Two levers, both table-side only (the serving program never changes, so one
compile covers the whole sweep):
  1. neighbor-window smoothing of the calibrated tables along the step axis
     (ops/static_norm.py::smooth_gn_tables), window in GN_WINDOWS
  2. a larger calibration batch (CALIB_BATCHES), cutting estimator variance

Each variant samples the identical x1 through the SAME compiled static-GN
serving program with different table values, gated SSIM>=0.99 / PSNR>=35 dB
vs the bf16 parity output. A passing variant would re-enable the +~1.1x
static-GN tier for DDIM (make_serving_sampler_ddim(gn_smooth_window=...));
an all-fail records the negative WITH the smoothed variants measured.

Env: GN_WINDOWS (default "1,3,5,9,17"), CALIB_BATCHES (default "8,64"),
BATCH/STEPS/RES overrides for smoke runs.
One JSON line per variant + a summary line (capture-proof).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402

BATCH = int(os.environ.get("BATCH", "500"))
STEPS = int(os.environ.get("STEPS", "250"))
RES = int(os.environ.get("RES", "64"))
WINDOWS = [int(w) for w in os.environ.get("GN_WINDOWS", "1,3,5,9,17").split(",")]
CALIBS = [int(c) for c in os.environ.get("CALIB_BATCHES", "8,64").split(",")]
GATE_SSIM, GATE_PSNR = 0.99, 35.0


def main():
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import unet_config_for_res
    from bndm_tpu.ops.int8 import calibrate_sampling_ddim
    from bndm_tpu.ops.static_norm import smooth_gn_tables
    from bndm_tpu.samplers.ddim import DDIMScheduler, sample_ddim
    from bndm_tpu.serving import serving_model_pair
    from bndm_tpu.utils.metrics import psnr, ssim

    _setup_compile_cache()
    cfg = unet_config_for_res(RES, in_channels=3, out_channels=3,
                              dtype="bfloat16", norm_dtype="bfloat16")
    m_cal, m_serve = serving_model_pair(
        cfg, conv_int8=True, int8_static=True, static_gn=True,
        gn_steps=STEPS, relax_kw={"attn_softmax_dtype": "bfloat16"})
    _, m_bf16 = serving_model_pair(cfg)
    params = m_bf16.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 3, RES, RES), jnp.float32),
                         jnp.zeros((1,)))["params"]
    scheduler = DDIMScheduler()
    x1 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 3, RES, RES),
                           jnp.float32)

    def run(model, p, pass_idx):
        out, _ = sample_ddim(model.apply, p, x1, scheduler=scheduler,
                             num_inference_steps=STEPS,
                             pass_step_idx=pass_idx)
        return out

    t0 = time.perf_counter()
    out_ref = run(m_bf16, {"params": params}, False)
    _fetch(out_ref)
    print(f"bf16 reference: {time.perf_counter() - t0:.1f}s", flush=True)
    ref01 = jnp.clip((out_ref + 1) / 2, 0, 1)

    def fidelity(out):
        o = jnp.clip((out + 1) / 2, 0, 1)
        return float(jnp.mean(ssim(o, ref01))), float(jnp.mean(psnr(o, ref01)))

    results = {}
    best = None
    for cb in CALIBS:
        x_cal = jax.random.normal(jax.random.PRNGKey(7), (cb, 3, RES, RES),
                                  jnp.float32)
        t0 = time.perf_counter()
        quant_raw = calibrate_sampling_ddim(m_cal, params, x_cal, scheduler,
                                            STEPS)
        print(f"calibrated (batch {cb}): {time.perf_counter() - t0:.1f}s",
              flush=True)
        for w in WINDOWS:
            quant = smooth_gn_tables(quant_raw, w)
            p = {"params": params, "quant": quant}
            t0 = time.perf_counter()
            out = run(m_serve, p, True)
            s, pnr = fidelity(out)
            dt = time.perf_counter() - t0
            gate = s >= GATE_SSIM and pnr >= GATE_PSNR
            r = {"calib_batch": cb, "window": w, "ssim": round(s, 4),
                 "psnr_db": round(pnr, 2), "gate": "pass" if gate else "fail",
                 "eval_s": round(dt, 1)}
            results[f"cb{cb}_w{w}"] = r
            print(json.dumps(r), flush=True)
            if gate and (best is None or pnr > best["psnr_db"]):
                best = r

    # throughput of the static-GN stack (identical program for every variant)
    _fetch(run(m_serve, {"params": params,
                         "quant": smooth_gn_tables(quant_raw, WINDOWS[-1])},
               True))
    t0 = time.perf_counter()
    _fetch(run(m_serve, {"params": params,
                         "quant": smooth_gn_tables(quant_raw, WINDOWS[-1])},
               True))
    sps = BATCH / (time.perf_counter() - t0)
    print(json.dumps({"summary": "ddim static-GN rescue",
                      "static_gn_stack_sps": round(sps, 2),
                      "best_passing": best, "results": results}), flush=True)


if __name__ == "__main__":
    main()
