"""bf16 sample-buffer carry for the cached chain (r5, VERDICT r4 #5).

The r4 roofline audit of the cached(i=12) serving step (PARITY.md §6) put the
largest single shallow-step cost on a bandwidth-bound shell glue fusion
(conv_in / x-update / concat, 1.6 GB at ~347 GB/s ≈ 4.7 ms/step) — and the x
carry rides through it in fp32. ``carry_dtype="bfloat16"``
(samplers/iadb.py::_cached_chain) halves the carry's bytes: x is stored bf16
between steps while the update arithmetic stays fp32. Each 1 ms saved on the
45 ms shallow step is ~+2% headline — this script measures the delta and
gates fidelity (bf16-carry vs fp32-carry on identical x0, SSIM>=0.99 /
PSNR>=35 dB) at the headline config:
int8-static + static-GN + bf16-softmax, cached(i=CACHE_INTERVAL), bs=BATCH.

Env: BATCH (500), STEPS (250), RES (64), CACHE_INTERVAL (12).
One JSON line per variant + summary (capture-proof).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
from bench import GAMMA, _fetch, _setup_compile_cache  # noqa: E402

BATCH = int(os.environ.get("BATCH", "500"))
STEPS = int(os.environ.get("STEPS", "250"))
RES = int(os.environ.get("RES", "64"))
IV = int(os.environ.get("CACHE_INTERVAL", "12"))


def main():
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.unet2d import unet_config_for_res
    from bndm_tpu.ops.int8 import calibrate_sampling
    from bndm_tpu.samplers.iadb import sample_iadb_cached
    from bndm_tpu.serving import serving_model_pair
    from bndm_tpu.utils.metrics import psnr, ssim

    _setup_compile_cache()
    cfg = unet_config_for_res(RES, in_channels=3, out_channels=6,
                              dtype="bfloat16", norm_dtype="bfloat16")
    m_cal, m_serve = serving_model_pair(
        cfg, conv_int8=True, int8_static=True, static_gn=True,
        gn_steps=STEPS, relax_kw={"attn_softmax_dtype": "bfloat16"})
    params = m_serve.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 3, RES, RES), jnp.float32),
                          jnp.zeros((1,)))["params"]
    x0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 3, RES, RES),
                           jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)

    t0 = time.perf_counter()
    quant = calibrate_sampling(m_cal, params, x0[:8], STEPS, **GAMMA)
    p = {"params": params, "quant": quant}
    print(f"calibration: {time.perf_counter() - t0:.1f}s", flush=True)

    def apply_full(pp, x, t):
        return m_serve.apply(pp, x, t, return_deep=True)

    def apply_shallow(pp, x, t, deep):
        return m_serve.apply(pp, x, t, deep_feature=deep)

    def run(carry, x):
        return sample_iadb_cached(
            apply_full, apply_shallow, p, x, nb_steps=STEPS,
            cache_interval=IV, carry_dtype=carry, **GAMMA)

    results = {}
    outs = {}
    for carry in (None, "bfloat16"):
        label = carry or "float32"
        t0 = time.perf_counter()
        _fetch(run(carry, x0))  # compile + warm
        print(f"{label}: compile+warm {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        out = run(carry, x1)
        _fetch(out)
        dt = time.perf_counter() - t0
        outs[label] = out
        results[label] = {"sps": round(BATCH / dt, 3),
                          "batch_seconds": round(dt, 3)}
        print(json.dumps({label: results[label]}), flush=True)

    a = jnp.clip((outs["float32"] + 1) / 2, 0, 1)
    b = jnp.clip((outs["bfloat16"] + 1) / 2, 0, 1)
    s, pnr = float(jnp.mean(ssim(b, a))), float(jnp.mean(psnr(b, a)))
    speedup = results["bfloat16"]["sps"] / results["float32"]["sps"]
    gate = s >= 0.99 and pnr >= 35.0
    print(json.dumps({
        "summary": f"bf16 carry on cached(i={IV}) headline config",
        "speedup": round(speedup, 4), "ssim": round(s, 4),
        "psnr_db": round(pnr, 2), "gate": "pass" if gate else "fail",
        "results": results}), flush=True)


if __name__ == "__main__":
    main()
