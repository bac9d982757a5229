"""End-to-end int8 sampling measurement: the headline bench config
(IADB-BN res64, 250 steps, bs=500, 113.7M UNet) with conv_int8=True.

Not wired into bench.py (sample quality vs the paper's figures is not yet
validated); records the experimental speedup for PARITY.md. Expect a long
first compile — it is a new program, not covered by the bf16 cache entry.
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

    _setup_compile_cache()
    cfg = unet_config_for_res(res, in_channels=3, out_channels=6, dtype="bfloat16",
                              norm_dtype="bfloat16", conv_int8=True)
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

    t0 = time.perf_counter()
    _fetch(run(params, x0))  # compile + warmup
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", flush=True)
    x1 = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.float32)
    t0 = time.perf_counter()
    _fetch(run(params, x1))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "samples/sec/chip (IADB-BN res64, 250 steps, bs=500, conv_int8)",
        "value": round(batch / dt, 3),
        "unit": "samples/s/chip",
        "extra": {"sample_batch_seconds": round(dt, 3),
                  "per_unet_step_ms": round(dt / steps * 1e3, 3),
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
