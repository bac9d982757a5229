"""Microbenchmark: bf16 vs W8A8 int8 conv stack on the real TPU.

Measures the int8-MXU speedup claim behind UNet2DConfig.conv_int8 on a
stack shaped like the UNet's hot convs (3x3, 256ch, 16^2..64^2 maps)
without paying the full 113M-UNet remote compile. Run on a TPU host:

    python scripts/bench_int8_tpu.py [batch]

Prints ms/iter and the int8:bf16 ratio. (Timing rule from CLAUDE.md: force
a host fetch — block_until_ready may return early through the axon relay.)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bndm_tpu.ops.int8 import int8_conv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
C, H, LAYERS, ITERS = 256, 32, 8, 20


def main():
    print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, C)).astype(np.float32))
    ws = [jnp.asarray((rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32))
          for _ in range(LAYERS)]

    @jax.jit
    def stack_bf16(x, ws):
        h = x.astype(jnp.bfloat16)
        for w in ws:
            h = jax.lax.conv_general_dilated(
                h, w.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.silu(h)
        return jnp.sum(h.astype(jnp.float32))

    @jax.jit
    def stack_int8(x, ws):
        # inter-layer activations in bf16, as Int8Conv returns in the model
        h = x.astype(jnp.bfloat16)
        for w in ws:
            h = int8_conv(h, w).astype(jnp.bfloat16)
            h = jax.nn.silu(h)
        return jnp.sum(h.astype(jnp.float32))

    flops = 2 * B * H * H * C * C * 9 * LAYERS

    for name, fn in [("bf16", stack_bf16), ("int8", stack_int8)]:
        float(fn(x, ws))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(x, ws)
        float(out)  # host fetch forces completion
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt * 1e3:8.2f} ms/iter  {flops / dt / 1e12:6.1f} TOP/s")
        if name == "bf16":
            bf16_dt = dt
    print(f"int8 speedup vs bf16: {bf16_dt / dt:.2f}x")


if __name__ == "__main__":
    main()
