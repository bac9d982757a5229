"""Microbench the GN/SiLU elementwise wall found by the r2 xplane profile.

The headline sampling profile attributes ~47% of device time to
GroupNorm-stats / normalize+SiLU fusions — e.g. 6.9 ms per step for a pass
over a bf16 (500,64,64,128) tensor whose pure HBM round-trip is ~1.4 ms.
This script times each candidate culprit in isolation on the real chip so
the kernel strategy (Pallas GN rewrite, MXU-based stats, activation change,
or acceptance) is chosen on evidence.

Each case runs inside a 20-iteration lax.scan (one dispatch, amortized), so
numbers are per-pass device time like inside the sampling scan.
"""

import sys
import time

sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402


def main(shape=(500, 64, 64, 128), inner=20):
    import jax
    import jax.numpy as jnp

    _setup_compile_cache()
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32).astype(jnp.bfloat16)
    scale = jnp.ones((shape[-1],), jnp.float32)
    bias = jnp.zeros((shape[-1],), jnp.float32)
    gbytes = x.size * 2 / 1e9

    import flax.linen as nn

    gn = nn.GroupNorm(32, epsilon=1e-5, dtype=jnp.bfloat16)
    gn_params = gn.init(jax.random.PRNGKey(1), x)

    def case_copy(y):
        return y + jnp.bfloat16(1.0)

    def case_affine(y):
        return y * scale.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)

    def case_silu(y):
        return jax.nn.silu(y)

    def case_sigmoid(y):
        return jax.nn.sigmoid(y)

    def case_tanh(y):
        return jnp.tanh(y)

    def case_exp(y):
        return jnp.exp(y)

    def case_silu_fp32(y):
        return jax.nn.silu(y.astype(jnp.float32)).astype(jnp.bfloat16)

    def case_stats_only(y):
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(1, 2))
        s2 = jnp.sum(yf * yf, axis=(1, 2))
        return y + (s1[:, None, None, :] * 0 + s2[:, None, None, :] * 0).astype(y.dtype)

    def case_gn(y):
        return gn.apply(gn_params, y)

    def case_gn_silu(y):
        return jax.nn.silu(gn.apply(gn_params, y))

    def pallas_copy(y):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        b, h, w, c = y.shape

        def kern(i_ref, o_ref):
            o_ref[:, :, :, :] = i_ref[:, :, :, :] + jnp.bfloat16(1.0)

        tb = 2  # 2 * 64*64*128 * 2B = 2 MB per block (x2 in/out, x2 dbl-buf)
        return pl.pallas_call(
            kern,
            grid=(b // tb,),
            in_specs=[pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        )(y)

    cases = [
        ("copy(+1)", case_copy),
        ("affine(scale,bias)", case_affine),
        ("silu bf16", case_silu),
        ("silu fp32", case_silu_fp32),
        ("sigmoid", case_sigmoid),
        ("tanh", case_tanh),
        ("exp", case_exp),
        ("gn_stats_vpu(fp32 sums)", case_stats_only),
        ("flax GroupNorm", case_gn),
        ("flax GroupNorm+silu", case_gn_silu),
        ("pallas copy(+1)", pallas_copy),
    ]

    # fp32 variant of the copy: is the (2,1) bf16 packing the bottleneck?
    xf = x.astype(jnp.float32)

    @jax.jit
    def run_f32(x0):
        def body(carry, _):
            return carry + jnp.float32(1.0), None

        out, _ = jax.lax.scan(body, x0, None, length=inner)
        return out

    _fetch(run_f32(xf))
    t0 = time.perf_counter()
    _fetch(run_f32(xf))
    dt = (time.perf_counter() - t0) / inner
    print(f"{'copy(+1) fp32':28s} {dt*1e3:8.3f} ms/pass  "
          f"({2*2*gbytes/dt:6.0f} GB/s r+w equiv)", flush=True)

    for name, fn in cases:
        @jax.jit
        def run(x0, fn=fn):
            def body(carry, _):
                return fn(carry), None

            out, _ = jax.lax.scan(body, x0, None, length=inner)
            return out

        _fetch(run(x))
        t0 = time.perf_counter()
        _fetch(run(x))
        dt = (time.perf_counter() - t0) / inner
        print(f"{name:28s} {dt*1e3:8.3f} ms/pass  "
              f"({2*gbytes/dt:6.0f} GB/s r+w equiv)", flush=True)


if __name__ == "__main__":
    main()
