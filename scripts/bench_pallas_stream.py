"""Pallas HBM streaming tuning: how fast can a Pallas kernel move bytes?

Context (r2 profile): the sampling step is HBM-bound around the GroupNorm/
SiLU passes; XLA's fused elementwise passes reach ~250-535 GB/s r+w while a
naive Pallas copy managed only ~207 GB/s. A traffic-optimal Pallas GN+SiLU
only makes sense if Pallas streaming can at least match XLA's — this script
sweeps block shapes / grid semantics and a manual double-buffered DMA
pipeline to find the ceiling.
"""

import functools
import sys
import time

sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _setup_compile_cache()
    # same payload as one res-64 activation tensor, flattened 2-D
    n_rows, n_cols = 500 * 64 * 64 // 8, 8 * 128  # (256000, 1024) bf16
    x = jax.random.normal(jax.random.PRNGKey(0), (n_rows, n_cols),
                          jnp.float32).astype(jnp.bfloat16)
    gbytes = x.size * 2 / 1e9

    def copy_kernel(i_ref, o_ref):
        o_ref[:, :] = i_ref[:, :] + jnp.bfloat16(1.0)

    def variant(rows_per_block, semantics):
        def f(y):
            return pl.pallas_call(
                copy_kernel,
                grid=(n_rows // rows_per_block,),
                in_specs=[pl.BlockSpec((rows_per_block, n_cols),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows_per_block, n_cols),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(semantics,),
                ),
            )(y)
        return f

    # manual double-buffered DMA: inputs stay in HBM (ANY), kernel overlaps
    # chunk DMA-in / compute / DMA-out by hand
    def manual_dma(rows_per_chunk):
        n_chunks = n_rows // rows_per_chunk

        def kern(i_hbm, o_hbm, buf, obuf, isem, osem):
            def get_in(slot, idx):
                return pltpu.make_async_copy(
                    i_hbm.at[pl.ds(idx * rows_per_chunk, rows_per_chunk), :],
                    buf.at[slot], isem.at[slot])

            def put_out(slot, idx):
                return pltpu.make_async_copy(
                    obuf.at[slot],
                    o_hbm.at[pl.ds(idx * rows_per_chunk, rows_per_chunk), :],
                    osem.at[slot])

            get_in(0, 0).start()

            def body(i, _):
                slot = i % 2
                nxt = (i + 1) % 2

                @pl.when(i + 1 < n_chunks)
                def _():
                    get_in(nxt, i + 1).start()

                get_in(slot, i).wait()

                @pl.when(i >= 2)
                def _():
                    put_out(slot, i - 2).wait()

                obuf[slot] = buf[slot] + jnp.bfloat16(1.0)
                put_out(slot, i).start()
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)
            put_out((n_chunks - 2) % 2, n_chunks - 2).wait()
            put_out((n_chunks - 1) % 2, n_chunks - 1).wait()

        def f(y):
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
                scratch_shapes=[
                    pltpu.VMEM((2, rows_per_chunk, n_cols), jnp.bfloat16),
                    pltpu.VMEM((2, rows_per_chunk, n_cols), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(y)
        return f

    cases = []
    for rpb in (256, 512, 1024):  # 0.5 / 1 / 2 MB blocks
        cases.append((f"auto blk ({rpb*n_cols*2//2**20}MiB) arbitrary",
                      variant(rpb, "arbitrary")))
        cases.append((f"auto blk ({rpb*n_cols*2//2**20}MiB) parallel",
                      variant(rpb, "parallel")))
    for rpc in (512, 1024):
        cases.append((f"manual dma ({rpc*n_cols*2//2**20}MiB chunks)",
                      manual_dma(rpc)))

    def xla_copy(y):
        return y + jnp.bfloat16(1.0)

    cases.append(("XLA copy(+1) same shape", xla_copy))

    for name, fn in cases:
        @jax.jit
        def run(x0, fn=fn):
            def body(c, _):
                return fn(c), None

            out, _ = jax.lax.scan(body, x0, None, length=20)
            return out

        try:
            _fetch(run(x))
            t0 = time.perf_counter()
            _fetch(run(x))
            dt = (time.perf_counter() - t0) / 20
            print(f"{name:36s} {dt*1e3:7.3f} ms  ({2*gbytes/dt:5.0f} GB/s r+w)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} FAILED: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
