"""Pallas TPU kernel for the blue-noise correlation matmul.

The hot op of the noise engine is ``noise_bn = L @ white`` where L is the
dense *lower-triangular* (4096, 4096) covariance factor and white is the
flattened (4096, B*C) white noise (reference get_noise_recent.py:88,113,146,
executed there via cuBLAS ``torch.matmul``). TPU-native replacement
(SURVEY.md S2.3): an MXU-tiled Pallas matmul that

  * keeps the current L row-panel resident in VMEM while streaming column
    tiles of the noise,
  * exploits the triangular structure by skipping the K-tiles above the
    diagonal block row (~2x FLOP saving) via a data-dependent-free
    ``fori_loop`` bound derived from the grid index,
  * accumulates in float32 on the MXU.

Off-TPU (CPU tests, interpret mode) ``apply_L`` falls back to a plain XLA
einsum with identical semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Tile sizes: rows/cols of the output tile and the contraction chunk.
# 256x512 fp32 L-panels (512 KB) plus 512xBN noise panels fit comfortably in
# ~16 MB VMEM with double buffering.
_BM = 256
_BK = 512
_BN = 256


def _matmul_kernel(l_ref, w_ref, o_ref, acc_ref, *, n_k_tiles, triangular):
    """Grid (i, j, k): o[i, j] += L[i, k] @ w[k, j], skipping k > i blocks."""
    import jax.experimental.pallas as pl  # local import: TPU-only dependency

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    if triangular:
        i = pl.program_id(0)
        # L-block rows cover _BM rows; K-tiles cover _BK columns. Blocks with
        # k*_BK > (i+1)*_BM - 1 are entirely above the diagonal -> all-zero.
        live = k * _BK <= (i + 1) * _BM - 1

        @pl.when(live)
        def _accum():
            acc_ref[:, :] += jnp.dot(
                l_ref[:, :],
                w_ref[:, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    else:
        acc_ref[:, :] += jnp.dot(
            l_ref[:, :],
            w_ref[:, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(k == n_k_tiles - 1)
    def _store():
        o_ref[:, :] = acc_ref[:, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("triangular",))
def _pallas_matmul(L, W, triangular=True):
    """(N, N) @ (N, M) on TPU via Pallas. N must divide _BM/_BK; M is padded."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, _ = L.shape
    m = W.shape[1]
    m_pad = -(-m // _BN) * _BN
    if m_pad != m:
        W = jnp.pad(W, ((0, 0), (0, m_pad - m)))
    n_k = n // _BK

    grid = (n // _BM, m_pad // _BN, n_k)
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k_tiles=n_k, triangular=triangular),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BM, _BK), lambda i, j, k: (i, k)),
            pl.BlockSpec((_BK, _BN), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((_BM, _BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, m_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BM, _BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(n * n * m_pad if not triangular else n * n * m_pad // 2) * 2,
            bytes_accessed=n * n * 4 + n * m_pad * 8,
            transcendentals=0,
        ),
    )(L.astype(jnp.float32), W.astype(jnp.float32))
    return out[:, :m]


def _use_pallas(n):
    if jax.default_backend() != "tpu":
        return False
    return n % _BM == 0 and n % _BK == 0


def apply_L(L, wf):
    """Batched correlation: (B, HW, C) white noise -> (B, HW, C) correlated.

    out[b] = L @ wf[b]. On TPU the batch and channel axes are folded into one
    MXU-friendly column dimension (HW, B*C); elsewhere a plain einsum.
    """
    b, hw, c = wf.shape
    n = L.shape[0]
    assert hw == n, f"L is {L.shape} but noise has {hw} pixels"
    if _use_pallas(n):
        w2 = jnp.transpose(wf, (1, 0, 2)).reshape(n, b * c)
        out = _pallas_matmul(L, w2, triangular=True)
        return jnp.transpose(out.reshape(n, b, c), (1, 0, 2)).astype(wf.dtype)
    # precision=highest: the default matmul path lowers to single-pass bf16
    # multiplies (~1e-2 abs error) — unacceptable for figure-parity noise.
    return jnp.einsum(
        "pq,bqc->bpc",
        L,
        wf,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(wf.dtype)
