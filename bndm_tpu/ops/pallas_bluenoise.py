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


# ---------------------- fully fused blue-noise kernel -------------------------
#
# The SURVEY S2.3 target kernel: white-noise generation (in-kernel PRNG +
# Box-Muller), the triangular L matmul, and the time-varying
# (1-gamma)*bn + gamma*wn mix fused into ONE pallas_call that writes
# (noise, bn, wn) straight to HBM. White-noise blocks are regenerated from a
# position-keyed seed wherever needed (matmul operand at block (k, j), output
# at block (i, j)) so nothing round-trips through HBM.


def _bits_to_unit(bits):
    """uint32 -> float32 in (0, 1): top 24 bits, offset to avoid exact 0.

    Mosaic has no uint32->f32 cast; the shifted value fits in 24 bits, so
    bitcast to int32 (sign bit clear) and cast from there.
    """
    from jax.experimental.pallas import tpu as pltpu

    i24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return i24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _white_block(seed0, seed1, k, j, shape):
    """Deterministic standard-normal block keyed by grid position."""
    from jax.experimental.pallas import tpu as pltpu

    # fold the block position into the seed arithmetically (Mosaic's
    # prng_set_seed lowers reliably with 2 operands)
    pltpu.prng_seed(seed0 + k * jnp.int32(131071) + j, seed1)
    u1 = _bits_to_unit(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = _bits_to_unit(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


# fused-kernel tiling: white-noise blocks must be generated at ONE
# granularity so the matmul operand block (k, j) and the output block (i, j)
# reproduce identical bits -> square row tiles.
_FB = 256


def _fused_kernel(seed_ref, gamma_ref, l_ref, noise_ref, bn_ref, wn_ref,
                  w_col_ref, acc_ref, *, n_k_tiles, gbn_only):
    """Grid (j, i, k), all sequential: for each column tile j the full white
    column (N, _BN) is generated ONCE into VMEM scratch (transcendentals are
    the expensive part of Box-Muller — do them 1x, not per matmul step), then
    every row block i reuses it as both matmul operand and wn output."""
    import jax.experimental.pallas as pl

    j = pl.program_id(0)
    i = pl.program_id(1)
    k = pl.program_id(2)
    s0 = seed_ref[0, 0]
    s1 = seed_ref[0, 1]

    @pl.when(jnp.logical_and(i == 0, k == 0))
    def _fill_column():
        def body(b, carry):
            w_col_ref[pl.ds(b * _FB, _FB), :] = _white_block(s0, s1, b, j, (_FB, _BN))
            return carry

        jax.lax.fori_loop(0, n_k_tiles, body, 0)

    @pl.when(k == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    # triangular skip: row block i only needs K tiles with k <= i
    @pl.when(k <= i)
    def _accum():
        acc_ref[:, :] += jnp.dot(
            l_ref[:, :], w_col_ref[pl.ds(k * _FB, _FB), :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(k == n_k_tiles - 1)
    def _store():
        w_out = w_col_ref[pl.ds(i * _FB, _FB), :]
        bn = acc_ref[:, :]
        bn_ref[:, :] = bn
        wn_ref[:, :] = w_out
        if gbn_only:
            noise_ref[:, :] = bn
        else:
            g = gamma_ref[0, :][None, :]
            noise_ref[:, :] = bn * (1.0 - g) + w_out * g


@functools.partial(jax.jit, static_argnames=("gbn_only",))
def _fused_bluenoise_flat(L, gamma_cols, seeds, gbn_only=False):
    """(N, M) fused generation. gamma_cols: (M,). seeds: (2,) int32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = L.shape[0]
    m = gamma_cols.shape[0]
    m_pad = -(-m // _BN) * _BN
    gamma_p = jnp.pad(gamma_cols.astype(jnp.float32), (0, m_pad - m)).reshape(1, m_pad)
    n_k = n // _FB
    grid = (m_pad // _BN, n // _FB, n_k)
    out_shape = [jax.ShapeDtypeStruct((n, m_pad), jnp.float32)] * 3
    noise, bn, wn = pl.pallas_call(
        functools.partial(_fused_kernel, n_k_tiles=n_k, gbn_only=gbn_only),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seeds (1, 2)
            pl.BlockSpec((1, _BN), lambda j, i, k: (0, j)),  # gamma
            pl.BlockSpec((_FB, _FB), lambda j, i, k: (i, k)),  # L
        ],
        out_specs=[
            pl.BlockSpec((_FB, _BN), lambda j, i, k: (i, j)),
            pl.BlockSpec((_FB, _BN), lambda j, i, k: (i, j)),
            pl.BlockSpec((_FB, _BN), lambda j, i, k: (i, j)),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, _BN), jnp.float32),  # cached white column (4 MB)
            pltpu.VMEM((_FB, _BN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # scratch reuse across i depends on sequential row-major order
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(seeds.reshape(1, 2).astype(jnp.int32), gamma_p, L.astype(jnp.float32))
    return noise[:, :m], bn[:, :m], wn[:, :m]


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def _fused_flat_diff(L, gamma_cols, seeds, gbn_only):
    """Differentiable wrapper of the fused kernel.

    pallas_call has no JVP rule, but the training loss differentiates the
    noise mix w.r.t. the LEARNABLE gamma schedule (train/pixel.py: jax.grad
    over sched_params flows through get_noise). The tangent needs no kernel
    re-entry: bn and wn are gamma-independent and the in-kernel mix is
    ``noise = bn*(1-g) + wn*g``, so d noise/d g = wn - bn — computable from
    the kernel's own outputs. L (a fixed covariance factor, never trained)
    and the integer seeds carry no tangent.
    """
    return _fused_bluenoise_flat(L, gamma_cols, seeds, gbn_only=gbn_only)


@_fused_flat_diff.defjvp
def _fused_flat_diff_jvp(gbn_only, primals, tangents):
    L, gamma_cols, seeds = primals
    _, dgamma, _ = tangents
    noise, bn, wn = _fused_flat_diff(L, gamma_cols, seeds, gbn_only)
    zero = jnp.zeros_like(bn)
    dnoise = zero if gbn_only else (wn - bn) * dgamma[None, :]
    return (noise, bn, wn), (dnoise, zero, zero)


def fused_bluenoise(key, batch, channels, L, gamma, *, gbn_only=False, res=64):
    """Fused [RNG -> L-matmul -> mix] for the res-64 path.

    Returns (noise, noise_bn, noise_wn) shaped (B, C, 64, 64) — the same
    contract as the unfused engine, with the white noise drawn by the
    in-kernel TPU PRNG (a different-but-valid stream vs jax.random.normal).
    Differentiable w.r.t. ``gamma`` (custom JVP above); L and the PRNG key
    are treated as constants.
    """
    assert res == 64, "fused path is the res-64 hot path"
    n = L.shape[0]
    seeds = jax.random.randint(key, (2,), 0, 2**31 - 1, dtype=jnp.int32)
    gamma_cols = jnp.repeat(jnp.asarray(gamma, jnp.float32), channels)
    noise, bn, wn = _fused_flat_diff(L, gamma_cols, seeds, gbn_only)

    def to_img(x):
        return jnp.transpose(x.reshape(n, batch, channels), (1, 2, 0)).reshape(
            batch, channels, 64, 64
        )

    # NOTE layout: flat (N, M) columns are (b, c); rows are pixels -> image
    return to_img(noise), to_img(bn), to_img(wn)


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
