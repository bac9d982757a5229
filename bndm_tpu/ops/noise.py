"""The BNDM noise engine: time-varying white -> blue/red Gaussian noise.

Pure-JAX, jittable re-implementation of the reference's single most important
public function, ``get_noise_v2`` (reference bluenoise/get_noise_recent.py:23-196).
Semantics are replicated exactly, including the reference's quirks
(SURVEY.md S7 "hard parts"):

  * the *transposed* quadrant layout of ``noise_padding``
    (get_noise_recent.py:7-19): tiles are concatenated along H for the "rows"
    and along W for the final assembly, so tile 2 lands *below* tile 1;
  * the res-128 white-noise "scramble": ``noise_wn`` is produced by
    reinterpreting the (H*W, C)-contiguous buffer as (C, H, W)
    (get_noise_recent.py:143-144 ``.contiguous().view(...)``) — statistically
    identical white noise, but a different deterministic permutation than the
    matmul input;
  * the res-128 ``gaussian`` *test*-time reshuffle that pushes the caller's
    noise through the same split/flatten/reassemble path purely so white- and
    blue-noise runs consume RNG identically (get_noise_recent.py:50-56);
  * the res-32 path that tiles the input 2x2 up to 64, correlates, and crops
    back (get_noise_recent.py:77-99);
  * the mix ``noise = noise_bn*(1-gamma) + noise_wn*gamma`` with NO variance
    renormalization (get_noise_recent.py:91,116,158-160) — the parameter is
    named ``alpha_t`` in the reference signature but every caller passes
    gamma_t (iadb_bn.py:881, latent_...:606); we name it ``gamma_t``.

Design notes (TPU-first): everything here is shape-static and traceable, so
it fuses into the surrounding jitted train/sample step. The heavy op — the
(H*W x H*W) @ (H*W x B*C) correlation matmul — is routed through
``bndm_tpu.ops.pallas_bluenoise.apply_L`` which uses a fused Pallas MXU
kernel on TPU and plain XLA matmul elsewhere.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from bndm_tpu.ops.pallas_bluenoise import apply_L

NOISE_TYPES = ("gaussian", "uniform", "gaussianBN", "gaussianRN", "GBN")


class NoiseResult(NamedTuple):
    """(noise, noise_bn, noise_wn) — training losses need all three
    (reference iadb_bn.py:948-968)."""

    noise: jax.Array
    noise_bn: jax.Array
    noise_wn: jax.Array


def noise_padding(tiles):
    """Stitch four 64x64 tiles into one 128x128 image — transposed layout.

    ``tiles``: (B, 4, C, 64, 64). Replicates reference
    ``noise_padding`` (get_noise_recent.py:7-19) exactly: tiles 1,2 are
    concatenated along H (the reference's dim=-2) to form the "top row",
    tiles 3,4 likewise, then the two are concatenated along W (dim=-1).
    Resulting quadrants: out[:64,:64]=t1, out[64:,:64]=t2, out[:64,64:]=t3,
    out[64:,64:]=t4 — i.e. a *transposed* reading order. Do not "fix" this;
    checkpoints were trained against it.
    """
    t1, t2, t3, t4 = tiles[:, 0], tiles[:, 1], tiles[:, 2], tiles[:, 3]
    left = jnp.concatenate([t1, t2], axis=-2)
    right = jnp.concatenate([t3, t4], axis=-2)
    return jnp.concatenate([left, right], axis=-1)


def _split_quadrants(x):
    """(B, C, 128, 128) -> (B*4, C, 64, 64) in the reference's t1..t4 order
    (reading order: TL, TR, BL, BR — get_noise_recent.py:52,132)."""
    t1 = x[:, :, 0:64, 0:64]
    t2 = x[:, :, 0:64, 64:128]
    t3 = x[:, :, 64:128, 0:64]
    t4 = x[:, :, 64:128, 64:128]
    return jnp.concatenate([t1, t2, t3, t4], axis=0)


def _flatten_pix(x):
    """(B, C, H, W) -> (B, H*W, C): torch ``.view(B,C,-1).permute(0,2,1)``."""
    b, c, h, w = x.shape
    return jnp.transpose(x.reshape(b, c, h * w), (0, 2, 1))


def _unflatten_pix(xf, h, w):
    """(B, H*W, C) -> (B, C, H, W): torch ``.permute(0,2,1).contiguous().view``."""
    b, hw, c = xf.shape
    return jnp.transpose(xf, (0, 2, 1)).reshape(b, c, h, w)


def _scramble_view(xf, h, w):
    """torch ``(B,HW,C).contiguous().view(B,C,H,W)`` — a raw buffer
    reinterpretation, NOT a transpose. Row-major flatten of (HW, C) read back
    as (C, H, W). Used for the res-128 noise_wn quirk
    (get_noise_recent.py:54-55,143-144)."""
    b, hw, c = xf.shape
    return xf.reshape(b, c, h, w)


def _mix(noise_bn, noise_wn, gamma_t, noise_type):
    g = gamma_t.reshape(-1, *([1] * (noise_bn.ndim - 1)))
    if noise_type in ("gaussianBN", "gaussianRN"):
        return noise_bn * (1.0 - g) + noise_wn * g
    # GBN: pure blue noise at every step (get_noise_recent.py:92-93)
    return noise_bn


def _correlate(L, wf):
    """noise_bn-flat = L @ white-flat, batched over B: (B, HW, C)."""
    return apply_L(L, wf)


def get_noise(
    x,
    L,
    gamma_t,
    *,
    noise_type="gaussian",
    train=True,
    inplace=False,
    key: Optional[jax.Array] = None,
    engine: str = "xla",
) -> NoiseResult:
    """Generate per-timestep noise of the 5 reference types.

    Functional analog of reference ``get_noise_v2``; the implicit torch RNG
    is replaced by an explicit ``key`` (required whenever fresh noise is
    drawn, i.e. ``inplace=False``). ``inplace=True`` means "use the caller's
    tensor ``x`` as the white-noise source" — the reference uses this at test
    time so the *saved* initial noise drives all methods identically
    (get_noise_recent.py:34-36,104-108,131-141).

    Shapes: x (B, C, H, W) with H == W in {32, 64, 128} for the correlated
    types. L is the (4096, 4096) res-64 covariance factor. gamma_t is (B,).
    Returns ``NoiseResult(noise, noise_bn, noise_wn)``.

    ``engine``: "xla" (default — jax.random.normal white noise, reproducible
    across backends), "fused" (TPU-only fully-fused Pallas kernel with
    in-kernel PRNG; res-64 fresh-noise path only), or "auto" (fused where
    eligible, xla otherwise — the training default since r4: measured
    end-to-end train win of 1.059x at bs=64 / 1.008x at bs=256 on v5e,
    `scripts/bench_fused_noise_train.py`). The fused stream is
    different-but-valid vs jax.random.normal, so anything needing
    cross-backend bit parity (saved-noise replication, tests) stays "xla".
    """
    if noise_type not in NOISE_TYPES:
        raise NotImplementedError(f"noise_type {noise_type!r}")
    b, c, h, w = x.shape
    res = w
    dtype = x.dtype

    # 'uniform' always draws fresh (the reference's rand() ignores inplace,
    # get_noise_recent.py:69-71), so it needs a key even when inplace=True
    if key is None and (not inplace or noise_type == "uniform"):
        raise ValueError("key is required when inplace=False (and always for "
                         "noise_type='uniform', which draws fresh noise)")

    if noise_type == "gaussian":
        # (get_noise_recent.py:31-67)
        if res == 128:
            noise = x if inplace else jax.random.normal(key, x.shape, dtype)
            if not train:
                # RNG-fairness reshuffle (get_noise_recent.py:50-56): split
                # *x* into quadrants, flatten to (HW, C), reinterpret the
                # buffer as (C, H, W) tiles, stitch with the transposed
                # padding. Exactly mirrors what the gaussianBN path does to
                # its white noise so both consume the same saved noise.
                tiles = _split_quadrants(x)  # (B*4, C, 64, 64)
                tiles_f = _flatten_pix(tiles)  # (B*4, 4096, C)
                tiles_s = _scramble_view(tiles_f, 64, 64)  # buffer view quirk
                noise = noise_padding(tiles_s.reshape(b, 4, c, 64, 64))
        else:
            # reference only implements 64 (and raises otherwise); we accept
            # any non-128 resolution for the plain-gaussian path since the
            # latent pipeline feeds 32x32 latents through it.
            noise = x if inplace else jax.random.normal(key, x.shape, dtype)
        return NoiseResult(noise, noise, noise)

    if noise_type == "uniform":
        # (get_noise_recent.py:69-71). NOTE: the reference returns
        # (noise, noise_bn, noise_wn) with the latter two UNBOUND on this
        # branch — calling it with 'uniform' raises UnboundLocalError. We
        # return the noise for all three, documenting the reference bug.
        u = jax.random.uniform(key, x.shape, dtype)
        noise = (u * 2.0 - 1.0) * math.sqrt(3.0)
        return NoiseResult(noise, noise, noise)

    # correlated types: gaussianBN / gaussianRN / GBN
    if res == 32:
        # tile 2x2 up to 64, correlate, crop back (get_noise_recent.py:77-99)
        x64 = jnp.concatenate([x, x], axis=-2)
        x64 = jnp.concatenate([x64, x64], axis=-1)
        noise = x64 if inplace else jax.random.normal(key, x64.shape, dtype)
        noise_wn = noise
        nf = _flatten_pix(noise)
        noise_bn = _unflatten_pix(_correlate(L, nf), 64, 64)
        noise = _mix(noise_bn, noise_wn, gamma_t, noise_type)
        return NoiseResult(
            noise[:, :, 0:32, 0:32], noise_bn[:, :, 0:32, 0:32], noise_wn[:, :, 0:32, 0:32]
        )

    if res == 64:
        if (engine in ("fused", "auto") and not inplace
                and jax.default_backend() == "tpu"):
            # one Pallas kernel: in-kernel RNG + triangular matmul + mix
            # (different-but-valid PRNG stream vs jax.random.normal)
            from bndm_tpu.ops.pallas_bluenoise import fused_bluenoise

            n, bn, wn = fused_bluenoise(
                key, b, c, L, gamma_t, gbn_only=(noise_type == "GBN")
            )
            return NoiseResult(n.astype(dtype), bn.astype(dtype), wn.astype(dtype))
        # direct path (get_noise_recent.py:103-123)
        noise = x if inplace else jax.random.normal(key, x.shape, dtype)
        noise_wn = noise
        nf = _flatten_pix(noise)
        noise_bn = _unflatten_pix(_correlate(L, nf), 64, 64)
        noise = _mix(noise_bn, noise_wn, gamma_t, noise_type)
        return NoiseResult(noise, noise_bn, noise_wn)

    if res == 128:
        # four independent 64-tiles through one batched matmul, then the
        # transposed stitch (get_noise_recent.py:126-164)
        if inplace:
            tiles = _split_quadrants(x)  # (B*4, C, 64, 64)
        else:
            tiles = jax.random.normal(key, (b * 4, c, 64, 64), dtype)
        tiles_f = _flatten_pix(tiles)  # (B*4, 4096, C)
        # noise_wn: the buffer-reinterpretation quirk (:143-144)
        noise_wn = noise_padding(_scramble_view(tiles_f, 64, 64).reshape(b, 4, c, 64, 64))
        bn_tiles = _unflatten_pix(_correlate(L, tiles_f), 64, 64)  # proper layout (:146)
        noise_bn = noise_padding(bn_tiles.reshape(b, 4, c, 64, 64))
        noise = _mix(noise_bn, noise_wn, gamma_t, noise_type)
        return NoiseResult(noise, noise_bn, noise_wn)

    raise NotImplementedError(f"resolution {res} for noise_type {noise_type!r}")


def get_noise_v2(
    device,
    x,
    cov_mat_L,
    alpha_t,
    time_step,
    noise_type="gaussian",
    train_or_test="train",
    inplace=False,
    key: Optional[jax.Array] = None,
):
    """Signature-compatible adapter for reference callers
    (get_noise_recent.py:23). ``device`` and ``time_step`` are accepted and
    ignored (JAX arrays carry their placement; time only enters through the
    pre-computed gamma). ``alpha_t`` is the gamma mix factor, as in every
    reference call site. Returns a plain tuple like the reference."""
    del device, time_step
    r = get_noise(
        x,
        cov_mat_L,
        alpha_t,
        noise_type=noise_type,
        train=(train_or_test == "train"),
        inplace=inplace,
        key=key,
    )
    return r.noise, r.noise_bn, r.noise_wn
