"""int8 (W8A8) quantized convolution for the sampling path.

The v5e MXU executes int8 matmuls/convs at 2x the bf16 rate (394 vs 197
TOPS), making post-training quantization the main remaining throughput
lever after the bf16 pipeline (73% MFU) — the reference has no analog
(pure fp16/bf16 torch, ddim_diffusers.py:222-231).

Scheme (standard symmetric PTQ, computed inside jit so checkpoints stay
fp32 and the converter is untouched):
  * weights:     per-output-channel scale  s_w[o] = max|W[..., o]| / 127
  * activations: dynamic per-tensor scale  s_x = max|x| / 127
  * y = conv(x_q, w_q)  accumulated in int32 on the MXU, dequantized by
    s_x * s_w[o], bias added in the compute dtype.

Quantizing the weight per call is loop-invariant work that costs
O(params) elementwise ops per step — noise next to the bs=500 convs it
feeds. EXPERIMENTAL: numerics are tested (tests/test_int8.py) but sample
*quality* has not been validated against the paper's figures; keep it
opt-in (`UNet2DConfig.conv_int8`).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def quantize_symmetric(x, axes, eps=1e-12):
    """(x_q int8, scale) with x ~= x_q * scale; scale reduced over `axes`."""
    amax = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _fp32_conv(x, w, strides, padding):
    return lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_conv(x, w, strides=(1, 1), padding=((1, 1), (1, 1))):
    """NHWC x HWIO -> NHWC conv with both operands int8-quantized on the fly;
    int32 MXU accumulation, float32 dequantized output.

    Differentiable via the straight-through estimator: the backward pass is
    the exact fp32 conv VJP (round() alone has zero gradient, which would
    silently kill training — with STE, ``conv_int8`` under a train step is
    quantization-aware training)."""
    xq, sx = quantize_symmetric(x.astype(jnp.float32), axes=(1, 2, 3))
    wq, sw = quantize_symmetric(w.astype(jnp.float32), axes=(0, 1, 2))
    y = lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    # sx: (B,1,1,1), sw: (1,1,1,O) -> broadcast over the NHWC output
    return y.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))


def _int8_conv_fwd(x, w, strides, padding):
    return int8_conv(x, w, strides, padding), (x, w)


def _int8_conv_bwd(strides, padding, res, g):
    x, w = res
    _, vjp = jax.vjp(
        lambda x_, w_: _fp32_conv(x_.astype(jnp.float32), w_.astype(jnp.float32),
                                  strides, padding),
        x, w,
    )
    gx, gw = vjp(g)
    return gx.astype(x.dtype), gw.astype(w.dtype)


int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)


class Int8Conv(nn.Module):
    """Drop-in for the UNet's ``nn.Conv`` sites: identical parameter tree
    (fp32 'kernel' HWIO + 'bias'), int8 execution."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        p = self.padding
        y = int8_conv(x, kernel, self.strides, ((p, p), (p, p)))
        return (y + bias).astype(self.dtype)
