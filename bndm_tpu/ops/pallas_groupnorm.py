"""Fused GroupNorm(+SiLU) Pallas kernel (EXPERIMENTAL, off by default).

Motivation: a profile of the res-64 BNDM UNet at bs=500 attributes large
device time to GroupNorm statistic reductions. This kernel does the whole
normalize-activate in one pass per batch tile: read x -> per-(sample, group)
mean/var (fp32) -> normalize -> scale/bias -> optional SiLU -> write.

Status (v5e, measured): numerically exact vs the reference math (1.4e-6 fp32),
but NOT yet faster end-to-end than XLA's fused pipeline for the UNet
(XLA overlaps its reduce fusions with MXU work; this kernel serializes a
separate pass). Kept as an opt-in (`UNet2DConfig.fused_groupnorm=True`) and a
base for future tuning (conv+GN megafusion, batch-axis pipelining).

Forward-only as a kernel; the backward pass falls back to XLA autodiff of the
mathematically identical jnp implementation via jax.custom_vjp, so training
uses it transparently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# per-block x-tile budget: the kernel holds ~3 fp32-sized copies of the tile
# (input cast, products, output) in scoped VMEM, so stay well under the 16MB
_VMEM_BUDGET = 2 * 1024 * 1024


def _reference_groupnorm(x, scale, bias, groups, eps, act):
    """Pure-jnp reference (CPU fallback + custom_vjp backward). NHWC."""
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, mcg_ref, mgc_ref, o_ref, *,
               groups, eps, act, hw):
    tb, h, w, c = x_ref.shape
    cg = c // groups
    x3 = x_ref[:, :, :, :].reshape(tb, h * w, c)  # sublane-merge view
    xf = x3.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)  # (TB, C), fp32 accumulation
    s2 = jnp.sum(xf * xf, axis=1)
    # Mosaic can't lane-split reshape (TB, C) -> (TB, G, C/G); do the group
    # reduce and the per-channel broadcast as tiny matmuls against the
    # one-hot membership matrices (HIGHEST precision: default MXU bf16
    # passes destroy the statistics).
    hi = jax.lax.Precision.HIGHEST
    mcg = mcg_ref[:, :]  # (C, G)
    mgc = mgc_ref[:, :]  # (G, C)
    s1g = jnp.dot(s1, mcg, preferred_element_type=jnp.float32, precision=hi)
    s2g = jnp.dot(s2, mcg, preferred_element_type=jnp.float32, precision=hi)
    count = hw * cg
    mean_g = s1g / count
    var_g = jnp.maximum(s2g / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, mgc, preferred_element_type=jnp.float32, precision=hi)
    inv_c = jnp.dot(inv_g, mgc, preferred_element_type=jnp.float32, precision=hi)
    scale = scale_ref[0, :].astype(jnp.float32)
    bias = bias_ref[0, :].astype(jnp.float32)
    a = inv_c * scale[None, :]
    bshift = bias[None, :] - mean_c * a
    y = xf * a[:, None, :] + bshift[:, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[:, :, :, :] = y.astype(o_ref.dtype).reshape(tb, h, w, c)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "act"))
def _gn_pallas(x, scale, bias, groups, eps, act):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cg = c // groups
    bytes_per_sample = h * w * c * x.dtype.itemsize
    tb = max(1, min(b, _VMEM_BUDGET // max(bytes_per_sample, 1)))
    while b % tb != 0:
        tb -= 1
    grid = (b // tb,)
    group_ids = jnp.arange(c) // cg
    mcg = jax.nn.one_hot(group_ids, groups, dtype=jnp.float32)  # (C, G)
    mgc = mcg.T  # (G, C)
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, act=act, hw=h * w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
            pl.BlockSpec((groups, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x, scale.reshape(1, c), bias.reshape(1, c), mcg, mgc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm(x, scale, bias, groups=32, eps=1e-5, act=None):
    """GroupNorm (+ optional fused SiLU) over NHWC. fp32 statistics.

    Pallas single-pass kernel on TPU, jnp elsewhere; gradients via XLA
    autodiff of the identical reference math.
    """
    if jax.default_backend() == "tpu":
        return _gn_pallas(x, scale, bias, groups, eps, act)
    return _reference_groupnorm(x, scale, bias, groups, eps, act)


def _fgn_fwd(x, scale, bias, groups, eps, act):
    return fused_group_norm(x, scale, bias, groups, eps, act), (x, scale, bias)


def _fgn_bwd(groups, eps, act, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _reference_groupnorm(xx, ss, bb, groups, eps, act),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm.defvjp(_fgn_fwd, _fgn_bwd)
