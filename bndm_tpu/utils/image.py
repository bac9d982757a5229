"""Image ops with torch-parity semantics.

``resize_bilinear_align_corners`` reproduces
``torch.nn.functional.interpolate(mode='bilinear', align_corners=True)`` —
the reference's super-res conditioning uses exactly that (iadb_bn.py:624-626,
931-932: down x4 then back up). jax.image.resize uses half-pixel centers
(align_corners=False), so we implement the corner-aligned sampling directly.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_weights(in_size, out_size):
    if out_size == 1:
        coords = jnp.zeros((1,), jnp.float32)
    else:
        coords = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = coords - lo.astype(jnp.float32)
    return lo, hi, w


def resize_bilinear_align_corners(x, out_h, out_w):
    """x: (..., H, W) -> (..., out_h, out_w), corner-aligned bilinear."""
    h, w = x.shape[-2], x.shape[-1]
    y0, y1, wy = _axis_weights(h, out_h)
    x0, x1, wx = _axis_weights(w, out_w)
    rows = jnp.take(x, y0, axis=-2) * (1 - wy)[..., :, None] + jnp.take(x, y1, axis=-2) * wy[
        ..., :, None
    ]
    out = jnp.take(rows, x0, axis=-1) * (1 - wx) + jnp.take(rows, x1, axis=-1) * wx
    return out


def superres_condition(x1, downscale=4):
    """Low-res conditioning image: bilinear down xN then back up, both
    corner-aligned (reference iadb_bn.py:624-626/:931-932)."""
    h, w = x1.shape[-2], x1.shape[-1]
    small = resize_bilinear_align_corners(x1, h // downscale, w // downscale)
    return resize_bilinear_align_corners(small, h, w)
