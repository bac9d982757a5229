"""Pure-JAX image quality metrics (jittable).

TPU-native replacement for the reference's GPU ``piq`` SSIM/PSNR calls in the
super-resolution eval (reference iadb_bn.py:570,639-647): same conventions —
gaussian-windowed SSIM (kernel 11, sigma 1.5, k1=0.01, k2=0.03) and PSNR over
the full image, both with an explicit ``data_range`` and per-sample reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_kernel(size=11, sigma=1.5, dtype=jnp.float32):
    r = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (r / sigma) ** 2)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2d(x, kernel):
    """Depthwise 'valid' 2D correlation. x: (B, C, H, W), kernel: (k, k)."""
    b, c, h, w = x.shape
    k = kernel.shape[0]
    kern = jnp.broadcast_to(kernel, (c, 1, k, k))  # (O=C, I/g=1, k, k)
    return jax.lax.conv_general_dilated(
        x,
        kern.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def ssim(x, y, data_range=1.0, kernel_size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Per-sample SSIM, shape (B,). x, y: (B, C, H, W) in [0, data_range]."""
    x = x.astype(jnp.float32) / data_range
    y = y.astype(jnp.float32) / data_range
    kern = _gaussian_kernel(kernel_size, sigma)
    c1 = k1**2
    c2 = k2**2
    mu_x = _filter2d(x, kern)
    mu_y = _filter2d(y, kern)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d(x * x, kern) - mu_xx
    sigma_yy = _filter2d(y * y, kern) - mu_yy
    sigma_xy = _filter2d(x * y, kern) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ss = (2 * mu_xy + c1) / (mu_xx + mu_yy + c1) * cs
    return jnp.mean(ss, axis=(1, 2, 3))


def psnr(x, y, data_range=1.0):
    """Per-sample PSNR in dB, shape (B,)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mse = jnp.mean((x - y) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))
