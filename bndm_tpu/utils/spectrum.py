"""Fourier spectrum utilities for noise analysis (XLA FFT).

TPU-native replacement for the reference's cuFFT path
(scripts/fig_main_3_4_inset_10_supp_1_2.py:31-36 ``compute_fft``): per-channel
2D FFT with fftshift, plus the radial power profile used by the paper's
spectral analyses and by our statistical tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_fft(x):
    """Per-channel centered 2D FFT. x: (B, C, H, W) -> complex (B, C, H, W).

    Matches reference ``compute_fft`` semantics (fftshift(fft2(channel))).
    """
    return jnp.fft.fftshift(jnp.fft.fft2(x, axes=(-2, -1)), axes=(-2, -1))


def power_spectrum(x):
    """|FFT|^2 averaged over batch and channels: (B, C, H, W) -> (H, W)."""
    f = compute_fft(x)
    return jnp.mean(jnp.abs(f) ** 2, axis=(0, 1))


def radial_power_profile(x, nbins=16, exclude_dc=True):
    """Radially-binned mean power: returns (centers, profile) as numpy.

    A rising profile is the signature of blue noise; falling = red.
    """
    p = np.asarray(power_spectrum(x))
    h, w = p.shape
    fy = np.fft.fftshift(np.fft.fftfreq(h))
    fx = np.fft.fftshift(np.fft.fftfreq(w))
    r = np.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    if exclude_dc:
        p = p.copy()
        p[r == 0] = np.nan
    bins = np.linspace(0, r.max() + 1e-9, nbins + 1)
    idx = np.digitize(r.ravel(), bins) - 1
    prof = np.full(nbins, np.nan)
    for i in range(nbins):
        vals = p.ravel()[idx == i]
        vals = vals[~np.isnan(vals)]
        if vals.size:
            prof[i] = vals.mean()
    centers = 0.5 * (bins[:-1] + bins[1:])
    return centers, prof
