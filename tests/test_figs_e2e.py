"""End-to-end test of the figure CLI (BASELINE config #1, CPU-runnable)."""

import os

import numpy as np


def test_figs_cli(tmp_path):
    from bndm_tpu.cli.figs import main

    out = tmp_path / "figs"
    cache = tmp_path / "bn"
    main([
        "--output_dir", str(out),
        "--realizations", "4",
        "--bluenoise_dir", str(cache),
    ])
    expected = [
        "gaussianBN_res64_0.png",
        "gaussianBN_res64_500.png",
        "gaussianBN_res64_999.png",
        "gaussianBN_res64_spectrum_0.png",
        "gaussianRN_res64_0.png",
        "inset.png",
        "gaussianBN_res128_repetitive_True_noise.png",
        "gaussianBN_res128_repetitive_False_noise.png",
    ]
    for f in expected:
        assert (out / f).exists(), f

    # independent-tile spectrum must not have the repetitive grid artifacts:
    # repetitive tiling concentrates energy on a sparse grid of harmonics, so
    # its spectrum has (much) higher kurtosis/max than the stitched one.
    rep = np.load(out / "gaussianBN_res128_repetitive_True_spectrum.npy")
    ind = np.load(out / "gaussianBN_res128_repetitive_False_spectrum.npy")
    # both normalized to max=1: count of near-zero bins is far larger for the
    # repetitive case (energy lives only on every-other-frequency lines)
    assert (rep < 1e-3).mean() > (ind < 1e-3).mean()
