"""Paper-figure reproduction CLI (noise-only, no model weights needed).

TPU-native counterpart of reference ``scripts/fig_main_3_4_inset_10_supp_1_2.py``:
  * fig 3/4: Gaussian blue noise + |FFT| spectrum at t in {0, 500, 999}
  * inset:   gamma sigmoid curves for tau in {0.1, 0.2, 0.5, 1.0, 1000}
  * fig 10:  Gaussian red noise + spectrum at t=0
  * supp 1/2: 100-realization average 128^2 spectrum, repetitive-tile vs
    independent-tile stitching (the artifact-vs-clean comparison), saved as
    EXR when an EXR codec is available, else .npy + a PNG preview.

This is BASELINE config #1 — CPU-runnable end to end. The whole per-figure
noise+FFT computation is one jitted function.

Usage:
    python -m bndm_tpu.cli.figs --output_dir scripts/results [--realizations 100]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from bndm_tpu.ops.cov import load_cov_L
from bndm_tpu.ops.noise import get_noise
from bndm_tpu.ops.schedules import gamma_schedule
from bndm_tpu.utils.spectrum import compute_fft

NB_STEPS = 1000
SCHED = "sigmoid"
SCHED_PARAMS = (1000.0, 0.0, 3.0)


def _save_png(arr_chw, path):
    from PIL import Image

    a = np.asarray(arr_chw)
    a = np.transpose(a, (1, 2, 0))
    Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8)).save(path)


def _save_exr_or_npy(img2d, path_base):
    img2d = np.asarray(img2d, dtype=np.float32)
    try:  # cv2 EXR, like the reference (fig script :10-11,177)
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2

        if cv2.imwrite(path_base + ".exr", img2d):
            return path_base + ".exr"
    except Exception:
        pass
    try:  # imageio with an EXR plugin, if present
        import imageio.v3 as iio

        iio.imwrite(path_base + ".exr", img2d)
        return path_base + ".exr"
    except Exception:
        np.save(path_base + ".npy", img2d)
        return path_base + ".npy"


def _noise_and_spectrum(L, key, t_step, res, noise_type="gaussianBN"):
    t = jnp.full((1,), float(t_step), jnp.float32)
    gamma_t = gamma_schedule(t, NB_STEPS, SCHED, SCHED_PARAMS)
    white = jax.random.normal(key, (1, 3, res, res), jnp.float32)
    r = get_noise(white, L, gamma_t, noise_type=noise_type, train=False,
                  inplace=True, key=key)  # key only consumed by 'uniform'
    fft_mag = jnp.abs(compute_fft(r.noise))
    return r.noise, fft_mag


def fig_main_3_4(L, outdir, key):
    for i, cur_step in enumerate([0, 500, 999]):
        noise, fft_mag = jax.jit(
            _noise_and_spectrum, static_argnames=("t_step", "res")
        )(L, jax.random.fold_in(key, i), t_step=cur_step, res=64)
        n = np.asarray(noise[0])
        n = (n - n.min()) / (n.max() - n.min())
        _save_png(n, f"{outdir}/gaussianBN_res64_{cur_step}.png")
        f = np.asarray(fft_mag[0, 0])
        _save_png(
            np.repeat((f / f.max())[None], 3, 0), f"{outdir}/gaussianBN_res64_spectrum_{cur_step}.png"
        )


def fig_main_10(L_rn, outdir, key):
    noise, fft_mag = jax.jit(_noise_and_spectrum, static_argnames=("t_step", "res"))(
        L_rn, key, t_step=0, res=64
    )
    n = np.asarray(noise[0])
    n = (n - n.min()) / (n.max() - n.min())
    _save_png(n, f"{outdir}/gaussianRN_res64_0.png")
    f = np.asarray(fft_mag[0, 0])
    _save_png(np.repeat((f / f.max())[None], 3, 0), f"{outdir}/gaussianRN_res64_spectrum_0.png")


def fig_main_inset(outdir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.linspace(0, NB_STEPS, NB_STEPS)
    taus = [0.1, 0.2, 0.5, 1.0, 1000.0]
    for tau in taus:
        y = np.asarray(gamma_schedule(x, NB_STEPS, "sigmoid", (tau, 0.0, 3.0)))
        plt.plot(x / NB_STEPS, y)
    plt.legend([rf"$\tau={t}$" for t in taus], prop={"size": 15})
    plt.gca().set_ylabel(r"$\gamma_t$", fontsize=15)
    plt.gca().set_xlabel(r"$t/T$", fontsize=15)
    plt.savefig(f"{outdir}/inset.png")
    plt.clf()


def fig_supp_1_2(L, outdir, key, realizations=100):
    """Average |FFT| of 128^2 blue noise: repetitive tiles show grid
    artifacts; independently-stitched tiles don't (reference fig_supp_1_2,
    comment :134). The realization loop is a vmapped batch, not a Python
    loop."""

    @jax.jit
    def batch_spectrum(keys, repetitive):
        def one(k):
            white = jax.random.normal(k, (1, 3, 128, 128), jnp.float32)
            white = jnp.where(
                repetitive, jnp.tile(white[:, :, 0:64, 0:64], (1, 1, 2, 2)), white
            )
            t = jnp.zeros((1,), jnp.float32)
            gamma_t = gamma_schedule(t, NB_STEPS, SCHED, SCHED_PARAMS)
            r = get_noise(white, L, gamma_t, noise_type="gaussianBN", train=False, inplace=True)
            return jnp.abs(compute_fft(r.noise))[0], r.noise[0]

        mags, noises = jax.vmap(one)(keys)
        return jnp.mean(mags, axis=0), noises[-1]

    for repetitive in (True, False):
        keys = jax.random.split(jax.random.fold_in(key, int(repetitive)), realizations)
        avg_fft, last_noise = batch_spectrum(keys, jnp.bool_(repetitive))
        n = np.asarray(last_noise)
        n = (n - n.min()) / (n.max() - n.min())
        _save_png(n, f"{outdir}/gaussianBN_res128_repetitive_{repetitive}_noise.png")
        spec = np.asarray(avg_fft[0])
        spec = spec / spec.max()
        path = _save_exr_or_npy(
            spec, f"{outdir}/gaussianBN_res128_repetitive_{repetitive}_spectrum"
        )
        _save_png(
            np.repeat(spec[None], 3, 0),
            f"{outdir}/gaussianBN_res128_repetitive_{repetitive}_spectrum.png",
        )
        print(f"supp fig (repetitive={repetitive}): spectrum -> {path}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", type=str, default="scripts/results")
    p.add_argument("--realizations", type=int, default=100)
    p.add_argument("--bluenoise_dir", type=str, default="bluenoise",
                   help="directory with the reference L-matrix .npz artifacts; generated if absent")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    L = jnp.asarray(load_cov_L(res=64, kind="blue", search_dirs=(".", args.bluenoise_dir),
                               cache_dir=args.bluenoise_dir))
    L_rn = jnp.asarray(load_cov_L(res=64, kind="red", search_dirs=(".", args.bluenoise_dir),
                                  cache_dir=args.bluenoise_dir))
    key = jax.random.PRNGKey(args.seed)

    fig_main_3_4(L, args.output_dir, jax.random.fold_in(key, 1))
    fig_main_inset(args.output_dir)
    fig_main_10(L_rn, args.output_dir, jax.random.fold_in(key, 2))
    fig_supp_1_2(L, args.output_dir, jax.random.fold_in(key, 3), args.realizations)
    print(f"figures written to {args.output_dir}")


if __name__ == "__main__":
    main()
