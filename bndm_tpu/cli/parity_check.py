"""Checkpoint-parity harness: validate converted reference weights end to end.

Given the reference's published artifacts placed at their original paths
(results_gaussianBN/<run>/model.ckpt or unet/*.safetensors, the L-matrix
.npz files, and optionally the saved-noise .npz files), this tool:

  1. converts the weights to flax (`bndm_tpu.models.convert`),
  2. runs one UNet forward on a fixed probe and prints activation stats
     (for eyeballing against a torch run of the same checkpoint),
  3. samples with the reference's saved initial noise (when present) and
     writes the resulting image next to the reference's, so figure parity
     (SURVEY.md §6: pixel-faithful reproduction) can be checked directly.

Zero-egress environments can't download the artifacts, so this is the tool a
user runs where they have them:
  python -m bndm_tpu.cli.parity_check --ckpt results_gaussianBN/<run>/model.ckpt \
      --res 64 --out_channel 6 --noise_type gaussianBN --scheduler_gamma sigmoid \
      --scheduler_param 1000
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True,
                   help=".ckpt / .safetensors reference checkpoint")
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--out_channel", type=int, default=6)
    p.add_argument("--in_channel", type=int, default=3)
    p.add_argument("--noise_type", type=str, default="gaussianBN")
    p.add_argument("--scheduler_gamma", type=str, default="sigmoid")
    p.add_argument("--scheduler_param", type=float, default=1000.0)
    p.add_argument("--scheduler_param_s", type=float, default=0.0)
    p.add_argument("--scheduler_param_e", type=float, default=3.0)
    p.add_argument("--nb_steps", type=int, default=250)
    p.add_argument("--saved_noise", type=str, default=None,
                   help="reference noise_batch*.npz for bit-identical x0")
    p.add_argument("--output", type=str, default="parity_sample.png")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   help="fp32 by default: parity first, speed second")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import save_image_grid
    from bndm_tpu.models.convert import load_reference_unet
    from bndm_tpu.models.unet2d import UNet2D, unet_config_for_res
    from bndm_tpu.samplers.iadb import sample_iadb

    params = load_reference_unet(args.ckpt)
    n_arrays = len(jax.tree.leaves(params))
    print(f"converted {n_arrays} arrays from {args.ckpt}")

    cfg = unet_config_for_res(args.res, args.in_channel, args.out_channel,
                              dtype=args.compute_dtype)
    model = UNet2D(cfg)

    # 1. fixed-probe forward: deterministic input, print stats per output head
    probe = jnp.asarray(
        np.linspace(-1, 1, args.in_channel * args.res * args.res, dtype=np.float32)
        .reshape(1, args.in_channel, args.res, args.res))
    d = model.apply(params, probe, jnp.array([0.5]))
    d = np.asarray(d)
    print("probe forward: shape", d.shape,
          "mean %.6f std %.6f head0 mean %.6f head1 mean %.6f"
          % (d.mean(), d.std(), d[:, :3].mean(),
             d[:, 3:].mean() if d.shape[1] > 3 else float("nan")))

    # 2. sample from the reference's saved noise (or seed 0 white noise)
    if args.saved_noise and os.path.exists(args.saved_noise):
        x0 = jnp.asarray(np.load(args.saved_noise)["noise"][:1], jnp.float32)
        print(f"using saved reference noise {args.saved_noise}")
    else:
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, args.in_channel,
                                                       args.res, args.res))
        print("no saved noise given; using jax PRNG seed 0 (statistics-level "
              "comparison only)")
    sp = (args.scheduler_param, args.scheduler_param_s, args.scheduler_param_e)
    two_head = args.noise_type in ("gaussianBN", "gaussianRN") and args.out_channel == 6
    sample, _ = sample_iadb(model.apply, params, x0, nb_steps=args.nb_steps,
                            scheduler_gamma=args.scheduler_gamma, gamma_params=sp,
                            two_head=two_head)
    save_image_grid(np.asarray(sample), args.output.replace(".png", "_{0}.png"))
    print(f"sample written; compare against the reference's image for this noise")


if __name__ == "__main__":
    main()
