"""Published-checkpoint interop: reference-format weights run UNCHANGED
through the flag-compatible CLIs, and bndm-tpu-trained models export back to
the reference's diffusers ``save_pretrained`` trees.

Covers the reference's loading surfaces:
  - iadb_bn.py:714      torch model.ckpt from the recomputed run folder
  - ddim_diffusers.py:640-643  UNet2DModel/DDIMScheduler.from_pretrained trees
  - ddim_diffusers.py:869-885  EMA params copied into the saved unet/
"""

import json
import os

import numpy as np
import pytest

from bndm_tpu.data.imagefolder import make_synthetic_folder


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_synthetic_folder(str(tmp_path / "data" / "tinycat"), n=8, res=64)
    rng = np.random.default_rng(0)
    n = 4096
    L = np.tril(rng.standard_normal((n, n)).astype(np.float32) * 0.01)
    np.fill_diagonal(L, 1.0)
    os.makedirs("bluenoise", exist_ok=True)
    np.savez_compressed("bluenoise/cov_gaussianBN_L_res64_d3.npz", x=L)
    return tmp_path


IADB_COMMON = [
    "--dataset=tinycat", "--res=64", "--batch_size=4", "--tiny_model",
    "--noise_type=gaussianBN", "--scheduler_gamma=sigmoid", "--scheduler_param=0.2",
    "--out_channel=6", "--compute_dtype=float32", "--nb_steps=10",
]

DDIM_COMMON = [
    "--dataset_name=tinycat", "--resolution=64", "--tiny_model",
    "--output_dir=ddim_interop", "--compute_dtype=float32",
    "--ddpm_num_inference_steps=10",
]


def test_iadb_reference_ckpt_runs_unchanged(workdir):
    """The done-condition from VERDICT #1: write a torch-format model.ckpt
    fixture, delete model.npz, and the test CLI still samples."""
    from bndm_tpu.cli.common import load_params
    from bndm_tpu.cli.iadb_bn import main
    from bndm_tpu.models.convert import export_torch_ckpt

    main(IADB_COMMON + ["--train_or_test=train", "--epochs=1", "--max_steps=1"])
    out = workdir / "results_gaussianBN" / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0"

    params = load_params(str(out / "model.npz"))
    export_torch_ckpt(params, str(out / "model.ckpt"))
    os.remove(out / "model.npz")

    main(IADB_COMMON + ["--train_or_test=test", "--test_samples=2", "--save_all_samples"])
    imgdir = out / "tinycat_iadb_gwn2gbn_steps10" / "images"
    assert len(list(imgdir.glob("*.png"))) == 2


def test_iadb_export_reference_ckpt_flag(workdir):
    """--export_reference_ckpt writes a model.ckpt torch can load back with
    the exact key set of a torch state_dict."""
    import torch

    from bndm_tpu.cli.iadb_bn import main

    main(IADB_COMMON + ["--train_or_test=train", "--epochs=1", "--max_steps=1",
                        "--export_reference_ckpt"])
    out = workdir / "results_gaussianBN" / "tinycat_gaussianBN_sigmoid_0.2_0_3_outc6_seed0"
    sd = torch.load(str(out / "model.ckpt"), map_location="cpu", weights_only=True)
    assert any(k.startswith("down_blocks.0.resnets.0.conv1.") for k in sd)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())


def test_ddim_pretrained_tree_runs_unchanged(workdir):
    """Training writes the save_pretrained tree; deleting unet/model.npz and
    re-running test mode must produce byte-identical samples from the
    safetensors+config.json tree alone (from_pretrained parity)."""
    from bndm_tpu.cli.ddim import main

    main(DDIM_COMMON + ["--train_or_test=train", "--train_batch_size=4",
                        "--num_epochs=1", "--max_steps=1", "--lr_warmup_steps=0"])
    out = workdir / "results_gaussianBN" / "ddim_interop"
    # the save_pretrained tree exists next to our npz
    assert (out / "unet" / "config.json").exists()
    assert (out / "unet" / "diffusion_pytorch_model.safetensors").exists()
    assert (out / "scheduler" / "scheduler_config.json").exists()
    assert (out / "model_index.json").exists()
    cfg = json.loads((out / "unet" / "config.json").read_text())
    assert cfg["_class_name"] == "UNet2DModel"
    assert cfg["block_out_channels"] == [8, 16]

    main(DDIM_COMMON + ["--train_or_test=test", "--eval_batch_size=2",
                        "--test_samples=2"])
    ref_img = (out / "images" / "ddim_img00000_0.png").read_bytes()

    os.remove(out / "unet" / "model.npz")
    main(DDIM_COMMON + ["--train_or_test=test", "--eval_batch_size=2",
                        "--test_samples=2"])
    assert (out / "images" / "ddim_img00000_0.png").read_bytes() == ref_img


def test_ddim_tree_config_overrides_flags(workdir):
    """A published tree's config.json wins over CLI flags (the reference's
    from_pretrained reads the architecture from the tree, not argparse)."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.ddim import main
    from bndm_tpu.models.convert import (ddim_scheduler_config,
                                         export_pipeline_tree)
    from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig

    # build a tree with a DIFFERENT tiny architecture than --tiny_model
    cfg = UNet2DConfig(
        in_channels=3, out_channels=3, block_out_channels=(8, 8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D", "UpBlock2D"),
        attention_head_dim=4, norm_num_groups=4,
    )
    model = UNet2D(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)),
                        jnp.zeros((1,)))
    out = workdir / "results_gaussianBN" / "ddim_tree_only"
    export_pipeline_tree(str(out), jax.device_get(params), cfg, 64,
                         ddim_scheduler_config(100))

    # no --tiny_model: without the tree this would build the 113M res-64 UNet
    # and fail to load; with it, the 3-block config.json is used
    main(["--dataset_name=tinycat", "--resolution=64", "--output_dir=ddim_tree_only",
          "--compute_dtype=float32", "--ddpm_num_steps=100",
          "--ddpm_num_inference_steps=5", "--train_or_test=test",
          "--eval_batch_size=2", "--test_samples=2"])
    assert len(list((out / "images").glob("*.png"))) == 2


def test_ema_weights_reach_eval(workdir):
    """VERDICT #2/#3: with --use_ema the weights saved to unet/ (what run_test
    loads) are the EMA params, not the raw ones."""
    from bndm_tpu.cli.common import load_params
    from bndm_tpu.cli.ddim import main

    main(DDIM_COMMON + ["--train_or_test=train", "--train_batch_size=4",
                        "--num_epochs=1", "--max_steps=2", "--lr_warmup_steps=0",
                        "--use_ema"])
    out = workdir / "results_gaussianBN" / "ddim_interop_ema"
    unet = load_params(str(out / "unet" / "model.npz"))
    ema = load_params(str(out / "unet_ema" / "model.npz"))

    import jax

    flat_u = jax.tree_util.tree_leaves(unet)
    flat_e = jax.tree_util.tree_leaves(ema)
    assert all(np.array_equal(u, e) for u, e in zip(flat_u, flat_e))


def test_latent_pipeline_tree_export(workdir):
    from bndm_tpu.cli.latent_iadb import main

    common = [
        "--dataset_name=tinycat", "--resolution=256", "--tiny_model",
        "--output_dir=latent_interop", "--compute_dtype=float32",
        "--noise_type=gaussianBN", "--out_channels=4",
        "--ddpm_num_steps=100", "--ddpm_num_inference_steps=5",
    ]
    main(common + ["--train_or_test=train", "--train_batch_size=4",
                   "--num_epochs=1", "--max_steps=1", "--lr_warmup_steps=0"])
    out = workdir / "results_gaussianBN" / "latent_interop_gaussianBN"
    sched = json.loads((out / "scheduler" / "scheduler_config.json").read_text())
    assert sched["_class_name"] == "IADBScheduler"
    idx = json.loads((out / "model_index.json").read_text())
    assert idx["_class_name"] == "IADBPipeline"
    cfg = json.loads((out / "unet" / "config.json").read_text())
    assert cfg["out_channels"] == 8  # BN doubling (latent_...:282-283)

    # tree-only load: remove npz, test must still run
    os.remove(out / "unet" / "model.npz")
    main(common + ["--train_or_test=test", "--eval_batch_size=2",
                   "--test_samples=2"])
    assert len(list((out / "images").glob("*.png"))) == 2


def test_pretrained_unet_roundtrip(tmp_path):
    """export_pretrained_unet -> load_pretrained_unet: identical params AND
    reconstructed config."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.convert import (export_pretrained_unet,
                                         load_pretrained_unet)
    from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig

    cfg = UNet2DConfig(
        in_channels=3, out_channels=6, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        attention_head_dim=4, norm_num_groups=4,
    )
    model = UNet2D(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)),
                        jnp.zeros((1,)))
    d = tmp_path / "unet"
    export_pretrained_unet(str(d), jax.device_get(params), cfg, sample_size=16)

    params2, cfg2 = load_pretrained_unet(str(d))
    assert cfg2 == cfg
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(params)), flat2):
        np.testing.assert_array_equal(np.asarray(a, np.float32), b)


def test_scheduler_from_config():
    from bndm_tpu.models.convert import ddim_scheduler_config
    from bndm_tpu.samplers.ddim import DDIMScheduler

    d = ddim_scheduler_config(num_train_timesteps=500, beta_schedule="linear",
                              prediction_type="v_prediction",
                              timestep_spacing="trailing")
    s = DDIMScheduler.from_config(d)
    assert s.num_train_timesteps == 500
    assert s.prediction_type == "v_prediction"
    assert s.timestep_spacing == "trailing"
    assert s.alphas_cumprod.shape == (500,)
