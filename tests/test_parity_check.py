"""End-to-end test of the checkpoint parity harness with both formats."""

import numpy as np
import pytest


@pytest.fixture()
def tiny_ref_ckpts(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models.convert import convert_flax_params, export_reference_unet
    from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig

    cfg = UNet2DConfig(
        in_channels=3, out_channels=6, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        attention_head_dim=4, norm_num_groups=4,
    )
    m = UNet2D(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)), jnp.zeros((1,)))
    export_reference_unet(params, "ref.safetensors")
    import torch

    sd = {k: torch.from_numpy(np.array(v)) for k, v in convert_flax_params(params).items()}
    torch.save(sd, "model.ckpt")
    # make the CLI build this tiny config for res 64
    import bndm_tpu.cli.parity_check as pc
    import bndm_tpu.models.unet2d as U

    monkeypatch.setattr(U, "unet_config_for_res", lambda *a, **k: cfg)
    return tmp_path


def test_parity_check_both_formats(tiny_ref_ckpts, capsys):
    from bndm_tpu.cli.parity_check import main

    for ckpt in ("model.ckpt", "ref.safetensors"):
        main(["--ckpt", ckpt, "--nb_steps", "4", "--output", f"p_{ckpt}.png"])
    out = capsys.readouterr().out
    assert out.count("probe forward:") == 2
    # both formats must produce identical probe statistics
    lines = [l for l in out.splitlines() if l.startswith("probe forward:")]
    assert lines[0] == lines[1]
    assert (tiny_ref_ckpts / "p_model.ckpt_0.png").exists()


def test_load_reference_artifact_path(tmp_path):
    """load_cov_L must pick up the reference's exact artifact naming."""
    from bndm_tpu.ops.cov import load_cov_L

    rng = np.random.default_rng(0)
    L = np.tril(rng.standard_normal((64, 64)).astype(np.float32))
    d = tmp_path / "bluenoise"
    d.mkdir()
    np.savez_compressed(d / "cov_gaussianBN_L_res8_d3.npz", x=L)
    got = load_cov_L(res=8, dimension=3, kind="blue", search_dirs=(str(d),))
    np.testing.assert_array_equal(got, L)
