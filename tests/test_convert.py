import json
import struct

import jax
import jax.numpy as jnp
import numpy as np

from bndm_tpu.models.convert import (
    convert_flax_params,
    convert_torch_state_dict,
    load_safetensors,
    torch_key_to_flax_path,
)
from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig

TINY = UNet2DConfig(
    in_channels=3,
    out_channels=6,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    attention_head_dim=4,
    norm_num_groups=4,
)


def test_key_mapping():
    assert torch_key_to_flax_path("down_blocks.0.resnets.1.conv1.weight") == (
        "down_blocks_0", "resnets_1", "conv1", "weight",
    )
    assert torch_key_to_flax_path("down_blocks.1.attentions.0.to_out.0.bias") == (
        "down_blocks_1", "attentions_0", "to_out_0", "bias",
    )
    # legacy AttentionBlock naming
    assert torch_key_to_flax_path("mid_block.attentions.0.query.weight") == (
        "mid_block", "attentions_0", "to_q", "weight",
    )
    assert torch_key_to_flax_path("mid_block.attentions.0.proj_attn.weight") == (
        "mid_block", "attentions_0", "to_out_0", "weight",
    )
    assert torch_key_to_flax_path("time_embedding.linear_1.weight") == (
        "time_embedding", "linear_1", "weight",
    )


def test_roundtrip_preserves_model():
    m = UNet2D(TINY)
    params = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 3, 16, 16)), jnp.zeros((1,)))
    sd = convert_flax_params(params)
    # all keys look torch-like
    assert "conv_in.weight" in sd
    assert any(k.startswith("down_blocks.0.resnets.0.") for k in sd)
    assert any(".to_out.0." in k for k in sd)
    back = convert_torch_state_dict(sd)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 16, 16)), jnp.float32)
    t = jnp.array([0.3, 0.8])
    out1 = m.apply(params, x, t)
    out2 = m.apply(back, x, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6, atol=1e-6)


def test_conv_layout_transpose():
    sd = {"conv_in.weight": np.arange(3 * 4 * 3 * 3, dtype=np.float32).reshape(4, 3, 3, 3)}
    params = convert_torch_state_dict(sd)["params"]
    k = params["conv_in"]["kernel"]
    assert k.shape == (3, 3, 3, 4)  # HWIO
    # round trip back to OIHW
    sd2 = convert_flax_params({"params": params})
    np.testing.assert_array_equal(sd2["conv_in.weight"], sd["conv_in.weight"])


def _write_safetensors(path, tensors):
    header = {}
    blobs = []
    offset = 0
    for name, arr in tensors.items():
        raw = arr.tobytes()
        tag = {"float32": "F32", "float16": "F16", "int32": "I32"}[str(arr.dtype)]
        header[name] = {"dtype": tag, "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        blobs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


def test_safetensors_reader(tmp_path):
    tensors = {
        "a.weight": np.random.default_rng(1).standard_normal((4, 3)).astype(np.float32),
        "b.bias": np.arange(5, dtype=np.float32),
    }
    p = tmp_path / "t.safetensors"
    _write_safetensors(p, tensors)
    out = load_safetensors(p)
    for k in tensors:
        np.testing.assert_array_equal(out[k], tensors[k])


def test_safetensors_bf16(tmp_path):
    vals = np.array([1.0, -2.5, 3.25], np.float32)
    u16 = (vals.view(np.uint32) >> 16).astype(np.uint16)
    header = {"x": {"dtype": "BF16", "shape": [3], "data_offsets": [0, 6]}}
    hjson = json.dumps(header).encode()
    p = tmp_path / "bf16.safetensors"
    with open(p, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        f.write(u16.tobytes())
    out = load_safetensors(p)
    np.testing.assert_array_equal(out["x"], vals)  # bf16 of exact values


def test_export_roundtrip(tmp_path):
    """flax -> safetensors file -> flax: full on-disk round trip."""
    from bndm_tpu.models.convert import export_reference_unet, load_reference_unet

    m = UNet2D(TINY)
    params = m.init(jax.random.PRNGKey(7), jnp.zeros((1, 3, 16, 16)), jnp.zeros((1,)))
    path = tmp_path / "unet.safetensors"
    export_reference_unet(params, str(path))
    back = load_reference_unet(str(path))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 3, 16, 16)), jnp.float32)
    t = jnp.array([0.4])
    np.testing.assert_allclose(
        np.asarray(m.apply(params, x, t)), np.asarray(m.apply(back, x, t)),
        rtol=1e-6, atol=1e-6,
    )
