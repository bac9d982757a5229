"""Checkpoint conversion: diffusers/torch UNet2DModel <-> bndm_tpu UNet2D.

The reference publishes weights as torch ``model.ckpt`` state_dicts
(iadb_bn.py:714,1028) and diffusers ``save_pretrained`` safetensors trees
(ddim_diffusers.py:869-885, latent_...:669-685). This module maps those to
our Flax param tree (and back) so published checkpoints run unchanged.

Layout rules:
  torch conv weight (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
  torch linear weight (O, I)        -> flax kernel (I, O)
  torch norm weight/bias            -> flax scale/bias
  name "a.0.b" -> path ("a_0", "b"); "to_out.0" -> "to_out_0"
  legacy AttentionBlock names (query/key/value/proj_attn) -> to_q/to_k/to_v/to_out_0

No diffusers dependency: ``.ckpt`` via torch (CPU), ``.safetensors`` via a
minimal self-contained parser.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict

import numpy as np

_LEGACY_ATTN = {
    "query": "to_q",
    "key": "to_k",
    "value": "to_v",
    "proj_attn": "to_out_0",
}

_NORM_MODULES = ("norm1", "norm2", "group_norm", "conv_norm_out", "norm")


def torch_key_to_flax_path(key):
    """'down_blocks.0.resnets.1.conv1.weight' -> ('down_blocks_0','resnets_1','conv1','weight')."""
    parts = key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    merged = [_LEGACY_ATTN.get(p, p) for p in merged]
    return tuple(merged)


def _set_nested(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_state_dict(sd: Dict[str, "np.ndarray"]):
    """torch-style flat state_dict (numpy or torch tensors) -> flax params tree."""
    params = {}
    for key, val in sd.items():
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        path = torch_key_to_flax_path(key)
        module, leaf = path[:-1], path[-1]
        if leaf == "weight":
            if arr.ndim == 4:
                _set_nested(params, module + ("kernel",), np.transpose(arr, (2, 3, 1, 0)))
            elif arr.ndim == 2:
                _set_nested(params, module + ("kernel",), np.transpose(arr, (1, 0)))
            elif arr.ndim == 1:  # norm scale
                _set_nested(params, module + ("scale",), arr)
            else:
                raise ValueError(f"unexpected weight ndim for {key}: {arr.shape}")
        elif leaf == "bias":
            _set_nested(params, module + ("bias",), arr)
        else:
            # non-parameter buffers (e.g. num_batches_tracked) — skip
            continue
    return {"params": params}


def convert_flax_params(params):
    """flax params tree -> torch-style flat dict of numpy arrays."""
    flat = {}

    def walk(node, prefix):
        for name, val in node.items():
            if isinstance(val, dict):
                walk(val, prefix + (name,))
            else:
                flat[prefix + (name,)] = np.asarray(val)

    walk(params.get("params", params), ())

    sd = {}
    for path, arr in flat.items():
        module, leaf = path[:-1], path[-1]
        # flax path element 'down_blocks_0' -> torch 'down_blocks.0'
        torch_parts = []
        for p in module:
            segs = p.split("_")
            # re-split trailing digit segments: 'down_blocks_0'->('down_blocks','0'),
            # 'to_out_0'->('to_out','0'), 'linear_1' stays ('linear_1')? No —
            # torch is 'linear_1' (named child), digits only split for list
            # indices. Heuristic: split only when prefix is a known list name.
            if segs[-1].isdigit() and "_".join(segs[:-1]) in (
                "down_blocks", "up_blocks", "resnets", "attentions",
                "downsamplers", "upsamplers", "to_out",
            ):
                torch_parts.append("_".join(segs[:-1]))
                torch_parts.append(segs[-1])
            else:
                torch_parts.append(p)
        base = ".".join(torch_parts)
        if leaf == "kernel":
            if arr.ndim == 4:
                sd[f"{base}.weight"] = np.transpose(arr, (3, 2, 0, 1))
            else:
                sd[f"{base}.weight"] = np.transpose(arr, (1, 0))
        elif leaf == "scale":
            sd[f"{base}.weight"] = arr
        elif leaf == "bias":
            sd[f"{base}.bias"] = arr
        else:
            raise ValueError(f"unexpected leaf {leaf} at {base}")
    return sd


# ----------------------------- file loading ----------------------------------

_SAFETENSORS_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def load_safetensors(path):
    """Minimal safetensors reader -> dict[str, np.ndarray]."""
    out = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        data_start = 8 + hlen
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            dtype_tag = meta["dtype"]
            shape = meta["shape"]
            begin, end = meta["data_offsets"]
            f.seek(data_start + begin)
            raw = f.read(end - begin)
            if dtype_tag == "BF16":
                u16 = np.frombuffer(raw, dtype=np.uint16)
                arr = (u16.astype(np.uint32) << 16).view(np.float32)
            else:
                arr = np.frombuffer(raw, dtype=_SAFETENSORS_DTYPES[dtype_tag])
            out[name] = arr.reshape(shape).copy()
    return out


def save_safetensors(tensors, path, metadata=None):
    """Minimal safetensors writer -> file readable by torch/diffusers.

    Completes the round trip: bndm-tpu checkpoints can be exported back to
    the reference's ecosystem (``convert_flax_params`` -> this writer).
    """
    header = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    blobs = []
    offset = 0
    tag_of = {"float32": "F32", "float16": "F16", "float64": "F64",
              "int64": "I64", "int32": "I32", "uint8": "U8", "bool": "BOOL"}
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if str(arr.dtype) not in tag_of:
            raise ValueError(f"unsupported export dtype {arr.dtype} for {name}; "
                             "cast (e.g. bf16 -> f32) before export")
        raw = arr.tobytes()
        header[name] = {
            "dtype": tag_of[str(arr.dtype)],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        blobs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


def export_reference_unet(params, path):
    """flax params -> diffusers-style .safetensors state dict on disk."""
    sd = {k: np.asarray(v, np.float32) for k, v in convert_flax_params(params).items()}
    save_safetensors(sd, path, metadata={"format": "pt"})


def load_torch_checkpoint(path):
    """Load a torch .ckpt/.pt state_dict to numpy (CPU, weights only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def load_reference_unet(path):
    """Load reference weights (.ckpt or .safetensors) as flax params."""
    if str(path).endswith(".safetensors"):
        return convert_torch_state_dict(load_safetensors(path))
    return convert_torch_state_dict(load_torch_checkpoint(path))


def export_torch_ckpt(params, path):
    """flax params -> torch ``model.ckpt`` state_dict (iadb_bn.py:1028 format),
    loadable by the reference's ``model.load_state_dict(torch.load(...))``."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, np.float32))
          for k, v in convert_flax_params(params).items()}
    torch.save(sd, path)


# ------------------ diffusers ``save_pretrained`` trees ----------------------
#
# The reference ecosystem consumes/produces directory trees written by
# ``DDIMPipeline/IADBPipeline.save_pretrained`` (ddim_diffusers.py:869-885,
# latent_...:669-685) and read back by ``UNet2DModel.from_pretrained`` /
# ``DDIMScheduler.from_pretrained`` (ddim_diffusers.py:640-643):
#   <out>/unet/config.json + diffusion_pytorch_model.safetensors
#   <out>/scheduler/scheduler_config.json
#   <out>/model_index.json
# These writers/readers make bndm-tpu checkpoints round-trip with it.

_DIFFUSERS_VERSION = "0.27.0"
UNET_WEIGHTS_NAME = "diffusion_pytorch_model.safetensors"
UNET_WEIGHTS_NAME_BIN = "diffusion_pytorch_model.bin"


def diffusers_unet_config(cfg, sample_size=None):
    """bndm_tpu UNet2DConfig -> diffusers ``UNet2DModel`` config.json dict."""
    return {
        "_class_name": "UNet2DModel",
        "_diffusers_version": _DIFFUSERS_VERSION,
        "act_fn": cfg.act_fn,
        "add_attention": cfg.add_attention,
        "attention_head_dim": cfg.attention_head_dim,
        "attn_norm_num_groups": None,
        "block_out_channels": list(cfg.block_out_channels),
        "center_input_sample": False,
        "class_embed_type": None,
        "down_block_types": list(cfg.down_block_types),
        "downsample_padding": 1,
        "downsample_type": "conv",
        "dropout": cfg.dropout,
        "flip_sin_to_cos": cfg.flip_sin_to_cos,
        "freq_shift": int(cfg.freq_shift),
        "in_channels": cfg.in_channels,
        "layers_per_block": cfg.layers_per_block,
        "mid_block_scale_factor": 1,
        "norm_eps": cfg.norm_eps,
        "norm_num_groups": cfg.norm_num_groups,
        "num_class_embeds": None,
        "num_train_timesteps": None,
        "out_channels": cfg.out_channels,
        "resnet_time_scale_shift": "default",
        "sample_size": sample_size,
        "time_embedding_type": "positional",
        "up_block_types": list(cfg.up_block_types),
        "upsample_type": "conv",
    }


def unet_config_from_diffusers(d):
    """diffusers config.json dict -> UNet2DConfig (the subset we implement)."""
    from bndm_tpu.models.unet2d import UNet2DConfig

    unsupported = {
        "center_input_sample": False,
        "class_embed_type": None,
        "num_class_embeds": None,
        "resnet_time_scale_shift": "default",
        "time_embedding_type": "positional",
        "downsample_type": "conv",
        "upsample_type": "conv",
    }
    for k, v in unsupported.items():
        if d.get(k, v) != v:
            raise NotImplementedError(f"diffusers UNet2DModel config {k}={d[k]!r} "
                                      "is outside the subset bndm-tpu implements")
    return UNet2DConfig(
        in_channels=d.get("in_channels", 3),
        out_channels=d.get("out_channels", 3),
        block_out_channels=tuple(d["block_out_channels"]),
        down_block_types=tuple(d["down_block_types"]),
        up_block_types=tuple(d["up_block_types"]),
        layers_per_block=d.get("layers_per_block", 2),
        act_fn=d.get("act_fn", "silu"),
        attention_head_dim=d.get("attention_head_dim") or 8,
        norm_num_groups=d.get("norm_num_groups", 32),
        norm_eps=d.get("norm_eps", 1e-5),
        add_attention=d.get("add_attention", True),
        flip_sin_to_cos=d.get("flip_sin_to_cos", True),
        freq_shift=d.get("freq_shift", 0) or 0,
    )


def export_pretrained_unet(dirpath, params, cfg, sample_size=None):
    """Write a diffusers ``UNet2DModel.save_pretrained``-style directory."""
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(diffusers_unet_config(cfg, sample_size), f, indent=2, sort_keys=True)
    export_reference_unet(params, os.path.join(dirpath, UNET_WEIGHTS_NAME))


def load_pretrained_unet(dirpath):
    """Read a diffusers UNet2DModel directory -> (flax params, UNet2DConfig|None).

    Accepts safetensors or legacy torch-pickle ``.bin`` weights; the config is
    returned when ``config.json`` is present so callers can build the matching
    model (the reference relies on from_pretrained doing this,
    ddim_diffusers.py:642).
    """
    cfg = None
    cfg_path = os.path.join(dirpath, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = unet_config_from_diffusers(json.load(f))
    st = os.path.join(dirpath, UNET_WEIGHTS_NAME)
    bin_ = os.path.join(dirpath, UNET_WEIGHTS_NAME_BIN)
    if os.path.exists(st):
        params = convert_torch_state_dict(load_safetensors(st))
    elif os.path.exists(bin_):
        params = convert_torch_state_dict(load_torch_checkpoint(bin_))
    else:
        raise FileNotFoundError(f"no {UNET_WEIGHTS_NAME} or {UNET_WEIGHTS_NAME_BIN} "
                                f"in {dirpath}")
    return params, cfg


def ddim_scheduler_config(num_train_timesteps=1000, beta_schedule="linear",
                          prediction_type="epsilon", beta_start=1e-4, beta_end=0.02,
                          clip_sample=True, set_alpha_to_one=True, steps_offset=0,
                          timestep_spacing="leading"):
    """diffusers ``DDIMScheduler`` scheduler_config.json dict (the reference
    constructs it with exactly these knobs, ddim_diffusers.py:498-503)."""
    return {
        "_class_name": "DDIMScheduler",
        "_diffusers_version": _DIFFUSERS_VERSION,
        "beta_end": beta_end,
        "beta_schedule": beta_schedule,
        "beta_start": beta_start,
        "clip_sample": clip_sample,
        "clip_sample_range": 1.0,
        "dynamic_thresholding_ratio": 0.995,
        "num_train_timesteps": num_train_timesteps,
        "prediction_type": prediction_type,
        "rescale_betas_zero_snr": False,
        "sample_max_value": 1.0,
        "set_alpha_to_one": set_alpha_to_one,
        "steps_offset": steps_offset,
        "thresholding": False,
        "timestep_spacing": timestep_spacing,
        "trained_betas": None,
    }


def iadb_scheduler_config(num_train_timesteps=1000):
    """Config written by the reference's custom IADBScheduler through
    ``IADBPipeline.save_pretrained`` (latent_...:75-142,684-685)."""
    return {
        "_class_name": "IADBScheduler",
        "_diffusers_version": _DIFFUSERS_VERSION,
        "num_train_timesteps": num_train_timesteps,
    }


def export_pipeline_tree(out_dir, params, cfg, sample_size, scheduler_config,
                         pipeline_class="DDIMPipeline"):
    """Write the full ``pipeline.save_pretrained`` tree the reference emits:
    unet/ + scheduler/ + model_index.json (ddim_diffusers.py:877-885)."""
    export_pretrained_unet(os.path.join(out_dir, "unet"), params, cfg, sample_size)
    sched_dir = os.path.join(out_dir, "scheduler")
    os.makedirs(sched_dir, exist_ok=True)
    with open(os.path.join(sched_dir, "scheduler_config.json"), "w") as f:
        json.dump(scheduler_config, f, indent=2, sort_keys=True)
    sched_cls = scheduler_config.get("_class_name", "DDIMScheduler")
    index = {
        "_class_name": pipeline_class,
        "_diffusers_version": _DIFFUSERS_VERSION,
        "scheduler": ["diffusers", sched_cls] if sched_cls == "DDIMScheduler"
        else ["__main__", sched_cls],
        "unet": ["diffusers", "UNet2DModel"],
    }
    with open(os.path.join(out_dir, "model_index.json"), "w") as f:
        json.dump(index, f, indent=2, sort_keys=True)
