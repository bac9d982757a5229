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
