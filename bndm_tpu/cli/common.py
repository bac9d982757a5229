"""Shared CLI plumbing: run-folder naming, L-matrix loading, checkpoint IO.

The reference encodes run identity in the output directory name computed
from flag values (iadb_bn.py:481-499) and *finds* checkpoints at test time
by recomputing that name — we reproduce the convention exactly so runs are
interchangeable.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from bndm_tpu.ops.cov import load_cov_L


def output_folder_name(opt):
    """Reference naming (iadb_bn.py:481-499)."""
    outer = (
        f"results_gaussianBN_{opt.conditional_type}" if opt.is_conditional else "results_gaussianBN"
    )
    if opt.scheduler_gamma == "linear" or opt.optimize_scheduler_param:
        name = f"{opt.dataset}_{opt.noise_type}_{opt.scheduler_gamma}_outc{opt.out_channel}_seed{opt.seed}"
    else:
        remap = "_remap" if opt.remap else ""
        name = (
            f"{opt.dataset}_{opt.noise_type}_{opt.scheduler_gamma}_{opt.scheduler_param}"
            f"_{opt.scheduler_param_s}_{opt.scheduler_param_e}_outc{opt.out_channel}{remap}_seed{opt.seed}"
        )
    return os.path.join(outer, name)


def noise_folder_name(noise_type):
    """(iadb_bn.py:689-703)"""
    return {
        "gaussianBN": "gwn2gbn",
        "gaussian": "gwn",
        "gaussianRN": "gwn2grn",
        "GBN": "gbn",
    }[noise_type]


def serving_relax_kw(args):
    """Serving-only model-config relaxations requested on the CLI, as kwargs
    for ``dataclasses.replace`` on the *serving* UNet2DConfig. Calibration
    always runs the exact model (fp32 softmax), so these are applied to
    ``sta_kw`` / the standalone serving model only — one place to extend when
    the next fidelity-gated relaxation lands (used by all three CLIs)."""
    kw = {}
    dt = getattr(args, "attn_softmax_dtype", "float32")
    if dt != "float32":
        kw["attn_softmax_dtype"] = dt
    return kw


def load_L_for(noise_type, bluenoise_dir="bluenoise"):
    kind = "red" if noise_type == "gaussianRN" else "blue"
    return load_cov_L(res=64, dimension=3, kind=kind,
                      search_dirs=(".", bluenoise_dir), cache_dir=bluenoise_dir)


def save_params(path, params, extra=None):
    """Flat .npz checkpoint of a flax params tree (+ json sidecar)."""
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                flat["/".join(prefix + (k,))] = np.asarray(v)

    walk(params.get("params", params), ("params",))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)
    if extra is not None:
        with open(path + ".json", "w") as f:
            json.dump(extra, f)


def load_params(path):
    data = np.load(path)
    tree = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jax.numpy.asarray(data[key])
    return tree


def load_pixel_unet_params(out_dir):
    """Weight resolution for the pixel CLI's test/resume paths: bndm-tpu's own
    ``model.npz`` first, else the reference's torch ``model.ckpt`` at the same
    path (iadb_bn.py:714) through the converter — so published checkpoints run
    unchanged through the flag-compatible CLI."""
    npz = os.path.join(out_dir, "model.npz")
    if os.path.exists(npz):
        return load_params(npz)
    ckpt = os.path.join(out_dir, "model.ckpt")
    if os.path.exists(ckpt):
        from bndm_tpu.models.convert import load_reference_unet

        print(f"loading reference torch checkpoint: {ckpt}")
        return load_reference_unet(ckpt)
    raise FileNotFoundError(f"no model.npz or model.ckpt in {out_dir}")


def load_tree_unet_params(out_dir):
    """Weight resolution for the diffusers-tree pipelines (ddim/latent):
    ``unet/model.npz`` first, else the ``save_pretrained`` tree
    (config.json + diffusion_pytorch_model.safetensors/.bin), mirroring
    ``UNet2DModel.from_pretrained(output_dir+"/unet")``
    (ddim_diffusers.py:642). Returns (params, UNet2DConfig|None) — the config
    comes from unet/config.json when present so the published architecture
    wins over CLI flags."""
    unet_dir = os.path.join(out_dir, "unet")
    cfg = None
    cfg_path = os.path.join(unet_dir, "config.json")
    if os.path.exists(cfg_path):
        from bndm_tpu.models.convert import unet_config_from_diffusers

        with open(cfg_path) as f:
            cfg = unet_config_from_diffusers(json.load(f))
    npz = os.path.join(unet_dir, "model.npz")
    if os.path.exists(npz):
        return load_params(npz), cfg
    from bndm_tpu.models.convert import load_pretrained_unet

    print(f"loading diffusers save_pretrained tree: {unet_dir}")
    params, tree_cfg = load_pretrained_unet(unet_dir)
    return params, (tree_cfg or cfg)


def save_image_grid(arr_nchw, path):
    from PIL import Image

    a = np.asarray(arr_nchw)
    a = np.clip((a + 1.0) / 2.0, 0.0, 1.0)
    a = (np.transpose(a, (0, 2, 3, 1)) * 255).astype(np.uint8)
    for i, img in enumerate(a):
        Image.fromarray(img).save(path.format(i))


class AsyncImageWriter:
    """Background PNG encoder for gallery-scale eval (r5, VERDICT r4 #2).

    The reference's gallery workload writes every sample to disk
    (iadb_bn.py:719-816, total_num=30000). On this 1-core host a synchronous
    PIL encode serializes with the TPU: the chip idles while Python encodes
    the previous batch. Encoding on a daemon thread overlaps the two — the
    main thread spends batch time blocked in ``block_until_ready`` (GIL
    released), which is exactly when the encoder runs. A bounded queue
    applies back-pressure so at most ``max_queue`` batches of pixels are in
    flight (bounds host RAM).

    Encode errors are captured and re-raised on the next submit()/close() —
    never silently dropped.
    """

    def __init__(self, max_queue: int = 4):
        import queue
        import threading

        self._q = queue.Queue(maxsize=max_queue)
        self._err = None
        self._n = 0
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                arr, path = item
                save_image_grid(arr, path)
                self._n += arr.shape[0]
            except Exception as e:  # noqa: BLE001 — surfaced on submit/close
                self._err = e
            finally:
                self._q.task_done()

    def submit(self, arr_nchw, path):
        if self._err:
            raise self._err
        self._q.put((np.asarray(arr_nchw), path))

    def close(self):
        """Drain the queue, stop the thread, re-raise any encode error.
        Returns the number of images written."""
        self._q.put(None)
        self._t.join()
        if self._err:
            raise self._err
        return self._n
