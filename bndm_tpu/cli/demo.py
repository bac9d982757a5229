"""Interactive comparison demo: DDIM vs IADB vs BNDM on the same noise.

TPU-native counterpart of reference ``gradio_bndm.py`` (:86-151): loads the
three church-64 models (DDIM baseline, IADB/gaussian, BNDM/gaussianBN),
denoises the SAME initial white noise with each, and shows intermediate
states per step. Three front ends over the same ``generate_all``:

  * ``--serve_http`` — dependency-free live server (stdlib http.server):
    slider UI in the browser, per-frame PNGs, and a POST /api/generate
    endpoint that re-runs the three samplers for a new seed. This is the
    served path that actually runs (and is socket-level tested) in images
    without gradio.
  * gradio slider UI when gradio is installed (``--serve`` forces it) —
    mirrors the reference's interface (gradio_bndm.py:139-151).
  * otherwise a static comparison panel PNG (method rows x step columns).

  python -m bndm_tpu.cli.demo --dataset=church_res64 --res=64 \
      --scheduler_gamma=sigmoid --scheduler_param=1000 --nb_steps=50
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="church_res64")
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--train_or_test", type=str, default="test")
    p.add_argument("--scheduler_gamma", type=str, default="sigmoid")
    p.add_argument("--scheduler_param", type=float, default=1000)
    p.add_argument("--scheduler_param_s", type=float, default=0)
    p.add_argument("--scheduler_param_e", type=float, default=3)
    p.add_argument("--nb_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bluenoise_dir", type=str, default="bluenoise")
    p.add_argument("--output", type=str, default="demo_comparison.png")
    p.add_argument("--tiny_model", action="store_true")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--serve", action="store_true", help="force the gradio UI")
    p.add_argument("--serve_http", action="store_true",
                   help="serve the comparison UI over stdlib http.server "
                        "(no gradio needed)")
    p.add_argument("--port", type=int, default=7860,
                   help="--serve_http port (0 = ephemeral)")
    return p.parse_args(argv)


def _model_and_params(opt, out_channel, ckpt_path):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.cli.common import load_params
    from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig, unet_config_for_res

    if opt.tiny_model:
        cfg = UNet2DConfig(
            in_channels=3, out_channels=out_channel, block_out_channels=(8, 16),
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
            attention_head_dim=4, norm_num_groups=4, dtype=opt.compute_dtype,
        )
    else:
        cfg = unet_config_for_res(opt.res, 3, out_channel, dtype=opt.compute_dtype)
    model = UNet2D(cfg)
    if ckpt_path and os.path.exists(ckpt_path):
        params = load_params(ckpt_path)
    else:
        print(f"WARNING: checkpoint {ckpt_path} not found; random init "
              "(demo still shows the pipeline plumbing)")
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 3, opt.res, opt.res)), jnp.zeros((1,)))
    return model, params


def load_all(opt):
    """Load the three (model, params) pairs ONCE — mirrors the reference demo,
    which loads its models at startup and only re-samples per request
    (gradio_bndm.py:64-80). Returns dict name -> (model, params)."""
    ds = opt.dataset
    return {
        "DDIM": _model_and_params(
            opt, 3, f"results_gaussianBN/ddim_{ds}/unet/model.npz"),
        "IADB": _model_and_params(
            opt, 3, f"results_gaussianBN/{ds}_gaussian_linear_outc3_seed0/model.npz"),
        "BNDM": _model_and_params(
            opt, 6,
            f"results_gaussianBN/{ds}_gaussianBN_{opt.scheduler_gamma}_outc6_seed0/model.npz"),
    }


def generate_all(opt, loaded=None):
    """Run the three methods from the same x0; returns dict name -> frames
    (n_frames, C, H, W) in [-1, 1]-ish (intermediates unnormalized).

    ``loaded``: optional dict from :func:`load_all`; pass it to avoid
    re-reading checkpoints on every call (the live server does)."""
    import jax
    import jax.numpy as jnp

    from bndm_tpu.samplers.ddim import DDIMScheduler, sample_ddim
    from bndm_tpu.samplers.iadb import sample_iadb

    if loaded is None:
        loaded = load_all(opt)
    key = jax.random.PRNGKey(opt.seed)
    x0 = jax.random.normal(key, (1, 3, opt.res, opt.res), jnp.float32)

    results = {}
    # DDIM baseline (reference model dir ddim_church_res64)
    m, p = loaded["DDIM"]
    sched = DDIMScheduler()
    out, frames = sample_ddim(m.apply, p, x0, scheduler=sched,
                              num_inference_steps=opt.nb_steps, collect_frames=True)
    results["DDIM"] = np.asarray(frames[:, 0])

    # IADB (gaussian, outc3)
    m, p = loaded["IADB"]
    out, frames = sample_iadb(m.apply, p, x0, nb_steps=opt.nb_steps,
                              collect_frames=True, log_freq=max(opt.nb_steps // 10, 1))
    results["IADB"] = np.asarray(frames[:, 0])

    # BNDM (gaussianBN, outc6)
    m, p = loaded["BNDM"]
    sp = (opt.scheduler_param, opt.scheduler_param_s, opt.scheduler_param_e)
    out, frames = sample_iadb(m.apply, p, x0, nb_steps=opt.nb_steps,
                              scheduler_gamma=opt.scheduler_gamma, gamma_params=sp,
                              two_head=True, collect_frames=True,
                              log_freq=max(opt.nb_steps // 10, 1))
    results["BNDM"] = np.asarray(frames[:, 0])
    return results


def _to_img(frame, final):
    a = np.asarray(frame)
    if final:
        a = np.clip((a + 1.0) / 2.0, 0, 1)
    else:
        a = (a - a.min()) / max(a.max() - a.min(), 1e-8)
    return np.transpose(a, (1, 2, 0))


def save_panel(results, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = len(results)
    cols = max(len(v) for v in results.values())
    fig, axes = plt.subplots(rows, cols, figsize=(1.6 * cols, 1.8 * rows))
    for r, (name, frames) in enumerate(results.items()):
        for c in range(cols):
            ax = axes[r][c] if rows > 1 else axes[c]
            if c < len(frames):
                ax.imshow(_to_img(frames[c], final=(c == len(frames) - 1)))
            ax.set_xticks([])
            ax.set_yticks([])
            if c == 0:
                ax.set_ylabel(name, fontsize=12)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"comparison panel written to {path}")


_PAGE = """<!doctype html>
<html><head><title>BNDM-TPU: DDIM vs IADB vs BNDM</title>
<style>
 body {{ font-family: sans-serif; margin: 2em; background: #fafafa; }}
 .row {{ display: flex; gap: 2em; align-items: center; }}
 figure {{ text-align: center; }}
 img {{ width: 256px; image-rendering: pixelated; border: 1px solid #ccc; }}
 input[type=range] {{ width: 40em; }}
</style></head><body>
<h2>BNDM-TPU — denoising comparison (same initial noise)</h2>
<div class="row" id="imgs">{figs}</div>
<p><label>denoising frame <input type="range" id="step" min="0" max="{nmax}"
 value="{nmax}" oninput="upd()"> <span id="stepv">{nmax}</span></label></p>
<p><label>seed <input type="number" id="seed" value="0" style="width:5em">
 </label> <button onclick="regen()">regenerate</button>
 <span id="status"></span></p>
<script>
function upd() {{
  const s = document.getElementById('step').value;
  document.getElementById('stepv').textContent = s;
  for (const im of document.querySelectorAll('img'))
    im.src = '/frame/' + im.dataset.method + '/' + s + '.png?v=' + Date.now();
}}
async function regen() {{
  document.getElementById('status').textContent = 'sampling...';
  const seed = document.getElementById('seed').value;
  await fetch('/api/generate?seed=' + seed, {{method: 'POST'}});
  document.getElementById('status').textContent = '';
  upd();
}}
</script></body></html>"""


def _png_bytes(frame, final):
    """Encode one (C, H, W) frame to PNG via PIL (no matplotlib needed)."""
    import io

    from PIL import Image

    a = (_to_img(frame, final) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    return buf.getvalue()


def make_http_server(opt, results, loaded=None):
    """Build (not start) a ThreadingHTTPServer serving the comparison UI.

    Endpoints: GET / (slider page), GET /api/meta (methods + frame count),
    GET /frame/<method>/<idx>.png, POST /api/generate?seed=N (re-runs the
    three samplers — the live-serving path the reference exposes through
    gradio, gradio_bndm.py:86-136). Returned server has .server_address;
    call .serve_forever() (blocking) or drive it from a thread in tests.

    ``loaded``: models/params from :func:`load_all`, loaded once here if not
    given, so POST /api/generate only re-samples (no checkpoint re-reads).
    """
    import http.server
    import json as _json
    import urllib.parse

    state = {"results": results, "loaded": loaded or load_all(opt)}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code, body, ctype="text/html; charset=utf-8"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            res = state["results"]
            path = urllib.parse.urlparse(self.path).path
            if path in ("/", "/index.html"):
                nmax = max(len(v) for v in res.values()) - 1
                figs = "".join(
                    f'<figure><img data-method="{m}" src="/frame/{m}/{nmax}.png">'
                    f"<figcaption>{m}</figcaption></figure>"
                    for m in res
                )
                self._send(200, _PAGE.format(figs=figs, nmax=nmax).encode())
            elif path == "/api/meta":
                meta = {m: len(v) for m, v in res.items()}
                self._send(200, _json.dumps(meta).encode(),
                           "application/json")
            elif path.startswith("/frame/"):
                try:
                    _, _, method, idx = path.split("/")
                    idx = int(idx.split(".")[0])
                    frames = res[method]
                    idx = min(idx, len(frames) - 1)
                    png = _png_bytes(frames[idx], final=(idx == len(frames) - 1))
                    self._send(200, png, "image/png")
                except (KeyError, ValueError, IndexError):
                    self._send(404, b"not found", "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            q = urllib.parse.urlparse(self.path)
            if q.path == "/api/generate":
                try:
                    seed = int(urllib.parse.parse_qs(q.query).get("seed", ["0"])[0])
                except ValueError:
                    self._send(400, b'{"ok": false, "error": "seed must be an integer"}',
                               "application/json")
                    return
                import copy

                o = copy.copy(opt)
                o.seed = seed
                try:
                    state["results"] = generate_all(o, state["loaded"])
                except Exception as e:  # noqa: BLE001 — report, don't hang the client
                    self._send(500, _json.dumps(
                        {"ok": False, "error": str(e)}).encode(),
                        "application/json")
                    return
                self._send(200, b'{"ok": true}', "application/json")
            else:
                self._send(404, b"not found", "text/plain")

    return http.server.ThreadingHTTPServer(("127.0.0.1", opt.port), Handler)


def serve_http(opt, results, loaded=None):
    srv = make_http_server(opt, results, loaded)
    host, port = srv.server_address[:2]
    print(f"serving comparison UI at http://{host}:{port}/ "
          "(ctrl-c to stop)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()


def serve_gradio(opt, results):
    import gradio as gr

    names = list(results)
    n = max(len(v) for v in results.values())

    def show(step_idx):
        return [
            _to_img(results[name][min(int(step_idx), len(results[name]) - 1)],
                    final=(int(step_idx) >= len(results[name]) - 1))
            for name in names
        ]

    with gr.Blocks(title="BNDM-TPU: DDIM vs IADB vs BNDM") as ui:
        slider = gr.Slider(0, n - 1, value=n - 1, step=1, label="denoising frame")
        imgs = [gr.Image(label=name) for name in names]
        slider.change(show, inputs=slider, outputs=imgs)
    ui.launch()


def main(argv=None):
    opt = parse_args(argv)
    loaded = load_all(opt)
    results = generate_all(opt, loaded)
    if opt.serve_http:
        serve_http(opt, results, loaded)
        return
    try:
        import gradio  # noqa: F401

        has_gradio = True
    except ImportError:
        has_gradio = False
    if has_gradio or opt.serve:
        serve_gradio(opt, results)
    else:
        save_panel(results, opt.output)


if __name__ == "__main__":
    main()
