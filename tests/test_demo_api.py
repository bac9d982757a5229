import sys
import types

import numpy as np
import jax
import jax.numpy as jnp


def test_demo_gradio_ui_wiring(tmp_path, monkeypatch):
    """Exercise the gradio UI branch (cli/demo.py:serve_gradio) with a stub
    module: Blocks/Slider/Image construction, the slider callback, and
    launch() — the branch a gradio-less image can't otherwise reach."""
    monkeypatch.chdir(tmp_path)

    created = {"sliders": [], "blocks": []}

    class _Component:
        def __init__(self, *a, **k):
            pass

    class _Slider(_Component):
        def __init__(self, *a, **k):
            self.fn = None
            created["sliders"].append(self)

        def change(self, fn, inputs=None, outputs=None):
            self.fn = fn

    class _Blocks:
        def __init__(self, *a, **k):
            self.launched = False
            created["blocks"].append(self)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def launch(self, *a, **k):
            self.launched = True

    fake = types.ModuleType("gradio")
    fake.Blocks, fake.Slider, fake.Image = _Blocks, _Slider, _Component
    monkeypatch.setitem(sys.modules, "gradio", fake)

    from bndm_tpu.cli.demo import main

    main(["--dataset=tinychurch", "--res=32", "--nb_steps=4", "--tiny_model",
          "--compute_dtype=float32"])

    assert created["blocks"] and created["blocks"][0].launched
    show = created["sliders"][0].fn
    imgs = show(0)
    assert len(imgs) == 3  # DDIM / IADB / BNDM rows
    for im in imgs:
        assert im.shape == (32, 32, 3)
    # the final frame is clamped to [0, 1]
    last = show(10**6)
    assert all(float(im.min()) >= 0.0 and float(im.max()) <= 1.0 for im in last)


def test_demo_static_panel(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from bndm_tpu.cli.demo import main

    main([
        "--dataset=tinychurch", "--res=32", "--nb_steps=6", "--tiny_model",
        "--compute_dtype=float32", f"--output={tmp_path}/panel.png",
    ])
    assert (tmp_path / "panel.png").exists()


def test_api_surface():
    from bndm_tpu.api import get_model, get_scheduler, get_scheduler_gamma, sample_iadb

    t = jnp.arange(0, 1001.0)
    a = get_scheduler(t, "linear")
    g = get_scheduler_gamma(t, "sigmoid", (0.2, 0.0, 3.0))
    assert a.shape == g.shape == (1001,)

    m = get_model(res=64, out_channel=6, dtype="float32")
    # don't init the full 113M model here; just check the module config
    assert m.cfg.out_channels == 6
    assert m.cfg.block_out_channels == (128, 128, 256, 256, 512, 512)

    # sampler smoke with a fake module-like object
    class FakeModel:
        @staticmethod
        def apply(params, x, tt):
            return jnp.concatenate([jnp.ones_like(x), jnp.zeros_like(x)], axis=1)

    x0 = jnp.zeros((1, 3, 8, 8))
    out, _ = sample_iadb(FakeModel, {}, x0, 10, noise_type="gaussianBN", out_channel=6)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
