"""W8A8 int8 conv path (ops/int8.py) — numerics + param-tree compatibility.

The scheme is standard symmetric PTQ: per-output-channel weight scales,
dynamic per-tensor activation scale, int32 accumulation. These tests pin
the quantization math and that the opt-in UNet2DConfig.conv_int8 flag is a
pure execution change (identical parameter tree -> checkpoint converter and
init are untouched).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig
from bndm_tpu.ops.int8 import int8_conv, quantize_symmetric

TINY = dict(
    in_channels=3,
    out_channels=6,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    attention_head_dim=4,
    norm_num_groups=4,
)


def test_quantize_symmetric_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32))
    q, s = quantize_symmetric(w, axes=(0, 1, 2))
    assert q.dtype == jnp.int8
    # dequantization error bounded by half a quantization step, elementwise
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    assert (err <= 0.5 * np.asarray(s) + 1e-7).all()
    # per-output-channel: the max-|w| element of every channel hits 127 exactly
    assert (np.abs(np.asarray(q)).reshape(-1, 16).max(axis=0) == 127).all()


def test_int8_conv_matches_fp32_conv():
    """Against the exact fp32 conv: relative error at the level implied by
    8-bit operands (~1%% of the output RMS for smooth inputs)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 8, 16)) * 0.1).astype(np.float32))

    y_q = int8_conv(x, w)
    y_f = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.02, rel


def test_int8_unet_same_param_tree_and_close_output():
    """conv_int8=True must not change the parameter tree (checkpoints load
    unchanged) and must stay close to the fp32 forward on a tiny UNet."""
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 3, 16, 16)).astype(np.float32) * 0.5
    )
    t = jnp.full((2,), 0.5, jnp.float32)

    m_f = UNet2D(UNet2DConfig(**TINY))
    m_q = UNet2D(UNet2DConfig(**TINY, conv_int8=True))
    params = m_f.init(jax.random.PRNGKey(0), x, t)

    flat_f = jax.tree_util.tree_flatten_with_path(params)[0]
    params_q = m_q.init(jax.random.PRNGKey(0), x, t)
    flat_q = jax.tree_util.tree_flatten_with_path(params_q)[0]
    assert [(jax.tree_util.keystr(p), v.shape) for p, v in flat_f] == [
        (jax.tree_util.keystr(p), v.shape) for p, v in flat_q
    ]

    y_f = m_f.apply(params, x, t)
    y_q = m_q.apply(params, x, t)  # fp32-trained params, int8 execution
    rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.15, rel  # loose: quantization error compounds through depth
    assert np.isfinite(np.asarray(y_q)).all()


def test_int8_conv_static_matches_dynamic():
    """With act_scale set to the dynamic per-tensor scale of x, the static
    path must reproduce the dynamic path bit-for-bit (same quantized
    operands, same int32 accumulation)."""
    from bndm_tpu.ops.int8 import int8_conv_static

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 8, 16)) * 0.1).astype(np.float32))
    _, sx = quantize_symmetric(x, axes=(1, 2, 3))
    # per-tensor: one scale for the whole batch (max over everything)
    s = jnp.max(sx)
    y_dyn = int8_conv(jnp.broadcast_to(x / sx * s, x.shape), w)  # normalize away per-sample scales
    y_sta = int8_conv_static(jnp.broadcast_to(x / sx * s, x.shape), w, s)
    np.testing.assert_allclose(np.asarray(y_sta), np.asarray(y_dyn), rtol=1e-6, atol=1e-6)


def test_calibrate_then_static_unet():
    """End-to-end static PTQ flow on a tiny UNet: calibrate over a short
    sampling trajectory, then run the static model — every conv site must
    have a positive recorded amax and the static forward must track the fp32
    forward on in-trajectory inputs."""
    from bndm_tpu.ops.int8 import calibrate_sampling

    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 3, 16, 16)).astype(np.float32)
    )
    t = jnp.full((2,), 0.5, jnp.float32)

    m_f = UNet2D(UNet2DConfig(**TINY))
    m_cal = UNet2D(UNet2DConfig(**TINY, conv_int8=True, int8_mode="calibrate"))
    m_sta = UNet2D(UNet2DConfig(**TINY, conv_int8=True, int8_mode="static"))
    params = m_f.init(jax.random.PRNGKey(0), x, t)

    quant = calibrate_sampling(m_cal, params, x, nb_steps=6, two_head=True)
    amaxes = jax.tree_util.tree_leaves(quant)
    assert len(amaxes) > 0
    assert all(float(a) > 0 for a in amaxes)

    y_f = m_f.apply(params, x, t)
    y_s = m_sta.apply({"params": params["params"], "quant": quant}, x, t)
    rel = float(jnp.linalg.norm(y_s - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.2, rel
    assert np.isfinite(np.asarray(y_s)).all()

    # calibrate mode must leave the trajectory exact (fp32 convs)
    y_c, _ = m_cal.apply(params, x, t, mutable=["quant"])
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_f), rtol=2e-5, atol=2e-5)


def test_int8_conv_ste_gradients():
    """Straight-through estimator: grads of int8_conv == grads of the fp32
    conv (round() alone would zero them — training must stay alive)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 4, 8)) * 0.1).astype(np.float32))

    def loss_q(x, w):
        return jnp.sum(int8_conv(x, w) ** 2) / 100.0

    def loss_f(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.sum(y ** 2) / 100.0

    gq = jax.grad(loss_q, argnums=(0, 1))(x, w)
    gf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    for a, b in zip(gq, gf):
        assert float(jnp.linalg.norm(a)) > 0  # not killed by round()
        # cotangent g differs (y_q vs y_f) by ~quant error; direction matches
        rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
        assert rel < 0.05, rel


def test_int8_site_policy():
    """Profile-chosen site policy (r2): resnet conv1/conv2 + upsamplers run
    int8; conv_shortcut, conv_in, downsamplers and conv_out stay fp — their
    quantize passes cost more HBM traffic than the small convs save
    (see the r2 int8 xplane profile notes in PARITY.md)."""
    m_cal = UNet2D(UNet2DConfig(**TINY, conv_int8=True, int8_mode="calibrate"))
    x = jnp.zeros((1, 3, 16, 16), jnp.float32)
    v = m_cal.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    assert "quant" in v
    paths = {jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(v["quant"])[0]}
    joined = " ".join(sorted(paths))
    assert "conv1" in joined and "conv2" in joined and "upsamplers_0" in joined
    for banned in ("conv_shortcut", "conv_in", "downsamplers", "conv_out"):
        assert banned not in joined, (banned, joined)
