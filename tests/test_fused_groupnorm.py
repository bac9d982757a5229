"""FusedGroupNorm parity: kernel/reference math vs flax nn.GroupNorm."""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bndm_tpu.models.unet2d import UNet2D, UNet2DConfig
from bndm_tpu.ops.pallas_groupnorm import _reference_groupnorm, fused_group_norm

TINY = UNet2DConfig(
    in_channels=3,
    out_channels=6,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    attention_head_dim=4,
    norm_num_groups=4,
)


def test_reference_matches_flax_groupnorm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32) * 3 + 1)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 16).astype(np.float32))

    gn = nn.GroupNorm(4, epsilon=1e-5)
    want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = _reference_groupnorm(x, scale, bias, 4, 1e-5, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    got_silu = _reference_groupnorm(x, scale, bias, 4, 1e-5, "silu")
    np.testing.assert_allclose(
        np.asarray(got_silu), np.asarray(jax.nn.silu(want)), rtol=1e-4, atol=1e-5
    )


def test_fused_gradient_matches_unfused():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    scale = jnp.ones(8)
    bias = jnp.zeros(8)

    def f_fused(x, s, b):
        return jnp.sum(fused_group_norm(x, s, b, 4, 1e-5, "silu") ** 2)

    def f_ref(x, s, b):
        return jnp.sum(
            jax.nn.silu(
                nn.GroupNorm(4, epsilon=1e-5).apply({"params": {"scale": s, "bias": b}}, x)
            )
            ** 2
        )

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)


def test_unet_output_parity_fused_vs_not():
    """Same params, fused vs standard GroupNorm: outputs must agree."""
    m1 = UNet2D(TINY)
    m2 = UNet2D(dataclasses.replace(TINY, fused_groupnorm=True))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 16, 16)), jnp.float32)
    t = jnp.array([0.3, 0.8])
    params = m1.init(jax.random.PRNGKey(0), x, t)
    # param trees identical (FusedGroupNorm declares the same scale/bias names)
    p2 = m2.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree.structure(params) == jax.tree.structure(p2)
    out1 = m1.apply(params, x, t)
    out2 = m2.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=5e-4, atol=5e-5)
