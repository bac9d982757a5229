"""Parity test of the align-corners bilinear resize against torch (CPU)."""

import numpy as np
import jax.numpy as jnp

from bndm_tpu.utils.image import resize_bilinear_align_corners, superres_condition


def test_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    for out in [(8, 8), (32, 32), (17, 9), (64, 64)]:
        want = F.interpolate(torch.from_numpy(x), size=out, mode="bilinear",
                             align_corners=True).numpy()
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), *out))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_superres_condition_roundtrip_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    xt = torch.from_numpy(x)
    small = F.interpolate(xt, size=(16, 16), mode="bilinear", align_corners=True)
    want = F.interpolate(small, size=(64, 64), mode="bilinear", align_corners=True).numpy()
    got = np.asarray(superres_condition(jnp.asarray(x), downscale=4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
