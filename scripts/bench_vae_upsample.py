"""A/B the VAE decoder's upsample implementation on the real chip.

The UNet measurement showed the subpixel-decomposed upsample (4/9 MACs, no
materialized 2x tensor) is a NET LOSS at the UNet's small upsample convs
(res<=64, C<=256) because the phase-interleave relayout costs more than the
saved MACs. The VAE decoder is the opposite regime — 3x3 convs at 128^2 to
512^2 spatial with C 256-512 are MAC-dominated — so the subpixel path should
win there. This script measures a full 64x64x4 -> 512^2 decode both ways.
"""

import sys
import time

sys.path.insert(0, ".")
from bench import _fetch, _setup_compile_cache  # noqa: E402


def main(batch=8):
    import jax
    import jax.numpy as jnp

    from bndm_tpu.models import vae as vae_mod
    from bndm_tpu.models.unet2d import _SubpixelUpConv

    _setup_compile_cache()
    cfg = vae_mod.VAEConfig(dtype="bfloat16")
    model = vae_mod.AutoencoderKL(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (batch, 4, 64, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 512, 512)))

    def decode(p, zz):
        return model.apply(p, zz, method=model.decode)

    # current (subpixel) path
    dec = jax.jit(decode)
    _fetch(dec(params, z))
    t0 = time.perf_counter()
    out_fast = dec(params, z)
    _fetch(out_fast)
    dt_fast = time.perf_counter() - t0

    # reference path: temporarily swap _VaeUpsample back to resize+conv
    import flax.linen as nn

    class _RefUp(nn.Module):
        out_channels: int
        dtype: jnp.dtype

        @nn.compact
        def __call__(self, x):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            return nn.Conv(self.out_channels, (3, 3), padding=1,
                           dtype=self.dtype, name="conv")(x)

    orig = vae_mod._VaeUpsample
    vae_mod._VaeUpsample = _RefUp
    try:
        model_ref = vae_mod.AutoencoderKL(cfg)
        dec_ref = jax.jit(lambda p, zz: model_ref.apply(p, zz, method=model_ref.decode))
        _fetch(dec_ref(params, z))
        t0 = time.perf_counter()
        out_ref = dec_ref(params, z)
        _fetch(out_ref)
        dt_ref = time.perf_counter() - t0
    finally:
        vae_mod._VaeUpsample = orig

    # relative error: with random-init params + the 1/0.18215 latent scale the
    # decoder output is unbounded, so only the relative deviation (pure bf16
    # rounding-order difference — the math is exact, tests/test_unet.py) means
    # anything here
    rel = float(jnp.linalg.norm((out_fast - out_ref).astype(jnp.float32))
                / jnp.linalg.norm(out_ref.astype(jnp.float32)))
    print(f"subpixel decode: {dt_fast*1e3:.1f} ms/batch{batch}  "
          f"reference decode: {dt_ref*1e3:.1f} ms  "
          f"speedup {dt_ref/dt_fast:.3f}x  rel err {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
