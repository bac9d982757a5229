"""Flax AutoencoderKL — TPU-native equivalent of the SD VAE.

The latent pipeline runs the frozen pretrained ``stabilityai/sd-vae-ft-mse``
``AutoencoderKL`` in half precision with the SD scaling constant 0.18215
(reference latent_...:70-71, encode :166-182, decode :185-191). This module
implements the same architecture (down/up blocks (128,256,512,512),
layers_per_block=2, single-head mid attention, GroupNorm(32, eps=1e-6),
silu) so converted weights reproduce the reference's latents; on TPU it runs
in bf16 instead of fp16 (SURVEY.md S7 "hard parts": verify decoded-image
deltas stay below figure fidelity).

Parameter names mirror the diffusers state_dict (encoder.down_blocks.N...,
decoder.up_blocks.N..., quant_conv, post_quant_conv) so
``bndm_tpu.models.convert.convert_torch_state_dict`` maps published VAE
weights directly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bndm_tpu.models.unet2d import AttentionBlock, ResnetBlock2D

SD_SCALING = 0.18215  # reference latent_...:171,186


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    act_fn: str = "silu"
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class _VaeDownsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # diffusers VAE downsample: asymmetric right/bottom pad + stride-2 VALID conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class _VaeUpsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # subpixel-decomposed nearest-2x + 3x3 conv (exact math, 4/9 MACs,
        # no materialized 2x tensor): measured 1.118x on the full 512^2
        # decode on v5e (scripts/bench_vae_upsample.py) — the decoder's
        # upsample convs are MAC-dominated, unlike the UNet's where the same
        # rewrite lost to interleave data movement
        from bndm_tpu.models.unet2d import _SubpixelUpConv

        return _SubpixelUpConv(self.out_channels, self.dtype, name="conv")(x)


class _EncoderDown(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, cfg.act_fn, cfg.norm_num_groups, cfg.norm_eps,
                dtype=cfg.compute_dtype, name=f"resnets_{i}",
            )(x, None)
        if self.add_downsample:
            x = _VaeDownsample(self.out_channels, cfg.compute_dtype,
                               name="downsamplers_0")(x)
        return x


class _DecoderUp(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, cfg.act_fn, cfg.norm_num_groups, cfg.norm_eps,
                dtype=cfg.compute_dtype, name=f"resnets_{i}",
            )(x, None)
        if self.add_upsample:
            x = _VaeUpsample(self.out_channels, cfg.compute_dtype, name="upsamplers_0")(x)
        return x


class _Mid(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        c = x.shape[-1]
        x = ResnetBlock2D(c, cfg.act_fn, cfg.norm_num_groups, cfg.norm_eps,
                          dtype=cfg.compute_dtype, name="resnets_0")(x, None)
        # VAE mid attention is single-head over the full channel dim
        x = AttentionBlock(head_dim=c, groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                           dtype=cfg.compute_dtype, name="attentions_0")(x)
        x = ResnetBlock2D(c, cfg.act_fn, cfg.norm_num_groups, cfg.norm_eps,
                          dtype=cfg.compute_dtype, name="resnets_1")(x, None)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt, name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for i, c in enumerate(cfg.block_out_channels):
            h = _EncoderDown(c, cfg.layers_per_block, i < n - 1, cfg,
                             name=f"down_blocks_{i}")(h)
        h = _Mid(cfg, name="mid_block")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=jnp.float32,
                         name="conv_norm_out")(h)
        h = nn.silu(h).astype(dt)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=dt,
                       name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.compute_dtype
        rev = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=dt, name="conv_in")(z)
        h = _Mid(cfg, name="mid_block")(h)
        n = len(rev)
        for i, c in enumerate(rev):
            h = _DecoderUp(c, cfg.layers_per_block + 1, i < n - 1, cfg,
                           name=f"up_blocks_{i}")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=jnp.float32,
                         name="conv_norm_out")(h)
        h = nn.silu(h).astype(dt)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.cfg.compute_dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.cfg.compute_dtype, name="post_quant_conv")

    def encode_moments(self, x):
        """x NCHW in [-1, 1] -> (mean, logvar), each (B, latent_c, H/8, W/8)."""
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.cfg.compute_dtype)
        m = self.quant_conv(self.encoder(h))
        m = jnp.transpose(m, (0, 3, 1, 2)).astype(jnp.float32)
        mean, logvar = jnp.split(m, 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, key=None):
        """Sample (or take the mean of) the posterior, scaled by 0.18215 —
        the reference's ``vae_encode`` contract (latent_...:166-182)."""
        mean, logvar = self.encode_moments(x)
        if key is None:
            z = mean
        else:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return SD_SCALING * z

    def decode(self, z):
        """Latents (scaled) -> image in [-1, 1] (latent_...:185-191)."""
        z = z / SD_SCALING
        h = jnp.transpose(z, (0, 2, 3, 1)).astype(self.cfg.compute_dtype)
        img = self.decoder(self.post_quant_conv(h))
        return jnp.transpose(img, (0, 3, 1, 2))

    def __call__(self, x, key=None):
        return self.decode(self.encode(x, key))


def make_decoder(vae, microbatch=None):
    """Jitted ``decode(params, z)`` closure, optionally microbatched.

    The full-batch 512^2 decode materializes bf16 (B, 512, 512, 256)
    temporaries — at the reference's latent test config (bs=50,
    latent_iadb_cat_res512_test.sh) that is 2 x 6.25 GB and OOMs a 16 GB
    v5e chip at compile time. With ``microbatch`` set, the batch is decoded
    as a ``lax.map`` over chunks inside ONE jit: only one chunk's decoder
    activations are live at a time (plus the output buffer, which is small
    — B x 3 x H x W). Decoding is per-sample independent (GroupNorm
    normalizes within each sample), so chunking is bit-exact vs full-batch.
    Non-divisible batches are zero-padded to the next multiple and sliced
    back.
    """

    def _decode(params, z):
        return vae.apply(params, z, method=AutoencoderKL.decode)

    if not microbatch:
        return jax.jit(_decode)

    @jax.jit
    def decode_mb(params, z):
        b = z.shape[0]
        mb = min(microbatch, b)
        pad = (-b) % mb
        if pad:
            z = jnp.concatenate(
                [z, jnp.zeros((pad,) + z.shape[1:], z.dtype)], axis=0)
        zk = z.reshape((z.shape[0] // mb, mb) + z.shape[1:])
        out = jax.lax.map(lambda zc: _decode(params, zc), zk)
        out = out.reshape((out.shape[0] * out.shape[1],) + out.shape[2:])
        return out[:b]

    return decode_mb
