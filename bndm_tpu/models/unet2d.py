"""Flax UNet2D — TPU-native equivalent of diffusers ``UNet2DModel``.

Implements exactly the subset the reference exercises (SURVEY.md S2.7):
DownBlock2D / AttnDownBlock2D / UpBlock2D / AttnUpBlock2D, UNetMidBlock2D
with attention, layers_per_block=2, sinusoidal timestep embedding accepting
*float* timesteps (the IADB pipelines pass the continuous blend factor alpha
as the "timestep" — reference iadb_bn.py:319,941 — while DDIM passes integer
steps), silu/gelu/mish activations, GroupNorm(32, eps=1e-5), per-resolution
block layouts (reference iadb_bn.py:205-282, ddim_diffusers.py:375-455,
latent_...:335-372).

TPU-first design choices:
  * NHWC internally (XLA:TPU's preferred conv layout); the public interface
    stays NCHW to match the reference's tensors and checkpoints.
  * compute dtype is configurable (bf16 by default on TPU) with fp32 params;
    attention softmax always in fp32 (mirrors diffusers' upcast_softmax).
  * module/parameter names mirror the diffusers state_dict so the checkpoint
    converter (bndm_tpu.models.convert) is a pure name/layout mapping.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ACT = {
    "silu": nn.silu,
    "swish": nn.silu,
    "gelu": nn.gelu,
    "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
    "relu": nn.relu,
}


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    """Mirror of the diffusers UNet2DModel constructor subset in use."""

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D", "DownBlock2D", "DownBlock2D", "DownBlock2D",
        "AttnDownBlock2D", "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "AttnUpBlock2D", "UpBlock2D", "UpBlock2D",
        "UpBlock2D", "UpBlock2D",
    )
    layers_per_block: int = 2
    act_fn: str = "silu"
    attention_head_dim: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    add_attention: bool = True  # mid-block attention
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dropout: float = 0.0
    dtype: str = "float32"  # compute dtype ("bfloat16" on TPU for speed)
    norm_dtype: str = "float32"  # GroupNorm compute dtype (fp32 = diffusers parity)
    # NOTE: a Pallas fused-GroupNorm kernel was tried (r1) and DELETED (r2):
    # measured 5.07 ms vs flax's 4.19 ms per res-64 GN+SiLU pass on v5e, and
    # Pallas streaming tops out ~215 GB/s r+w vs XLA fusions' ~330
    # (scripts/bench_elementwise_tpu.py, scripts/bench_pallas_stream.py) —
    # the pass is HBM-bound, so a kernel that can't out-stream XLA can't win.
    conv_int8: bool = False  # EXPERIMENTAL W8A8 convs (int8 MXU = 2x bf16 on v5e);
    # conv_out stays fp32 for output fidelity; see ops/int8.py
    int8_mode: str = "dynamic"  # dynamic | calibrate | static (ops/int8.py)
    int8_wide: bool = False  # ALSO quantize the profile-excluded sites
    # (resnet shortcut, downsamplers, conv_in) — r2's HBM analysis says their
    # quantize passes cost more than the small convs save; this switch exists
    # to measure that claim with static scales (scripts/bench_int8_qat.py)
    fast_upsample: bool = False  # subpixel-decomposed upsample conv (exact math,
    # 4/9 the MACs; see _SubpixelUpConv). MEASURED NET LOSS on the res-64 UNet
    # at bs=500 on v5e: the phase-interleave relayout copies cost ~9 ms/step
    # vs ~6 ms of saved conv time (xplane profile, 2026-08-16) — the UNet's
    # upsample convs are small enough that XLA's conv is already faster than
    # the extra data movement. Kept opt-in; the VAE decoder (4x larger convs
    # at 256^2/512^2, MAC-dominated) does use it.
    gn_mode: str = "dynamic"  # dynamic | calibrate | static | record | reuse —
    # static-calibrated or carried GroupNorm statistics for serving
    # (ops/static_norm.py; fidelity-gated experiments attacking the GN/SiLU
    # bandwidth wall). calibrate/static need gn_steps = the sampler's
    # nb_steps and the LINEAR alpha schedule; record/reuse (the per-sample
    # GN-stats-carry tier for the cached sampler) need neither — 'record'
    # exposes this forward's per-sample stats in the mutable 'gnstats'
    # collection, 'reuse' consumes them (serving.py wires the pair).
    gn_steps: int = 0
    conv_out_dtype: str = "float32"  # the final conv's compute/output dtype.
    # fp32 is the parity default; the r3 static-GN profile shows this conv is
    # the single largest per-step op (4.6 ms/step at bs=500 — tiny FLOPs but
    # an f32[500,6,64,64] write + poor MXU layout), so serving may relax it
    # to bf16 under the usual SSIM/PSNR gate (scripts/bench_static_gn.py)
    attn_softmax_dtype: str = "float32"  # attention softmax dtype. fp32 is
    # the parity default (diffusers upcast_softmax); the r3 static-GN profile
    # shows the upcast materializes five standalone bf16->f32 convert fusions
    # of the attention logits (0.61 ms/step each, ~3% of the step), so the
    # serving tier may relax it to bf16 under the usual SSIM/PSNR gate
    # (scripts/bench_static_gn.py ATTN_BF16 leg). At <=256 tokens the logits'
    # dynamic range is tiny and jax.nn.softmax subtracts the row max anyway.
    cache_depth: int = 1  # feature-reuse split point for the block-caching
    # serving tier (samplers.iadb.sample_iadb_cached): on a cached step only
    # the outermost `cache_depth` down blocks and the matching innermost-to-
    # outermost `cache_depth` up blocks are recomputed; the trunk (deeper
    # blocks + mid) is replaced by the `deep_feature` captured on the last
    # full step. Does not change the param tree — it only selects which
    # modules a shallow __call__ executes. cf. "Cache Me if You Can"
    # (arXiv:2312.03209) / DeepCache; here the cache point is static so the
    # whole alternation compiles into one lax.scan.

    @property
    def int8_arg(self):
        """Value passed to conv sites: False (fp conv) or the int8 mode."""
        return self.int8_mode if self.conv_int8 else False

    @property
    def int8_wide_arg(self):
        """int8 mode for the normally-fp sites, only under int8_wide."""
        return self.int8_mode if (self.conv_int8 and self.int8_wide) else False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def gn_dtype(self):
        return jnp.dtype(self.norm_dtype)

    @property
    def softmax_dtype(self):
        return jnp.dtype(self.attn_softmax_dtype)


def unet_config_for_res(res, in_channels=3, out_channels=3, act_fn="silu", dtype="float32",
                        norm_dtype="float32", conv_int8=False,
                        int8_mode="dynamic"):
    """Per-resolution block layouts of the reference (iadb_bn.py:205-282).

    res 64:  6 blocks (128,128,256,256,512,512), attn 5th down / 2nd up
    res 128: 7 blocks (128,128,128,256,256,512,512), attn 6th down / 2nd up
    res 256: 8 blocks (128,128,128,128,256,256,512,512), attn 7th down / 2nd up
    latent32 (256^2 pixels): 3 blocks (128,256,256), attn 3rd down / 1st up
    (latent_...:348-354)
    """
    if res == 64:
        boc = (128, 128, 256, 256, 512, 512)
        attn_down, attn_up = 4, 1
    elif res == 128:
        boc = (128, 128, 128, 256, 256, 512, 512)
        attn_down, attn_up = 5, 1
    elif res == 256:
        boc = (128, 128, 128, 128, 256, 256, 512, 512)
        attn_down, attn_up = 6, 1
    elif res == "latent32":
        boc = (128, 256, 256)
        attn_down, attn_up = 2, 0
    else:
        raise NotImplementedError(f"res {res}")
    n = len(boc)
    down = tuple(
        "AttnDownBlock2D" if i == attn_down else "DownBlock2D" for i in range(n)
    )
    up = tuple("AttnUpBlock2D" if i == attn_up else "UpBlock2D" for i in range(n))
    return UNet2DConfig(
        in_channels=in_channels,
        out_channels=out_channels,
        block_out_channels=boc,
        down_block_types=down,
        up_block_types=up,
        act_fn=act_fn,
        dtype=dtype,
        norm_dtype=norm_dtype,
        conv_int8=conv_int8,
        int8_mode=int8_mode,
    )


def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=True,
                           downscale_freq_shift=0.0, max_period=10000.0):
    """Sinusoidal embedding of (possibly float) timesteps: (B,) -> (B, dim).

    Matches diffusers ``get_timestep_embedding`` with UNet2DModel defaults
    (flip_sin_to_cos=True, freq_shift=0): exponents over half_dim, then
    [cos | sin] when flipped.
    """
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


def _gn(groups, eps, dtype, norm_mode, norm_steps, name):
    """nn.GroupNorm (dynamic — bit-identical to the parity path), or the
    static-calibrated CalGroupNorm (ops/static_norm.py). Returns a callable
    ``f(x, step_idx)``; dynamic ignores step_idx."""
    if norm_mode == "dynamic":
        m = nn.GroupNorm(groups, epsilon=eps, dtype=dtype, name=name)
        return lambda x, step_idx=None: m(x)
    from bndm_tpu.ops.static_norm import CalGroupNorm

    return CalGroupNorm(groups, eps, dtype, norm_mode, norm_steps, name=name)


def _conv(int8, features, kernel_size=(3, 3), strides=(1, 1), padding=1,
          dtype=jnp.float32, name=None):
    """nn.Conv, or the experimental W8A8 Int8Conv (identical param tree).

    ``int8``: False for the fp conv, or an int8 mode string
    ('dynamic' | 'calibrate' | 'static', see ops/int8.py); True means
    'dynamic' for backward compatibility."""
    if int8:
        from bndm_tpu.ops.int8 import Int8Conv

        mode = int8 if isinstance(int8, str) else "dynamic"
        return Int8Conv(features, kernel_size, strides, padding, dtype,
                        mode=mode, name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   dtype=dtype, name=name)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb):
        temb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(temb)
        return temb


class ResnetBlock2D(nn.Module):
    out_channels: int
    act_fn: str = "silu"
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    int8: bool = False
    norm_mode: str = "dynamic"
    norm_steps: int = 0
    # keyword-only in practice (callers pass the fields above positionally)
    int8_wide: bool = False  # int8 mode for the shortcut too (see config)

    def _norm_act(self, x, name, step_idx=None):
        act = ACT[self.act_fn]
        h = _gn(self.groups, self.eps, self.norm_dtype, self.norm_mode,
                self.norm_steps, name)(x, step_idx)
        return act(h).astype(self.dtype)

    @nn.compact
    def __call__(self, x, temb=None, deterministic=True, step_idx=None):
        act = ACT[self.act_fn]
        in_channels = x.shape[-1]
        h = self._norm_act(x, "norm1", step_idx)
        h = _conv(self.int8, self.out_channels, dtype=self.dtype, name="conv1")(h)
        if temb is not None:  # VAE resnets have no time conditioning
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                act(temb).astype(self.dtype)
            )
            h = h + t[:, None, None, :]
        h = self._norm_act(h, "norm2", step_idx)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv(self.int8, self.out_channels, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            # shortcut stays fp even under conv_int8: quantizing it forces a
            # SECOND full-size s8 copy of the raw (un-normalized) input next
            # to the normalized one (r2 int8 profile: dual-s8 quantize passes
            # of 2x524 MB at res 64), costing more HBM traffic than the tiny
            # 1x1 conv saves on the MXU. int8_wide overrides to measure that.
            x = _conv(self.int8 if self.int8_wide else False,
                      self.out_channels, (1, 1), padding=0,
                      dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over (H*W) tokens, residual, fp32 softmax.

    Mirrors the diffusers Attention module as instantiated by the UNet2D
    blocks (residual_connection=True, bias=True, upcast_softmax=True,
    heads = channels // attention_head_dim).
    """

    head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    norm_mode: str = "dynamic"
    norm_steps: int = 0
    softmax_dtype: jnp.dtype = jnp.float32  # fp32 = diffusers upcast_softmax

    @nn.compact
    def __call__(self, x, step_idx=None):
        b, hh, ww, c = x.shape
        heads = max(1, c // self.head_dim)
        dh = c // heads
        residual = x
        h = _gn(self.groups, self.eps, self.norm_dtype, self.norm_mode,
                self.norm_steps, "group_norm")(x, step_idx)
        h = h.astype(self.dtype).reshape(b, hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h)
        q = q.reshape(b, -1, heads, dh)
        k = k.reshape(b, -1, heads, dh)
        v = v.reshape(b, -1, heads, dh)
        scale = 1.0 / math.sqrt(dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(self.softmax_dtype) * scale
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, hh * ww, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, hh, ww, c) + residual


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        # conv stride 2, padding 1 (diffusers Downsample2D with use_conv=True)
        return _conv(self.int8, self.out_channels, strides=(2, 2),
                     dtype=self.dtype, name="conv")(x)


class _SubpixelUpConv(nn.Module):
    """nearest-2x upsample + 3x3 conv, computed WITHOUT materializing the 2x
    tensor: because nearest duplication makes adjacent taps share a source
    pixel, each of the 4 output phases (i%2, j%2) reduces to a 2x2-kernel conv
    over the ORIGINAL grid whose taps are sums of the stored 3x3 taps —
    4/9 the MACs, one MXU conv (features 4*C_out), then a phase interleave.

    Exact math (same sums, regrouped); parameter tree identical to nn.Conv
    ('kernel' (3,3,Cin,Cout) + 'bias'), so checkpoints/converters are
    untouched, and the kernel transform is a pure function of params that
    XLA's while-loop LICM hoists out of the 250-step sampling scan.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        cout = self.out_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, cout), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
        # Row/col tap-combination matrices per output phase a in {0,1}:
        # output row 2m+a reads duplicated rows (2m+a+di)//2, di in {-1,0,1}
        # -> source rows {m-1: W0, m: W1+W2} (a=0) / {m: W0+W1, m+1: W2} (a=1)
        comb = jnp.asarray(
            [[[1, 0, 0], [0, 1, 1]],   # a == 0: (prev, cur)
             [[1, 1, 0], [0, 0, 1]]],  # a == 1: (cur, next)
            jnp.float32,
        )
        # (a, r, i) x (b, s, j) x (i, j, ci, co) -> (2,2, r, s, ci, co).
        # HIGHEST precision: default dots lower to single-pass bf16 on TPU,
        # which would round the combined taps and break the exact-math claim
        # of the fp32 parity path; the einsum is tiny and loop-invariant.
        k2 = jnp.einsum("ari,bsj,ijco->abrsco", comb, comb, kernel,
                        precision=jax.lax.Precision.HIGHEST)
        # phase-major output channels: p = 2*a + b
        k2 = k2.reshape(4, 2, 2, cin, cout).transpose(1, 2, 3, 0, 4)
        k2 = k2.reshape(2, 2, cin, 4 * cout).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H+1, W+1, 4*Cout); padded index k covers source rows k-1..k
        y = y.reshape(b, h + 1, w + 1, 4, cout)
        # phase (a, b) lives at padded offset (a, b): a=0 -> window m-1..m at
        # k=m (slice 0:h); a=1 -> window m..m+1 at k=m+1 (slice 1:h+1)
        z = jnp.stack(
            [jnp.stack([y[:, a:h + a, bb:w + bb, 2 * a + bb] for bb in (0, 1)],
                       axis=3) for a in (0, 1)],
            axis=2,
        )  # (B, H, 2, W, 2, Cout)
        z = z.reshape(b, 2 * h, 2 * w, cout)
        return z + bias.astype(self.dtype)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    int8: bool = False
    # default matches UNet2DConfig.fast_upsample=False (the subpixel path is
    # a measured net loss on the UNet); callers that want it pass True
    fast: bool = False

    @nn.compact
    def __call__(self, x):
        # subpixel path only for the fp conv: int8 quantization semantics
        # differ on the combined 2x2 taps, so int8 keeps the reference path
        if self.fast and not self.int8:
            return _SubpixelUpConv(self.out_channels, self.dtype, name="conv")(x)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return _conv(self.int8, self.out_channels, dtype=self.dtype, name="conv")(x)


class DownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    with_attn: bool
    add_downsample: bool
    cfg: UNet2DConfig

    @nn.compact
    def __call__(self, x, temb, deterministic=True, step_idx=None):
        cfg = self.cfg
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, cfg.act_fn, cfg.norm_num_groups, cfg.norm_eps,
                cfg.dropout, cfg.compute_dtype, cfg.gn_dtype,
                cfg.int8_arg, cfg.gn_mode, cfg.gn_steps,
                int8_wide=cfg.int8_wide, name=f"resnets_{i}",
            )(x, temb, deterministic, step_idx)
            if self.with_attn:
                x = AttentionBlock(
                    cfg.attention_head_dim, cfg.norm_num_groups, cfg.norm_eps,
                    cfg.compute_dtype, cfg.gn_dtype, cfg.gn_mode, cfg.gn_steps,
                    softmax_dtype=cfg.softmax_dtype, name=f"attentions_{i}",
                )(x, step_idx)
            skips.append(x)
        if self.add_downsample:
            # fp even under conv_int8: the strided conv is tiny but its input
            # quantize would be a separate full-size pass (the bf16 x is also
            # kept as a skip, so the s8 copy can't replace it); int8_wide
            # overrides to measure that claim
            x = Downsample2D(self.out_channels, cfg.compute_dtype,
                             cfg.int8_wide_arg, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class UpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    with_attn: bool
    add_upsample: bool
    cfg: UNet2DConfig

    @nn.compact
    def __call__(self, x, skips, temb, deterministic=True, step_idx=None):
        cfg = self.cfg
        for i in range(self.num_layers):
            skip = skips.pop()
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, cfg.act_fn, cfg.norm_num_groups, cfg.norm_eps,
                cfg.dropout, cfg.compute_dtype, cfg.gn_dtype,
                cfg.int8_arg, cfg.gn_mode, cfg.gn_steps,
                int8_wide=cfg.int8_wide, name=f"resnets_{i}",
            )(x, temb, deterministic, step_idx)
            if self.with_attn:
                x = AttentionBlock(
                    cfg.attention_head_dim, cfg.norm_num_groups, cfg.norm_eps,
                    cfg.compute_dtype, cfg.gn_dtype, cfg.gn_mode, cfg.gn_steps,
                    softmax_dtype=cfg.softmax_dtype, name=f"attentions_{i}",
                )(x, step_idx)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, cfg.compute_dtype, cfg.int8_arg,
                           cfg.fast_upsample, name="upsamplers_0")(x)
        return x


class UNetMidBlock2D(nn.Module):
    cfg: UNet2DConfig

    @nn.compact
    def __call__(self, x, temb, deterministic=True, step_idx=None):
        cfg = self.cfg
        c = x.shape[-1]
        x = ResnetBlock2D(
            c, cfg.act_fn, cfg.norm_num_groups, cfg.norm_eps, cfg.dropout,
            cfg.compute_dtype, cfg.gn_dtype, cfg.int8_arg, cfg.gn_mode,
            cfg.gn_steps, int8_wide=cfg.int8_wide, name="resnets_0",
        )(x, temb, deterministic, step_idx)
        if cfg.add_attention:
            x = AttentionBlock(
                cfg.attention_head_dim, cfg.norm_num_groups, cfg.norm_eps,
                cfg.compute_dtype, cfg.gn_dtype, cfg.gn_mode, cfg.gn_steps,
                softmax_dtype=cfg.softmax_dtype, name="attentions_0",
            )(x, step_idx)
        x = ResnetBlock2D(
            c, cfg.act_fn, cfg.norm_num_groups, cfg.norm_eps, cfg.dropout,
            cfg.compute_dtype, cfg.gn_dtype, cfg.int8_arg, cfg.gn_mode,
            cfg.gn_steps, int8_wide=cfg.int8_wide, name="resnets_1",
        )(x, temb, deterministic, step_idx)
        return x


class UNet2D(nn.Module):
    """Full UNet. Public call signature: (x_NCHW, timesteps) -> out_NCHW.

    Feature-reuse serving (``cfg.cache_depth``, cf. arXiv:2312.03209):
      * ``return_deep=True``: also return the trunk output — the input to the
        outermost ``cache_depth`` up blocks (i.e. the output of up block
        n-cache_depth-1 including its upsampler), NHWC, compute dtype.
      * ``deep_feature=<that tensor>``: run only the outer shell — conv_in,
        down blocks [0, cache_depth) (for their skip tensors), up blocks
        [n-cache_depth, n), conv_out — splicing ``deep_feature`` in place of
        the trunk. With the deep feature captured at the SAME (x, t) this is
        exactly the full forward (tested); a cached-step forward reuses the
        previous full step's trunk output instead.
    The param tree is unchanged; a shallow call simply leaves the trunk
    modules unvisited (flax ignores unused params at apply time).
    """

    cfg: UNet2DConfig

    @nn.compact
    def __call__(self, x, timesteps, deterministic=True, step_idx=None,
                 deep_feature=None, return_deep=False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        x = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)  # NCHW -> NHWC

        if step_idx is not None:
            # explicit trajectory index (DDIM: the sampler's scan position —
            # its integer timesteps carry no usable index, samplers/ddim.py)
            step_idx = jnp.asarray(step_idx, jnp.int32)
        elif cfg.gn_mode in ("calibrate", "static"):
            # IADB passes alpha = (t+1)/T as the timestep; with LINEAR alpha
            # (every published run config) this recovers the integer step t
            # for the calibrated-GN tables (ops/static_norm.py module doc).
            # record/reuse (the GN-stats-carry tier) have no step tables.
            step_idx = jnp.round(
                timesteps.astype(jnp.float32)[0] * cfg.gn_steps
            ).astype(jnp.int32) - 1

        temb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=dt, name="time_embedding"
        )(temb)

        # conv_in stays fp under conv_int8 (3-channel input: no MXU win, and
        # the quantize pass would cost more than the conv); int8_wide overrides
        h = _conv(cfg.int8_wide_arg, cfg.block_out_channels[0], dtype=dt,
                  name="conv_in")(x)

        skips = [h]
        n = len(cfg.block_out_channels)
        depth = cfg.cache_depth
        shallow = deep_feature is not None
        if shallow and return_deep:
            raise ValueError("a shallow (cached) call cannot return_deep")
        if (shallow or return_deep) and not (1 <= depth < n):
            raise ValueError(f"cache_depth {depth} must be in [1, {n - 1}]")
        for i in range(depth if shallow else n):
            btype, c = cfg.down_block_types[i], cfg.block_out_channels[i]
            # shallow pass: block depth-1's downsample output feeds only the
            # trunk (not run) and its skip is consumed only by trunk up
            # blocks, so it is skipped; blocks < depth-1 keep theirs (the
            # downsampled tensor feeds the next shell block and its skip is
            # consumed by an outer-shell up block)
            add_ds = (i < depth - 1) if shallow else (i < n - 1)
            h, s = DownBlock2D(
                out_channels=c,
                num_layers=cfg.layers_per_block,
                with_attn=(btype == "AttnDownBlock2D"),
                add_downsample=add_ds,
                cfg=cfg,
                name=f"down_blocks_{i}",
            )(h, temb, deterministic, step_idx)
            skips.extend(s)

        rev_channels = list(reversed(cfg.block_out_channels))

        def up_block(i, h):
            return UpBlock2D(
                out_channels=rev_channels[i],
                num_layers=cfg.layers_per_block + 1,
                with_attn=(cfg.up_block_types[i] == "AttnUpBlock2D"),
                add_upsample=(i < n - 1),
                cfg=cfg,
                name=f"up_blocks_{i}",
            )(h, skips, temb, deterministic, step_idx)

        if shallow:
            deep = None
            h = deep_feature.astype(dt)
        else:
            h = UNetMidBlock2D(cfg, name="mid_block")(h, temb, deterministic, step_idx)
            for i in range(n - depth):
                h = up_block(i, h)
            deep = h  # trunk output: input to the outer-shell up blocks
        for i in range(n - depth, n):
            h = up_block(i, h)

        h = _gn(cfg.norm_num_groups, cfg.norm_eps, cfg.gn_dtype, cfg.gn_mode,
                cfg.gn_steps, "conv_norm_out")(h, step_idx)
        h = ACT[cfg.act_fn](h).astype(dt)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1,
                    dtype=jnp.dtype(cfg.conv_out_dtype), name="conv_out")(h)
        out = jnp.transpose(h, (0, 3, 1, 2))  # NHWC -> NCHW
        if return_deep:
            return out, deep
        return out
