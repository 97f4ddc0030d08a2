"""Stable-Diffusion backbone in Flax: UNet2DCondition + AutoencoderKL.

TPU-native replacement for the reference's torch/diffusers pipeline
(reference: guidance/multitime_sd_utils.py:63-112). The whole guidance
step — VAE encode, the multi-timestep UNet ladder, CSD gradient assembly —
traces into a single jitted XLA program, erasing the reference's
renderer<->guidance device hop (training/scene_trainer.py:826-881).

The architecture matches SD 1.x/2.x (configurable width/depth/context-dim);
`tiny_config()` builds a miniature variant for tests and dry-runs.
`load_diffusers_unet/vae` map a local diffusers PyTorch checkpoint
(safetensors/bin) onto these modules; without weights the models run
randomly initialized — the FPS algorithm, numerics, and performance paths
are identical either way.

Matmul-heavy modules run in bfloat16 on the MXU with fp32 parameters
(configurable), per the TPU performance rules.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024       # SD2.x; 768 for SD1.x
    attention_head_dim: int = 64          # dim per head (SD2.x)
    num_attention_heads: int | None = None  # fixed head count (SD1.x: 8)
    num_groups: int = 32
    with_cross_attn: Sequence[bool] = (True, True, True, False)
    dtype: jnp.dtype = jnp.bfloat16

    def heads_for(self, ch: int) -> tuple[int, int]:
        if self.num_attention_heads is not None:
            return self.num_attention_heads, ch // self.num_attention_heads
        return ch // self.attention_head_dim, self.attention_head_dim


def sd15_unet_config() -> UNetConfig:
    return UNetConfig(cross_attention_dim=768, num_attention_heads=8)


def sd21_unet_config() -> UNetConfig:
    return UNetConfig(cross_attention_dim=1024, attention_head_dim=64)


def tiny_unet_config() -> UNetConfig:
    return UNetConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_head_dim=16,
        num_groups=8,
        with_cross_attn=(True, False),
        dtype=jnp.float32,
    )


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, diffusers convention (flip_sin_to_cos=True,
    downscale_freq_shift=0): [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=self.groups, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


def _use_flash_attention(n: int, m: int) -> bool:
    """Pallas TPU flash attention for big self-attention resolutions —
    OFF by default after the round-3 on-chip A/B (scripts/flash_ab.py,
    v5e, SD2.1 arch, seq 4096/head_dim 64): flash 38.4 ms vs XLA-naive
    37.0 ms for the UNet forward and a tie for the VAE encode+grad —
    XLA already fuses softmax(QK^T)V without materializing the score
    matrix at these shapes. The kernel stays (DS_FLASH_ATTN=1 forces it
    on) for shapes/batches where score materialization would blow HBM.
    Self-attention only (cross-attention kv is the 77-token text — the
    matrix is tiny and 77 breaks the 128-lane block granularity); the
    VAE encoder path uses the kernel's custom VJP.
    """
    if os.environ.get("DS_FLASH_ATTN") != "1":
        return False
    return (n == m and n >= 1024 and n % 128 == 0
            and jax.default_backend() == "tpu")


def _flash_attention(q, k, v, scale):
    """flash_attention on [b, heads, n, d] operands with block sizes that
    divide n (the kernel hard-rejects non-divisible blocks — n = 6400 at
    640^2 images passes the 128-lane gate but not a fixed 512 block)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    n = q.shape[2]
    bq = bk = next(b for b in (512, 256, 128) if n % b == 0)
    blocks = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    return flash_attention(q, k, v, sm_scale=scale, block_sizes=blocks)


class Attention(nn.Module):
    query_dim: int
    heads: int
    head_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.head_dim)
        k = k.reshape(b, m, self.heads, self.head_dim)
        v = v.reshape(b, m, self.heads, self.head_dim)
        scale = self.head_dim**-0.5
        if _use_flash_attention(n, m):
            out = _flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), scale,
            ).transpose(0, 2, 1, 3).reshape(b, n, inner).astype(self.dtype)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
            attn = jax.nn.softmax(
                attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class FeedForward(nn.Module):
    dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # GEGLU
        h = nn.Dense(self.dim * 8, dtype=self.dtype, name="net_0_proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(a * nn.gelu(g))


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    context_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context):
        x = x + Attention(self.dim, self.heads, self.head_dim, self.dtype, name="attn1")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        )
        x = x + Attention(self.dim, self.heads, self.head_dim, self.dtype, name="attn2")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context
        )
        x = x + FeedForward(self.dim, self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        )
        return x


class SpatialTransformer(nn.Module):
    channels: int
    heads: int
    head_dim: int
    context_dim: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=self.groups, name="norm")(x)
        x = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(
            x.reshape(b, h * w, c)
        )
        x = TransformerBlock(
            self.channels, self.heads, self.head_dim, self.context_dim,
            self.dtype, name="transformer_blocks_0",
        )(x, context)
        x = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(b, h, w, self.channels) + res


class FlaxUNet2DCondition(nn.Module):
    """SD-style conditional UNet. NHWC layout (TPU-native conv layout).

    `control_res = (down_residuals, mid_residual)` injects ControlNet
    residuals: one per skip connection plus one on the mid state
    (diffusers UNet2DConditionModel down_block_additional_residuals /
    mid_block_additional_residual contract)."""

    config: UNetConfig

    @nn.compact
    def __call__(self, latents, timesteps, context, control_res=None):
        """latents [B,H,W,Cin]; timesteps [B]; context [B,L,D]."""
        cfg = self.config
        dt = cfg.dtype
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4

        temb = timestep_embedding(timesteps, ch0)
        temb = nn.Dense(temb_dim, dtype=dt, name="time_embedding_linear_1")(temb)
        temb = nn.Dense(temb_dim, dtype=dt, name="time_embedding_linear_2")(
            nn.silu(temb)
        )

        x = nn.Conv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(latents.astype(dt))
        context = context.astype(dt)

        skips = [x]
        # down
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.num_groups, dt, name=f"down_{i}_res_{j}")(x, temb)
                if cfg.with_cross_attn[i]:
                    heads, hdim = cfg.heads_for(ch)
                    x = SpatialTransformer(
                        ch, heads, hdim, cfg.cross_attention_dim,
                        cfg.num_groups, dt, name=f"down_{i}_attn_{j}",
                    )(x, context)
                skips.append(x)
            if i < len(cfg.block_out_channels) - 1:
                x = nn.Conv(
                    ch, (3, 3), strides=2, padding=1, dtype=dt,
                    name=f"down_{i}_downsample",
                )(x)
                skips.append(x)

        if control_res is not None:
            down_res, mid_res = control_res
            assert len(down_res) == len(skips), (len(down_res), len(skips))
            skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_res)]

        # mid
        ch = cfg.block_out_channels[-1]
        heads, hdim = cfg.heads_for(ch)
        x = ResnetBlock(ch, cfg.num_groups, dt, name="mid_res_0")(x, temb)
        x = SpatialTransformer(
            ch, heads, hdim, cfg.cross_attention_dim,
            cfg.num_groups, dt, name="mid_attn",
        )(x, context)
        x = ResnetBlock(ch, cfg.num_groups, dt, name="mid_res_1")(x, temb)
        if control_res is not None:
            x = x + mid_res.astype(x.dtype)

        # up
        for i, ch in reversed(list(enumerate(cfg.block_out_channels))):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock(ch, cfg.num_groups, dt, name=f"up_{i}_res_{j}")(x, temb)
                if cfg.with_cross_attn[i]:
                    heads, hdim = cfg.heads_for(ch)
                    x = SpatialTransformer(
                        ch, heads, hdim, cfg.cross_attention_dim,
                        cfg.num_groups, dt, name=f"up_{i}_attn_{j}",
                    )(x, context)
            if i > 0:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
                x = nn.Conv(ch, (3, 3), padding=1, dtype=dt, name=f"up_{i}_upsample")(x)

        x = nn.GroupNorm(num_groups=cfg.num_groups, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out"
        )(x)
        return x.astype(jnp.float32)


class FlaxControlNet(nn.Module):
    """ControlNet (depth-conditioned) sharing the UNet's down+mid
    architecture: a conditioning-embedding conv stack maps the hint image
    into latent space, the UNet encoder runs on latents + hint, and
    zero-initialised 1x1 convs project every skip state + the mid state
    into residuals for `FlaxUNet2DCondition(control_res=...)`.

    Matches diffusers `ControlNetModel` (the reference loads
    lllyasviel/sd-controlnet-depth via guidance/multitime_sd_utils.py:88-91
    — note the reference never actually INVOKES it; see
    guidance/mtsd.py for how the TPU build wires it for real). Zero convs
    make the untrained module an exact no-op on the UNet."""

    config: UNetConfig
    cond_channels: int = 3           # depth hint replicated to 3 channels
    downscale: int = 8               # image->latent factor (stride-2 stages)

    @nn.compact
    def __call__(self, latents, timesteps, context, cond):
        """latents [B,H,W,4]; timesteps [B]; context [B,L,D];
        cond [B, downscale*H, downscale*W, cond_channels] full-res hint.
        Returns (down_residuals tuple, mid_residual)."""
        cfg = self.config
        dt = cfg.dtype
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4

        temb = timestep_embedding(timesteps, ch0)
        temb = nn.Dense(temb_dim, dtype=dt, name="time_embedding_linear_1")(temb)
        temb = nn.Dense(temb_dim, dtype=dt, name="time_embedding_linear_2")(
            nn.silu(temb)
        )

        x = nn.Conv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(
            latents.astype(dt)
        )
        context = context.astype(dt)

        # conditioning embedding: 3x3 conv stack, stride-2 pyramid down to
        # latent resolution, zero-init final conv (diffusers
        # ControlNetConditioningEmbedding contract)
        c = nn.Conv(16, (3, 3), padding=1, dtype=dt, name="cond_in")(
            cond.astype(dt)
        )
        c = nn.silu(c)
        stages = int(math.log2(self.downscale))
        chans = (16, 32, 96, 256)[: stages + 1]
        for k in range(stages):
            c = nn.silu(nn.Conv(chans[k], (3, 3), padding=1, dtype=dt,
                                name=f"cond_block_{2*k}")(c))
            c = nn.silu(nn.Conv(chans[k + 1], (3, 3), strides=2, padding=1,
                                dtype=dt, name=f"cond_block_{2*k+1}")(c))
        c = nn.Conv(ch0, (3, 3), padding=1, dtype=dt,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="cond_out")(c)
        x = x + c

        def zero_conv(h, name):
            return nn.Conv(h.shape[-1], (1, 1), dtype=dt,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros, name=name)(h)

        residuals = [zero_conv(x, "ctrl_down_0")]
        zc = 1
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.num_groups, dt,
                                name=f"down_{i}_res_{j}")(x, temb)
                if cfg.with_cross_attn[i]:
                    heads, hdim = cfg.heads_for(ch)
                    x = SpatialTransformer(
                        ch, heads, hdim, cfg.cross_attention_dim,
                        cfg.num_groups, dt, name=f"down_{i}_attn_{j}",
                    )(x, context)
                residuals.append(zero_conv(x, f"ctrl_down_{zc}"))
                zc += 1
            if i < len(cfg.block_out_channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=2, padding=1, dtype=dt,
                            name=f"down_{i}_downsample")(x)
                residuals.append(zero_conv(x, f"ctrl_down_{zc}"))
                zc += 1

        ch = cfg.block_out_channels[-1]
        heads, hdim = cfg.heads_for(ch)
        x = ResnetBlock(ch, cfg.num_groups, dt, name="mid_res_0")(x, temb)
        x = SpatialTransformer(
            ch, heads, hdim, cfg.cross_attention_dim,
            cfg.num_groups, dt, name="mid_attn",
        )(x, context)
        x = ResnetBlock(ch, cfg.num_groups, dt, name="mid_res_1")(x, temb)
        mid = zero_conv(x, "ctrl_mid")

        return tuple(r.astype(jnp.float32) for r in residuals), mid.astype(
            jnp.float32
        )


# --------------------------------------------------------------------------
# VAE (AutoencoderKL)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.bfloat16


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(
        block_out_channels=(32, 32),
        layers_per_block=1,
        num_groups=8,
        dtype=jnp.float32,
    )


class VAEResnet(nn.Module):
    out_ch: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention in the VAE mid block
    (diffusers AutoencoderKL mid_block.attentions.0)."""

    channels: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(num_groups=self.groups, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        n = h * w
        if _use_flash_attention(n, n):
            # single head, head_dim = c; the VAE encoder IS differentiated
            # (train_step backprops the CSD latent grad through encode) —
            # the flash kernel's custom VJP covers that.
            y = _flash_attention(
                q[:, None], k[:, None], v[:, None], c ** -0.5,
            )[:, 0].astype(self.dtype)
        else:
            attn = jax.nn.softmax(
                (q @ jnp.swapaxes(k, -1, -2)).astype(jnp.float32)
                * (c ** -0.5),
                axis=-1,
            ).astype(self.dtype)
            y = attn @ v
        y = nn.Dense(c, dtype=self.dtype, name="to_out_0")(y)
        return res + y.reshape(b, h, w, c)


class FlaxVAEEncoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, images):
        """images [B,H,W,3] in [-1,1] -> moments [B,h,w,2*latent]."""
        cfg = self.config
        dt = cfg.dtype
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt,
                    name="conv_in")(images.astype(dt))
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnet(ch, cfg.num_groups, dt, name=f"down_{i}_res_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=2, padding=((0, 1), (0, 1)), dtype=dt,
                            name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnet(ch, cfg.num_groups, dt, name="mid_res_0")(x)
        x = VAEAttention(ch, cfg.num_groups, dt, name="mid_attn")(x)
        x = VAEResnet(ch, cfg.num_groups, dt, name="mid_res_1")(x)
        x = nn.GroupNorm(num_groups=cfg.num_groups, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(x)
        # diffusers applies a 1x1 quant conv to the moments
        x = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=jnp.float32,
                    name="quant_conv")(x)
        return x.astype(jnp.float32)


class FlaxVAEDecoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, latents):
        cfg = self.config
        dt = cfg.dtype
        ch = cfg.block_out_channels[-1]
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=jnp.float32,
                    name="post_quant_conv")(latents)
        x = nn.Conv(ch, (3, 3), padding=1, dtype=dt, name="conv_in")(
            z.astype(dt)
        )
        x = VAEResnet(ch, cfg.num_groups, dt, name="mid_res_0")(x)
        x = VAEAttention(ch, cfg.num_groups, dt, name="mid_attn")(x)
        x = VAEResnet(ch, cfg.num_groups, dt, name="mid_res_1")(x)
        for i, ch in reversed(list(enumerate(cfg.block_out_channels))):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnet(ch, cfg.num_groups, dt, name=f"up_{i}_res_{j}")(x)
            if i > 0:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
                x = nn.Conv(ch, (3, 3), padding=1, dtype=dt, name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=cfg.num_groups, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(3, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(x)
        return x.astype(jnp.float32)
