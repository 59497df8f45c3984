"""Stable-Diffusion UNet2DConditionModel in flax — diffusers checkpoint layout.

Serves three reference roles with ONE implementation:
  * the SD-x4 upscaler UNet (phase 1 non-banana path,
    /root/reference/src/segmentation/upscaler.py:13-116);
  * Marigold's intrinsics/normals UNets (phase 7,
    /root/reference/src/scene_optimization/scene_optim.py:68-121);
  * the camera-conditioned multiview texture UNet
    (Hunyuan3DPaintPipeline role, /root/reference/src/2d_to_3d_models/run.py:97)
    via ``class_labels``-style camera embeddings (pipeline/texgen.py).

The module graph and parameter names mirror diffusers' UNet2DConditionModel
(conv_in, time_embedding.linear_1/2, down_blocks.N.resnets.M /
attentions.M.transformer_blocks.0.{attn1,attn2,ff}, mid_block, up_blocks,
conv_norm_out, conv_out) so the public checkpoints convert key-for-key
(models/conversion.py 'sd_unet'). TPU notes: all attention on the flash
kernel, bf16 with f32 norms/outputs, group-norm channels padded to VPU
lanes by XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import timestep_embedding
from regen3d_tpu.ops.attention import flash_attention


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    in_channels: int = 7              # x4-upscaler: 4 latent + 3 lowres
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (256, 512, 512, 1024)
    layers_per_block: int = 2
    cross_attn_dim: int = 1024
    attn_head_dim: int = 64
    attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    norm_groups: int = 32
    class_embeddings: Optional[int] = None   # e.g. camera indices for texgen
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls, in_channels: int = 7, out_channels: int = 4,
             class_embeddings: Optional[int] = None) -> "SDUNetConfig":
        return cls(in_channels=in_channels, out_channels=out_channels,
                   block_channels=(8, 16), layers_per_block=1,
                   cross_attn_dim=16, attn_head_dim=4,
                   attn_blocks=(True, False), norm_groups=4,
                   class_embeddings=class_embeddings)

    @classmethod
    def sd_x4(cls) -> "SDUNetConfig":
        return cls()

    @classmethod
    def multiview(cls, num_views: int = 6) -> "SDUNetConfig":
        """Geometry-conditioned multiview texgen variant: [noisy latent ‖
        reference-image latent ‖ per-view mesh normal-map latent] in
        (4+4+4 channels), per-view camera index as class embedding, camera
        pose as an extra cross-attention token (pipeline/texgen.py)."""
        return cls(in_channels=12, out_channels=4,
                   block_channels=(192, 384, 768, 768),
                   cross_attn_dim=768, class_embeddings=num_views)


def _gn(groups, ch):
    return min(groups, ch) if ch % min(groups, ch) == 0 else 1


class ResnetBlock(nn.Module):
    """diffusers ResnetBlock2D: norm1/conv1 + time_emb_proj + norm2/conv2
    (+ conv_shortcut)."""

    out_ch: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, t_emb):
        h = nn.GroupNorm(num_groups=_gn(self.groups, x.shape[-1]),
                         dtype=jnp.float32, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        t = nn.Dense(self.out_ch, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(t_emb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=_gn(self.groups, self.out_ch),
                         dtype=jnp.float32, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """diffusers Attention: to_q/to_k/to_v/to_out.0."""

    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, e = x.shape
        hd = e // self.heads
        q = nn.Dense(e, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(e, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(e, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        def split(t):
            return t.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)

        o = flash_attention(split(q), split(k), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, e)
        return nn.Dense(e, dtype=self.dtype, name="to_out_0")(o)


class GEGLUFeedForward(nn.Module):
    """diffusers FeedForward with GEGLU: ff.net.0.proj (2×inner) +
    ff.net.2."""

    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        e = x.shape[-1]
        h = nn.Dense(e * 8, dtype=self.dtype, name="net_0_proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return nn.Dense(e, dtype=self.dtype, name="net_2")(a * nn.gelu(g))


class TransformerBlock2D(nn.Module):
    """diffusers BasicTransformerBlock: attn1 (self) / attn2 (cross) / ff."""

    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, ctx):
        x = x + CrossAttention(self.heads, self.dtype, name="attn1")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x))
        x = x + CrossAttention(self.heads, self.dtype, name="attn2")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), ctx)
        x = x + GEGLUFeedForward(self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """diffusers Transformer2DModel: norm, proj_in, one BasicTransformerBlock,
    proj_out (SD uses depth 1)."""

    heads: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, ctx):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=_gn(self.groups, c), dtype=jnp.float32,
                         name="norm")(x)
        x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        x = TransformerBlock2D(self.heads, self.dtype,
                               name="transformer_blocks_0")(x, ctx)
        x = x.reshape(b, h, w, c)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return x + res


class SDUNet(nn.Module):
    """UNet2DConditionModel: (latents, t, encoder_hidden_states
    [, class_labels]) → noise/velocity prediction."""

    cfg: SDUNetConfig

    @nn.compact
    def __call__(self, x, t, ctx, class_labels=None):
        c = self.cfg
        tdim = c.block_channels[0] * 4
        t_emb = timestep_embedding(t, c.block_channels[0])
        t_emb = nn.Dense(tdim, dtype=c.dtype,
                         name="time_embedding_linear_1")(t_emb.astype(c.dtype))
        t_emb = nn.Dense(tdim, dtype=c.dtype,
                         name="time_embedding_linear_2")(nn.silu(t_emb))
        if c.class_embeddings is not None:
            cls = nn.Embed(c.class_embeddings, tdim,
                           name="class_embedding")(class_labels)
            t_emb = t_emb + cls.astype(c.dtype)

        ctx = ctx.astype(c.dtype)
        heads_of = lambda ch: max(1, ch // c.attn_head_dim)

        h = nn.Conv(c.block_channels[0], (3, 3), dtype=c.dtype,
                    name="conv_in")(x.astype(c.dtype))
        skips = [h]

        # down path
        for i, ch in enumerate(c.block_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, c.norm_groups, c.dtype,
                                name=f"down_{i}_resnet_{j}")(h, t_emb)
                if c.attn_blocks[i]:
                    h = SpatialTransformer(heads_of(ch), c.norm_groups,
                                           c.dtype,
                                           name=f"down_{i}_attn_{j}")(h, ctx)
                skips.append(h)
            if i < len(c.block_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=c.dtype,
                            name=f"down_{i}_downsample")(h)
                skips.append(h)

        # mid
        ch = c.block_channels[-1]
        h = ResnetBlock(ch, c.norm_groups, c.dtype, name="mid_resnet_0")(
            h, t_emb)
        h = SpatialTransformer(heads_of(ch), c.norm_groups, c.dtype,
                               name="mid_attn_0")(h, ctx)
        h = ResnetBlock(ch, c.norm_groups, c.dtype, name="mid_resnet_1")(
            h, t_emb)

        # up path — named by the DIFFUSERS up_blocks index (0 = deepest),
        # so checkpoint keys map index-for-index
        n = len(c.block_channels)
        for i, ch in reversed(list(enumerate(c.block_channels))):
            k = n - 1 - i
            for j in range(c.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(ch, c.norm_groups, c.dtype,
                                name=f"up_{k}_resnet_{j}")(h, t_emb)
                if c.attn_blocks[i]:
                    h = SpatialTransformer(heads_of(ch), c.norm_groups,
                                           c.dtype,
                                           name=f"up_{k}_attn_{j}")(h, ctx)
            if i > 0:
                b_, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b_, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(ch, (3, 3), dtype=c.dtype,
                            name=f"up_{k}_upsample")(h)

        h = nn.GroupNorm(num_groups=_gn(c.norm_groups, h.shape[-1]),
                         dtype=jnp.float32, name="conv_norm_out")(h)
        return nn.Conv(c.out_channels, (3, 3), dtype=jnp.float32,
                       name="conv_out")(nn.silu(h))
