"""Depth-Anything-V2 (DINOv2-S/14 + DPT) — the phase-1 depth.png model.

Reference: global_utils.py:400-418 runs the HF pipeline
``depth-anything/Depth-Anything-V2-Small-hf`` when ``depth_large_model``
is false (Marigold covers the large path via the sd_unet family). This is
an exact structural transcription of the upstream topology so the
checkpoint converts key-for-key (conversion family "depth_anything"):

  * backbone: DINOv2 ViT-S/14 — patch-embed conv 14, cls token, learned
    pos-embed, 12 pre-norm blocks with fused qkv + LayerScale, final norm
    applied to every tap (DINOv2 get_intermediate_layers norm=True);
  * head: DA-v2 DPTHead — per-tap 1×1 projects to (48, 96, 192, 384),
    resize pyramid (×4 convT, ×2 convT, identity, ×0.5 conv), scratch
    layer_rn 3×3 no-bias to `features`, FeatureFusionBlocks with two
    ResidualConvUnits + 1×1 out_conv, output_conv1 → ×14 upsample →
    output_conv2 (3×3 → ReLU → 1×1 → ReLU) relative depth.

TPU notes: bf16 trunk / f32 head output; everything is static-shape and
jits whole; taps at blocks (2, 5, 8, 11).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import PatchEmbed, ViTBlock


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    image_size: int = 518
    patch: int = 14
    width: int = 384               # ViT-S
    depth: int = 12
    num_heads: int = 6
    out_idx: Tuple[int, ...] = (2, 5, 8, 11)
    features: int = 64
    out_channels: Tuple[int, ...] = (48, 96, 192, 384)
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def small(cls) -> "DepthAnythingConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "DepthAnythingConfig":
        return cls(image_size=56, patch=14, width=32, depth=4, num_heads=2,
                   out_idx=(0, 1, 2, 3), features=8,
                   out_channels=(4, 8, 16, 32))


class ResidualConvUnit(nn.Module):
    ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype,
                    name="conv1")(nn.relu(x))
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype,
                    name="conv2")(nn.relu(h))
        return x + h


class FeatureFusionBlock(nn.Module):
    """Upstream FeatureFusionBlock: skip through resConfUnit1, sum,
    resConfUnit2, ×2 upsample, 1×1 out_conv."""

    ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.ch, self.dtype,
                                     name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.ch, self.dtype, name="resConfUnit2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = jax.image.resize(x, (x.shape[0], *out_hw, x.shape[-1]),
                             "bilinear")
        return nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DepthAnything(nn.Module):
    cfg: DepthAnythingConfig

    @nn.compact
    def __call__(self, img):
        """(B, H, W, 3) in [0, 1] → relative depth (B, H, W), ≥ 0."""
        c = self.cfg
        b, h, w = img.shape[:3]
        x, (gh, gw) = PatchEmbed(c.patch, c.width, dtype=c.dtype,
                                 name="patch_embed")(img.astype(c.dtype))
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.width), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + (c.image_size // c.patch) ** 2, c.width),
                         jnp.float32)
        # interpolate the patch part of pos_embed to the actual grid
        side = c.image_size // c.patch
        pos_patch = pos[:, 1:].reshape(1, side, side, c.width)
        pos_patch = jax.image.resize(pos_patch, (1, gh, gw, c.width),
                                     "bilinear").reshape(1, gh * gw, c.width)
        x = x + pos_patch.astype(c.dtype)
        cls_t = jnp.broadcast_to(cls + pos[:, :1], (b, 1, c.width))
        x = jnp.concatenate([cls_t.astype(c.dtype), x], axis=1)

        norm = nn.LayerNorm(dtype=jnp.float32, name="norm")
        taps = []
        for i in range(c.depth):
            x = ViTBlock(c.num_heads, layer_scale=True, dtype=c.dtype,
                         name=f"block{i}")(x)
            if i in c.out_idx:
                taps.append(norm(x)[:, 1:])          # drop cls, final norm

        # --- DPT head -----------------------------------------------------
        fe = c.features
        outs = []
        for i, t in enumerate(taps):
            y = t.reshape(b, gh, gw, c.width)
            y = nn.Conv(c.out_channels[i], (1, 1), dtype=c.dtype,
                        name=f"project{i}")(y)
            if i == 0:
                y = nn.ConvTranspose(c.out_channels[i], (4, 4),
                                     strides=(4, 4), dtype=c.dtype,
                                     name="resize0")(y)
            elif i == 1:
                y = nn.ConvTranspose(c.out_channels[i], (2, 2),
                                     strides=(2, 2), dtype=c.dtype,
                                     name="resize1")(y)
            elif i == 3:
                y = nn.Conv(c.out_channels[i], (3, 3), strides=(2, 2),
                            dtype=c.dtype, name="resize3")(y)
            y = nn.Conv(fe, (3, 3), use_bias=False, dtype=c.dtype,
                        name=f"layer{i + 1}_rn")(y)
            outs.append(y)

        path = FeatureFusionBlock(fe, c.dtype, name="refinenet4")(
            outs[3], out_hw=outs[2].shape[1:3])
        path = FeatureFusionBlock(fe, c.dtype, name="refinenet3")(
            path, outs[2], out_hw=outs[1].shape[1:3])
        path = FeatureFusionBlock(fe, c.dtype, name="refinenet2")(
            path, outs[1], out_hw=outs[0].shape[1:3])
        path = FeatureFusionBlock(fe, c.dtype, name="refinenet1")(
            path, outs[0])

        y = nn.Conv(fe // 2, (3, 3), dtype=c.dtype, name="output_conv1")(path)
        y = jax.image.resize(y, (b, h, w, y.shape[-1]), "bilinear")
        y = nn.relu(nn.Conv(32, (3, 3), dtype=c.dtype,
                            name="output_conv2a")(y))
        y = nn.relu(nn.Conv(1, (1, 1), dtype=jnp.float32,
                            name="output_conv2b")(y))
        return y[..., 0]
