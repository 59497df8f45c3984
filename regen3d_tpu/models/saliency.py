"""Saliency transformer (the VST role for the `saliency` point strategy).

The reference vendors a 2.4k-LoC Visual Saliency Transformer (T2T-ViT
backbone + transformer decoder, src/segmentation/vst_main/) solely to pick
SAM prompt points (SURVEY §2.2). This is that family in compact flax form:
a tokens-to-token stem (overlapping soft-split unfoldings), transformer
encoder, and a saliency token cross-attending into patch tokens to produce
the saliency map.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import Attention, Mlp, TransformerBlock, posemb_sincos_2d


@dataclasses.dataclass(frozen=True)
class SaliencyConfig:
    image_size: int = 224
    width: int = 384
    depth: int = 6
    num_heads: int = 6
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "SaliencyConfig":
        return cls(image_size=64, width=64, depth=2, num_heads=4)


class T2TStem(nn.Module):
    """Tokens-to-token stem: two overlapping soft splits with token mixing,
    16× total downsampling (the T2T-ViT tokenization scheme)."""

    width: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, img):  # (B, H, W, 3)
        # soft split 1: 7×7 stride 4
        x = nn.Conv(self.width // 2, (7, 7), strides=(4, 4), dtype=self.dtype,
                    name="unfold1")(img.astype(self.dtype))
        b, h, w, c = x.shape
        t = TransformerBlock(2, mlp_ratio=1.0, dtype=self.dtype, name="t2t1")(
            x.reshape(b, h * w, c))
        s4 = t.reshape(b, h, w, c)                 # stride-4 skip
        # soft split 2: 3×3 stride 2
        x = nn.Conv(self.width // 2, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="unfold2")(s4)
        b, h, w, c = x.shape
        t = TransformerBlock(2, mlp_ratio=1.0, dtype=self.dtype, name="t2t2")(
            x.reshape(b, h * w, c))
        s8 = t.reshape(b, h, w, c)                 # stride-8 skip
        # final projection: 3×3 stride 2 → width
        x = nn.Conv(self.width, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="proj")(s8)
        return x, s8, s4


class SaliencyTransformer(nn.Module):
    cfg: SaliencyConfig

    @nn.compact
    def __call__(self, img):  # (B, H, W, 3) in [0,1] → (B, H, W) in [0,1]
        c = self.cfg
        # saliency is DEFINED relative to the frame: give the stem the
        # globally mean-centered image alongside the raw one so
        # "contrasts with the scene" is a linear feature, not something
        # the encoder must rediscover through attention
        inp = jnp.concatenate(
            [img, img - img.mean(axis=(1, 2), keepdims=True)], axis=-1)
        feat, s8, s4 = T2TStem(c.width, c.dtype, name="stem")(inp)
        b, gh, gw, _ = feat.shape
        x = feat.reshape(b, gh * gw, c.width)
        x = x + posemb_sincos_2d(gh, gw, c.width)[None].astype(c.dtype)
        sal_tok = self.param("saliency_token", nn.initializers.normal(0.02),
                             (1, c.width), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(sal_tok[None].astype(c.dtype), (b, 1, c.width)), x],
            axis=1)
        for i in range(c.depth):
            x = TransformerBlock(c.num_heads, dtype=c.dtype, name=f"block{i}")(x)
        sal = x[:, :1]
        patches = x[:, 1:]
        # saliency-token ↔ patch similarity decodes the map (VST decoder role)
        att = Attention(c.num_heads, dtype=c.dtype, name="decode")(
            nn.LayerNorm(dtype=c.dtype, name="dn")(patches), sal)
        d = (patches + att).reshape(b, gh, gw, c.width)
        # reverse-T2T decoder (VST RT2T role): progressively upsample tokens
        # back to the stride-4 soft-split resolution, fusing stem skips —
        # a 16×-downsampled logit grid alone cannot localize small objects
        d = nn.ConvTranspose(c.width // 2, (3, 3), strides=(2, 2),
                             dtype=c.dtype, name="up8")(d)
        d = d + nn.Dense(c.width // 2, dtype=c.dtype, name="skip8")(s8)
        bb, h8, w8, cc = d.shape
        d = TransformerBlock(2, mlp_ratio=1.0, dtype=c.dtype, name="dec8")(
            d.reshape(bb, h8 * w8, cc)).reshape(bb, h8, w8, cc)
        d = nn.ConvTranspose(c.width // 2, (3, 3), strides=(2, 2),
                             dtype=c.dtype, name="up4")(d)
        d = d + nn.Dense(c.width // 2, dtype=c.dtype, name="skip4")(s4)
        logits = nn.Dense(1, dtype=jnp.float32, name="out")(d)[..., 0]
        up = jax.image.resize(logits, (b, *img.shape[1:3]), "bilinear")
        return jax.nn.sigmoid(up)
