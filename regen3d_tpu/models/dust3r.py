"""DUSt3R-family pairwise stereo geometry net (AsymmetricCroCo3DStereo role).

The reference's alternative phase 4 (`Use_VGGT: false`) runs
`AsymmetricCroCo3DStereo.from_pretrained("naver/DUSt3R_ViTLarge_BaseDecoder_512_linear")`
on symmetrized image pairs (minimal_demo_dust3r.py:123-175): a shared ViT
encoder consumes both views, two cross-attending decoders exchange tokens,
and per-view linear heads regress a dense 3D pointmap — BOTH expressed in
view-1's camera frame — plus per-pixel confidence.

TPU-first design: one flax module, both views stacked on the batch axis for
the siamese encoder (one big MXU matmul stream instead of two), RoPE-2D
attention on the flash kernel, bf16 throughout with f32 heads; the pairwise
fan-out in phase 4 is vmapped over pairs rather than looped.

Upstream layout notes for weight conversion (models/weights.py rules):
encoder = ViT-L/16 (1024×24, 16 heads), decoders = ViT-B-ish (768×12, 12
heads) with per-block [self, cross, mlp], linear heads emit patch²·(3+1)
channels, pointmaps use the 'exp' radial parametrization and confidences
`1 + exp(c)`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import Mlp, PatchEmbed
from regen3d_tpu.ops.attention import flash_attention


@dataclasses.dataclass(frozen=True)
class Dust3rConfig:
    patch: int = 16
    enc_width: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    dec_width: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    rope_freq: float = 100.0      # upstream croco RoPE2D base frequency
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "Dust3rConfig":
        return cls(patch=8, enc_width=64, enc_depth=2, enc_heads=4,
                   dec_width=48, dec_depth=2, dec_heads=4)


def rope_2d(t: jnp.ndarray, positions: jnp.ndarray,
            base: float = 100.0) -> jnp.ndarray:
    """RoPE-2D: rotate the first half of each head dim by the y position and
    the second half by x (croco v2 convention). t: (B, H, N, D),
    positions: (N, 2) as (y, x). D must be divisible by 4."""
    d4 = t.shape[-1] // 4

    def rot(pos1d, half_slice):
        # half_slice: (B, H, N, 2·d4) → rotate consecutive (even, odd) pairs
        freqs = base ** (-jnp.arange(d4, dtype=jnp.float32) / d4)
        ang = pos1d[:, None].astype(jnp.float32) * freqs[None]  # (N, d4)
        cos = jnp.cos(ang)[None, None].astype(half_slice.dtype)
        sin = jnp.sin(ang)[None, None].astype(half_slice.dtype)
        a = half_slice[..., 0::2]
        b = half_slice[..., 1::2]
        ra = a * cos - b * sin
        rb = a * sin + b * cos
        return jnp.stack([ra, rb], axis=-1).reshape(half_slice.shape)

    d = t.shape[-1]
    hy = rot(positions[:, 0], t[..., : d // 2])
    hx = rot(positions[:, 1], t[..., d // 2:])
    return jnp.concatenate([hy, hx], axis=-1)


class RopeAttention(nn.Module):
    """Multi-head attention with RoPE-2D on q/k (self or cross).

    For cross-attention, queries use `pos_q` and keys `pos_kv` — both views
    share the same patch-grid geometry, so cross-view relative positions are
    meaningful (the croco design)."""

    num_heads: int
    rope_freq: float
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_q, pos_q, x_kv=None, pos_kv=None):
        x_kv = x_q if x_kv is None else x_kv
        pos_kv = pos_q if pos_kv is None else pos_kv
        b, sq, e = x_q.shape
        hd = e // self.num_heads
        q = nn.Dense(e, dtype=self.dtype, name="q")(x_q)
        k = nn.Dense(e, dtype=self.dtype, name="k")(x_kv)
        v = nn.Dense(e, dtype=self.dtype, name="v")(x_kv)

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        q = rope_2d(q, pos_q, self.rope_freq)
        k = rope_2d(k, pos_kv, self.rope_freq)
        o = flash_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, sq, e)
        return nn.Dense(e, dtype=self.dtype, name="proj")(o)


class EncoderBlock(nn.Module):
    num_heads: int
    rope_freq: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, pos):
        e = x.shape[-1]
        x = x + RopeAttention(self.num_heads, self.rope_freq, self.dtype,
                              name="attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x), pos)
        x = x + Mlp(e * 4, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x


class DecoderBlock(nn.Module):
    """Self-attn on own tokens, cross-attn to the OTHER view's tokens, MLP —
    the CroCo decoder block layout (norm1→attn, norm2→cross queries with
    norm_y on the other view's memory tokens, norm3→mlp), so upstream
    dec_blocks / dec_blocks2 weights map 1:1."""

    num_heads: int
    rope_freq: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, pos, other, pos_other):
        e = x.shape[-1]
        x = x + RopeAttention(self.num_heads, self.rope_freq, self.dtype,
                              name="attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x), pos)
        mem = nn.LayerNorm(dtype=self.dtype, name="norm_y")(other)
        x = x + RopeAttention(self.num_heads, self.rope_freq, self.dtype,
                              name="cross_attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), pos,
            mem, pos_other)
        x = x + Mlp(e * 4, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x))
        return x


def _postprocess_pointmap(fmap: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw head output (..., 4) → (pts3d (..., 3), conf (...,)).

    Pointmap uses the upstream 'exp' radial parametrization: the direction of
    the raw xyz is kept, its norm d maps to expm1(d) (positive, unbounded
    depth range with a linear regime near 0); conf = 1 + exp(c) (vmin=1)."""
    xyz = fmap[..., :3].astype(jnp.float32)
    c = fmap[..., 3].astype(jnp.float32)
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    conf = 1.0 + jnp.exp(jnp.clip(c, -10.0, 10.0))
    return pts, conf


class LinearHead(nn.Module):
    """Dense tokens → per-pixel (pts3d, conf) via patch-level pixel shuffle
    (upstream LinearPts3d)."""

    patch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, tokens, grid_hw):  # (B, N, D)
        gh, gw = grid_hw
        p = self.patch
        b = tokens.shape[0]
        x = nn.Dense(p * p * 4, dtype=jnp.float32, name="proj")(
            tokens.astype(jnp.float32))
        x = x.reshape(b, gh, gw, p, p, 4)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * p, gw * p, 4)
        return _postprocess_pointmap(x)


class AsymmetricCroCo3DStereo(nn.Module):
    """Image pair → {pts3d1, conf1, pts3d2, conf2}; both pointmaps live in
    view 1's camera frame (the dust3r contract)."""

    cfg: Dust3rConfig

    @nn.compact
    def __call__(self, img1, img2):  # (B, H, W, 3) each, in [0, 1]
        c = self.cfg
        b, h, w = img1.shape[:3]
        gh, gw = h // c.patch, w // c.patch
        n = gh * gw
        yy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0).reshape(-1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1).reshape(-1)
        pos = jnp.stack([yy, xx], axis=-1)  # (N, 2)

        # siamese encoder: both views through ONE batched stream
        embed = PatchEmbed(c.patch, c.enc_width, dtype=c.dtype, name="patch")
        both = jnp.concatenate([img1, img2], axis=0)  # (2B, H, W, 3)
        x, _ = embed((both - 0.5) / 0.5)
        for i in range(c.enc_depth):
            x = EncoderBlock(c.enc_heads, c.rope_freq, c.dtype,
                             name=f"enc{i}")(x, pos)
        x = nn.LayerNorm(dtype=c.dtype, name="enc_norm")(x)
        f1, f2 = x[:b], x[b:]

        # two decoders exchanging previous-layer tokens
        proj = nn.Dense(c.dec_width, dtype=c.dtype, name="decoder_embed")
        d1, d2 = proj(f1), proj(f2)
        for i in range(c.dec_depth):
            p1, p2 = d1, d2
            d1 = DecoderBlock(c.dec_heads, c.rope_freq, c.dtype,
                              name=f"dec1_{i}")(p1, pos, p2, pos)
            d2 = DecoderBlock(c.dec_heads, c.rope_freq, c.dtype,
                              name=f"dec2_{i}")(p2, pos, p1, pos)
        d1 = nn.LayerNorm(dtype=c.dtype, name="dec_norm1")(d1)
        d2 = nn.LayerNorm(dtype=c.dtype, name="dec_norm2")(d2)

        pts1, conf1 = LinearHead(c.patch, c.dtype, name="head1")(d1, (gh, gw))
        pts2, conf2 = LinearHead(c.patch, c.dtype, name="head2")(d2, (gh, gw))
        return {"pts3d1": pts1, "conf1": conf1,
                "pts3d2": pts2, "conf2": conf2}


def estimate_focal(pts3d: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Weiszfeld focal estimate from a pointmap in its own camera frame
    (upstream estimate_focal_knowing_depth, assuming the principal point at
    the image center): minimize Σ ‖(u, v) − f·(x/z, y/z)‖ over f."""
    h, w = pts3d.shape[:2]
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5 - h / 2.0
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5 - w / 2.0
    z = jnp.maximum(pts3d[..., 2], 1e-6)
    px = pts3d[..., 0] / z
    py = pts3d[..., 1] / z
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], -1)
    pp = jnp.stack([px.reshape(-1), py.reshape(-1)], -1)

    f0 = jnp.asarray(max(h, w), jnp.float32)

    def body(f, _):
        r = jnp.linalg.norm(uv - f * pp, axis=-1)
        wgt = 1.0 / jnp.maximum(r, 1e-6)
        num = jnp.sum(wgt * jnp.sum(uv * pp, -1))
        den = jnp.sum(wgt * jnp.sum(pp * pp, -1))
        return num / jnp.maximum(den, 1e-8), None

    f, _ = jax.lax.scan(body, f0, None, length=iters)
    return f
