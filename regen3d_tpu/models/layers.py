"""Shared transformer building blocks (flax.linen, flash-attention-backed).

All attention goes through the Pallas kernel in
:mod:`regen3d_tpu.ops.attention`; matmuls default to bf16 with f32
accumulation (TPU MXU native).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.ops.attention import flash_attention


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0
                       ) -> jnp.ndarray:
    """Sinusoidal timestep embedding: (B,) → (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Mlp(nn.Module):
    hidden: int
    out: Optional[int] = None
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = self.out or x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self/cross attention on the flash kernel."""

    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    qkv_bias: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x_q, x_kv=None):
        x_kv = x_q if x_kv is None else x_kv
        b, sq, e = x_q.shape
        hd = e // self.num_heads
        q = nn.Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x_q)
        k = nn.Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="k")(x_kv)
        v = nn.Dense(e, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x_kv)

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if self.qk_norm:
            q = nn.RMSNorm(dtype=self.dtype, name="q_norm")(q)
            k = nn.RMSNorm(dtype=self.dtype, name="k_norm")(k)
        o = flash_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, sq, e)
        return nn.Dense(e, dtype=self.dtype, name="proj")(o)


class FusedAttention(nn.Module):
    """Self-attention with a FUSED qkv projection — the torch-ViT layout
    (timm/DINOv2/VGGT checkpoints store one qkv matrix), so converted
    weights drop in without splitting."""

    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, s, e = x.shape
        hd = e // self.num_heads
        qkv = nn.Dense(3 * e, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)

        o = flash_attention(split(q), split(k), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, e)
        return nn.Dense(e, dtype=self.dtype, name="proj")(o)


class ViTBlock(nn.Module):
    """Standard pre-norm ViT block with fused qkv and optional LayerScale
    (DINOv2/VGGT block layout: norm1/attn/ls1/norm2/mlp/ls2)."""

    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        e = x.shape[-1]
        h = FusedAttention(self.num_heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x))
        if self.layer_scale:
            h = h * self.param("ls1", nn.initializers.constant(1e-5),
                               (e,), jnp.float32).astype(h.dtype)
        x = x + h
        h = Mlp(int(e * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x))
        if self.layer_scale:
            h = h * self.param("ls2", nn.initializers.constant(1e-5),
                               (e,), jnp.float32).astype(h.dtype)
        return x + h


class TransformerBlock(nn.Module):
    """Pre-norm block: self-attn [+ optional cross-attn] + MLP."""

    num_heads: int
    mlp_ratio: float = 4.0
    use_cross: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond=None):
        e = x.shape[-1]
        x = x + Attention(self.num_heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x))
        if self.use_cross:
            x = x + Attention(self.num_heads, dtype=self.dtype, name="cross")(
                nn.LayerNorm(dtype=self.dtype, name="norm_cross")(x), cond)
        x = x + Mlp(int(e * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x


def modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    """AdaLN-Zero DiT block with optional cross-attention conditioning
    (the Hunyuan3D-2-family layout: self-attn over shape-latent tokens,
    cross-attn to image tokens, gated by the timestep embedding)."""

    num_heads: int
    mlp_ratio: float = 4.0
    use_cross: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t_emb, cond=None):
        e = x.shape[-1]
        n_mod = 9 if self.use_cross else 6
        mod = nn.Dense(n_mod * e, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="adaLN")(
            nn.silu(t_emb))
        parts = jnp.split(mod, n_mod, axis=-1)

        sa_shift, sa_scale, sa_gate = parts[0], parts[1], parts[2]
        h = nn.LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype,
                         name="norm1")(x)
        h = modulate(h, sa_shift, sa_scale)
        x = x + sa_gate[:, None, :] * Attention(
            self.num_heads, dtype=self.dtype, qk_norm=True, name="attn")(h)

        idx = 3
        if self.use_cross:
            ca_shift, ca_scale, ca_gate = parts[3], parts[4], parts[5]
            h = nn.LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype,
                             name="norm_cross")(x)
            h = modulate(h, ca_shift, ca_scale)
            x = x + ca_gate[:, None, :] * Attention(
                self.num_heads, dtype=self.dtype, qk_norm=True, name="cross")(h, cond)
            idx = 6

        m_shift, m_scale, m_gate = parts[idx], parts[idx + 1], parts[idx + 2]
        h = nn.LayerNorm(use_scale=False, use_bias=False, dtype=self.dtype,
                         name="norm2")(x)
        h = modulate(h, m_shift, m_scale)
        x = x + m_gate[:, None, :] * Mlp(int(e * self.mlp_ratio),
                                         dtype=self.dtype, name="mlp")(h)
        return x


class PatchEmbed(nn.Module):
    """Image → patch tokens via a strided conv (ViT stem)."""

    patch: int
    width: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img):  # (B, H, W, C)
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="proj")(img)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c), (h, w)


def posemb_sincos_2d(h: int, w: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h·w, dim) fixed 2D sin-cos position embedding."""
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    out = jnp.concatenate([
        jnp.sin(x[:, None] * omega), jnp.cos(x[:, None] * omega),
        jnp.sin(y[:, None] * omega), jnp.cos(y[:, None] * omega),
    ], axis=-1)
    if out.shape[-1] < dim:
        out = jnp.pad(out, ((0, 0), (0, dim - out.shape[-1])))
    return out.astype(dtype)


def fourier_features(x: jnp.ndarray, num_freqs: int = 8,
                     include_input: bool = True) -> jnp.ndarray:
    """3D point → Fourier features (NeRF-style), for SDF query embedding."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype) * jnp.pi
    ang = x[..., None, :] * freqs[:, None]  # (..., F, 3)
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
