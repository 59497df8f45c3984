"""FLUX-family rectified-flow image transformer (MMDiT).

The reference's FLUX upscaling path (src/segmentation/upscaler.py:26-39)
drives ``black-forest-labs/FLUX.1-dev`` with the jasperai ControlNet
upscaler. This module rebuilds the FLUX *transformer* with the upstream
diffusers ``FluxTransformer2DModel`` tensor layout so the real checkpoint
converts 1:1 (models/conversion.py ``flux`` family):

  * ``x_embedder`` / ``context_embedder`` token projections;
  * ``time_text_embed`` — sinusoidal timestep + guidance + pooled-text
    MLPs summed into the AdaLN conditioning vector;
  * 19 ``transformer_blocks`` (DOUBLE stream): separate img/txt streams
    with per-stream AdaLN-Zero modulation, JOINT attention over
    [txt ‖ img] tokens (per-head RMSNorm on q/k, 3-axis rotary position
    embedding), separate out projections and GELU MLPs;
  * 38 ``single_transformer_blocks``: fused attention+MLP trunk over the
    concatenated sequence with a single gated output projection;
  * ``norm_out`` AdaLN-continuous + ``proj_out``.

TPU design notes: everything runs bf16 on the Pallas flash-attention
kernel with f32 modulation/output heads; rotary tables are computed once
per call (static shapes) and passed down, so the whole sampler jits into
one program. The 12-B full config does not fit one v5e chip — serve it
tp-sharded over the ('dp','tp') mesh (parallel/mesh.py shards the fused
qkv/MLP kernels column/row-parallel).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import timestep_embedding
from regen3d_tpu.ops.attention import flash_attention


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64          # 16-ch VAE latents packed 2×2
    width: int = 3072
    num_heads: int = 24            # head_dim 128
    double_depth: int = 19
    single_depth: int = 38
    cond_dim: int = 4096           # T5 joint_attention_dim
    pooled_dim: int = 768          # CLIP pooled projection
    mlp_ratio: float = 4.0
    axes_dim: Tuple[int, int, int] = (16, 56, 56)  # rotary axes (id, y, x)
    theta: float = 10000.0
    guidance: bool = True          # FLUX.1-dev has a guidance embedder
    latent_tokens: int = 1024      # default img sequence (for init shapes)
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads

    @classmethod
    def tiny(cls) -> "FluxConfig":
        return cls(in_channels=8, width=64, num_heads=4, double_depth=1,
                   single_depth=2, cond_dim=32, pooled_dim=16,
                   axes_dim=(4, 6, 6), latent_tokens=16)


def rope_tables(ids: jnp.ndarray, axes_dim: Tuple[int, ...],
                theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Position ids (B, L, n_axes) → rotary (cos, sin), each (B, L, hd/2).

    Per axis a with dim d: ω_j = θ^(−2j/d); angles = id_a · ω — the FLUX
    EmbedND layout (axes concatenated along the head dimension)."""
    cos, sin = [], []
    for a, d in enumerate(axes_dim):
        half = d // 2
        omega = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
        ang = ids[..., a].astype(jnp.float32)[..., None] * omega
        cos.append(jnp.cos(ang))
        sin.append(jnp.sin(ang))
    return jnp.concatenate(cos, -1), jnp.concatenate(sin, -1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
               ) -> jnp.ndarray:
    """Rotate (B, H, L, hd) by interleaved-pair rotary tables (B, L, hd/2)."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xr[..., 0].astype(jnp.float32), xr[..., 1].astype(jnp.float32)
    c, s = cos[:, None], sin[:, None]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], -1)
    return out.reshape(x.shape).astype(x.dtype)


class _QKV(nn.Module):
    """q/k/v projections + per-head RMSNorm (+rope), diffusers names."""

    cfg: FluxConfig
    prefix: str = ""               # "" (img/self) or "add_" (txt stream)

    @nn.compact
    def __call__(self, x, cos, sin):
        c = self.cfg
        b, s, _ = x.shape
        p = self.prefix

        def proj(name):
            t = nn.Dense(c.width, dtype=c.dtype, name=name)(x)
            return t.reshape(b, s, c.num_heads, c.head_dim) \
                .transpose(0, 2, 1, 3)

        q = nn.RMSNorm(dtype=c.dtype, name=f"{p}q_norm")(proj(f"{p}q"))
        k = nn.RMSNorm(dtype=c.dtype, name=f"{p}k_norm")(proj(f"{p}k"))
        v = proj(f"{p}v")
        return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


class _GeluMlp(nn.Module):
    """diffusers FeedForward (gelu-approx): fc1 → gelu(tanh) → fc2."""

    width: int
    mlp_ratio: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None]) + shift[:, None]


class FluxDoubleBlock(nn.Module):
    """Double-stream MMDiT block (diffusers FluxTransformerBlock)."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, vec, img_rope, txt_rope):
        c = self.cfg
        svec = nn.silu(vec)
        mod_i = nn.Dense(6 * c.width, dtype=c.dtype, name="mod_img")(svec)
        mod_t = nn.Dense(6 * c.width, dtype=c.dtype, name="mod_txt")(svec)
        (i_shift, i_scale, i_gate,
         i_shift2, i_scale2, i_gate2) = jnp.split(mod_i, 6, -1)
        (t_shift, t_scale, t_gate,
         t_shift2, t_scale2, t_gate2) = jnp.split(mod_t, 6, -1)

        ln = lambda name: nn.LayerNorm(use_scale=False, use_bias=False,
                                       dtype=c.dtype, name=name)
        img_n = _modulate(ln("norm1_img")(img), i_shift, i_scale)
        txt_n = _modulate(ln("norm1_txt")(txt), t_shift, t_scale)

        qi, ki, vi = _QKV(c, name="attn")(img_n, *img_rope)
        qt, kt, vt = _QKV(c, prefix="add_", name="attn_add")(txt_n, *txt_rope)
        # joint attention, txt first (the diffusers concat order)
        q = jnp.concatenate([qt, qi], axis=2)
        k = jnp.concatenate([kt, ki], axis=2)
        v = jnp.concatenate([vt, vi], axis=2)
        o = flash_attention(q, k, v)
        b, _, _, hd = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, c.width)
        lt = txt.shape[1]
        o_txt, o_img = o[:, :lt], o[:, lt:]

        img = img + i_gate[:, None] * nn.Dense(
            c.width, dtype=c.dtype, name="out")(o_img)
        h = _modulate(ln("norm2_img")(img), i_shift2, i_scale2)
        img = img + i_gate2[:, None] * _GeluMlp(
            c.width, c.mlp_ratio, c.dtype, name="ff")(h)

        txt = txt + t_gate[:, None] * nn.Dense(
            c.width, dtype=c.dtype, name="add_out")(o_txt)
        h = _modulate(ln("norm2_txt")(txt), t_shift2, t_scale2)
        txt = txt + t_gate2[:, None] * _GeluMlp(
            c.width, c.mlp_ratio, c.dtype, name="ff_txt")(h)
        return img, txt


class FluxSingleBlock(nn.Module):
    """Single-stream block (diffusers FluxSingleTransformerBlock):
    attention and MLP computed from one modulated norm, concatenated
    through one gated output projection."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, vec, rope):
        c = self.cfg
        mod = nn.Dense(3 * c.width, dtype=c.dtype, name="mod")(nn.silu(vec))
        shift, scale, gate = jnp.split(mod, 3, -1)
        xn = _modulate(nn.LayerNorm(use_scale=False, use_bias=False,
                                    dtype=c.dtype, name="norm")(x),
                       shift, scale)
        q, k, v = _QKV(c, name="attn")(xn, *rope)
        o = flash_attention(q, k, v)
        b = x.shape[0]
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, c.width)
        mlp = nn.gelu(nn.Dense(int(c.width * c.mlp_ratio), dtype=c.dtype,
                               name="proj_mlp")(xn), approximate=True)
        out = nn.Dense(c.width, dtype=c.dtype, name="proj_out")(
            jnp.concatenate([o, mlp], axis=-1))
        return x + gate[:, None] * out


class FluxTransformer(nn.Module):
    """images-latent tokens + condition tokens → velocity prediction.

    Call signature matches ShapeDiT (x, t, cond) so the rectified-flow
    sampler in models/dit.py drives it unchanged (the FLUX family IS flow
    matching); pooled/guidance/ids are optional refinements."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, t, cond, pooled=None, guidance=None,
                 img_ids=None, txt_ids=None):
        c = self.cfg
        b, l, _ = x.shape
        lt = cond.shape[1]

        if img_ids is None:
            # default: square-grid ids (0, y, x); fall back to a linear id
            side = int(round(l ** 0.5))
            if side * side == l:
                ar = jnp.arange(l)
                img_ids = jnp.stack(
                    [jnp.zeros(l), ar // side, ar % side], -1)
            else:
                img_ids = jnp.stack(
                    [jnp.zeros(l), jnp.zeros(l), jnp.arange(l)], -1)
            img_ids = jnp.broadcast_to(img_ids[None], (b, l, 3))
        if txt_ids is None:
            txt_ids = jnp.zeros((b, lt, 3))
        img_rope = rope_tables(img_ids, c.axes_dim, c.theta)
        txt_rope = rope_tables(txt_ids, c.axes_dim, c.theta)
        all_rope = tuple(jnp.concatenate([tr, ir], axis=1)
                         for tr, ir in zip(txt_rope, img_rope))

        img = nn.Dense(c.width, dtype=c.dtype, name="x_in")(x)
        txt = nn.Dense(c.width, dtype=c.dtype, name="cond_in")(cond)

        t_emb = timestep_embedding(t * 1000.0, 256)
        vec = nn.Dense(c.width, dtype=c.dtype, name="t_in")(t_emb)
        vec = nn.Dense(c.width, dtype=c.dtype, name="t_out")(nn.silu(vec))
        if c.guidance:
            g = (guidance if guidance is not None
                 else jnp.full((b,), 3.5, jnp.float32))
            g_emb = timestep_embedding(g * 1000.0, 256)
            gv = nn.Dense(c.width, dtype=c.dtype, name="g_in")(g_emb)
            vec = vec + nn.Dense(c.width, dtype=c.dtype,
                                 name="g_out")(nn.silu(gv))
        p = (pooled if pooled is not None
             else jnp.zeros((b, c.pooled_dim), x.dtype))
        pv = nn.Dense(c.width, dtype=c.dtype, name="p_in")(p)
        vec = vec + nn.Dense(c.width, dtype=c.dtype, name="p_out")(
            nn.silu(pv))

        for i in range(c.double_depth):
            img, txt = FluxDoubleBlock(c, name=f"double{i}")(
                img, txt, vec, img_rope, txt_rope)
        h = jnp.concatenate([txt, img], axis=1)
        for i in range(c.single_depth):
            h = FluxSingleBlock(c, name=f"single{i}")(h, vec, all_rope)
        h = h[:, lt:]

        mod = nn.Dense(2 * c.width, dtype=c.dtype, name="norm_out_lin")(
            nn.silu(vec))
        scale, shift = jnp.split(mod, 2, -1)   # diffusers order: scale, shift
        h = _modulate(nn.LayerNorm(use_scale=False, use_bias=False,
                                   dtype=c.dtype, name="norm_out")(h),
                      shift, scale)
        return nn.Dense(c.in_channels, dtype=jnp.float32, name="proj_out")(h)
