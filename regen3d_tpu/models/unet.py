"""Diffusion UNet family + samplers.

Covers the reference's diffusion consumers (SURVEY §2.2):
  * SD-x4 upscaler UNet (phase-1 non-banana path, upscaler.py:13-116 —
    50 DDIM steps, guidance 5.0, low-res conditioning by channel concat);
  * Marigold intrinsics/normals pipelines (phase 7, scene_optim.py:68-121 —
    image-conditioned latent diffusion heads);
  * rembg-style background matting (phase 2's prep, as `MattingUNet` —
    no timestep, plain encoder/decoder).

One configurable flax UNet serves all three weight families: residual
blocks with timestep FiLM conditioning, flash-attention blocks at the low-
resolution levels, channel-concat image conditioning.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import Attention, timestep_embedding


def _groups(ch: int, target: int = 32) -> int:
    """Largest group count ≤ target that divides the channel count."""
    g = min(target, ch)
    while g > 1 and ch % g:
        g -= 1
    return g


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 7          # x4 upscaler: 4 latent + 3 lowres
    out_channels: int = 4
    base: int = 128
    mults: Tuple[int, ...] = (1, 2, 4, 4)
    attn_levels: Tuple[int, ...] = (2, 3)
    blocks_per_level: int = 2
    num_heads: int = 8
    time_conditioned: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls, in_channels=7, out_channels=4) -> "UNetConfig":
        return cls(in_channels=in_channels, out_channels=out_channels,
                   base=16, mults=(1, 2), attn_levels=(1,),
                   blocks_per_level=1, num_heads=2)


class ResBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, t_emb=None):
        h = nn.GroupNorm(num_groups=_groups(x.shape[-1]), dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(h)
        if t_emb is not None:
            film = nn.Dense(2 * self.out_ch, dtype=self.dtype, name="film")(
                nn.silu(t_emb))
            scale, shift = jnp.split(film[:, None, None, :], 2, axis=-1)
            h = h * (1 + scale) + shift
        h = nn.GroupNorm(num_groups=_groups(self.out_ch), dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class AttnBlock2D(nn.Module):
    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=_groups(c), dtype=self.dtype, name="norm")(x)
        y = Attention(self.num_heads, dtype=self.dtype, name="attn")(
            y.reshape(b, h * w, c))
        return x + y.reshape(b, h, w, c)


class UNet(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, t=None, cond_img=None):
        """x (B, H, W, in) [optionally with cond concatenated by caller or
        via ``cond_img``], t (B,) timesteps in [0, 1000)."""
        c = self.cfg
        if cond_img is not None:
            x = jnp.concatenate([x, cond_img.astype(x.dtype)], axis=-1)
        t_emb = None
        if c.time_conditioned:
            tt = t if t is not None else jnp.zeros(x.shape[0])
            t_emb = nn.Dense(c.base * 4, dtype=c.dtype, name="t1")(
                timestep_embedding(tt, c.base))
            t_emb = nn.Dense(c.base * 4, dtype=c.dtype, name="t2")(nn.silu(t_emb))

        h = nn.Conv(c.base, (3, 3), dtype=c.dtype, name="stem")(x.astype(c.dtype))
        skips = [h]
        # down
        for li, mult in enumerate(c.mults):
            ch = c.base * mult
            for bi in range(c.blocks_per_level):
                h = ResBlock(ch, c.dtype, name=f"down{li}_{bi}")(h, t_emb)
                if li in c.attn_levels:
                    h = AttnBlock2D(c.num_heads, c.dtype,
                                    name=f"down{li}_{bi}_attn")(h)
                skips.append(h)
            if li < len(c.mults) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=c.dtype,
                            name=f"down{li}_pool")(h)
                skips.append(h)
        # middle
        h = ResBlock(h.shape[-1], c.dtype, name="mid1")(h, t_emb)
        h = AttnBlock2D(c.num_heads, c.dtype, name="mid_attn")(h)
        h = ResBlock(h.shape[-1], c.dtype, name="mid2")(h, t_emb)
        # up
        for li, mult in reversed(list(enumerate(c.mults))):
            ch = c.base * mult
            for bi in range(c.blocks_per_level + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(ch, c.dtype, name=f"up{li}_{bi}")(h, t_emb)
                if li in c.attn_levels:
                    h = AttnBlock2D(c.num_heads, c.dtype,
                                    name=f"up{li}_{bi}_attn")(h)
            if li > 0:
                b_, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b_, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), dtype=c.dtype, name=f"up{li}_conv")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), dtype=c.dtype,
                         name="out_norm")(h)
        return nn.Conv(c.out_channels, (3, 3), dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros, name="out")(nn.silu(h))


# --- samplers -------------------------------------------------------------------

def ddim_sample(
    model: UNet,
    params,
    key: jax.Array,
    shape: Tuple[int, ...],
    cond_img: Optional[jnp.ndarray] = None,
    num_steps: int = 50,
    guidance_scale: float = 1.0,
    num_train_steps: int = 1000,
) -> jnp.ndarray:
    """DDIM (η=0) over a linear-β ᾱ schedule — the SD-x4 upscaler's sampler
    family (50 steps, guidance 5.0 — config.yaml:152-153). ε-prediction."""
    betas = jnp.linspace(1e-4, 0.02, num_train_steps)
    alphas_bar = jnp.cumprod(1.0 - betas)
    ts = jnp.linspace(num_train_steps - 1, 0, num_steps).astype(jnp.int32)

    x = jax.random.normal(key, shape)

    def step(x, i):
        t_cur = ts[i]
        t_next = jnp.where(i + 1 < num_steps, ts[jnp.minimum(i + 1,
                                                             num_steps - 1)], 0)
        a_cur = alphas_bar[t_cur]
        a_next = jnp.where(i + 1 < num_steps, alphas_bar[t_next], 1.0)
        tt = jnp.full((shape[0],), t_cur, jnp.float32)
        if guidance_scale != 1.0 and cond_img is not None:
            eps_c = model.apply(params, x, tt, cond_img)
            eps_u = model.apply(params, x, tt, jnp.zeros_like(cond_img))
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        else:
            eps = model.apply(params, x, tt, cond_img)
        x0 = (x - jnp.sqrt(1 - a_cur) * eps) / jnp.sqrt(a_cur)
        x = jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(num_steps))
    return x


class MattingUNet(nn.Module):
    """rembg-family background matting (isnet/u2net role,
    inpaint_nanoBanana.py:157-189): image → alpha matte. Same UNet trunk,
    no timestep."""

    base: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img):  # (B, H, W, 3) → (B, H, W, 1) in [0, 1]
        cfg = UNetConfig(in_channels=3, out_channels=1, base=self.base,
                         mults=(1, 2, 4), attn_levels=(2,),
                         blocks_per_level=1, num_heads=4,
                         time_conditioned=False, dtype=self.dtype)
        logits = UNet(cfg, name="trunk")(img)
        return jax.nn.sigmoid(logits)
