"""Image VAE (AutoencoderKL family) for the latent-diffusion pipelines.

The SD-x4 upscaler and Marigold heads (SURVEY §2.2) operate in an
AutoencoderKL latent space; this is that architecture in flax: conv
encoder/decoder with GroupNorm+SiLU residual blocks and a mid-block
attention, diagonal-Gaussian latents with the 0.18215 scaling convention.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.unet import AttnBlock2D, ResBlock, _groups


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    base: int = 128
    mults: Tuple[int, ...] = (1, 2, 4, 4)   # 8× downsampling
    dtype: jnp.dtype = jnp.bfloat16
    scaling: float = 0.18215

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(latent_channels=4, base=16, mults=(1, 2))


class VAEEncoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, img):  # (B, H, W, 3) in [-1, 1]
        c = self.cfg
        h = nn.Conv(c.base, (3, 3), dtype=c.dtype, name="stem")(
            img.astype(c.dtype))
        for li, mult in enumerate(c.mults):
            ch = c.base * mult
            h = ResBlock(ch, c.dtype, name=f"down{li}_0")(h)
            h = ResBlock(ch, c.dtype, name=f"down{li}_1")(h)
            if li < len(c.mults) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=c.dtype,
                            name=f"down{li}_pool")(h)
        h = ResBlock(h.shape[-1], c.dtype, name="mid1")(h)
        h = AttnBlock2D(4, c.dtype, name="mid_attn")(h)
        h = ResBlock(h.shape[-1], c.dtype, name="mid2")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), dtype=c.dtype,
                         name="out_norm")(h)
        moments = nn.Conv(2 * c.latent_channels, (3, 3), dtype=jnp.float32,
                          name="out")(nn.silu(h))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):  # (B, h, w, latent)
        c = self.cfg
        ch = c.base * c.mults[-1]
        h = nn.Conv(ch, (3, 3), dtype=c.dtype, name="stem")(z.astype(c.dtype))
        h = ResBlock(ch, c.dtype, name="mid1")(h)
        h = AttnBlock2D(4, c.dtype, name="mid_attn")(h)
        h = ResBlock(ch, c.dtype, name="mid2")(h)
        for li, mult in reversed(list(enumerate(c.mults))):
            ch = c.base * mult
            h = ResBlock(ch, c.dtype, name=f"up{li}_0")(h)
            h = ResBlock(ch, c.dtype, name=f"up{li}_1")(h)
            if li > 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), dtype=c.dtype, name=f"up{li}_conv")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), dtype=c.dtype,
                         name="out_norm")(h)
        return nn.Conv(3, (3, 3), dtype=jnp.float32, name="out")(nn.silu(h))


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = VAEEncoder(self.cfg, name="encoder")
        self.decoder = VAEDecoder(self.cfg, name="decoder")

    def __call__(self, img, key=None):
        mean, logvar = self.encoder(img)
        z = mean if key is None else (
            mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape))
        return self.decoder(z * (1.0 / self.cfg.scaling) * self.cfg.scaling), \
            (mean, logvar)

    def encode(self, img, key=None):
        mean, logvar = self.encoder(img)
        z = mean if key is None else (
            mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape))
        return z * self.cfg.scaling

    def decode(self, z):
        return self.decoder(z / self.cfg.scaling)
