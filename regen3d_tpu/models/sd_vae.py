"""AutoencoderKL in flax — diffusers checkpoint layout.

The latent codec for every SD-family model the reference uses (SD-x4
upscaler, Marigold, the multiview texture UNet). Module graph mirrors
diffusers' AutoencoderKL (encoder.conv_in / down_blocks.N.resnets.M /
mid_block / conv_norm_out / conv_out, quant_conv, post_quant_conv,
decoder...) so public checkpoints convert key-for-key
(models/conversion.py 'sd_vae')."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.ops.attention import flash_attention


@dataclasses.dataclass(frozen=True)
class SDVAEConfig:
    latent_channels: int = 4
    block_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "SDVAEConfig":
        return cls(block_channels=(8, 16), layers_per_block=1, norm_groups=4)


def _gn(groups, ch):
    return min(groups, ch) if ch % min(groups, ch) == 0 else 1


class VAEResnet(nn.Module):
    out_ch: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=_gn(self.groups, x.shape[-1]),
                         dtype=jnp.float32, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        h = nn.GroupNorm(num_groups=_gn(self.groups, self.out_ch),
                         dtype=jnp.float32, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """diffusers Attention block in the VAE mid_block (group_norm +
    to_q/to_k/to_v/to_out.0, single head)."""

    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(num_groups=_gn(self.groups, c), dtype=jnp.float32,
                         name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        o = flash_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = nn.Dense(c, dtype=self.dtype, name="to_out_0")(o)
        return res + o.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    cfg: SDVAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.block_channels[0], (3, 3), dtype=c.dtype,
                    name="conv_in")(x.astype(c.dtype))
        for i, ch in enumerate(c.block_channels):
            for j in range(c.layers_per_block):
                h = VAEResnet(ch, c.norm_groups, c.dtype,
                              name=f"down_{i}_resnet_{j}")(h)
            if i < len(c.block_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=c.dtype,
                            name=f"down_{i}_downsample")(h)
        ch = c.block_channels[-1]
        h = VAEResnet(ch, c.norm_groups, c.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(c.norm_groups, c.dtype, name="mid_attn")(h)
        h = VAEResnet(ch, c.norm_groups, c.dtype, name="mid_resnet_1")(h)
        h = nn.GroupNorm(num_groups=_gn(c.norm_groups, ch),
                         dtype=jnp.float32, name="conv_norm_out")(h)
        return nn.Conv(2 * c.latent_channels, (3, 3), dtype=jnp.float32,
                       name="conv_out")(nn.silu(h))


class VAEDecoder(nn.Module):
    cfg: SDVAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        ch = c.block_channels[-1]
        h = nn.Conv(ch, (3, 3), dtype=c.dtype, name="conv_in")(
            z.astype(c.dtype))
        h = VAEResnet(ch, c.norm_groups, c.dtype, name="mid_resnet_0")(h)
        h = VAEAttention(c.norm_groups, c.dtype, name="mid_attn")(h)
        h = VAEResnet(ch, c.norm_groups, c.dtype, name="mid_resnet_1")(h)
        # diffusers up_blocks index: 0 = deepest
        n = len(c.block_channels)
        for i, ch in reversed(list(enumerate(c.block_channels))):
            k = n - 1 - i
            for j in range(c.layers_per_block + 1):
                h = VAEResnet(ch, c.norm_groups, c.dtype,
                              name=f"up_{k}_resnet_{j}")(h)
            if i > 0:
                b_, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b_, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), dtype=c.dtype,
                            name=f"up_{k}_upsample")(h)
        h = nn.GroupNorm(num_groups=_gn(c.norm_groups, h.shape[-1]),
                         dtype=jnp.float32, name="conv_norm_out")(h)
        return nn.Conv(3, (3, 3), dtype=jnp.float32,
                       name="conv_out")(nn.silu(h))


class SDAutoencoderKL(nn.Module):
    cfg: SDVAEConfig

    def setup(self):
        self.encoder = VAEEncoder(self.cfg, name="encoder")
        self.decoder = VAEDecoder(self.cfg, name="decoder")
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=jnp.float32,
                                       name="post_quant_conv")

    def __call__(self, x, key=None):
        mean, logvar = self.encode(x)
        z = mean if key is None else mean + jnp.exp(0.5 * jnp.clip(
            logvar, -30, 20)) * jax.random.normal(key, mean.shape)
        return self.decode(z), mean, logvar

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, logvar

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
