"""RealESRGAN ×4 texture upscaler (RRDBNet) — the Hunyuan3D-2.1 variant's
texture post-process (reference: run_hunyuan21.py:112
``conf.realesrgan_ckpt_path = "hy3dpaint/ckpt/RealESRGAN_x4plus.pth"``).

TPU-native flax transcription of the public RRDBNet topology
(BasicSR rrdbnet_arch: conv_first → num_block×RRDB → conv_body residual →
2× nearest-neighbor upsample convs → conv_hr → conv_last, LeakyReLU 0.2,
residual scaling 0.2). NHWC layout, jitted whole-image inference with
shard-friendly spatial tiling for large textures.

Weight conversion: models/conversion.py family "esrgan" maps the
RealESRGAN_x4plus.pth ``params_ema`` key schema onto this module.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ESRGANConfig:
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4                 # fixed ×4 (two ×2 stages)

    @classmethod
    def x4plus(cls) -> "ESRGANConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ESRGANConfig":
        return cls(num_feat=16, num_block=2, num_grow_ch=8)


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


class ResidualDenseBlock(nn.Module):
    feat: int
    grow: int

    @nn.compact
    def __call__(self, x):
        g = self.grow
        conv = functools.partial(nn.Conv, kernel_size=(3, 3), padding="SAME")
        x1 = _lrelu(conv(g, name="conv1")(x))
        x2 = _lrelu(conv(g, name="conv2")(jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(conv(g, name="conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(conv(g, name="conv4")(
            jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.feat, name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x + 0.2 * x5


class RRDB(nn.Module):
    feat: int
    grow: int

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.feat, self.grow, name="rdb1")(x)
        out = ResidualDenseBlock(self.feat, self.grow, name="rdb2")(out)
        out = ResidualDenseBlock(self.feat, self.grow, name="rdb3")(out)
        return x + 0.2 * out


class RRDBNet(nn.Module):
    cfg: ESRGANConfig

    @nn.compact
    def __call__(self, x):
        """(B, H, W, 3) in [0, 1] → (B, 4H, 4W, 3)."""
        c = self.cfg
        conv = functools.partial(nn.Conv, kernel_size=(3, 3), padding="SAME")
        feat = conv(c.num_feat, name="conv_first")(x)
        body = feat
        for i in range(c.num_block):
            body = RRDB(c.num_feat, c.num_grow_ch, name=f"body_{i}")(body)
        feat = feat + conv(c.num_feat, name="conv_body")(body)
        for name in ("conv_up1", "conv_up2"):
            b, h, w, ch = feat.shape
            feat = jax.image.resize(feat, (b, h * 2, w * 2, ch), "nearest")
            feat = _lrelu(conv(c.num_feat, name=name)(feat))
        feat = _lrelu(conv(c.num_feat, name="conv_hr")(feat))
        return conv(3, name="conv_last")(feat)


@functools.lru_cache(maxsize=4)
def _jitted_rrdb_apply(cfg: ESRGANConfig):
    """One jitted forward per config — a fresh jit per upscale call would
    recompile this 23-block net for every texture."""
    model = RRDBNet(cfg)
    return jax.jit(lambda p, x: model.apply(p, x))


def upscale_x4(params, cfg: ESRGANConfig, img: np.ndarray,
               tile: Optional[int] = 256, overlap: int = 16) -> np.ndarray:
    """×4 upscale an (H, W, 3) [0,1] image; spatial tiling bounds peak
    memory on big textures (each tile is one jitted call, overlap-blended
    by simple crop — the interior of each tile is exact)."""
    fwd = _jitted_rrdb_apply(cfg)
    h, w = img.shape[:2]
    if tile is None or (h <= tile and w <= tile):
        out = fwd(params, jnp.asarray(img)[None])[0]
        return np.clip(np.asarray(out), 0.0, 1.0)
    s = cfg.scale
    out = np.zeros((h * s, w * s, 3), np.float32)
    step = tile - 2 * overlap
    for y0 in range(0, h, step):
        for x0 in range(0, w, step):
            ya, xa = max(y0 - overlap, 0), max(x0 - overlap, 0)
            yb = min(y0 + step + overlap, h)
            xb = min(x0 + step + overlap, w)
            patch = fwd(params, jnp.asarray(img[ya:yb, xa:xb])[None])[0]
            patch = np.asarray(patch)
            cy0, cx0 = (y0 - ya) * s, (x0 - xa) * s
            cy1 = cy0 + (min(y0 + step, h) - y0) * s
            cx1 = cx0 + (min(x0 + step, w) - x0) * s
            out[y0 * s:y0 * s + (cy1 - cy0),
                x0 * s:x0 * s + (cx1 - cx0)] = patch[cy0:cy1, cx0:cx1]
    return np.clip(out, 0.0, 1.0)
