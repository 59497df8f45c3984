"""Monocular depth for the phase-1 `depth.png` artifact.

The reference's ``depth_from_image`` (global_utils.py:357-418) runs Marigold
(depth_large_model: true) or Depth-Anything-V2 and writes
output/findings/depth.png. Both families are served here:

  * Marigold role → the latent-diffusion ``UNet`` family (models/unet.py)
    run as a denoising depth estimator (weights pending conversion);
  * Depth-Anything role → a DPT-style feed-forward head (models/vggt.py's
    DPTHead over a ViT trunk) — the same architecture class.

Without checkpoints, a luminance+vertical-gradient prior keeps the artifact
produced so downstream consumers stay testable.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Optional

import numpy as np

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.config import Config
from regen3d_tpu.utils.image import load_image_rgb, save_image

log = logging.getLogger(__name__)


@functools.lru_cache(maxsize=4)
def _jitted_apply(model):
    """One jitted forward per module instance — a fresh jit per image
    would recompile the depth net every call."""
    import jax
    return jax.jit(model.apply)


def estimate_depth(image: np.ndarray, model=None, params=None) -> np.ndarray:
    """(H, W, 3) uint8 → (H, W) float relative depth in [0, 1].

    Accepts either the DepthAnything model (models/depth_anything.py —
    (B, H, W, 3) → (B, H, W)) or a VGGT-style model returning a
    {"depth": (B, F, H, W)} dict."""
    if model is not None and params is not None:
        import jax
        import jax.numpy as jnp

        from regen3d_tpu.models.depth_anything import DepthAnything
        size = getattr(getattr(model, "cfg", None), "image_size", 518)
        img = jax.image.resize(jnp.asarray(image, jnp.float32) / 255.0,
                               (size, size, 3), "bilinear")
        if isinstance(model, DepthAnything):
            d = np.asarray(_jitted_apply(model)(params, img[None])[0])
        else:
            out = model.apply(params, img[None, None])
            d = np.asarray(out["depth"][0, 0])
        d = (d - d.min()) / max(d.max() - d.min(), 1e-9)
        import jax.image as jimage
        return np.asarray(jimage.resize(jnp.asarray(d), image.shape[:2],
                                        "bilinear"))
    # offline prior: indoor scenes are roughly depth-increasing with image
    # height (floor→wall) modulated by inverse luminance contrast
    h, w = image.shape[:2]
    rows = np.linspace(1.0, 0.2, h)[:, None]
    lum = image.mean(-1) / 255.0
    d = 0.8 * rows + 0.2 * (1.0 - np.abs(lum - np.median(lum)))
    return ((d - d.min()) / max(d.max() - d.min(), 1e-9)).astype(np.float32)


def run(cfg: Config, model=None, params=None) -> Optional[str]:
    art = Artifacts(cfg)
    ckpt = str(cfg.get("depth_anything_checkpoint", "") or "")
    if model is None and ckpt and os.path.exists(ckpt):
        # honors the config.json sidecar written by depth_distill (and
        # defaults to the ViT-S dims a converted checkpoint uses)
        from regen3d_tpu.pipeline.depth_distill import load_depth_checkpoint
        params, model = load_depth_checkpoint(ckpt)
        log.info("depth: Depth-Anything checkpoint %s", ckpt)
    img = load_image_rgb(cfg.path("input_image"), max_side=1280)
    depth = estimate_depth(img, model, params)
    out = art.depth_scene
    save_image(out, (depth * 255).astype(np.uint8))
    log.info("depth: wrote %s", out)
    return out
