"""Diffusion upscaler (the phase-1 non-banana path).

Reference flow (upscaler.py:13-116 + segmentation.py:1031-1059,1222-1252):
per finding crop — square pad → SD-x4-upscaler (50 DDIM steps, guidance
5.0) → 512² → white→alpha, fanned out one process per GPU.

Here: latent DDIM (models/unet.py) in an AutoencoderKL latent space
(models/vae.py) with low-res conditioning by channel concat, batched over
crops on the device instead of process-per-GPU. Without converted weights
a Lanczos upscale keeps the artifact contract flowing.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from regen3d_tpu.config import Config

log = logging.getLogger(__name__)


@dataclasses.dataclass
class Upscaler:
    """SD-x4-upscaler-family pipeline bundle."""

    unet: object = None
    unet_params: object = None
    vae: object = None
    vae_params: object = None

    @property
    def has_weights(self) -> bool:
        return self.unet_params is not None and self.vae_params is not None

    def upscale(self, image: np.ndarray, cfg: Config,
                key: Optional[jax.Array] = None) -> np.ndarray:
        """(H, W, 3) uint8 → (4H, 4W, 3) uint8."""
        if not self.has_weights:
            img = Image.fromarray(image)
            out = img.resize((img.width * 4, img.height * 4), Image.LANCZOS)
            return np.asarray(out)

        from regen3d_tpu.models.unet import ddim_sample

        key = key if key is not None else jax.random.PRNGKey(
            int(cfg.get("seed", 1234567)))
        h, w = image.shape[:2]
        lowres = jnp.asarray(image, jnp.float32)[None] / 127.5 - 1.0
        # the x4 upscaler denoises at the TARGET resolution, conditioned on
        # the (upsampled) low-res image concatenated channel-wise
        cond = jax.image.resize(lowres, (1, h * 4, w * 4, 3), "bilinear")
        z = ddim_sample(
            self.unet, self.unet_params, key,
            (1, h * 4 // 8, w * 4 // 8, 4),
            cond_img=jax.image.resize(cond, (1, h * 4 // 8, w * 4 // 8, 3),
                                      "bilinear"),
            num_steps=int(cfg.get("num_inference_steps", 50)),
            guidance_scale=float(cfg.get("guidance_scale", 5.0)))
        rgb = self.vae.apply(self.vae_params, z, method=type(self.vae).decode)
        out = np.asarray(jnp.clip((rgb[0] + 1.0) * 127.5, 0, 255)).astype(np.uint8)
        return out


@dataclasses.dataclass
class FluxUpscaler:
    """FLUX.1 ControlNet upscaler variant (reference: upscaler.py:26-39,
    ``model_name="FLUX"`` → FLUX.1-dev + jasperai Controlnet-Upscaler).

    TPU-native structure of the same recipe: a rectified-flow transformer
    over VAE image latents (patchified 2×2 tokens) with the control
    image's latent tokens supplied as the conditioning stream. FLUX is
    flow matching, so the ShapeDiT sampler IS the right integrator; the
    transformer slot accepts either the compact ShapeDiT or the faithful
    ``models/flux.py::FluxTransformer`` (diffusers FluxTransformer2DModel
    layout; conversion family ``flux`` maps the real checkpoint 1:1 —
    both share the (x, t, cond) call signature). The 12-B full config is
    served tp-sharded over the device mesh. Weightless runs fall back to
    Lanczos, keeping the Upscaler contract."""

    dit: object = None
    dit_params: object = None
    vae: object = None
    vae_params: object = None
    patch: int = 2

    @property
    def has_weights(self) -> bool:
        return self.dit_params is not None and self.vae_params is not None

    def upscale(self, image: np.ndarray, cfg: Config,
                key: Optional[jax.Array] = None) -> np.ndarray:
        if not self.has_weights:
            img = Image.fromarray(image)
            out = img.resize((img.width * 4, img.height * 4), Image.LANCZOS)
            return np.asarray(out)

        from regen3d_tpu.models.dit import sample as flow_sample

        key = key if key is not None else jax.random.PRNGKey(
            int(cfg.get("seed", 1234567)))
        h, w = image.shape[:2]
        vae_cls = type(self.vae)
        img = jnp.asarray(image, jnp.float32)[None] / 127.5 - 1.0
        ctrl = jax.image.resize(img, (1, h * 4, w * 4, 3), "bilinear")
        z_ctrl, _ = self.vae.apply(self.vae_params, ctrl,
                                   method=vae_cls.encode)
        p = self.patch
        b, lh, lw, c4 = z_ctrl.shape
        toks = z_ctrl.reshape(b, lh // p, p, lw // p, p, c4) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, p * p * c4)
        lat = flow_sample(
            self.dit, self.dit_params, key, toks,
            num_steps=int(cfg.get("num_inference_steps", 5)),
            guidance_scale=float(cfg.get("guidance_scale", 3.5)))
        z = lat.reshape(b, lh // p, lw // p, p, p, c4) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, lh, lw, c4)
        rgb = self.vae.apply(self.vae_params, z, method=vae_cls.decode)
        return np.asarray(jnp.clip((rgb[0] + 1.0) * 127.5, 0, 255)
                          ).astype(np.uint8)


def make_upscaler(cfg: Config):
    """Reference's Upscaler(model_name) switch (upscaler.py:13-41):
    ``upscaler_model_name: SD | FLUX`` (config.yaml:154)."""
    name = str(cfg.get("upscaler_model_name", "SD")).upper()
    if name == "FLUX":
        return FluxUpscaler()
    if name == "SD":
        return Upscaler()
    raise ValueError(
        f"upscaler_model_name must be 'SD' or 'FLUX', got {name}")


def square_pad(image: np.ndarray, fill: int = 255) -> np.ndarray:
    """Pad to square on a white canvas (upscaler.py's prep)."""
    h, w = image.shape[:2]
    side = max(h, w)
    canvas = np.full((side, side, image.shape[2]), fill, image.dtype)
    y0 = (side - h) // 2
    x0 = (side - w) // 2
    canvas[y0:y0 + h, x0:x0 + w] = image
    return canvas


def run(cfg: Config, upscaler: Optional[Upscaler] = None) -> int:
    """Upscale every cropped finding → findings/upscaled/cropped (the
    phase-3 input dir when the banana path is off, config.yaml:163)."""
    import os

    from regen3d_tpu.artifacts import Artifacts
    from regen3d_tpu.utils.image import load_image_rgb, save_image

    art = Artifacts(cfg)
    upscaler = upscaler or make_upscaler(cfg)
    out_dir = os.path.join(art.findings, "upscaled", "cropped")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for stem in art.list_findings(full_size=False):
        img = load_image_rgb(os.path.join(art.findings_cropped, f"{stem}.png"),
                             max_side=None)
        up = upscaler.upscale(square_pad(img), cfg)
        # → 512² with white background→alpha convention downstream
        up = np.asarray(Image.fromarray(up).resize((512, 512), Image.LANCZOS))
        save_image(os.path.join(out_dir, f"{stem}.png"), up)
        n += 1
    log.info("upscale: %d crops → %s (weights=%s)", n, out_dir,
             upscaler.has_weights)
    return n
