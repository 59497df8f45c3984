"""Matting distillation: train MattingUNet so phase-2 prep stops being a
white threshold.

The reference's `prepare_for_hunyuan` removes backgrounds with rembg's
U²-Net (inpaint_nanoBanana.py:157-189) — a *learned* matte that keeps
near-white object parts and drops soft shadows, two things the fallback
threshold (`arr >= 246`) gets exactly wrong. The rembg conversion family
is `diverged` (nested RSU blocks don't map onto MattingUNet), so the
declared parity path is distillation. With zero egress there is no
teacher to query; this module trains on SYNTHETIC alpha compositing whose
generative process mirrors the phase-2 input distribution (an object with
soft edges over a near-white background, plus a contact shadow that must
NOT be matted). When rembg teacher mattes become recordable, the same
trainer consumes (image, teacher-alpha) pairs unchanged — the synthetic
generator is just the zero-checkpoint stand-in for the teacher.

Checkpoints ride the standard orbax path (`models/weights.py`), wired via
the ``matting_checkpoint`` config key into `prepare_for_3d`.
"""

from __future__ import annotations

import logging
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regen3d_tpu.models.unet import MattingUNet

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# synthetic alpha-compositing data (the zero-egress teacher stand-in)
# ---------------------------------------------------------------------------

def _smooth_field(rng: np.random.Generator, size: int, cells: int = 4,
                  lo: float = 0.0, hi: float = 1.0) -> np.ndarray:
    """Low-frequency random field in [lo, hi] via bilinear-upsampled noise."""
    coarse = rng.uniform(lo, hi, (cells, cells)).astype(np.float32)
    idx = np.linspace(0, cells - 1, size)
    x0 = np.clip(idx.astype(np.int32), 0, cells - 2)
    fx = idx - x0
    row = coarse[x0][:, x0] * (1 - fx)[None, :] + coarse[x0][:, x0 + 1] * fx[None, :]
    row2 = coarse[x0 + 1][:, x0] * (1 - fx)[None, :] + coarse[x0 + 1][:, x0 + 1] * fx[None, :]
    return row * (1 - fx)[:, None] + row2 * fx[:, None]


def _soft_blob(rng: np.random.Generator, size: int, n_lobes: int,
               scale: Tuple[float, float]) -> np.ndarray:
    """Union of gaussian lobes → soft [0,1] mask with a crisp-ish core."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    m = np.zeros((size, size), np.float32)
    for _ in range(n_lobes):
        cx, cy = rng.uniform(0.25, 0.75, 2)
        sx = rng.uniform(*scale)
        sy = rng.uniform(*scale)
        th = rng.uniform(0, np.pi)
        dx, dy = xx - cx, yy - cy
        u = dx * np.cos(th) + dy * np.sin(th)
        v = -dx * np.sin(th) + dy * np.cos(th)
        m = np.maximum(m, np.exp(-(u / sx) ** 2 - (v / sy) ** 2))
    return m


def synth_matting_batch(rng: np.random.Generator, batch: int, size: int
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """(images (B,S,S,3) float in [0,1], alphas (B,S,S,1) float in [0,1]).

    Generative process per sample (mirrors a phase-2 finding):
      * near-white background with a gentle gradient + noise;
      * an object = union of soft lobes, sharpened to an alpha with a thin
        soft edge; textured by a low-frequency color field that MAY be
        near-white in places (threshold matting drops those);
      * a contact shadow: darkened background under/beside the object,
        excluded from the alpha (threshold matting keeps it)."""
    imgs = np.zeros((batch, size, size, 3), np.float32)
    alphas = np.zeros((batch, size, size, 1), np.float32)
    for i in range(batch):
        # background: white-ish with a gentle gradient + noise (mostly
        # ABOVE the 246/255 threshold so the fallback isn't a strawman —
        # its failures here are the real ones: shadows and white objects)
        bg_level = rng.uniform(0.97, 1.0)
        bg = bg_level - 0.02 * _smooth_field(rng, size, 3)
        bg = np.repeat(bg[..., None], 3, -1)
        bg += rng.normal(0, 0.006, bg.shape)
        # object alpha: soft lobes → sharpen, keep a soft edge
        blob = _soft_blob(rng, size, rng.integers(1, 4), (0.08, 0.28))
        alpha = np.clip((blob - 0.35) / 0.08, 0.0, 1.0)
        # object texture: low-freq color, sometimes near-white patches
        fg = np.stack([_smooth_field(rng, size, 4, 0.05, 1.0)
                       for _ in range(3)], -1)
        if rng.random() < 0.7:       # near-white object region
            white_patch = _soft_blob(rng, size, 1, (0.05, 0.15))[..., None]
            fg = fg * (1 - white_patch) + rng.uniform(0.96, 1.0) * white_patch
        # contact shadow: offset darkening of the background, NOT in alpha
        if rng.random() < 0.8:
            sh = np.roll(blob, (rng.integers(2, size // 6),
                                rng.integers(-size // 8, size // 8)),
                         (0, 1))
            shade = 1.0 - rng.uniform(0.1, 0.35) * np.clip(sh, 0, 1)
            bg = bg * shade[..., None]
        a = alpha[..., None]
        imgs[i] = np.clip(bg * (1 - a) + fg * a, 0.0, 1.0)
        alphas[i] = a
    return imgs, alphas


def threshold_alpha(img: np.ndarray, thresh: float = 246 / 255.0
                    ) -> np.ndarray:
    """The phase-2 fallback matte: non-white-ish pixels are foreground
    (prepare_for_3d's `arr >= 246` rule) — the baseline to beat."""
    return (~np.all(img >= thresh, axis=-1)).astype(np.float32)[..., None]


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def distill_matting(
    steps: int = 600,
    batch: int = 16,
    size: int = 128,
    base: int = 32,
    lr: float = 2e-3,
    seed: int = 0,
    log_every: int = 100,
) -> Tuple[dict, MattingUNet]:
    """Train MattingUNet on synthetic compositing; returns (params, model).

    BCE + L1 on the alpha; adamw with cosine decay. Each step is one jitted
    program; data is synthesized host-side per batch (cheap numpy)."""
    model = MattingUNet(base=base)
    rng = np.random.default_rng(seed)
    imgs0, _ = synth_matting_batch(rng, 1, size)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(imgs0))
    opt = optax.adamw(optax.cosine_decay_schedule(lr, steps), b1=0.9,
                      b2=0.95, weight_decay=1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, alphas):
        def loss_fn(p):
            pred = model.apply(p, imgs)
            pred = jnp.clip(pred.astype(jnp.float32), 1e-6, 1 - 1e-6)
            bce = -(alphas * jnp.log(pred)
                    + (1 - alphas) * jnp.log(1 - pred)).mean()
            l1 = jnp.abs(pred - alphas).mean()
            return bce + l1
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        imgs, alphas = synth_matting_batch(rng, batch, size)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(imgs),
                                       jnp.asarray(alphas))
        if log_every and (i % log_every == 0 or i == steps - 1):
            log.info("matting distill step %d/%d loss %.4f", i, steps,
                     float(loss))
    return params, model


# ---------------------------------------------------------------------------
# inference wrapper (the phase-2 consumer)
# ---------------------------------------------------------------------------

class MattingModel:
    """Loaded matting net + jitted inference at a fixed eval resolution."""

    def __init__(self, params, base: int = 32, eval_size: int = 256):
        self.model = MattingUNet(base=base)
        self.params = params
        self.eval_size = eval_size
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def load(cls, path: str, base: int = 32, eval_size: int = 256
             ) -> "MattingModel":
        from regen3d_tpu.models.weights import load_checkpoint
        return cls(load_checkpoint(path), base=base, eval_size=eval_size)

    def save(self, path: str) -> None:
        from regen3d_tpu.models.weights import save_checkpoint
        save_checkpoint(path, jax.tree.map(np.asarray, self.params))

    def alpha(self, img: np.ndarray) -> np.ndarray:
        """uint8/float (H, W, 3) → float32 alpha (H, W) in [0, 1], at the
        input resolution (net runs at eval_size², bilinear both ways)."""
        from PIL import Image
        h, w = img.shape[:2]
        arr = np.asarray(img)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        s = self.eval_size
        small = np.asarray(Image.fromarray(
            (arr * 255).astype(np.uint8)).resize((s, s), Image.BILINEAR),
            np.float32) / 255.0
        a = np.asarray(self._apply(self.params, jnp.asarray(small[None])),
                       np.float32)[0, ..., 0]
        return np.asarray(Image.fromarray(
            (np.clip(a, 0, 1) * 255).astype(np.uint8)).resize(
                (w, h), Image.BILINEAR), np.float32) / 255.0


def iou(pred: np.ndarray, gt: np.ndarray, thr: float = 0.5) -> float:
    p, g = pred > thr, gt > thr
    inter = np.logical_and(p, g).sum()
    union = np.logical_or(p, g).sum()
    return float(inter) / max(float(union), 1.0)
