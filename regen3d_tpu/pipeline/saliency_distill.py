"""Saliency distillation: train the VST-role saliency net so the
`saliency` point strategy stops falling back to max_distance.

The reference's point generator can pick SAM prompt points from a VST
(Visual Saliency Transformer) map (segmentation.py point strategies); the
`saliency` conversion family is `diverged` (T2T redesign), so — like
matting and depth — the parity path is distillation. With zero egress the
teacher is a synthetic generative process: one high-contrast salient
object over a cluttered low-contrast background, ground truth = the
object's mask. The trained `SaliencyTransformer` must beat the CENTER
PRIOR (a centered gaussian — the classic no-learning saliency baseline)
on held-out scenes; objects are placed uniformly, so the prior genuinely
loses wherever the object is off-center.

Checkpoints ride the standard orbax path + a config.json sidecar, wired
via ``saliency_checkpoint`` into phase 1's `generate_points`.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regen3d_tpu.models.saliency import SaliencyConfig, SaliencyTransformer

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# synthetic salient-object scenes
# ---------------------------------------------------------------------------

def _field(rng, size, cells, lo=0.0, hi=1.0):
    coarse = rng.uniform(lo, hi, (cells, cells, 3)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(coarse), (size, size, 3),
                                       "bilinear"))


def _blob_mask(rng, size, cx, cy, scale):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    m = np.zeros((size, size), np.float32)
    for _ in range(rng.integers(1, 4)):
        ox, oy = rng.uniform(-0.06, 0.06, 2)
        sx, sy = rng.uniform(scale * 0.6, scale, 2)
        th = rng.uniform(0, np.pi)
        dx, dy = xx - (cx + ox), yy - (cy + oy)
        u = dx * np.cos(th) + dy * np.sin(th)
        v = -dx * np.sin(th) + dy * np.cos(th)
        m = np.maximum(m, np.exp(-(u / sx) ** 2 - (v / sy) ** 2))
    return np.clip((m - 0.35) / 0.1, 0.0, 1.0)


def synth_saliency_batch(rng: np.random.Generator, batch: int, size: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """(images (B,S,S,3) in [0,1], saliency GT (B,S,S) in {0..1}).

    Background: low-frequency color + low-contrast clutter blobs.
    Salient object: ONE high-contrast multi-lobe blob at a uniform-random
    position (so a center prior is beatable, not a strawman)."""
    imgs = np.zeros((batch, size, size, 3), np.float32)
    gts = np.zeros((batch, size, size), np.float32)
    for i in range(batch):
        # LOW-contrast background: a narrow band around a scene base color
        # (a wide 0.2–0.8 field would itself deviate from the global mean
        # as much as the "salient" object, destroying the signal)
        bg = _field(rng, size, rng.integers(2, 5), 0.38, 0.62)
        # clutter: small blobs hugging the background palette
        for _ in range(rng.integers(2, 6)):
            cm = _blob_mask(rng, size, rng.uniform(0.1, 0.9),
                            rng.uniform(0.1, 0.9), 0.06)
            cc = np.clip(bg.mean((0, 1)) + rng.normal(0, 0.05, 3), 0, 1)
            bg = bg * (1 - cm[..., None]) + cc * cm[..., None]
        # the salient object: the FARTHEST RGB-cube corner from the
        # background mean (≥0.38 per-channel distance by construction —
        # the naive complement 1−base collapses onto base when base≈0.5)
        cx, cy = rng.uniform(0.15, 0.85, 2)
        om = _blob_mask(rng, size, cx, cy, rng.uniform(0.10, 0.22))
        base = bg.mean((0, 1))
        oc = np.clip(np.where(base < 0.5, 1.0, 0.0)
                     + rng.normal(0, 0.05, 3), 0, 1)
        tex = 0.85 + 0.3 * _field(rng, size, 4)[..., :3]
        img = bg * (1 - om[..., None]) + (oc * tex + (1 - tex) * 0.5) \
            * om[..., None]
        img = np.clip(img + rng.normal(0, 0.015, img.shape), 0, 1)
        imgs[i] = img
        gts[i] = (om > 0.5).astype(np.float32)
    return imgs, gts


def center_prior(size: int) -> np.ndarray:
    """The classic no-learning saliency baseline: centered gaussian."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    return np.exp(-(((xx - 0.5) / 0.28) ** 2 + ((yy - 0.5) / 0.28) ** 2))


def mae(pred: np.ndarray, gt: np.ndarray) -> float:
    """Mean absolute error — the standard saliency benchmark metric."""
    p = (pred - pred.min()) / max(pred.max() - pred.min(), 1e-9)
    return float(np.abs(p - gt).mean())


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def small_config(size: int = 96) -> SaliencyConfig:
    """CPU-trainable dims of the same T2T arch."""
    return SaliencyConfig(image_size=size, width=96, depth=3, num_heads=4)


def distill_saliency(
    cfg: Optional[SaliencyConfig] = None,
    steps: int = 300,
    batch: int = 8,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 50,
):
    """Train SaliencyTransformer on synthetic scenes → (params, model)."""
    cfg = cfg or small_config()
    model = SaliencyTransformer(cfg)
    rng = np.random.default_rng(seed)
    s = cfg.image_size
    imgs0, _ = synth_saliency_batch(rng, 1, s)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(imgs0))
    opt = optax.adamw(optax.cosine_decay_schedule(lr, steps), b1=0.9,
                      b2=0.95, weight_decay=1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, gts):
        def loss_fn(p):
            pred = model.apply(p, imgs).astype(jnp.float32)
            pred = jnp.clip(pred, 1e-6, 1 - 1e-6)
            # class-BALANCED BCE: salient pixels are a small minority
            # (0.5–20% of the frame); unweighted BCE collapses to the
            # all-background solution (logits → −40), which still "beats"
            # a center prior after normalization but is useless for
            # point picking
            pos = jnp.clip(gts.mean(), 1e-3, 0.5)
            w = gts / pos + (1 - gts) / (1 - pos)
            bce = -(w * (gts * jnp.log(pred)
                         + (1 - gts) * jnp.log(1 - pred))).mean() / 2
            # soft-Dice: scale-invariant overlap term, immune to imbalance
            inter = (pred * gts).sum((1, 2))
            dice = 1 - (2 * inter + 1) / (pred.sum((1, 2))
                                          + gts.sum((1, 2)) + 1)
            return bce + dice.mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        imgs, gts = synth_saliency_batch(rng, batch, s)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(imgs),
                                       jnp.asarray(gts))
        if log_every and (i % log_every == 0 or i == steps - 1):
            log.info("saliency distill step %d/%d loss %.4f", i, steps,
                     float(loss))
    return params, model


# ---------------------------------------------------------------------------
# checkpoint + inference wrapper (the phase-1 consumer)
# ---------------------------------------------------------------------------

def save_saliency_checkpoint(path: str, params, cfg: SaliencyConfig) -> None:
    from regen3d_tpu.models.weights import save_checkpoint
    save_checkpoint(path, jax.tree.map(np.asarray, params))
    d = dataclasses.asdict(cfg)
    d.pop("dtype", None)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(d, f)


class SaliencyModel:
    """Loaded saliency net; maps any-size uint8/float RGB → (H, W) map."""

    def __init__(self, params, cfg: SaliencyConfig):
        self.model = SaliencyTransformer(cfg)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def load(cls, path: str) -> "SaliencyModel":
        from regen3d_tpu.models.weights import load_checkpoint
        cfg_path = os.path.join(path, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                cfg = SaliencyConfig(**json.load(f))
        else:
            cfg = SaliencyConfig()
        return cls(load_checkpoint(path), cfg)

    def saliency(self, image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        arr = np.asarray(image, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        s = self.model.cfg.image_size
        small = jax.image.resize(jnp.asarray(arr), (s, s, 3), "bilinear")
        m = self._apply(self.params, small[None])[0]
        return np.asarray(jax.image.resize(m, (h, w), "bilinear"), np.float32)
