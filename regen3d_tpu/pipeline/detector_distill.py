"""Detector distillation: train the OWL-style open-vocab detector so
phase 1 stops falling back to color clustering.

The reference grounds detection in ``grounding-dino-base``
(/root/reference/src/segmentation/segmentation.py:587-613); that family is
registered `diverged` (deformable attention is a poor TPU fit — the
redesign is OWL-ViT-style, models/detector.py). Like matting/depth/
saliency, the zero-egress parity path is distillation against a synthetic
teacher. Text grounding needs language-appearance pairs, so the teacher is
an ATTRIBUTE GRAMMAR: scenes of colored geometric objects whose labels are
compositional phrases ("red box", "cyan disk", "green tri") — the detector
must learn BOTH class-agnostic localization (objectness + boxes, the part
that transfers to any vocabulary) and text-conditioned scoring through the
byte-level text tower (the open-vocab mechanism itself, demonstrated
end-to-end). The trained net must beat the k-means clustering fallback on
held-out box recall@IoU0.5, and rank the queried phrase's object above
distractors.

Checkpoints ride the standard orbax path + config.json sidecar, wired via
``detector_checkpoint`` into phase 1's `detect_and_segment`; with real
(input, teacher-box) pairs recorded from grounding-dino the same trainer
refreshes against the true teacher.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regen3d_tpu.models.detector import (
    DetectorConfig,
    OpenVocabDetector,
    tokenize_bytes,
)

log = logging.getLogger(__name__)

COLORS = {
    "red": (0.82, 0.13, 0.13),
    "green": (0.15, 0.65, 0.2),
    "blue": (0.15, 0.25, 0.75),
    "yellow": (0.85, 0.8, 0.15),
    "magenta": (0.75, 0.15, 0.7),
    "cyan": (0.15, 0.7, 0.75),
}
SHAPES = ("box", "disk", "tri")
VOCAB: List[str] = [f"{c} {s}" for c in COLORS for s in SHAPES]
MAX_OBJECTS = 4


# ---------------------------------------------------------------------------
# synthetic grounded-detection scenes
# ---------------------------------------------------------------------------

def _draw_shape(img, shape: str, cx, cy, w, h, color, rng):
    size = img.shape[0]
    x0, x1 = int((cx - w / 2) * size), int((cx + w / 2) * size)
    y0, y1 = int((cy - h / 2) * size), int((cy + h / 2) * size)
    x0, y0 = max(x0, 0), max(y0, 0)
    x1, y1 = min(x1, size), min(y1, size)
    if x1 <= x0 + 1 or y1 <= y0 + 1:
        return None
    yy, xx = np.mgrid[y0:y1, x0:x1]
    u = (xx - x0) / max(x1 - 1 - x0, 1)
    v = (yy - y0) / max(y1 - 1 - y0, 1)
    if shape == "box":
        m = np.ones_like(u, bool)
    elif shape == "disk":
        m = ((u - 0.5) ** 2 + (v - 0.5) ** 2) <= 0.25
    else:  # tri: isoceles, apex up
        m = np.abs(u - 0.5) <= v / 2
    col = np.clip(np.asarray(color) + rng.normal(0, 0.03, 3), 0, 1)
    shade = 0.85 + 0.3 * v[..., None]            # cheap vertical shading
    img[y0:y1, x0:x1][m] = (col * shade)[m]
    # tight box from the drawn mask (tri/disk are narrower than the rect)
    ys, xs = np.nonzero(m)
    bx0, bx1 = (x0 + xs.min()) / size, (x0 + xs.max() + 1) / size
    by0, by1 = (y0 + ys.min()) / size, (y0 + ys.max() + 1) / size
    return ((bx0 + bx1) / 2, (by0 + by1) / 2, bx1 - bx0, by1 - by0)


def synth_detection_batch(rng: np.random.Generator, batch: int, size: int
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                     np.ndarray]:
    """(imgs (B,S,S,3) in [0,1], boxes (B,M,4) cxcywh, labels (B,M) int32
    into VOCAB, valid (B,M) bool). Room-like neutral background; 1..M
    saturated attribute-grammar objects with ≤0.15-IoU pairwise overlap."""
    imgs = np.zeros((batch, size, size, 3), np.float32)
    boxes = np.zeros((batch, MAX_OBJECTS, 4), np.float32)
    labels = np.zeros((batch, MAX_OBJECTS), np.int32)
    valid = np.zeros((batch, MAX_OBJECTS), bool)
    names = list(COLORS)
    for b in range(batch):
        wall = 0.55 + rng.uniform(-0.12, 0.12, 3)
        floor = wall * rng.uniform(0.55, 0.8)
        horizon = rng.uniform(0.5, 0.75)
        img = np.empty((size, size, 3), np.float32)
        img[:] = wall
        img[int(horizon * size):] = floor
        img += rng.normal(0, 0.015, img.shape)
        n = int(rng.integers(1, MAX_OBJECTS + 1))
        placed: List[Tuple[float, float, float, float]] = []
        k = 0
        for _ in range(12):                     # rejection sampling
            if k >= n:
                break
            w, h = rng.uniform(0.14, 0.38, 2)
            cx = rng.uniform(w / 2 + 0.02, 1 - w / 2 - 0.02)
            cy = rng.uniform(h / 2 + 0.02, 1 - h / 2 - 0.02)
            if any(_iou_cxcywh((cx, cy, w, h), p) > 0.15 for p in placed):
                continue
            ci = int(rng.integers(len(names)))
            si = int(rng.integers(len(SHAPES)))
            tight = _draw_shape(img, SHAPES[si], cx, cy, w, h,
                                COLORS[names[ci]], rng)
            if tight is None:
                continue
            placed.append((cx, cy, w, h))
            boxes[b, k] = tight
            labels[b, k] = ci * len(SHAPES) + si
            valid[b, k] = True
            k += 1
        imgs[b] = np.clip(img, 0, 1)
    return imgs, boxes, labels, valid


def _iou_cxcywh(a, b) -> float:
    ax0, ay0 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax1, ay1 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx0, by0 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx1, by1 = b[0] + b[2] / 2, b[1] + b[3] / 2
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / max(union, 1e-9)


# ---------------------------------------------------------------------------
# training (anchor-free center-assignment, FCOS-style)
# ---------------------------------------------------------------------------

def distill_config(size: int = 128) -> DetectorConfig:
    """CPU-trainable dims of the same OWL-style arch (f32: bf16 is emulated
    and slow on the CPU used for distillation)."""
    return DetectorConfig(image_size=size, patch=16, width=96, depth=4,
                          num_heads=4, text_width=48, text_depth=2,
                          text_len=16, embed_dim=48, dtype=jnp.float32)


def _assign(gh: int, gw: int, boxes, labels, valid, shrink: float = 0.7):
    """Per-patch GT assignment: a patch is positive when its centre lies in
    the shrunk box of a valid GT; ties go to the smallest box (FCOS rule).
    Every valid GT is additionally guaranteed its nearest patch — with a
    coarse 16-px grid, small boxes (w≈0.14, shrunk 0.7) often contain no
    patch centre at all and would otherwise be unlearnable.
    Returns (assigned (B,P) bool, gt_box (B,P,4), gt_label (B,P))."""
    ys = (jnp.arange(gh) + 0.5) / gh
    xs = (jnp.arange(gw) + 0.5) / gw
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
    d = jnp.abs(grid[None, :, None, :] - boxes[:, None, :, :2])   # (B,P,M,2)
    inside = jnp.all(d <= shrink * boxes[:, None, :, 2:] / 2, -1)
    dist2 = (d ** 2).sum(-1)                                      # (B,P,M)
    nearest = dist2 == dist2.min(axis=1, keepdims=True)
    inside = (inside | nearest) & valid[:, None, :]
    area = boxes[..., 2] * boxes[..., 3]
    cost = jnp.where(inside, area[:, None, :], jnp.inf)
    best = jnp.argmin(cost, axis=-1)                              # (B,P)
    assigned = jnp.isfinite(jnp.min(cost, axis=-1))
    gt_box = jnp.take_along_axis(boxes, jnp.repeat(best[:, :, None], 4, -1),
                                 axis=1)
    gt_label = jnp.take_along_axis(labels, best, axis=1)
    return assigned, gt_box, gt_label


def detection_loss(model, params, imgs, tokens, boxes, labels, valid):
    sim, obj, pred = model.apply(params, imgs, tokens, return_logits=True)
    bsz, p, nl = sim.shape
    gh = gw = int(np.sqrt(p))
    assigned, gt_box, gt_label = _assign(gh, gw, boxes, labels, valid)
    af = assigned.astype(jnp.float32)
    pos = jnp.maximum(af.sum(), 1.0)

    # objectness: balanced sigmoid BCE
    ob = obj[..., 0]
    obj_nll = optax.sigmoid_binary_cross_entropy(ob, af)
    w_pos = (af.size / pos) * 0.5
    obj_loss = (obj_nll * jnp.where(assigned, w_pos, 1.0)).mean()

    # boxes: L1 on cxcywh at positives
    box_loss = (jnp.abs(pred - gt_box).sum(-1) * af).sum() / pos

    # text grounding: one-hot BCE over the vocabulary at positives,
    # all-zero rows at negatives (the sim head must also learn silence)
    tgt = jax.nn.one_hot(gt_label, nl) * af[..., None]
    cls_nll = optax.sigmoid_binary_cross_entropy(sim, tgt)
    cls_loss = (cls_nll * jnp.where(tgt > 0, float(nl), 1.0)).mean()

    return obj_loss + 2.0 * box_loss + cls_loss, {
        "obj": obj_loss, "box": box_loss, "cls": cls_loss}


def distill_detector(
    cfg: Optional[DetectorConfig] = None,
    steps: int = 600,
    batch: int = 8,
    lr: float = 2e-3,
    seed: int = 0,
    log_every: int = 50,
):
    """Train OpenVocabDetector on attribute-grammar scenes → (params, model)."""
    cfg = cfg or distill_config()
    model = OpenVocabDetector(cfg)
    rng = np.random.default_rng(seed)
    s = cfg.image_size
    tokens = jnp.asarray(tokenize_bytes(VOCAB, cfg.text_len))
    imgs0, *_ = synth_detection_batch(rng, 1, s)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(imgs0), tokens)
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, min(30, steps // 4),
                                               steps)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=1e-4))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, boxes, labels, valid):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: detection_loss(model, p, imgs, tokens, boxes, labels,
                                     valid), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    for i in range(steps):
        imgs, boxes, labels, valid = synth_detection_batch(rng, batch, s)
        params, opt_state, loss, aux = step(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(boxes),
            jnp.asarray(labels), jnp.asarray(valid))
        if log_every and (i % log_every == 0 or i == steps - 1):
            log.info("detector distill step %d/%d loss %.4f "
                     "(obj %.3f box %.3f cls %.3f)", i, steps, float(loss),
                     float(aux["obj"]), float(aux["box"]),
                     float(aux["cls"]))
    return params, model


# ---------------------------------------------------------------------------
# evaluation vs the clustering fallback
# ---------------------------------------------------------------------------

def box_recall(dets, gt_boxes_xyxy: np.ndarray, iou_thr: float = 0.5
               ) -> float:
    """Fraction of GT boxes matched (IoU ≥ thr) by ANY detection —
    class-agnostic localization quality, the clustering-fallback metric."""
    if not len(gt_boxes_xyxy):
        return 1.0
    hit = 0
    for g in gt_boxes_xyxy:
        for d in dets:
            bb = d.box
            ix0, iy0 = max(bb.xmin, g[0]), max(bb.ymin, g[1])
            ix1, iy1 = min(bb.xmax, g[2]), min(bb.ymax, g[3])
            inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
            ga = (g[2] - g[0]) * (g[3] - g[1])
            da = (bb.xmax - bb.xmin) * (bb.ymax - bb.ymin)
            if inter / max(ga + da - inter, 1e-9) >= iou_thr:
                hit += 1
                break
    return hit / len(gt_boxes_xyxy)


# ---------------------------------------------------------------------------
# checkpoint + phase-1 consumer
# ---------------------------------------------------------------------------

def save_detector_checkpoint(path: str, params, cfg: DetectorConfig) -> None:
    from regen3d_tpu.models.weights import save_checkpoint
    save_checkpoint(path, jax.tree.map(np.asarray, params))
    d = dataclasses.asdict(cfg)
    d.pop("dtype", None)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(d, f)


def load_detector_checkpoint(path: str):
    """→ (params, OpenVocabDetector); honors the config.json sidecar."""
    from regen3d_tpu.models.weights import load_checkpoint
    cfg_path = os.path.join(path, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            cfg = DetectorConfig(**json.load(f), dtype=jnp.float32)
    else:
        cfg = DetectorConfig()
    return load_checkpoint(path), OpenVocabDetector(cfg)
