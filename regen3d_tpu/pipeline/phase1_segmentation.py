"""Phase 1: open-vocabulary instance segmentation + finding export.

Reference flow (segmentation.py:1062-1253): normalize the input image
(webp/jpg → PNG, alpha over white, ≤1280 px) → Grounding-DINO zero-shot
detection from the config `labels` (threshold 0.25) → greedy IoU NMS →
SAM ViT-H masks prompted by boxes (optionally + generated points) → optional
interactive editing → per-object white-background finding PNGs (fullSize +
padded crops, named `<label>__(cx, cy).png`) → red-outline / bbox 'banana'
prompt images + AQ layout canvases.

Here detection + mask generation run as jitted JAX models
(models/sam.py + models/detector.py). When no checkpoint is supplied
(zero-egress environments), a weightless color/position clustering proposer
keeps the phase end-to-end runnable so downstream contracts stay testable.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

import numpy as np

from regen3d_tpu.artifacts import Artifacts, finding_stem
from regen3d_tpu.config import Config
from regen3d_tpu.pipeline.detection import (
    BoundingBox,
    DetectionResult,
    generate_points,
    nms,
)
from regen3d_tpu.utils.image import (
    draw_bbox,
    draw_outline,
    load_image_rgb,
    mask_bbox,
    masked_on_white,
    padded_crop,
    save_image,
    segmentation_layout,
)

log = logging.getLogger(__name__)


def cluster_proposals(image: np.ndarray, num_regions: int = 6,
                      min_area_frac: float = 0.005,
                      seed: int = 0) -> List[DetectionResult]:
    """Weightless fallback proposer: k-means over (color, position) features,
    connected regions become detections labeled 'object'. Exists so the
    pipeline runs end to end without model checkpoints; swapped out by the
    detector+SAM path whenever weights are provided."""
    from sklearn.cluster import KMeans

    h, w = image.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w]
    feats = np.concatenate([
        image.reshape(-1, 3).astype(np.float32) / 255.0 * 2.0,
        (xs.reshape(-1, 1) / w).astype(np.float32),
        (ys.reshape(-1, 1) / h).astype(np.float32),
    ], axis=1)
    sub = feats[::max(1, len(feats) // 20000)]
    km = KMeans(n_clusters=num_regions, n_init=4, random_state=seed).fit(sub)
    labels = km.predict(feats).reshape(h, w)
    out = []
    for k in range(num_regions):
        m = labels == k
        if m.mean() < min_area_frac:
            continue
        x0, y0, x1, y1 = mask_bbox(m)
        out.append(DetectionResult(
            score=float(m.mean()), label="object",
            box=BoundingBox(x0, y0, x1, y1), mask=m))
    return out


def detect_and_segment(
    cfg: Config,
    image: np.ndarray,
    sam=None, sam_params=None,
    detector=None, detector_params=None,
) -> List[DetectionResult]:
    """Detector → NMS → SAM masks (grounded_segmentation,
    segmentation.py:691-758). Falls back to clustering when weightless."""
    labels = list(cfg.get("labels", []))
    thr = float(cfg.get("threshold", 0.25))
    iou_thr = float(cfg.get("iou_threshold", 0.5))

    if detector is None:
        det_ckpt = str(cfg.get("detector_checkpoint", "") or "")
        if det_ckpt and os.path.isdir(det_ckpt):
            from regen3d_tpu.pipeline.detector_distill import (
                load_detector_checkpoint)
            detector_params, detector = load_detector_checkpoint(det_ckpt)
            log.info("phase1: detector checkpoint %s", det_ckpt)
        elif det_ckpt:
            log.warning("phase1: detector_checkpoint %s missing — "
                        "clustering fallback", det_ckpt)
    if detector is not None and detector_params is not None:
        dets = detector.detect(detector_params, image, labels, thr)
    else:
        log.warning("phase1: no detector checkpoint — clustering fallback")
        dets = cluster_proposals(image, num_regions=max(6, len(labels)),
                                 seed=int(cfg.get("seed", 1234567)))
    dets = nms(dets, iou_thr)

    saliency_model = None
    if str(cfg.get("point_method", "")) == "saliency":
        sal_ckpt = str(cfg.get("saliency_checkpoint", "") or "")
        if sal_ckpt and os.path.isdir(sal_ckpt):
            from regen3d_tpu.pipeline.saliency_distill import SaliencyModel
            saliency_model = SaliencyModel.load(sal_ckpt)
            log.info("phase1: saliency checkpoint %s", sal_ckpt)
        elif sal_ckpt:
            log.warning("phase1: saliency_checkpoint %s missing — "
                        "max_distance fallback", sal_ckpt)

    if sam is not None and sam_params is not None:
        import jax.numpy as jnp
        h, w = image.shape[:2]
        size = sam.cfg.image_size
        import jax
        img_in = np.asarray(jax.image.resize(
            jnp.asarray(image, jnp.float32) / 255.0, (size, size, 3),
            "bilinear"))
        use_points = bool(cfg.get("use_points", False))
        scale_bb = float(cfg.get("scale_bounding_boxes", 1.01))
        for d in dets:
            bb = d.box.scaled(scale_bb, (w, h)) if use_points else d.box
            boxes = jnp.asarray([[[bb.xmin / w, bb.ymin / h],
                                  [bb.xmax / w, bb.ymax / h]]])
            if use_points and d.mask is not None:
                pts_px = generate_points(cfg.get("point_method", "max_distance"),
                                         image, d.mask, 3,
                                         int(cfg.get("seed", 1234567)),
                                         saliency_model=saliency_model)
                pts = jnp.asarray(pts_px[None] / [w, h]) if len(pts_px) else \
                    jnp.zeros((1, 1, 2))
                labs = jnp.ones((1, pts.shape[1]))
            else:
                pts = jnp.zeros((1, 1, 2))
                labs = -jnp.ones((1, 1))
            masks, iou = sam.apply(sam_params, jnp.asarray(img_in[None]),
                                   pts, labs, boxes)
            best = int(np.argmax(np.asarray(iou)[0]))
            m = np.asarray(jax.image.resize(masks[0, best], (h, w), "bilinear"))
            d.mask = m > 0
    else:
        # no SAM weights: a box-filled mask keeps the detector path (e.g. a
        # distilled detector_checkpoint) end-to-end runnable — the reference
        # always has SAM, so this branch only exists for weightless images
        h, w = image.shape[:2]
        for d in dets:
            if d.mask is None:
                m = np.zeros((h, w), bool)
                y0, y1 = max(int(d.box.ymin), 0), min(int(np.ceil(d.box.ymax)), h)
                x0, x1 = max(int(d.box.xmin), 0), min(int(np.ceil(d.box.xmax)), w)
                m[y0:y1, x0:x1] = True
                d.mask = m
    return [d for d in dets if d.mask is not None and d.mask.any()]


def export_findings(cfg: Config, image: np.ndarray,
                    detections: List[DetectionResult]) -> List[str]:
    """Write the phase-1 artifact set (findings/banana/layout contracts)."""
    art = Artifacts(cfg)
    padding = int(cfg.get("findings_padding", 5))
    os.makedirs(art.findings_fullsize, exist_ok=True)
    os.makedirs(art.findings_cropped, exist_ok=True)
    os.makedirs(art.banana_outline, exist_ok=True)
    os.makedirs(art.banana_bbox, exist_ok=True)
    os.makedirs(art.banana_layouts, exist_ok=True)

    stems = []
    for d in detections:
        stem = finding_stem(d.label, d.mask_centroid)
        stems.append(stem)
        full = masked_on_white(image, d.mask)
        save_image(os.path.join(art.findings_fullsize, f"{stem}.png"), full)
        bbox = mask_bbox(d.mask)
        save_image(os.path.join(art.findings_cropped, f"{stem}.png"),
                   padded_crop(full, bbox, padding))
        outline = draw_outline(
            image, d.mask,
            color=cfg.get("banana_line_color", [255, 0, 0]),
            thickness=int(cfg.get("banana_line_thickness", 3)),
            offset_px=int(cfg.get("banana_offset_px", 5)))
        save_image(os.path.join(art.banana_outline, f"{stem}.png"), outline)
        save_image(os.path.join(art.banana_bbox, f"{stem}.png"),
                   draw_bbox(image, bbox,
                             color=cfg.get("banana_bbox_color", [255, 0, 0]),
                             thickness=int(cfg.get("banana_bbox_thickness", 2)),
                             padding=int(cfg.get("banana_bbox_padding", 6))))
        save_image(os.path.join(art.banana_layouts, f"{stem}.png"),
                   segmentation_layout(image, d.mask))
        log.info("phase1: finding %s (score %.2f)", stem, d.score)
    return stems


def run(cfg: Config, sam=None, sam_params=None,
        detector=None, detector_params=None,
        detections: Optional[List[DetectionResult]] = None) -> List[str]:
    image = load_image_rgb(cfg.path("input_image"), max_side=1280)
    if detections is None:
        detections = detect_and_segment(cfg, image, sam, sam_params,
                                        detector, detector_params)
    if bool(cfg.get("interactive_edit", False)):
        # human-in-the-loop mask editing (reference: segmentation.py:1132-
        # 1143 → manual_editor.edit_segmentations_interactive); blocks
        # until the browser session finishes
        from regen3d_tpu.pipeline.editor_ui import (
            edit_segmentations_interactive)
        detections = edit_segmentations_interactive(
            image, detections, cfg, sam=sam, sam_params=sam_params)
        log.info("phase1: interactive session finished with %d detections",
                 len(detections))
    if not detections:
        log.warning("phase1: no detections")
        return []
    stems = export_findings(cfg, image, detections)
    # depth.png artifact (reference: depth_from_image, global_utils.py:357-418)
    try:
        from regen3d_tpu.pipeline import depth as depth_mod
        depth_mod.run(cfg)
    except Exception:
        log.exception("phase1: depth estimation failed (non-fatal)")
    # non-banana path: diffusion-upscale the crops for phase 3
    # (reference: segmentation.py:1208-1252, mp.Pool of Upscaler workers)
    if not bool(cfg.get("use_banana", True)):
        from regen3d_tpu.pipeline import upscale
        upscale.run(cfg)
    return stems
