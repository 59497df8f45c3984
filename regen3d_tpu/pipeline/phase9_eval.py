"""Phase 9: metric evaluation vs the ground-truth scene.

Reference flow (run_eval.py:71-254): load pred_points.ply/gt_points.ply
written by phase 7 → 3D metrics (Chamfer ×2, F-score τ=0.1, volume IoU,
Hausdorff, P/R@0.01, Wasserstein) → 2D metrics
(PSNR/SSIM/LPIPS of render_cam1_white_bg.png vs the input image) →
timestamped evaluation dir with json/csv + comparison vs the previous run.
"""

from __future__ import annotations

import logging
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.config import Config
from regen3d_tpu.ops.metrics import evaluate_clouds, psnr, ssim
from regen3d_tpu.utils.evalstore import dump_evaluation
from regen3d_tpu.utils.image import load_image_rgb
from regen3d_tpu.utils.ply import load_ply

log = logging.getLogger(__name__)


def run(cfg: Config, lpips_fn=None) -> Dict[str, float]:
    art = Artifacts(cfg)
    metrics: Dict[str, float] = {}

    # LPIPS requires calibrated weights to be meaningful; load them when a
    # converted checkpoint is configured (scripts/convert_weights.py lpips).
    if lpips_fn is None:
        ckpt = cfg.path("lpips_checkpoint", None)
        if ckpt and os.path.exists(ckpt):
            try:
                from regen3d_tpu.models.lpips import make_lpips_fn
                from regen3d_tpu.models.weights import load_checkpoint

                lpips_fn = make_lpips_fn(load_checkpoint(ckpt))
                log.info("phase9: LPIPS weights from %s", ckpt)
            except Exception:
                log.exception("phase9: LPIPS checkpoint load failed")

    # --- 3D block --------------------------------------------------------------
    if os.path.exists(art.pred_points_ply) and os.path.exists(art.gt_points_ply):
        pred = jnp.asarray(load_ply(art.pred_points_ply).vertices)
        gt = jnp.asarray(load_ply(art.gt_points_ply).vertices)
        metrics.update(evaluate_clouds(pred, gt, tau=0.1))
        log.info("phase9: 3D metrics on %d/%d points", pred.shape[0], gt.shape[0])
    else:
        log.warning("phase9: pred/gt point clouds missing — skipping 3D metrics")

    # full-scene variant incl. the background mesh (NOT a reference
    # metric — see phase7_assemble.scene_vs_gt_metrics docstring)
    if bool(cfg.get("eval_scene_incl_background", True)):
        try:
            from regen3d_tpu.pipeline.phase7_assemble import scene_vs_gt_metrics
            metrics.update(scene_vs_gt_metrics(cfg))
        except Exception:
            log.exception("phase9: scene-incl-background metrics failed")

    # --- 2D block --------------------------------------------------------------
    pred_img_path = art.predicted_image
    input_path = cfg.path("input_image")
    if os.path.exists(pred_img_path) and input_path and os.path.exists(input_path):
        pred_img = load_image_rgb(pred_img_path, max_side=None)
        ref_img = load_image_rgb(input_path, max_side=None)
        if pred_img.shape != ref_img.shape:
            from PIL import Image
            pred_img = np.asarray(Image.fromarray(pred_img).resize(
                (ref_img.shape[1], ref_img.shape[0]), Image.LANCZOS))
        p = jnp.asarray(pred_img, jnp.float32) / 255.0
        r = jnp.asarray(ref_img, jnp.float32) / 255.0
        metrics["psnr"] = float(psnr(p, r))
        metrics["ssim"] = float(ssim(p, r))
        if lpips_fn is not None:
            metrics["lpips"] = float(lpips_fn(p, r))
    else:
        log.warning("phase9: rendered/input image missing — skipping 2D metrics")

    out_dir = dump_evaluation(art.eval_dir, metrics,
                              config_values=dict(cfg.values))
    log.info("phase9: wrote %s (%d metrics)", out_dir, len(metrics))
    return metrics
