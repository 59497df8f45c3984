"""Phase 5: per-object point-cloud extraction from the scene cloud.

Reference flow (extract_pc_object.py): per finding → binary mask from the
white-background PNG, eroded to cut depth-edge noise → scene_vggt.ply
re-based into the render world (B2P(I) + Y-flip, pc_utils.py:11-40) →
project every point through the camera, keep those landing on the mask →
quantile / DBSCAN outlier filters → Open3D normals → write
pointclouds/<stem>.ply + pointclouds/normals/<stem>_normals.ply +
masks/<stem>.png.

TPU redesign: the scene cloud is projected ONCE for all objects (one jitted
program produces every per-object keep-mask simultaneously); filters and
KNN-PCA normals run batched on device. Only file IO is host-side.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.camera import Camera, camera_from_npz
from regen3d_tpu.config import Config
from regen3d_tpu.ops.filters import (
    dbscan_largest_cluster,
    estimate_normals,
    quantile_filter,
)
from regen3d_tpu.transforms.conventions import blender_to_p3d
from regen3d_tpu.utils.image import erode_mask, mask_from_finding, save_image
from regen3d_tpu.utils.ply import load_ply, save_ply

log = logging.getLogger(__name__)


def scene_cloud_to_world(points: np.ndarray) -> np.ndarray:
    """scene_vggt.ply → render-world frame: fixed B2P(I) rotation + Y-flip
    (reference: get_model_vggt_cloud, pc_utils.py:25-37)."""
    R, t = blender_to_p3d(np.eye(4))
    out = points @ R.T + t
    out[:, 1] *= -1
    return out


def project_and_mask(
    camera: Camera,
    points_world: jnp.ndarray,
    masks: jnp.ndarray,           # (K, H, W) bool
) -> jnp.ndarray:
    """(K, N) bool: which points project onto each object's mask."""
    uv, z = camera.project(points_world)
    h, w = masks.shape[1:]
    xi = jnp.round(uv[:, 0]).astype(jnp.int32)
    yi = jnp.round(uv[:, 1]).astype(jnp.int32)
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h) & (z > 0)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    hits = masks[:, yi, xi]            # (K, N)
    return hits & inb[None, :]


# module-level jit: a fresh wrapper per run() call would recompile per scene
_project_and_mask_jit = jax.jit(project_and_mask)


def _pad_cloud(pts: np.ndarray, lo: int = 1024):
    """Pad (N, 3) to the next power-of-two bucket → (padded jnp array,
    valid-row mask). Bounds the number of compiled filter/normal programs
    at log₂(max cloud size) instead of one per object."""
    n = len(pts)
    m = lo
    while m < n:
        m *= 2
    out = np.zeros((m, 3), np.float32)
    out[:n] = pts
    return jnp.asarray(out), jnp.asarray(np.arange(m) < n)


def run(cfg: Config) -> Dict[str, int]:
    """Extract per-object clouds for every finding. Returns {stem: n_points}."""
    art = Artifacts(cfg)
    # 3D-FRONT mode derives camera.npz from the dataset JSON
    # (reference: cam_utils.py:30-35)
    from regen3d_tpu.pipeline.front3d import maybe_extract
    maybe_extract(cfg)
    stems = art.list_findings(full_size=True)
    os.makedirs(art.masks_dir, exist_ok=True)
    os.makedirs(art.pointclouds_dir, exist_ok=True)
    os.makedirs(art.normals_dir, exist_ok=True)

    cloud = load_ply(art.scene_cloud_ply).vertices
    world = scene_cloud_to_world(cloud.astype(np.float64)).astype(np.float32)

    # render-resolution camera: masks are at the finding image resolution
    shrink_px = int(cfg.get("mask_shrink_pixels", 4))
    shrink_it = int(cfg.get("mask_shrink_iterations", 4))

    masks = []
    kept_stems: List[str] = []
    hw: Optional[tuple] = None
    for stem in stems:
        m = mask_from_finding(os.path.join(art.findings_fullsize, f"{stem}.png"))
        m = erode_mask(m, shrink_px, shrink_it)
        save_image(os.path.join(art.masks_dir, f"{stem}.png"),
                   (m * 255).astype(np.uint8))
        masks.append(m)
        kept_stems.append(stem)
        hw = m.shape
    if not masks:
        log.warning("phase5: no findings to extract")
        return {}

    cam = camera_from_npz(art.camera_npz, render_hw=hw)
    hits = np.asarray(_project_and_mask_jit(
        cam, jnp.asarray(world), jnp.asarray(np.stack(masks))))

    use_quant = bool(cfg.get("filter_vggt_quantile", True))
    use_db = bool(cfg.get("filter_vggt_dbscan", False))
    q = float(cfg.get("quantile_value", 0.02))
    eps = float(cfg.get("dbscan_eps", 0.1))
    min_pts = int(cfg.get("dbscan_min_points", 10))

    counts: Dict[str, int] = {}
    for k, stem in enumerate(kept_stems):
        pts = world[hits[k]]
        if len(pts) < 8:
            log.warning("phase5: %s has %d points — skipped", stem, len(pts))
            counts[stem] = 0
            continue
        # pad to power-of-two buckets: per-object clouds have unique sizes,
        # so unpadded shapes would compile a fresh filter/normal program
        # for EVERY object of EVERY scene
        jpts, pmask = _pad_cloud(pts)
        keep = pmask
        if use_quant:
            keep = keep & quantile_filter(jpts, q, mask=pmask)
        if use_db:
            keep = keep & dbscan_largest_cluster(jpts, eps, min_pts,
                                                 mask=pmask)
        pts = pts[np.asarray(keep)[:len(pts)]]
        if len(pts) < 8:
            counts[stem] = 0
            continue
        jpts2, pmask2 = _pad_cloud(pts)
        kk = 30 if len(pts) > 30 else len(pts) - 1
        normals = np.asarray(estimate_normals(
            jpts2, k=kk, viewpoint=cam.center, mask=pmask2))[:len(pts)]
        save_ply(os.path.join(art.pointclouds_dir, f"{stem}.ply"), pts)
        save_ply(os.path.join(art.normals_dir, f"{stem}_normals.ply"), pts,
                 normals=normals)
        counts[stem] = len(pts)
        log.info("phase5: %s → %d points", stem, len(pts))
    return counts
