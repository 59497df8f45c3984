"""Loss functions for the pose optimizer.

Reference semantics (diff_model.py:229-240, diff_model_planar.py:63-67,
209-212): silhouette loss = 0.75·dice + 0.25·(BCE | focal α=.5 γ=2),
weighted by `silhoutte_loss`; 3D term = point_mesh_face_distance × `loss_3d`;
background-box hinge × `loss_bbox`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

_EPS = 1e-7


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 − Dice coefficient over soft masks (any shape, reduced fully)."""
    p = pred.reshape(-1)
    t = target.reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + _EPS) / (jnp.sum(p) + jnp.sum(t) + _EPS)


def bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on probabilities (already sigmoided)."""
    p = jnp.clip(pred, _EPS, 1.0 - _EPS)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def focal_loss(pred: jnp.ndarray, target: jnp.ndarray,
               alpha: float = 0.5, gamma: float = 2.0) -> jnp.ndarray:
    """Focal loss on probabilities (planar model's silhouette term,
    diff_model_planar.py:63-67)."""
    p = jnp.clip(pred, _EPS, 1.0 - _EPS)
    pt = jnp.where(target > 0.5, p, 1.0 - p)
    at = jnp.where(target > 0.5, alpha, 1.0 - alpha)
    return jnp.mean(-at * (1.0 - pt) ** gamma * jnp.log(pt))


def silhouette_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    use_focal: bool = False) -> jnp.ndarray:
    """0.75·dice + 0.25·(focal|bce) (diff_model.py:229-231)."""
    pixel_term = focal_loss(pred, target) if use_focal else bce_loss(pred, target)
    return 0.75 * dice_loss(pred, target) + 0.25 * pixel_term


def bbox_hinge_loss(verts: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                    verts_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean penetration distance of vertices outside an AABB
    (bounding_box_loss, diff_model.py:21-30 — keeps objects inside the
    empty-room bounds)."""
    under = jnp.maximum(lo - verts, 0.0)
    over = jnp.maximum(verts - hi, 0.0)
    pen = jnp.sum(under + over, axis=-1)
    if verts_mask is not None:
        return jnp.sum(pen * verts_mask) / jnp.maximum(jnp.sum(verts_mask), 1.0)
    return jnp.mean(pen)
