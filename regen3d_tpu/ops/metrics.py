"""Evaluation metric suite (phase 9).

Replaces the reference metric stack (run_eval.py:48-222 + utils/metrics.py):
3D — symmetric Chamfer (pytorch3d-convention squared + pcu-convention
euclidean), Hausdorff, F-score(τ), volume IoU (bbox mode), precision/recall
@threshold, 1-D Wasserstein on flattened coordinates; 2D — PSNR, SSIM
(LPIPS lives in models/lpips.py).

Everything is jit-safe JAX over static shapes; the NN passes ride the MXU
chamfer op.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from regen3d_tpu.ops.knn import nn_distances


def chamfer_metrics(pred: jnp.ndarray, gt: jnp.ndarray,
                    chunk: int = 2048) -> Dict[str, jnp.ndarray]:
    """Both Chamfer conventions + Hausdorff from one pair of NN passes."""
    d_pg, _ = nn_distances(pred, gt, chunk=chunk)   # squared
    d_gp, _ = nn_distances(gt, pred, chunk=chunk)
    return {
        # pytorch3d chamfer_distance: mean squared, summed both ways
        "chamfer_p3d": jnp.mean(d_pg) + jnp.mean(d_gp),
        # point-cloud-utils chamfer: mean euclidean, averaged both ways
        "chamfer_pcu": 0.5 * (jnp.mean(jnp.sqrt(d_pg)) + jnp.mean(jnp.sqrt(d_gp))),
        "hausdorff": jnp.maximum(jnp.sqrt(jnp.max(d_pg)), jnp.sqrt(jnp.max(d_gp))),
    }


def fscore(pred: jnp.ndarray, gt: jnp.ndarray, tau: float = 0.1,
           chunk: int = 2048) -> Dict[str, jnp.ndarray]:
    """F-score at distance threshold τ (reference: compute_fscore,
    utils/metrics.py:39-96, τ=0.1)."""
    d_pg, _ = nn_distances(pred, gt, chunk=chunk)
    d_gp, _ = nn_distances(gt, pred, chunk=chunk)
    precision = jnp.mean((jnp.sqrt(d_pg) < tau).astype(jnp.float32))
    recall = jnp.mean((jnp.sqrt(d_gp) < tau).astype(jnp.float32))
    f = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    return {"fscore": f, "precision_tau": precision, "recall_tau": recall}


def precision_recall_at(pred: jnp.ndarray, gt: jnp.ndarray,
                        thr: float = 0.01, chunk: int = 2048
                        ) -> Dict[str, jnp.ndarray]:
    """P/R at 1 cm (reference: run_eval.py cKDTree-based P/R@0.01)."""
    d_pg, _ = nn_distances(pred, gt, chunk=chunk)
    d_gp, _ = nn_distances(gt, pred, chunk=chunk)
    return {
        "precision_001": jnp.mean((jnp.sqrt(d_pg) < thr).astype(jnp.float32)),
        "recall_001": jnp.mean((jnp.sqrt(d_gp) < thr).astype(jnp.float32)),
    }


def volume_iou_bbox(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned bounding-box volume IoU (reference: compute_volume_iou
    bbox mode, utils/metrics.py:131-189)."""
    p_lo, p_hi = jnp.min(pred, 0), jnp.max(pred, 0)
    g_lo, g_hi = jnp.min(gt, 0), jnp.max(gt, 0)
    inter = jnp.prod(jnp.maximum(jnp.minimum(p_hi, g_hi) - jnp.maximum(p_lo, g_lo), 0))
    vol_p = jnp.prod(p_hi - p_lo)
    vol_g = jnp.prod(g_hi - g_lo)
    return inter / jnp.maximum(vol_p + vol_g - inter, 1e-12)


def wasserstein_flat(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """1-D Wasserstein distance between the flattened coordinate
    distributions (reference flattens xyz into one sample set,
    run_eval.py:160-168). Sort-based closed form; resamples to the smaller
    count via linear quantile interpolation when sizes differ."""
    a = jnp.sort(pred.reshape(-1))
    b = jnp.sort(gt.reshape(-1))
    n = min(a.shape[0], b.shape[0])
    q = (jnp.arange(n) + 0.5) / n

    def quantiles(x):
        idx = q * (x.shape[0] - 1)
        lo = jnp.floor(idx).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, x.shape[0] - 1)
        w = idx - lo
        return x[lo] * (1 - w) + x[hi] * w

    return jnp.mean(jnp.abs(quantiles(a) - quantiles(b)))


# --- 2D image metrics ---------------------------------------------------------

def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0
         ) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0
         ) -> jnp.ndarray:
    """Structural similarity (Wang et al.), 11×11 gaussian window, per-channel
    averaged — matches skimage's default configuration used by the reference
    (run_eval.py PSNR/SSIM block)."""
    if pred.ndim == 2:
        pred = pred[..., None]
        target = target[..., None]
    k = _gaussian_kernel()[..., None, None]  # (11, 11, 1, 1)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    def filt(x):
        # depthwise conv per channel
        x = jnp.moveaxis(x, -1, 0)[:, None]  # (C, 1, H, W)
        out = jax.lax.conv_general_dilated(
            x, jnp.moveaxis(k, (0, 1, 2, 3), (2, 3, 1, 0)),
            window_strides=(1, 1), padding="VALID")
        return jnp.moveaxis(out[:, 0], 0, -1)

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = filt(pred * pred)
    mu_tt = filt(target * target)
    mu_pt = filt(pred * target)
    var_p = mu_pp - mu_p ** 2
    var_t = mu_tt - mu_t ** 2
    cov = mu_pt - mu_p * mu_t
    s = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2))
    return jnp.mean(s)


# module-level jits (cached per image shape): phase 9 calls these per scene
psnr = jax.jit(psnr)
ssim = jax.jit(ssim)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _evaluate_clouds_jit(pred, gt, tau, chunk):
    """ONE program, TWO NN passes (the naive composition above runs six —
    chamfer/fscore/P-R each redo the same nearest-neighbor sweep — and
    dispatches every metric eagerly)."""
    d_pg, _ = nn_distances(pred, gt, chunk=chunk)   # squared
    d_gp, _ = nn_distances(gt, pred, chunk=chunk)
    r_pg = jnp.sqrt(d_pg)
    r_gp = jnp.sqrt(d_gp)
    precision = jnp.mean((r_pg < tau).astype(jnp.float32))
    recall = jnp.mean((r_gp < tau).astype(jnp.float32))
    return {
        "chamfer_p3d": jnp.mean(d_pg) + jnp.mean(d_gp),
        "chamfer_pcu": 0.5 * (jnp.mean(r_pg) + jnp.mean(r_gp)),
        "hausdorff": jnp.maximum(jnp.max(r_pg), jnp.max(r_gp)),
        "fscore": 2 * precision * recall
        / jnp.maximum(precision + recall, 1e-12),
        "precision_tau": precision,
        "recall_tau": recall,
        "precision_001": jnp.mean((r_pg < 0.01).astype(jnp.float32)),
        "recall_001": jnp.mean((r_gp < 0.01).astype(jnp.float32)),
        "volume_iou_bbox": volume_iou_bbox(pred, gt),
        "wasserstein": wasserstein_flat(pred, gt),
    }


def evaluate_clouds(pred: jnp.ndarray, gt: jnp.ndarray,
                    tau: float = 0.1, chunk: int = 2048
                    ) -> Dict[str, float]:
    """The full 3D metric block of run_eval.py:133-168, one call."""
    out = _evaluate_clouds_jit(pred, gt, jnp.float32(tau), chunk)
    return {k: float(v) for k, v in out.items()}
