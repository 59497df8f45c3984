"""Cross-frame point tracks for bundle adjustment (the `use_ba` path).

The reference predicts tracks with the VGGT track head seeded by
ALIKED+SuperPoint keypoints (minimal_demo_vggt.py:414-430 →
vggt/dependency/track_predict.py) and hands them to pycolmap. The
TPU-native counterpart keeps the same role — query-frame keypoints
propagated to every frame with a per-observation visibility score — but is
built from jitted primitives that map onto the MXU:

  1. keypoints: Shi-Tomasi min-eigenvalue response (two 3×3 gradient convs
     + box filter), 5×5 max-pool NMS, `lax.top_k`.
  2. descriptors: zero-mean/ℓ2-normalized P×P image patches (bilinear
     gather), flattened to (K, D).
  3. matching: one (K, D) @ (D, G) matmul against the target frame's
     stride-s dense patch grid (normalized cross-correlation on the MXU),
     then a sub-stride refinement pass over the 3×3 neighboring cells with
     a correlation-weighted soft-argmax → sub-pixel positions.

Visibility = best NCC score (in [-1, 1]); callers threshold with the
reference's `vis_thresh` (default 0.2, minimal_demo_vggt.py:436).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class Tracks(NamedTuple):
    xy: jnp.ndarray      # (F, K, 2) pixel positions per frame
    vis: jnp.ndarray     # (F, K) visibility/confidence score in [-1, 1]
    query_xy: jnp.ndarray  # (K, 2) keypoint positions in the query frame


def _gray(img: jnp.ndarray) -> jnp.ndarray:
    if img.ndim == 3:
        return img @ jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return img


def _conv2(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        img[None, None], k[None, None].astype(img.dtype), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]


def shi_tomasi_keypoints(img: jnp.ndarray, num_points: int,
                         nms_radius: int = 2, border: int = 8
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K corner keypoints of an (H, W[, 3]) image in [0, 1].

    Returns (xy (K, 2) float pixel coords, score (K,)). Fully jitted;
    deterministic (top_k over the NMS-suppressed response map).
    """
    g = _gray(img)
    sob = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    ix = _conv2(g, sob / 8.0)
    iy = _conv2(g, sob.T / 8.0)
    box = jnp.ones((5, 5)) / 25.0
    sxx = _conv2(ix * ix, box)
    syy = _conv2(iy * iy, box)
    sxy = _conv2(ix * iy, box)
    # min eigenvalue of [[sxx, sxy], [sxy, syy]]
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    resp = tr / 2.0 - disc

    # NMS: keep strict local maxima of a (2r+1)² window
    w = 2 * nms_radius + 1
    mx = lax.reduce_window(resp, -jnp.inf, lax.max, (w, w), (1, 1), "SAME")
    resp = jnp.where(resp >= mx, resp, -jnp.inf)
    h, wd = resp.shape
    yy = lax.broadcasted_iota(jnp.int32, resp.shape, 0)
    xx = lax.broadcasted_iota(jnp.int32, resp.shape, 1)
    inside = ((yy >= border) & (yy < h - border)
              & (xx >= border) & (xx < wd - border))
    resp = jnp.where(inside, resp, -jnp.inf)

    score, idx = lax.top_k(resp.reshape(-1), num_points)
    xy = jnp.stack([(idx % wd).astype(jnp.float32),
                    (idx // wd).astype(jnp.float32)], -1)
    return xy, score


def _bilinear_patch(img: jnp.ndarray, center: jnp.ndarray,
                    patch: int) -> jnp.ndarray:
    """Patch of side `patch` (odd or even) bilinearly sampled around
    `center` (2,) = (x, y). img (H, W, C). Returns (patch, patch, C)."""
    h, w = img.shape[:2]
    r = (patch - 1) / 2.0
    off = jnp.arange(patch, dtype=jnp.float32) - r
    gy = jnp.clip(center[1] + off, 0.0, h - 1.0)
    gx = jnp.clip(center[0] + off, 0.0, w - 1.0)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (gy - y0)[:, None, None]
    fx = (gx - x0)[None, :, None]
    return ((img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx) * (1 - fy)
            + (img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx) * fy)


def patch_descriptors(img: jnp.ndarray, xy: jnp.ndarray,
                      patch: int = 8) -> jnp.ndarray:
    """Zero-mean, ℓ2-normalized flattened patches at `xy` → (K, D)."""
    if img.ndim == 2:
        img = img[..., None]
    d = jax.vmap(lambda c: _bilinear_patch(img, c, patch))(xy)
    d = d.reshape(d.shape[0], -1)
    d = d - jnp.mean(d, -1, keepdims=True)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)


def _grid_descriptors(img: jnp.ndarray, stride: int,
                      patch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Descriptors on a stride grid → ((G, D), grid xy (G, 2))."""
    h, w = img.shape[:2]
    ys = jnp.arange(stride // 2, h, stride, dtype=jnp.float32)
    xs = jnp.arange(stride // 2, w, stride, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    return patch_descriptors(img, xy, patch), xy


@functools.partial(jax.jit, static_argnames=("num_points", "patch", "stride",
                                             "refine_steps"))
def predict_tracks(images: jnp.ndarray, num_points: int = 512,
                   patch: int = 8, stride: int = 4,
                   refine_steps: int = 2) -> Tracks:
    """Track query-frame (frame 0) keypoints across all frames.

    images: (F, H, W, 3) in [0, 1]. Coarse NCC match against each target
    frame's stride grid on the MXU, then `refine_steps` rounds of halving
    the offset grid around the best position (correlation soft-argmax).
    """
    f = images.shape[0]
    q_xy, _ = shi_tomasi_keypoints(images[0], num_points)
    q_desc = patch_descriptors(images[0], q_xy, patch)      # (K, D)

    def track_one(img):
        g_desc, g_xy = _grid_descriptors(img, stride, patch)
        corr = q_desc @ g_desc.T                            # (K, G) MXU
        best = jnp.argmax(corr, axis=-1)
        pos = g_xy[best]                                    # (K, 2)

        # iterative refinement: correlate against a shrinking 3×3 offset
        # pattern around the current estimate, move to the best offset
        def refine(carry, step_px):
            pos = carry
            offs = (jnp.stack(jnp.meshgrid(jnp.arange(-1.0, 2.0),
                                           jnp.arange(-1.0, 2.0)), -1)
                    .reshape(-1, 2) * step_px)              # (9, 2)
            cand = pos[:, None, :] + offs[None]             # (K, 9, 2)
            cd = jax.vmap(lambda c: patch_descriptors(img, c, patch))(
                cand.reshape(-1, 9, 2).transpose(1, 0, 2)
            )                                               # (9, K, D)
            cc = jnp.einsum("kd,skd->ks", q_desc, cd)       # (K, 9)
            # soft-argmax over the 3×3 pattern for sub-step precision
            wgt = jax.nn.softmax(cc * 20.0, axis=-1)
            pos = pos + jnp.einsum("ks,sd->kd", wgt,
                                   offs.astype(jnp.float32))
            return pos, jnp.max(cc, -1)

        steps = jnp.asarray([stride / 2.0 / (2.0 ** i)
                             for i in range(refine_steps)])
        pos, scores = lax.scan(refine, pos, steps)
        return pos, scores[-1]

    xy, vis = jax.vmap(track_one)(images)
    # the query frame tracks itself: pin exact positions / full confidence
    xy = xy.at[0].set(q_xy)
    vis = vis.at[0].set(jnp.ones(num_points))
    return Tracks(xy=xy, vis=vis, query_xy=q_xy)
