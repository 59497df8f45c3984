"""Iterative closest point, fully on-device (lax.while_loop).

Replaces pytorch3d ``iterative_closest_point`` (reference: scene_optim.py:
332-350 — 200 iterations, estimate_scale=False, on ~60-100k-point clouds).

TPU design: one jitted while_loop; each iteration is a chamfer-style MXU
nearest-neighbour pass (:func:`regen3d_tpu.ops.knn.nn_distances`) plus a
closed-form Umeyama solve — no host round-trips, early exit on relative
RMSE convergence like the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from regen3d_tpu.ops.knn import nn_distances
from regen3d_tpu.transforms.rigid import umeyama


class ICPResult(NamedTuple):
    R: jnp.ndarray          # (3, 3) row-vector rotation
    t: jnp.ndarray          # (3,)
    s: jnp.ndarray          # scalar
    rmse: jnp.ndarray       # final RMSE
    num_iters: jnp.ndarray  # iterations actually run
    aligned: jnp.ndarray    # (N, 3) transformed source


def iterative_closest_point(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    max_iterations: int = 200,
    estimate_scale: bool = False,
    src_mask: Optional[jnp.ndarray] = None,
    dst_mask: Optional[jnp.ndarray] = None,
    relative_rmse_thr: float = 1e-6,
    chunk: int = 2048,
) -> ICPResult:
    """Align src → dst. Returns the accumulated similarity and aligned cloud."""
    n = src.shape[0]
    w = jnp.ones(n, src.dtype) if src_mask is None else src_mask.astype(src.dtype)
    wn = w / jnp.maximum(jnp.sum(w), 1.0)
    wd = (jnp.ones(dst.shape[0], dst.dtype) if dst_mask is None
          else dst_mask.astype(dst.dtype))
    wd = wd / jnp.maximum(jnp.sum(wd), 1.0)

    # Init: centroid alignment (+ variance-matched scale when estimating) —
    # prevents the scale-collapse failure mode of NN correspondences from a
    # cold start.
    mu_s = jnp.sum(src * wn[:, None], axis=0)
    mu_d = jnp.sum(dst * wd[:, None], axis=0)
    if estimate_scale:
        var_s = jnp.sum(wn * jnp.sum((src - mu_s) ** 2, -1))
        var_d = jnp.sum(wd * jnp.sum((dst - mu_d) ** 2, -1))
        s0 = jnp.sqrt(var_d / jnp.maximum(var_s, 1e-12))
    else:
        s0 = jnp.ones((), src.dtype)
    t0 = mu_d - mu_s * s0

    def step(state):
        i, R, t, s, prev_rmse, _ = state
        x = (src @ R) * s + t
        d2, idx = nn_distances(x, dst, src_mask, dst_mask, chunk)
        corr = dst[idx]
        R2, t2, s2 = umeyama(src, corr, weights=w, estimate_scale=estimate_scale)
        x2 = (src @ R2) * s2 + t2
        d2b = jnp.sum((x2 - corr) ** 2, axis=-1) * w
        rmse = jnp.sqrt(jnp.sum(d2b) / jnp.maximum(jnp.sum(w), 1.0))
        return (i + 1, R2, t2, s2, rmse, prev_rmse)

    def cond(state):
        i, _R, _t, _s, rmse, prev = state
        not_converged = jnp.abs(prev - rmse) > relative_rmse_thr * jnp.maximum(prev, 1e-12)
        return jnp.logical_and(i < max_iterations, jnp.logical_or(i < 2, not_converged))

    init = (
        jnp.zeros((), jnp.int32),
        jnp.eye(3, dtype=src.dtype),
        t0,
        s0,
        jnp.asarray(jnp.inf, src.dtype),
        jnp.asarray(jnp.inf, src.dtype),
    )
    i, R, t, s, rmse, _ = lax.while_loop(cond, step, init)
    aligned = (src @ R) * s + t
    return ICPResult(R=R, t=t, s=s, rmse=rmse, num_iters=i, aligned=aligned)


# whole-ICP jit (cached at module level): eager dispatch pays a tunnel
# round-trip per surrounding op; one program per (shape, knobs) instead
iterative_closest_point = jax.jit(
    iterative_closest_point,
    static_argnames=("max_iterations", "estimate_scale",
                     "relative_rmse_thr", "chunk"))
