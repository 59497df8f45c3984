"""Camera refinement by Gauss-Newton on reprojection error (the `use_ba`
path).

The reference optionally runs pycolmap/Ceres bundle adjustment over VGGT
tracks (minimal_demo_vggt.py:414-456, off by default at config.yaml:233).
This is the TPU-native counterpart for the common case (points held fixed,
per-camera refinement): a damped Gauss-Newton loop over the 7 camera
parameters (axis-angle rotation, translation, log-focal), fully jitted —
the 7×7 normal equations solve is a trivial on-device linalg call, and
multiple cameras refine in parallel under vmap.

Full joint camera+structure BA (Schur-complement over points) is ROADMAP
item 9; for 1–2 frame scenes this pose-only refinement is the part that
moves the metrics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from regen3d_tpu.transforms.rotations import so3_exp, so3_log


class BAResult(NamedTuple):
    R: jnp.ndarray        # (3, 3) world→view (row-vector convention)
    T: jnp.ndarray        # (3,)
    focal: jnp.ndarray    # scalar (pixels)
    rmse_px: jnp.ndarray  # final reprojection RMSE
    num_iters: jnp.ndarray


def _project(params, points, principal):
    """params = (aa (3,), t (3,), log_f); row-convention pinhole."""
    aa, t, log_f = params[:3], params[3:6], params[6]
    R = so3_exp(aa)
    v = points @ R + t
    z = jnp.maximum(v[:, 2], 1e-6)
    f = jnp.exp(log_f)
    u = principal[0] + f * v[:, 0] / z
    w = principal[1] + f * v[:, 1] / z
    return jnp.stack([u, w], -1)


def refine_camera_gn(
    points3d: jnp.ndarray,
    observations: jnp.ndarray,
    R_init: jnp.ndarray,
    T_init: jnp.ndarray,
    focal_init: float,
    principal: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    max_iterations: int = 20,
    damping: float = 1e-4,
    refine_focal: bool = True,
) -> BAResult:
    """Minimize Σ w‖project(X) − obs‖² over (rotation, translation[, focal]).

    points3d: (N, 3) fixed world points; observations: (N, 2) pixels.
    Levenberg-style damped Gauss-Newton; jit/vmap-safe (fixed iterations with
    a step-acceptance gate instead of data-dependent exits).
    """
    n = points3d.shape[0]
    w = jnp.ones(n) if weights is None else weights
    sw = jnp.sqrt(w / jnp.maximum(jnp.sum(w), 1e-12))

    p0 = jnp.concatenate([so3_log(jnp.asarray(R_init, jnp.float32)),
                          jnp.asarray(T_init, jnp.float32),
                          jnp.log(jnp.asarray([focal_init], jnp.float32))])

    def residuals(params):
        r = (_project(params, points3d, principal) - observations)
        return (r * sw[:, None]).reshape(-1)

    jac_fn = jax.jacfwd(residuals)
    mask = jnp.asarray([1.0] * 6 + [1.0 if refine_focal else 0.0])

    def step(carry, _):
        params, lam = carry
        r = residuals(params)
        J = jac_fn(params) * mask[None, :]
        H = J.T @ J + lam * jnp.eye(7)
        g = J.T @ r
        delta = jnp.linalg.solve(H, g)
        cand = params - delta * mask
        better = jnp.sum(residuals(cand) ** 2) < jnp.sum(r ** 2)
        new_params = jnp.where(better, cand, params)
        new_lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-8), lam * 4.0)
        return (new_params, new_lam), None

    (params, _), _ = lax.scan(step, (p0, jnp.asarray(damping)), None,
                              length=max_iterations)
    r = residuals(params)
    rmse = jnp.sqrt(jnp.sum(r ** 2))
    return BAResult(R=so3_exp(params[:3]), T=params[3:6],
                    focal=jnp.exp(params[6]), rmse_px=rmse,
                    num_iters=jnp.asarray(max_iterations))
