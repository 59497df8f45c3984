"""Camera refinement by Gauss-Newton on reprojection error (the `use_ba`
path).

The reference optionally runs pycolmap/Ceres bundle adjustment over VGGT
tracks (minimal_demo_vggt.py:414-456, off by default at config.yaml:233).
This is the TPU-native counterpart for the common case (points held fixed,
per-camera refinement): a damped Gauss-Newton loop over the 7 camera
parameters (axis-angle rotation, translation, log-focal), fully jitted —
the 7×7 normal equations solve is a trivial on-device linalg call, and
multiple cameras refine in parallel under vmap.

Two entry points:
  * :func:`refine_camera_gn` — points fixed, per-camera 7-DOF refinement
    (rotation, translation, log-focal), vmappable across cameras.
  * :func:`joint_bundle_adjust` — the pycolmap.bundle_adjustment role
    (minimal_demo_vggt.py:455-456): M cameras + N points refined jointly
    by damped Gauss-Newton with the standard Schur complement over points
    — V (the point block) is a batched (N, 3, 3) inverse, the reduced
    camera system is a tiny (7M, 7M) dense on-device solve. Gauge is fixed
    by freezing camera 0.
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

class JointBAResult(NamedTuple):
    R: jnp.ndarray        # (M, 3, 3) world→view per camera
    T: jnp.ndarray        # (M, 3)
    focal: jnp.ndarray    # (M,) pixels
    points3d: jnp.ndarray  # (N, 3) refined structure
    rmse_px: jnp.ndarray  # weighted reprojection RMSE (pixels)


def _project_one(cam_params: jnp.ndarray, point: jnp.ndarray,
                 principal: jnp.ndarray) -> jnp.ndarray:
    """cam_params = (aa (3,), t (3,), log_f); one point → (u, v)."""
    aa, t, log_f = cam_params[:3], cam_params[3:6], cam_params[6]
    v = point @ so3_exp(aa) + t
    z = jnp.maximum(v[2], 1e-6)
    f = jnp.exp(log_f)
    return principal + f * v[:2] / z


def joint_bundle_adjust(
    points3d: jnp.ndarray,
    observations: jnp.ndarray,
    weights: jnp.ndarray,
    R_init: jnp.ndarray,
    T_init: jnp.ndarray,
    focal_init: jnp.ndarray,
    principal: jnp.ndarray,
    max_iterations: int = 30,
    damping: float = 1e-3,
    refine_focal: bool = True,
    shared_focal: bool = False,
) -> JointBAResult:
    """Joint structure+pose BA: min Σ_{ij} w_ij ‖π_i(X_j) − obs_ij‖².

    points3d (N, 3) initial structure; observations (M, N, 2) pixels;
    weights (M, N) with 0 = unobserved (track invisible in that frame);
    R_init (M, 3, 3) / T_init (M, 3) / focal_init (M,) initial cameras;
    principal (M, 2). Camera 0 is frozen (gauge). Fixed-iteration damped GN
    under `lax.scan` with a step-acceptance gate — jit-safe.
    """
    m, n = observations.shape[:2]
    w = jnp.maximum(jnp.asarray(weights, jnp.float32), 0.0)

    cam0 = jnp.concatenate([
        jax.vmap(so3_log)(jnp.asarray(R_init, jnp.float32)),
        jnp.asarray(T_init, jnp.float32),
        jnp.log(jnp.asarray(focal_init, jnp.float32))[:, None]], axis=-1)
    pts0 = jnp.asarray(points3d, jnp.float32)
    principal = jnp.asarray(principal, jnp.float32)

    # gauge freeze needs only camera 0's POSE; its focal stays free when
    # focals are shared so all frames truly converge to one common focal
    f0_free = 1.0 if (refine_focal and shared_focal) else 0.0
    cam_mask = jnp.concatenate([
        jnp.concatenate([jnp.zeros((1, 6)), jnp.full((1, 1), f0_free)], -1),
        jnp.concatenate([jnp.ones((m - 1, 6)),
                         jnp.full((m - 1, 1),
                                  1.0 if refine_focal else 0.0)], -1)])

    def resid_raw(cams, pts):
        proj = jax.vmap(  # over cameras
            lambda c, p: jax.vmap(lambda x: _project_one(c, x, p))(pts)
        )(cams, principal)                                # (M, N, 2)
        return proj - observations

    jac = jax.vmap(jax.vmap(
        jax.jacfwd(_project_one, argnums=(0, 1)),
        in_axes=(None, 0, None)), in_axes=(0, None, 0))

    def total_err(cams, pts):
        return jnp.sum(w[..., None] * resid_raw(cams, pts) ** 2)

    def step(carry, _):
        cams, pts, lam = carry
        r = resid_raw(cams, pts)                          # (M, N, 2)
        jc, jp = jac(cams, pts, principal)                # (M,N,2,7),(M,N,2,3)
        jc = jc * cam_mask[:, None, None, :]
        sw = w[..., None, None]

        U = jnp.einsum("mnia,mnib->mab", jc * sw, jc)     # (M, 7, 7)
        V = jnp.einsum("mnia,mnib->nab", jp * sw, jp)     # (N, 3, 3)
        W = jnp.einsum("mnia,mnib->mnab", jc * sw, jp)    # (M, N, 7, 3)
        gc = jnp.einsum("mnia,mni->ma", jc * sw, r)       # J^T·w·r
        gp = jnp.einsum("mnia,mni->na", jp * sw, r)

        V = V + lam * jnp.eye(3)[None]
        Vinv = jnp.linalg.inv(V)                          # batched 3×3

        WVinv = jnp.einsum("mnab,nbc->mnac", W, Vinv)     # (M, N, 7, 3)
        # reduced camera system S (M, 7, M, 7)
        S = (jnp.einsum("mnab,kncb->makc", WVinv, W) * -1.0)
        S = S + jnp.einsum("mk,mab->makb", jnp.eye(m),
                           U + lam * jnp.eye(7)[None])
        b = gc - jnp.einsum("mnab,nb->ma", WVinv, gp)
        # freeze camera 0: identity rows/cols for its masked params keep S
        # nonsingular without moving it
        diag_fix = jnp.einsum("mk,ab,ma->makb", jnp.eye(m), jnp.eye(7),
                              1.0 - cam_mask)
        S = S * cam_mask[:, :, None, None] * cam_mask[None, None] + diag_fix
        b = b * cam_mask

        dc = jnp.linalg.solve(S.reshape(m * 7, m * 7),
                              b.reshape(m * 7)).reshape(m, 7)
        dp = jnp.einsum("nab,nb->na",
                        Vinv, gp - jnp.einsum("mnba,mb->na", W, dc))

        cand_c = cams - dc * cam_mask
        if shared_focal and refine_focal:
            # ALL frames share one focal: average the (all-free) candidate
            # log-focals and assign it everywhere, camera 0 included
            shared = jnp.mean(cand_c[:, 6])
            cand_c = cand_c.at[:, 6].set(shared)
        cand_p = pts - dp

        better = total_err(cand_c, cand_p) < total_err(cams, pts)
        cams = jnp.where(better, cand_c, cams)
        pts = jnp.where(better, cand_p, pts)
        lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-8), lam * 4.0)
        return (cams, pts, lam), None

    (cams, pts, _), _ = lax.scan(step, (cam0, pts0, jnp.asarray(damping)),
                                 None, length=max_iterations)
    rmse = jnp.sqrt(jnp.sum(w[..., None] * resid_raw(cams, pts) ** 2)
                    / jnp.maximum(jnp.sum(w) * 2.0, 1.0))
    return JointBAResult(R=jax.vmap(so3_exp)(cams[:, :3]), T=cams[:, 3:6],
                         focal=jnp.exp(cams[:, 6]), points3d=pts,
                         rmse_px=rmse)
