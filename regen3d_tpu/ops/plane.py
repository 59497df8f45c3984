"""Plane fitting: total-least-squares SVD + vectorized RANSAC.

Replaces the floor-plane fitters at reference pose_matching_planar.py:402-474
(fit_plane_svd, fit_plane_ransac_refined — 2000 iterations, 5 cm threshold)
used for the floor-snap of on-floor objects.

TPU design: RANSAC hypotheses are NOT a Python loop — all ``num_iters``
3-point minimal samples are drawn at once and scored as a single
(num_iters, N) batched program (vmapped plane eval), then the best
hypothesis is refit by weighted SVD on its inliers. Deterministic under a
fixed PRNG key (the reference's np.random is seeded at config.yaml:29).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from regen3d_tpu.transforms.rigid import Transform3d


class Plane(NamedTuple):
    """n·x + d = 0 with ‖n‖=1."""

    normal: jnp.ndarray  # (3,)
    offset: jnp.ndarray  # scalar d
    centroid: jnp.ndarray  # (3,) fit centroid (on the plane)

    def signed_distance(self, pts: jnp.ndarray) -> jnp.ndarray:
        return pts @ self.normal + self.offset

    def project(self, pts: jnp.ndarray) -> jnp.ndarray:
        return pts - self.signed_distance(pts)[..., None] * self.normal


def fit_plane_svd(
    points: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    up_hint: Optional[jnp.ndarray] = None,
) -> Plane:
    """Total-least-squares plane through weighted points (smallest principal
    axis of the covariance). ``up_hint`` flips the normal into a half-space."""
    if weights is None:
        weights = jnp.ones(points.shape[0], points.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu = jnp.sum(points * w[:, None], axis=0)
    x = points - mu
    cov = (x * w[:, None]).T @ x
    # eigh returns ascending eigenvalues; the smallest eigenvector is the normal
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[:, 0]
    if up_hint is not None:
        n = n * jnp.sign(jnp.sum(n * up_hint) + 1e-12)
    d = -jnp.dot(n, mu)
    return Plane(normal=n, offset=d, centroid=mu)


def fit_plane_ransac(
    points: jnp.ndarray,
    key: jax.Array,
    num_iters: int = 2000,
    threshold: float = 0.05,
    up_hint: Optional[jnp.ndarray] = None,
) -> Tuple[Plane, jnp.ndarray]:
    """RANSAC plane + SVD refit on inliers.

    Matches the reference's 2000-iteration, 5 cm setup
    (pose_matching_planar.py:430-474) but evaluates every hypothesis in one
    batched pass. Returns (plane, inlier_mask).
    """
    n_pts = points.shape[0]
    idx = jax.random.randint(key, (num_iters, 3), 0, n_pts)
    tri = points[idx]  # (I, 3, 3)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    normals = jnp.cross(e1, e2)
    norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / jnp.maximum(norm, 1e-12)
    d = -jnp.sum(normals * tri[:, 0], axis=-1)  # (I,)
    # degenerate (collinear) samples score zero inliers
    valid = (norm[:, 0] > 1e-9)

    dist = jnp.abs(points @ normals.T + d[None, :])  # (N, I)
    inliers = (dist < threshold).sum(axis=0)
    inliers = jnp.where(valid, inliers, -1)
    best = jnp.argmax(inliers)
    n_best, d_best = normals[best], d[best]

    inlier_mask = jnp.abs(points @ n_best + d_best) < threshold
    plane = fit_plane_svd(points, weights=inlier_mask.astype(points.dtype),
                          up_hint=up_hint)
    return plane, inlier_mask


def plane_transforms(plane: Plane, dtype=jnp.float32) -> Tuple[Transform3d, Transform3d]:
    """(world→plane, plane→world) transforms with the plane's normal mapped to
    +Y and the origin at the fit centroid (reference: get_plane_transforms,
    pose_matching_planar.py:103-182 — plane space is used by the planar pose
    model so objects slide in (u, v) and yaw about the plane normal)."""
    n = plane.normal.astype(dtype)
    # build a right-handed basis (t1, n, t2) — rows of R map world→plane axes
    helper = jnp.where(jnp.abs(n[0]) < 0.9,
                       jnp.asarray([1.0, 0.0, 0.0], dtype),
                       jnp.asarray([0.0, 0.0, 1.0], dtype))
    t1 = jnp.cross(helper, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(n, t1)
    # row-vector convention: x_plane = (x_world − c) @ R with R columns = axes
    R = jnp.stack([t1, n, t2], axis=-1)  # world→plane basis (3,3)
    c = plane.centroid.astype(dtype)
    world_to_plane = Transform3d(R=R, t=-(c @ R), s=jnp.ones((), dtype))
    return world_to_plane, world_to_plane.inverse()
