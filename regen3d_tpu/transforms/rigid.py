"""Rigid / similarity transforms (pure JAX).

Replaces pytorch3d ``Transform3d`` (used by floor-plane snapping, reference:
pose_matching_planar.py:103-182) and the SVD rigid solvers inside pytorch3d's
ICP (reference: scene_optim.py:332-350).

Convention: row vectors, ``x' = x @ R * s + t`` — consistent with the camera
view transform in :mod:`regen3d_tpu.camera`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


class Transform3d(NamedTuple):
    """Similarity transform ``x' = (x @ R) * s + t`` (row-vector convention)."""

    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    s: jnp.ndarray  # scalar

    @classmethod
    def identity(cls, dtype=jnp.float32) -> "Transform3d":
        return cls(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
                   jnp.ones((), dtype=dtype))

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        return (points @ self.R) * self.s + self.t

    def compose(self, other: "Transform3d") -> "Transform3d":
        """self then other: x @ (R1 s1) + t1 → @ (R2 s2) + t2."""
        return Transform3d(
            R=self.R @ other.R,
            t=(self.t @ other.R) * other.s + other.t,
            s=self.s * other.s,
        )

    def inverse(self) -> "Transform3d":
        R_inv = self.R.T
        s_inv = 1.0 / self.s
        return Transform3d(R=R_inv, t=-(self.t @ R_inv) * s_inv, s=s_inv)

    def as_matrix(self) -> jnp.ndarray:
        """4x4 homogeneous matrix for row vectors: [x 1] @ M."""
        M = jnp.eye(4, dtype=self.R.dtype)
        M = M.at[:3, :3].set(self.R * self.s)
        M = M.at[3, :3].set(self.t)
        return M


def kabsch(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimal rotation+translation aligning src→dst (row-vector convention).

    Returns (R, t) with ``src @ R + t ≈ dst``. Weighted least squares;
    reflection-free via determinant sign correction.
    """
    R, t, _ = umeyama(src, dst, weights=weights, estimate_scale=False)
    return R, t


def umeyama(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    estimate_scale: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Similarity solve: find (R, t, s) minimizing Σ w ‖(src @ R) s + t − dst‖².

    Umeyama's closed form; jit/grad-safe (SVD from jnp.linalg).
    Used by ICP (:mod:`regen3d_tpu.ops.icp`) and PCA cloud alignment.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_src = jnp.sum(src * w[:, None], axis=0)
    mu_dst = jnp.sum(dst * w[:, None], axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst
    # Cross-covariance for the row convention: we need R s.t. src_c @ R ≈ dst_c,
    # i.e. R ≈ argmax tr(R^T src_c^T diag(w) dst_c).
    H = (src_c * w[:, None]).T @ dst_c  # (3, 3)
    U, S, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], dtype=src.dtype)).at[2, 2].set(
        jnp.sign(det) + (det == 0)
    )
    R = U @ D @ Vt
    var_src = jnp.sum(w * jnp.sum(src_c * src_c, axis=-1))
    if estimate_scale:
        s = jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_src, 1e-12)
    else:
        s = jnp.ones((), dtype=src.dtype)
    t = mu_dst - (mu_src @ R) * s
    return R, t, s
