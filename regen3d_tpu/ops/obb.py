"""Y-up oriented bounding box via 2D PCA in the ground (XZ) plane.

Replaces ``get_oriented_bounding_box_2d_up`` (reference:
pose_matching_planar.py:337-377) used for the coarse pose init: the object's
target cloud is boxed with the up axis fixed to +Y, rotation only about Y.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class OBB(NamedTuple):
    center: jnp.ndarray        # (3,)
    axes: jnp.ndarray          # (3, 3) rows = box axes in world (row-vec: world→box is (x-c)@axes.T)
    half_extents: jnp.ndarray  # (3,)

    @property
    def volume(self) -> jnp.ndarray:
        return 8.0 * jnp.prod(self.half_extents)

    def corners(self) -> jnp.ndarray:
        """(8, 3) world-space box corners."""
        signs = jnp.asarray(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            dtype=self.center.dtype,
        )
        return self.center + (signs * self.half_extents) @ self.axes


def oriented_bounding_box_2d_up(
    points: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> OBB:
    """Fit a Y-up OBB: PCA of the XZ footprint gives the yaw, Y is vertical.

    Branch-free; padded points excluded via ``mask``.
    """
    if mask is None:
        w = jnp.ones(points.shape[0], points.dtype)
    else:
        w = mask.astype(points.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu = jnp.sum(points * w[:, None], axis=0) / wsum

    xz = (points - mu)[:, jnp.asarray([0, 2])]  # (N, 2) footprint
    cov = (xz * w[:, None]).T @ xz / wsum       # (2, 2)
    _, vecs = jnp.linalg.eigh(cov)              # ascending; columns are axes
    a = vecs[:, 1]                              # major footprint axis
    # right-handed world axes: major in XZ, +Y up, minor = up × major
    ax_major = jnp.asarray([a[0], 0.0, a[1]], dtype=points.dtype)
    ax_up = jnp.asarray([0.0, 1.0, 0.0], dtype=points.dtype)
    ax_minor = jnp.cross(ax_up, ax_major)
    axes = jnp.stack([ax_major, ax_up, ax_minor], axis=0)  # (3,3) rows

    local = (points - mu) @ axes.T  # (N, 3) in box frame
    big = 1e30
    lo = jnp.min(jnp.where(w[:, None] > 0, local, big), axis=0)
    hi = jnp.max(jnp.where(w[:, None] > 0, local, -big), axis=0)
    center_local = 0.5 * (lo + hi)
    center = mu + center_local @ axes
    return OBB(center=center, axes=axes, half_extents=0.5 * (hi - lo))


def aabb(points: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
         pad: float = 0.0):
    """Axis-aligned bounds (min, max) with optional symmetric padding
    (used for the background bbox hinge loss — reference
    pose_matching_planar.py:1490-1561, `background_bbox_extents`)."""
    big = 1e30
    if mask is None:
        lo = jnp.min(points, axis=0)
        hi = jnp.max(points, axis=0)
    else:
        m = mask[:, None]
        lo = jnp.min(jnp.where(m, points, big), axis=0)
        hi = jnp.max(jnp.where(m, points, -big), axis=0)
    return lo - pad, hi + pad
