"""Coordinate-convention converters.

Four conventions are in flight across the pipeline (SURVEY §7.3 item 5):

  * OpenCV / VGGT camera:   +X right, +Y down, +Z forward (into the scene)
  * COLMAP:                 same as OpenCV (world→cam extrinsic [R|t])
  * Blender world/camera:   +Z up world; camera looks down its local -Z, +Y up
  * "P3D" render frame:     +X left, +Y up, +Z forward; view transform acts on
                            ROW vectors: ``x_view = x_world @ R + T``

The artifact contract (camera.npz written by phase 4, consumed by phases
5/6/8 — reference: minimal_demo_vggt.py:160-255 and cam_utils.py:28-87) stores
a Blender-style 4x4 ``extrinsic`` (camera-to-world matrix_world). The exact
constant matrices below are convention facts, matching the reference's
``P2B``/``B2P`` (global_utils.py:819-844) and ``R_fix``
(minimal_demo_vggt.py:165-173) so reference-produced camera.npz files load
bit-identically.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# OpenCV camera axes → Blender camera axes: Blender's camera looks down -Z
# with +Y up, OpenCV looks down +Z with +Y down ⇒ flip Y and Z.
# Reference equivalent: R_fix at minimal_demo_vggt.py:165-173.
R_FIX_CV2BLENDER = np.diag([1.0, -1.0, -1.0]).astype(np.float64)

# Constant basis-change matrices between Blender world and the P3D render
# frame (convention facts; reference: global_utils.py:819-844).
_B2P_R1 = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float64)
_B2P_R2 = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, -1]], dtype=np.float64)
_B2P_T = np.array([[-1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float64)
_P2B_R1 = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float64)
_P2B_R2 = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, -1]], dtype=np.float64)
_P2B_T = np.array([[-1, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float64)


def blender_to_p3d(B: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Blender camera-to-world 4x4 → (R, T) row-vector view transform.

    ``x_view = x_world @ R + T``. Mirrors reference ``B2P``
    (global_utils.py:835-844) so reference camera.npz files are
    interchangeable with ours.
    """
    B = np.asarray(B, dtype=np.float64)
    R = _B2P_R1 @ B[:3, :3] @ _B2P_R2
    T = _B2P_T @ B[:3, 3] @ R
    return R, T


def p3d_to_blender(R: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Inverse of :func:`blender_to_p3d` (reference ``P2B``,
    global_utils.py:819-831). Returns a Blender 4x4 camera-to-world matrix."""
    R = np.asarray(R, dtype=np.float64)
    T = np.asarray(T, dtype=np.float64)
    col3 = _P2B_T @ R @ T
    B3 = _P2B_R1 @ R @ _P2B_R2
    B = np.eye(4, dtype=np.float64)
    B[:3, :3] = B3
    B[:3, 3] = col3
    return B


def opencv_extrinsic_to_blender_world(E_cv: np.ndarray) -> np.ndarray:
    """COLMAP/OpenCV world→camera extrinsic [R|t] (3x4 or 4x4) → Blender-style
    4x4 used in camera.npz.

    The reference stores `R_fix @ R_cw` and `R_fix @ t_cw` in the npz
    'extrinsic' slot (minimal_demo_vggt.py:160-186) — i.e. NOT a true
    matrix_world but the cam-from-world transform re-expressed with flipped
    Y/Z camera axes. We reproduce that exact layout for interchangeability.
    """
    E_cv = np.asarray(E_cv, dtype=np.float64)
    out = np.eye(4, dtype=np.float64)
    out[:3, :3] = R_FIX_CV2BLENDER @ E_cv[:3, :3]
    out[:3, 3] = R_FIX_CV2BLENDER @ E_cv[:3, 3]
    return out


def blender_points_reorder(points: jnp.ndarray) -> jnp.ndarray:
    """Make a P3D-frame point cloud 'Blender readable' for export:
    flip Z then swap Y/Z (reference: global_utils.py:686-688)."""
    p = points * jnp.asarray([1.0, 1.0, -1.0], dtype=points.dtype)
    return p[..., jnp.asarray([0, 2, 1])]
