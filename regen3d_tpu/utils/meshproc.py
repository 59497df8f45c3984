"""Host-side mesh cleanup + decimation (numpy).

Covers the reference's mesh hygiene: NaN-vertex repair + degenerate-face
removal (clean_mesh, diff_utils.py:334-404; clean_and_validate_trimesh,
2d_to_3d_models/run.py:24-64) and the FaceReducer/remesh decimation knobs
(config.yaml:172-173) via vertex-clustering decimation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def clean_mesh(verts: np.ndarray, faces: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Drop non-finite vertices (remapping faces), degenerate and
    out-of-range faces, and unreferenced vertices."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    finite = np.all(np.isfinite(verts), axis=1)
    remap = np.full(len(verts), -1, np.int64)
    remap[finite] = np.arange(finite.sum())
    verts = verts[finite]
    faces = remap[faces]
    ok = np.all(faces >= 0, axis=1)
    f = faces[ok]
    ok2 = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    f = f[ok2]
    # drop zero-area faces
    tri = verts[f]
    area2 = np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]),
                           axis=1)
    f = f[area2 > 1e-12]
    # drop unreferenced vertices
    used = np.zeros(len(verts), bool)
    used[f.reshape(-1)] = True
    remap2 = np.full(len(verts), -1, np.int64)
    remap2[used] = np.arange(used.sum())
    return verts[used], remap2[f].astype(np.int32)


def weld_vertices(verts: np.ndarray, faces: np.ndarray, tol: float = 1e-6
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Merge vertices closer than tol (grid hash)."""
    key = np.round(verts / tol).astype(np.int64)
    _, first, inverse = np.unique(key, axis=0, return_index=True,
                                  return_inverse=True)
    return verts[first], inverse[faces].astype(np.int32)


def decimate_vertex_clustering(
    verts: np.ndarray, faces: np.ndarray, target_faces: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Decimate by snapping vertices to a uniform grid sized to hit roughly
    ``target_faces`` (bisection on cell size), then cleaning.

    A TPU-friendly stand-in for quadric decimation: O(V), deterministic,
    robust on the noisy marching-tetrahedra outputs it consumes.
    """
    if len(faces) <= target_faces:
        return verts.astype(np.float32), faces.astype(np.int32)
    lo_v = verts.min(0)
    extent = float(max(verts.max(0) - lo_v))
    lo, hi = extent / 1024.0, extent
    best = (verts, faces)
    for _ in range(20):
        cell = (lo + hi) / 2.0
        key = np.floor((verts - lo_v) / max(cell, 1e-12)).astype(np.int64)
        uniq, inverse = np.unique(key, axis=0, return_inverse=True)
        # cluster centroid positions
        pos = np.zeros((len(uniq), 3), np.float64)
        cnt = np.zeros(len(uniq), np.int64)
        np.add.at(pos, inverse, verts)
        np.add.at(cnt, inverse, 1)
        pos = (pos / cnt[:, None]).astype(np.float32)
        f = inverse[faces]
        ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        f = f[ok]
        if len(f) > target_faces:
            lo = cell
        else:
            best = (pos, f.astype(np.int32))
            hi = cell
    v, f = clean_mesh(*best)
    return v, f


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals."""
    tri = verts[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = np.zeros_like(verts)
    for k in range(3):
        np.add.at(n, faces[:, k], fn)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.maximum(norm, 1e-12)


def fix_winding_outward(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Heuristic global winding fix: if most face normals point toward the
    centroid, flip all faces (trimesh fix_normals analog for closed-ish
    meshes)."""
    tri = verts[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    to_center = tri.mean(1) - verts.mean(0)
    frac_out = ((fn * to_center).sum(1) > 0).mean()
    if frac_out < 0.5:
        return faces[:, [0, 2, 1]]
    return faces
