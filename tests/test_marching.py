"""Marching tetrahedra: sphere SDF → watertight mesh with correct radius."""

import numpy as np
import pytest

from regen3d_tpu.ops.marching_cubes import (
    _get_lib,
    _marching_tetrahedra_numpy,
    marching_tetrahedra,
)


def _sphere_sdf(n=32, r=0.6):
    lin = np.linspace(-1, 1, n)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    return (np.sqrt(xx**2 + yy**2 + zz**2) - r).astype(np.float32)


class TestMarchingTetrahedra:
    def test_native_builds(self):
        assert _get_lib() is not None, "C++ marching lib failed to build"

    def test_sphere_radius(self):
        sdf = _sphere_sdf(48, 0.6)
        verts, tris = marching_tetrahedra(sdf, 0.0, bounds=(-1.0, 1.0))
        assert len(verts) > 100 and len(tris) > 100
        radii = np.linalg.norm(verts, axis=1)
        np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)
        assert radii.std() < 0.02

    def test_watertight_and_oriented(self):
        """Closed surface: every edge shared by exactly 2 triangles with
        opposite direction (consistent orientation)."""
        sdf = _sphere_sdf(24, 0.5)
        verts, tris = marching_tetrahedra(sdf, 0.0)
        # drop degenerate triangles (repeated vertex ids) before the check
        ok = (tris[:, 0] != tris[:, 1]) & (tris[:, 1] != tris[:, 2]) & \
             (tris[:, 0] != tris[:, 2])
        tris = tris[ok]
        edges = {}
        for t in tris:
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edges[(a, b)] = edges.get((a, b), 0) + 1
        for (a, b), cnt in edges.items():
            assert cnt == 1, "duplicate directed edge — inconsistent winding"
            assert edges.get((b, a), 0) == 1, "boundary edge — not watertight"

    def test_normals_point_outward(self):
        sdf = _sphere_sdf(32, 0.6)
        verts, tris = marching_tetrahedra(sdf, 0.0, bounds=(-1.0, 1.0))
        tri = verts[tris]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        centers = tri.mean(1)
        align = (n * centers).sum(-1)
        frac_out = (align > 0).mean()
        assert frac_out > 0.99 or frac_out < 0.01  # consistent...
        assert frac_out > 0.99, "normals should point outward (away from center)"

    def test_numpy_fallback_matches_native(self):
        sdf = _sphere_sdf(16, 0.55)
        v1, t1 = marching_tetrahedra(sdf, 0.0)
        v2, t2 = _marching_tetrahedra_numpy(sdf, 0.0)
        assert abs(len(t1) - len(t2)) <= len(t1) * 0.02
        r1 = np.linalg.norm(v1 - v1.mean(0), axis=1).mean()
        r2 = np.linalg.norm(v2 - v2.mean(0), axis=1).mean()
        np.testing.assert_allclose(r1, r2, atol=1e-3)

    def test_empty_volume(self):
        sdf = np.ones((8, 8, 8), np.float32)
        verts, tris = marching_tetrahedra(sdf, 0.0)
        assert len(verts) == 0 and len(tris) == 0
