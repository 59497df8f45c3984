"""Host-side mesh hygiene: clean/weld/decimate/winding + floater removal.

These functions sit on the per-object phase-3 host path (reference mesh
hygiene: clean_and_validate_trimesh + FloaterRemover/FaceReducer,
2d_to_3d_models/run.py:24-64); the vectorized rewrites (1D-hash unique,
scipy connected components, area-seeded bisection) must preserve behavior.
"""

import numpy as np
import pytest

from regen3d_tpu.utils.meshproc import (
    clean_mesh,
    decimate_vertex_clustering,
    fix_winding_outward,
    vertex_normals,
    weld_vertices,
)


def _icosphere(subdiv: int = 3, radius: float = 0.7):
    """Refined icosahedron — a closed genus-0 mesh at controllable scale."""
    t = (1 + np.sqrt(5)) / 2
    v = np.asarray([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                    [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                    [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                   np.float64)
    f = np.asarray([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                    [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                    [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                    [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                   np.int64)
    for _ in range(subdiv):
        mid = {}
        nv = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                mid[key] = len(nv)
                nv.append((nv[a] + nv[b]) / 2)
            return mid[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v, f = np.asarray(nv), np.asarray(nf, np.int64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * radius
    return v.astype(np.float32), f.astype(np.int32)


class TestCleanMesh:
    def test_drops_nan_and_degenerate(self):
        v, f = _icosphere(1)
        v = np.concatenate([v, [[np.nan, 0, 0], [0, 0, 0]]]).astype(np.float32)
        bad = np.asarray([[len(v) - 2, 0, 1],      # references NaN vertex
                          [2, 2, 3],               # repeated index
                          [4, 5, 4]], np.int32)    # repeated index
        f2 = np.concatenate([f, bad])
        cv, cf = clean_mesh(v, f2)
        assert len(cf) == len(f)
        assert np.all(np.isfinite(cv))
        # unreferenced vertices dropped
        assert len(cv) == len(np.unique(cf))

    def test_zero_area_faces_dropped(self):
        v = np.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0], [0, 1, 0]],
                       np.float32)
        f = np.asarray([[0, 1, 2],    # collinear → zero area
                        [0, 1, 3]], np.int32)
        _, cf = clean_mesh(v, f)
        assert len(cf) == 1


class TestWeld:
    def test_merges_duplicates(self):
        v, f = _icosphere(1)
        # duplicate every vertex, faces point at the copies
        v2 = np.concatenate([v, v + 1e-9])
        f2 = f + len(v)
        wv, wf = weld_vertices(v2, f2, tol=1e-6)
        assert len(wv) == len(v)
        assert wf.max() < len(wv)
        # surface unchanged
        r = np.linalg.norm(wv, axis=1)
        np.testing.assert_allclose(r, 0.7, atol=1e-3)


class TestDecimate:
    @pytest.mark.parametrize("target", [5000, 512, 128])
    def test_hits_target_band(self, target):
        v, f = _icosphere(4)           # 20480 faces
        dv, df = decimate_vertex_clustering(v, f, target)
        assert len(df) <= target
        assert len(df) > target // 4, (target, len(df))
        # geometry preserved: decimated vertices stay near the sphere
        r = np.linalg.norm(dv, axis=1)
        assert abs(float(r.mean()) - 0.7) < 0.02
        assert float(r.std()) < 0.02

    def test_noop_below_target(self):
        v, f = _icosphere(1)
        dv, df = decimate_vertex_clustering(v, f, 10_000)
        assert len(df) == len(f)
        np.testing.assert_array_equal(dv, v)

    def test_valid_topology(self):
        v, f = _icosphere(3)
        dv, df = decimate_vertex_clustering(v, f, 300)
        assert df.min() >= 0 and df.max() < len(dv)
        # no degenerate faces survive
        assert np.all(df[:, 0] != df[:, 1])
        assert np.all(df[:, 1] != df[:, 2])
        assert np.all(df[:, 0] != df[:, 2])


class TestLargestComponent:
    def test_floater_removed(self):
        from regen3d_tpu.pipeline.phase3_assets import _largest_component

        v1, f1 = _icosphere(3)                     # big sphere
        v2, f2 = _icosphere(1, radius=0.05)        # small floater
        v = np.concatenate([v1, v2 + 2.0])
        f = np.concatenate([f1, f2 + len(v1)])
        kept = _largest_component(v, f)
        assert len(kept) == len(f1)
        assert kept.max() < len(v1)

    def test_single_component_unchanged(self):
        from regen3d_tpu.pipeline.phase3_assets import _largest_component

        v, f = _icosphere(2)
        kept = _largest_component(v, f)
        assert len(kept) == len(f)


class TestWindingAndNormals:
    def test_winding_flip(self):
        v, f = _icosphere(2)
        flipped = f[:, [0, 2, 1]]
        fixed = fix_winding_outward(v, flipped)
        # outward again: normals point away from the centroid
        tri = v[fixed]
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        out = ((fn * tri.mean(1)).sum(1) > 0).mean()
        assert out > 0.99

    def test_vertex_normals_unit_and_radial(self):
        v, f = _icosphere(3)
        n = vertex_normals(v, f)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
        # sphere normals ≈ radial directions
        r = v / np.linalg.norm(v, axis=1, keepdims=True)
        assert float((n * r).sum(1).mean()) > 0.99
