"""Unit tests for the geometry op pack vs brute-force references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.ops.filters import (
    dbscan_largest_cluster,
    estimate_normals,
    pca_align,
    quantile_filter,
)
from regen3d_tpu.ops.icp import iterative_closest_point
from regen3d_tpu.ops.knn import chamfer_distance, chamfer_loss, knn_points, nn_distances
from regen3d_tpu.ops.obb import aabb, oriented_bounding_box_2d_up
from regen3d_tpu.ops.plane import fit_plane_ransac, fit_plane_svd, plane_transforms
from regen3d_tpu.ops.point_mesh import (
    point_mesh_face_distance,
    point_triangle_distance,
    points_to_mesh_distance,
)
from regen3d_tpu.ops.sampling import face_areas, sample_points_from_meshes
from regen3d_tpu.transforms.rotations import so3_exp


class TestNN:
    def test_nn_vs_bruteforce(self, rng):
        x = rng.normal(size=(100, 3)).astype(np.float32)
        y = rng.normal(size=(237, 3)).astype(np.float32)
        d, i = nn_distances(jnp.asarray(x), jnp.asarray(y), chunk=64)
        full = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d), full.min(1), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), full.argmin(1))

    def test_nn_with_masks(self, rng):
        x = rng.normal(size=(50, 3)).astype(np.float32)
        y = rng.normal(size=(80, 3)).astype(np.float32)
        ym = np.zeros(80, bool)
        ym[:40] = True
        d, i = nn_distances(jnp.asarray(x), jnp.asarray(y), None, jnp.asarray(ym), 32)
        full = ((x[:, None, :] - y[None, :40, :]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d), full.min(1), atol=1e-4)
        assert np.all(np.asarray(i) < 40)

    def test_knn_vs_bruteforce(self, rng):
        x = rng.normal(size=(60, 3)).astype(np.float32)
        y = rng.normal(size=(150, 3)).astype(np.float32)
        d, i = knn_points(jnp.asarray(x), jnp.asarray(y), 5, chunk=64)
        full = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
        ref_i = np.argsort(full, axis=1)[:, :5]
        ref_d = np.take_along_axis(full, ref_i, axis=1)
        np.testing.assert_allclose(np.asarray(d), ref_d, atol=1e-4)

    def test_chamfer_symmetric_zero(self, rng):
        x = rng.normal(size=(64, 3)).astype(np.float32)
        loss = chamfer_loss(jnp.asarray(x), jnp.asarray(x))
        assert float(loss) == pytest.approx(0.0, abs=1e-6)

    def test_chamfer_gradient_matches_finite_difference(self, rng):
        x = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))

        f = lambda x_: chamfer_loss(x_, y, chunk=16)
        g = jax.grad(f)(x)
        eps = 1e-3
        for probe in [(0, 0), (7, 2), (19, 1)]:
            dx = np.zeros((20, 3), np.float32)
            dx[probe] = eps
            fd = (float(f(x + dx)) - float(f(x - dx))) / (2 * eps)
            assert float(g[probe]) == pytest.approx(fd, abs=2e-2), probe

    def test_chamfer_grad_flows_to_targets(self, rng):
        x = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        gy = jax.grad(lambda y_: chamfer_loss(x, y_, chunk=8))(y)
        assert np.any(np.abs(np.asarray(gy)) > 1e-6)


class TestPointMesh:
    def test_point_above_triangle_interior(self):
        a, b, c = jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 1, 0])
        p = jnp.asarray([0.25, 0.25, 0.7])
        d = point_triangle_distance(p, a, b, c)
        assert float(d) == pytest.approx(0.49, abs=1e-6)

    def test_point_near_vertex_edge(self):
        a, b, c = jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 1, 0])
        # beyond vertex A
        d = point_triangle_distance(jnp.asarray([-1.0, -1.0, 0.0]), a, b, c)
        assert float(d) == pytest.approx(2.0, abs=1e-6)
        # off edge AB
        d = point_triangle_distance(jnp.asarray([0.5, -2.0, 0.0]), a, b, c)
        assert float(d) == pytest.approx(4.0, abs=1e-6)
        # off edge BC
        d = point_triangle_distance(jnp.asarray([1.0, 1.0, 0.0]), a, b, c)
        assert float(d) == pytest.approx(0.5, abs=1e-6)

    def test_vs_dense_sampling(self, rng):
        """Distance to a triangle ≈ min distance to dense surface samples."""
        a = jnp.asarray(rng.normal(size=3).astype(np.float32))
        b = jnp.asarray(rng.normal(size=3).astype(np.float32))
        c = jnp.asarray(rng.normal(size=3).astype(np.float32))
        # dense barycentric grid
        u = np.linspace(0, 1, 200)
        uu, vv = np.meshgrid(u, u)
        keep = uu + vv <= 1.0
        w = np.stack([1 - uu[keep] - vv[keep], uu[keep], vv[keep]], -1).astype(np.float32)
        surf = w @ np.stack([np.asarray(a), np.asarray(b), np.asarray(c)])
        for _ in range(5):
            p = rng.normal(size=3).astype(np.float32) * 2
            d = float(point_triangle_distance(jnp.asarray(p), a, b, c))
            ref = ((surf - p) ** 2).sum(-1).min()
            assert d == pytest.approx(ref, abs=1e-3)

    def test_points_to_mesh_and_symmetric_loss(self, rng):
        verts = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=jnp.float32)
        faces = jnp.asarray([[0, 1, 2], [1, 3, 2]], dtype=jnp.int32)
        pts = jnp.asarray([[0.5, 0.5, 0.3], [0.1, 0.1, -0.2]], dtype=jnp.float32)
        d, idx = points_to_mesh_distance(pts, verts, faces, chunk=2)
        np.testing.assert_allclose(np.asarray(d), [0.09, 0.04], atol=1e-5)
        loss = point_mesh_face_distance(verts, faces, pts, chunk=2)
        assert float(loss) > 0

    def test_loss_differentiable(self, rng):
        verts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        faces = jnp.asarray(rng.integers(0, 10, size=(6, 3)), dtype=jnp.int32)
        pts = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
        g = jax.grad(lambda v: point_mesh_face_distance(v, faces, pts))(verts)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.abs(np.asarray(g)) > 0)


class TestSampling:
    def test_samples_on_surface(self, rng):
        verts = jnp.asarray([[0.0, 0, 0], [2, 0, 0], [0, 2, 0]], dtype=jnp.float32)
        faces = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
        (pts,) = sample_points_from_meshes(verts, faces, 512, jax.random.PRNGKey(0))
        p = np.asarray(pts)
        assert np.allclose(p[:, 2], 0, atol=1e-6)
        assert np.all(p[:, 0] >= -1e-6) and np.all(p[:, 1] >= -1e-6)
        assert np.all(p[:, 0] + p[:, 1] <= 2 + 1e-5)

    def test_area_weighting(self):
        # two faces, one 100x larger — samples should concentrate there
        verts = jnp.asarray(
            [[0, 0, 0], [10, 0, 0], [0, 10, 0], [100, 100, 0], [101, 100, 0], [100, 101, 0]],
            dtype=jnp.float32)
        faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], dtype=jnp.int32)
        areas = np.asarray(face_areas(verts, faces))
        assert areas[0] == pytest.approx(50.0) and areas[1] == pytest.approx(0.5)
        (pts,) = sample_points_from_meshes(verts, faces, 1000, jax.random.PRNGKey(1))
        frac_big = float(np.mean(np.asarray(pts)[:, 0] < 50))
        assert frac_big > 0.95

    def test_normals_returned(self):
        verts = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=jnp.float32)
        faces = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
        pts, n = sample_points_from_meshes(verts, faces, 16, jax.random.PRNGKey(2),
                                           return_normals=True)
        np.testing.assert_allclose(np.abs(np.asarray(n)[:, 2]), 1.0, atol=1e-6)


class TestICP:
    def test_recovers_rigid_transform(self, rng):
        src = rng.normal(size=(500, 3)).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray([0.1, 0.3, -0.2])))
        dst = src @ R + np.asarray([0.5, -0.3, 0.2], np.float32)
        res = iterative_closest_point(jnp.asarray(src), jnp.asarray(dst),
                                      max_iterations=50, chunk=128)
        np.testing.assert_allclose(np.asarray(res.aligned), dst, atol=1e-3)
        assert float(res.rmse) < 1e-3

    def test_estimate_scale(self, rng):
        src = rng.normal(size=(300, 3)).astype(np.float32)
        dst = src * 1.7 + np.asarray([0.1, 0.2, 0.3], np.float32)
        res = iterative_closest_point(jnp.asarray(src), jnp.asarray(dst),
                                      max_iterations=50, estimate_scale=True, chunk=128)
        assert float(res.s) == pytest.approx(1.7, abs=1e-3)


class TestPlane:
    def test_svd_plane(self, rng):
        n_true = np.asarray([0.0, 1.0, 0.0])
        pts = rng.normal(size=(400, 3)).astype(np.float32)
        pts[:, 1] = 2.0  # plane y=2
        plane = fit_plane_svd(jnp.asarray(pts), up_hint=jnp.asarray([0.0, 1, 0]))
        np.testing.assert_allclose(np.abs(np.asarray(plane.normal)), n_true, atol=1e-4)
        assert float(plane.offset) == pytest.approx(-2.0, abs=1e-4)

    def test_ransac_with_outliers(self, rng):
        pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
        pts[:, 1] = 0.0
        outliers = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32) + np.asarray([0, 3, 0])
        all_pts = np.concatenate([pts, outliers]).astype(np.float32)
        plane, inl = fit_plane_ransac(jnp.asarray(all_pts), jax.random.PRNGKey(0),
                                      num_iters=500, threshold=0.05,
                                      up_hint=jnp.asarray([0.0, 1, 0]))
        np.testing.assert_allclose(np.asarray(plane.normal), [0, 1, 0], atol=0.02)
        assert int(np.asarray(inl).sum()) >= 490

    def test_plane_transforms_map_normal_to_y(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        pts = pts - pts @ np.asarray([[0.36], [0.48], [0.8]]) @ np.asarray([[0.36, 0.48, 0.8]])
        pts = pts + np.asarray([1.0, 2.0, 3.0])
        plane = fit_plane_svd(jnp.asarray(pts.astype(np.float32)))
        w2p, p2w = plane_transforms(plane)
        in_plane = w2p.apply(jnp.asarray(pts.astype(np.float32)))
        np.testing.assert_allclose(np.asarray(in_plane)[:, 1], 0.0, atol=1e-3)
        back = p2w.apply(in_plane)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)


class TestOBB:
    def test_axis_aligned_box(self, rng):
        pts = rng.uniform(-1, 1, size=(1000, 3)).astype(np.float32) * np.asarray([3, 1, 0.5])
        box = oriented_bounding_box_2d_up(jnp.asarray(pts))
        he = np.sort(np.asarray(box.half_extents))
        np.testing.assert_allclose(he, [0.5, 1.0, 3.0], atol=0.05)
        # up axis preserved
        np.testing.assert_allclose(np.abs(np.asarray(box.axes[1])), [0, 1, 0], atol=1e-5)

    def test_rotated_footprint(self, rng):
        pts = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32) * np.asarray([4, 1, 0.25])
        yaw = 0.6
        R = np.asarray([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]])
        box = oriented_bounding_box_2d_up(jnp.asarray((pts @ R).astype(np.float32)))
        he = np.sort(np.asarray(box.half_extents))
        np.testing.assert_allclose(he, [0.25, 1.0, 4.0], atol=0.1)

    def test_aabb_padding(self, rng):
        pts = jnp.asarray(rng.uniform(0, 1, size=(100, 3)).astype(np.float32))
        lo, hi = aabb(pts, pad=-0.02)
        assert np.all(np.asarray(lo) > -0.03)


class TestFilters:
    def test_quantile(self, rng):
        pts = rng.normal(size=(1000, 3)).astype(np.float32)
        pts[0] = [100, 0, 0]
        keep = quantile_filter(jnp.asarray(pts), q=0.02)
        assert not bool(keep[0])
        assert 0.85 < float(jnp.mean(keep.astype(jnp.float32))) <= 1.0

    def test_dbscan_two_clusters(self, rng):
        a = rng.normal(size=(300, 3)).astype(np.float32) * 0.05
        b = rng.normal(size=(100, 3)).astype(np.float32) * 0.05 + 10
        pts = np.concatenate([a, b]).astype(np.float32)
        keep = dbscan_largest_cluster(jnp.asarray(pts), eps=0.5, min_points=5, chunk=64)
        k = np.asarray(keep)
        assert k[:300].all() and not k[300:].any()

    def test_normals_of_plane(self, rng):
        pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
        pts[:, 2] = 0.0
        n = estimate_normals(jnp.asarray(pts), k=8, viewpoint=jnp.asarray([0.0, 0, 5]))
        np.testing.assert_allclose(np.asarray(n)[:, 2], 1.0, atol=1e-3)

    def test_pca_align(self, rng):
        src = rng.normal(size=(400, 3)).astype(np.float32) * np.asarray([5, 2, 0.5])
        R_true = np.asarray(so3_exp(jnp.asarray([0.2, 0.1, -0.3])), np.float32)
        dst = src @ R_true + np.asarray([1, 2, 3], np.float32)
        R, t = pca_align(jnp.asarray(src), jnp.asarray(dst))
        aligned = src @ np.asarray(R) + np.asarray(t)
        # PCA alignment has sign ambiguities; check alignment up to small error
        err = np.abs(aligned - dst).mean()
        assert err < 0.5


class TestPointMeshTopK:
    @staticmethod
    def _sphere_mesh():
        """A realistic small-face mesh (the regime the pruning targets)."""
        from regen3d_tpu.ops.marching_cubes import marching_tetrahedra
        lin = np.linspace(-1, 1, 16)
        zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
        sdf = (np.sqrt(xx**2 + yy**2 + zz**2) - 0.6).astype(np.float32)
        v, f = marching_tetrahedra(sdf, 0.0, bounds=(-1, 1))
        return jnp.asarray(v), jnp.asarray(f)

    def test_matches_exact_on_small_face_mesh(self, rng):
        from regen3d_tpu.ops.point_mesh import (
            point_mesh_face_distance, point_mesh_face_distance_topk)
        verts, faces = self._sphere_mesh()
        pts = jnp.asarray((rng.normal(size=(80, 3)) * 0.5).astype(np.float32))
        exact = float(point_mesh_face_distance(verts, faces, pts, chunk=64))
        fast = float(point_mesh_face_distance_topk(verts, faces, pts, k=16,
                                                   chunk=128))
        assert fast == pytest.approx(exact, rel=1e-3)

    def test_gradients_flow(self, rng):
        from regen3d_tpu.ops.point_mesh import point_mesh_face_distance_topk
        verts = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
        faces = jnp.asarray(rng.integers(0, 30, size=(20, 3)), dtype=jnp.int32)
        pts = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
        g = jax.grad(lambda v: point_mesh_face_distance_topk(v, faces, pts,
                                                             k=8))(verts)
        arr = np.asarray(g)
        assert np.all(np.isfinite(arr)) and np.abs(arr).max() > 0

    def test_with_masks(self, rng):
        from regen3d_tpu.ops.point_mesh import (
            point_mesh_face_distance, point_mesh_face_distance_topk)
        verts, faces = self._sphere_mesh()
        pts = jnp.asarray((rng.normal(size=(50, 3)) * 0.5).astype(np.float32))
        fm = jnp.asarray(rng.random(faces.shape[0]) > 0.25)
        pm = jnp.asarray(rng.random(50) > 0.25)
        exact = float(point_mesh_face_distance(verts, faces, pts, pm, fm, 64))
        fast = float(point_mesh_face_distance_topk(verts, faces, pts, pm, fm,
                                                   k=24, chunk=128))
        assert fast == pytest.approx(exact, rel=1e-3)


class TestPointMeshFast:
    def test_value_and_grad_match_exact(self, rng):
        from regen3d_tpu.ops.point_mesh import (
            point_mesh_face_distance, point_mesh_face_distance_fast)
        verts = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
        faces = jnp.asarray(rng.integers(0, 30, size=(20, 3)), dtype=jnp.int32)
        pts = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
        exact = float(point_mesh_face_distance(verts, faces, pts, chunk=16))
        fast = float(point_mesh_face_distance_fast(verts, faces, pts,
                                                   None, None, 16))
        assert fast == pytest.approx(exact, rel=1e-5)
        g_ex = jax.grad(lambda v, p: point_mesh_face_distance(
            v, faces, p, chunk=16), argnums=(0, 1))(verts, pts)
        g_fa = jax.grad(lambda v, p: point_mesh_face_distance_fast(
            v, faces, p, None, None, 16), argnums=(0, 1))(verts, pts)
        np.testing.assert_allclose(np.asarray(g_fa[0]), np.asarray(g_ex[0]),
                                   atol=1e-5, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(g_fa[1]), np.asarray(g_ex[1]),
                                   atol=1e-5, rtol=1e-3)

    def test_with_masks(self, rng):
        from regen3d_tpu.ops.point_mesh import (
            point_mesh_face_distance, point_mesh_face_distance_fast)
        verts = jnp.asarray(rng.normal(size=(24, 3)).astype(np.float32))
        faces = jnp.asarray(rng.integers(0, 24, size=(16, 3)), dtype=jnp.int32)
        pts = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
        fm = jnp.asarray(rng.random(16) > 0.3)
        pm = jnp.asarray(rng.random(32) > 0.3)
        exact = float(point_mesh_face_distance(verts, faces, pts, pm, fm, 8))
        fast = float(point_mesh_face_distance_fast(verts, faces, pts, pm, fm, 8))
        assert fast == pytest.approx(exact, rel=1e-5)
        g_ex = jax.grad(lambda v: point_mesh_face_distance(
            v, faces, pts, pm, fm, 8))(verts)
        g_fa = jax.grad(lambda v: point_mesh_face_distance_fast(
            v, faces, pts, pm, fm, 8))(verts)
        np.testing.assert_allclose(np.asarray(g_fa), np.asarray(g_ex),
                                   atol=1e-5, rtol=1e-3)
