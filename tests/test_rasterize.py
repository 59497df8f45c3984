"""Rasterizer tests: coverage correctness, gradients, shading, splatting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.camera import Camera
from regen3d_tpu.ops.rasterize import (
    interpolate_attributes,
    phong_shade,
    rasterize_hard,
    render_points_soft,
    soft_silhouette,
)

H, W = 64, 64


def _cam():
    return Camera(
        R=jnp.eye(3), T=jnp.zeros(3),
        focal=jnp.asarray([64.0, 64.0]),
        principal=jnp.asarray([W / 2.0, H / 2.0]),
        image_size=(H, W),
    )


def _square_mesh(center=(0.0, 0.0, 2.0), half=0.5):
    """Camera-facing square at given view-space position."""
    cx, cy, cz = center
    verts = jnp.asarray([
        [cx - half, cy - half, cz],
        [cx + half, cy - half, cz],
        [cx + half, cy + half, cz],
        [cx - half, cy + half, cz],
    ], dtype=jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    return verts, faces


class TestSoftSilhouette:
    def test_centered_square_coverage(self):
        cam = _cam()
        verts, faces = _square_mesh()
        vs = cam.view_to_screen(verts)
        alpha = soft_silhouette(vs, faces, (H, W), sigma=1e-5, chunk=2)
        a = np.asarray(alpha)
        # square of side 1.0 at depth 2 with f=64 → 32px wide, centered.
        # (probe off the square's triangulation diagonal: exactly on a shared
        # edge SoftRas yields 1−(1−0.5)² = 0.75 by construction)
        assert a[32, 20] > 0.99
        assert a[20, 32] > 0.99
        assert a[2, 2] < 0.01
        # coverage fraction ≈ (32*32)/(64*64) = 0.25
        assert np.mean(a) == pytest.approx(0.25, abs=0.03)

    def test_behind_camera_culled(self):
        cam = _cam()
        verts, faces = _square_mesh(center=(0, 0, -2.0))
        vs = cam.view_to_screen(verts)
        alpha = soft_silhouette(vs, faces, (H, W), sigma=1e-5, chunk=2)
        assert float(jnp.max(alpha)) < 1e-3

    def test_translation_gradient_direction(self):
        """Moving the square right should increase coverage on the right."""
        cam = _cam()
        verts, faces = _square_mesh()
        target = np.zeros((H, W), np.float32)
        target[:, 32:] = 1.0  # want mass on the right half

        def loss(dx):
            v = verts + jnp.asarray([dx, 0.0, 0.0]) * jnp.asarray([1.0, 0, 0])
            vs = cam.view_to_screen(v)
            a = soft_silhouette(vs, faces, (H, W), sigma=1e-4, chunk=2)
            return jnp.mean((a - target) ** 2)

        g = jax.grad(loss)(jnp.asarray(0.0))
        # P3D view frame (+X left, u = cx − fx·x/z; CLAUDE.md conventions):
        # increasing world dx moves the square screen-LEFT, away from the
        # right-half target ⇒ the loss rises, so the gradient is positive
        assert float(g) > 0

    def test_gradient_finite_and_nonzero(self):
        cam = _cam()
        verts, faces = _square_mesh()

        def loss(v):
            vs = cam.view_to_screen(v)
            return jnp.mean(soft_silhouette(vs, faces, (H, W), sigma=1e-4, chunk=2))

        g = jax.grad(loss)(verts)
        arr = np.asarray(g)
        assert np.all(np.isfinite(arr))
        assert np.abs(arr).max() > 1e-6

    def test_sigma_controls_edge_softness(self):
        cam = _cam()
        verts, faces = _square_mesh()
        vs = cam.view_to_screen(verts)
        sharp = soft_silhouette(vs, faces, (H, W), sigma=1e-7, chunk=2)
        soft = soft_silhouette(vs, faces, (H, W), sigma=1e-3, chunk=2)
        # soft version has more in-between values
        mid = lambda a: float(jnp.mean((a > 0.05) & (a < 0.95)))
        assert mid(soft) > mid(sharp)


class TestHardRasterize:
    def test_depth_ordering(self):
        cam = _cam()
        # near square occludes far square
        v1, f1 = _square_mesh(center=(0, 0, 2.0), half=0.3)
        v2, f2 = _square_mesh(center=(0, 0, 4.0), half=1.2)
        verts = jnp.concatenate([v1, v2])
        faces = jnp.concatenate([f1, f2 + 4])
        frag = rasterize_hard(cam.view_to_screen(verts), faces, (H, W), chunk=2)
        fid = np.asarray(frag.face_idx)
        # near square spans px [22.4, 41.6]; far square spans [12.8, 51.2]
        assert fid[32, 32] in (0, 1)      # near mesh wins at center
        assert fid[16, 16] in (2, 3)      # far mesh visible outside near one
        d = np.asarray(frag.depth)
        assert d[32, 32] == pytest.approx(2.0, abs=1e-3)
        assert d[16, 16] == pytest.approx(4.0, abs=1e-3)
        assert np.isinf(d[0, 0])

    def test_barycentric_interpolation(self):
        cam = _cam()
        verts, faces = _square_mesh()
        frag = rasterize_hard(cam.view_to_screen(verts), faces, (H, W), chunk=2)
        # interpolate x-coordinate: at screen center it should be ≈ 0
        attr = interpolate_attributes(frag, faces, verts)
        assert float(attr[32, 32, 0]) == pytest.approx(0.0, abs=0.05)
        assert float(attr[32, 32, 2]) == pytest.approx(2.0, abs=0.01)

    def test_phong_shading_runs(self):
        cam = _cam()
        verts, faces = _square_mesh()
        frag = rasterize_hard(cam.view_to_screen(verts), faces, (H, W), chunk=2)
        normals = jnp.tile(jnp.asarray([[0.0, 0, -1]]), (4, 1))
        colors = jnp.tile(jnp.asarray([[0.8, 0.2, 0.2]]), (4, 1))
        img = phong_shade(frag, faces, verts, normals, colors,
                          light_pos=jnp.asarray([0.0, 2, 0]),
                          camera_pos=cam.center)
        arr = np.asarray(img)
        assert arr.shape == (H, W, 3)
        assert np.all((arr >= 0) & (arr <= 1))
        assert arr[32, 32, 0] > arr[32, 32, 1]          # red-ish object
        np.testing.assert_allclose(arr[0, 0], 1.0)      # white background


class TestPointSplat:
    def test_points_render(self):
        cam = _cam()
        pts = jnp.asarray([[0.0, 0.0, 2.0], [0.4, 0.0, 3.0]], dtype=jnp.float32)
        ps = cam.view_to_screen(pts)
        colors = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
        rgb, alpha = render_points_soft(ps, (H, W), radius_px=3.0, colors=colors, chunk=2)
        a = np.asarray(alpha)
        assert a[32, 32] > 0.5
        np.testing.assert_allclose(np.asarray(rgb)[32, 32], [1, 0, 0], atol=1e-5)
        assert a[0, 0] == pytest.approx(0.0, abs=1e-6)


class TestEdgeRasterDegenerateGradients:
    def test_degenerate_faces_keep_gradients_finite(self):
        """Zero-length projected edges / zero-area faces must not poison the
        backward pass (regression: plain jnp.linalg.norm has a NaN gradient
        at 0, and a max() clamp does not stop the chain rule)."""
        import jax
        from regen3d_tpu.ops.rasterize import soft_silhouette_edge

        v = jnp.asarray([[10.0, 10.0, 2.0], [40.0, 12.0, 2.0],
                         [25.0, 40.0, 2.0], [30.0, 30.0, 2.0]])
        f = jnp.asarray([[0, 1, 2],      # valid
                         [3, 3, 3],      # fully degenerate (point)
                         [0, 1, 1]],     # zero-length edge
                        jnp.int32)

        def loss(v):
            a = soft_silhouette_edge(v, f, (64, 64), sigma=1e-4,
                                     tile=32, faces_per_tile=8)
            return jnp.sum(a)

        val = loss(v)
        g = jax.grad(loss)(v)
        assert bool(jnp.isfinite(val))
        assert bool(jnp.all(jnp.isfinite(g))), np.asarray(g)
        # the degenerate faces must not darken coverage: alpha only where
        # the one valid triangle lives
        a = np.asarray(soft_silhouette_edge(v, f, (64, 64), sigma=1e-4,
                                            tile=32, faces_per_tile=8))
        assert a[5, 5] < 0.05, "degenerate face leaked coverage"
        assert a.max() > 0.5, "valid face lost"
