import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.camera import Camera, camera_from_npz, save_camera_npz


def _simple_camera(H=256, W=320, f=200.0):
    """Identity pose: view == world (+X left, +Y up, +Z forward)."""
    return Camera(
        R=jnp.eye(3), T=jnp.zeros(3),
        focal=jnp.asarray([f, f]),
        principal=jnp.asarray([W / 2.0, H / 2.0]),
        image_size=(H, W),
    )


class TestProjection:
    def test_optical_axis_hits_center(self):
        cam = _simple_camera()
        uv, z = cam.project(jnp.asarray([0.0, 0.0, 2.0]))
        np.testing.assert_allclose(np.asarray(uv), [160.0, 128.0], atol=1e-5)
        assert float(z) == pytest.approx(2.0)

    def test_view_plus_x_goes_screen_left(self):
        # P3D view frame (+X left): +x lands at u < cx
        # (pytorch3d transform_points_screen semantics, cam_utils.py:28-87)
        cam = _simple_camera()
        uv, _ = cam.project(jnp.asarray([0.5, 0.0, 2.0]))
        assert float(uv[0]) < 160.0

    def test_view_plus_y_goes_screen_up(self):
        # P3D view frame (+Y up): +y lands at v < cy
        cam = _simple_camera()
        uv, _ = cam.project(jnp.asarray([0.0, 0.5, 2.0]))
        assert float(uv[1]) < 128.0

    def test_unproject_roundtrip(self, rng):
        cam = _simple_camera()
        pts = np.stack([
            rng.uniform(-1, 1, 64), rng.uniform(-1, 1, 64), rng.uniform(1, 5, 64)
        ], axis=-1)
        uv, z = cam.project(jnp.asarray(pts))
        back = cam.unproject(uv, z)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)

    def test_world_to_view_roundtrip_with_pose(self, rng):
        from regen3d_tpu.transforms.rotations import random_rotation
        import jax
        cam = _simple_camera()._replace(
            R=random_rotation(jax.random.PRNGKey(1)), T=jnp.asarray([0.4, -0.2, 3.0]))
        pts = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(cam.view_to_world(cam.world_to_view(pts))),
            np.asarray(pts), atol=1e-4)

    def test_camera_center(self):
        import jax
        from regen3d_tpu.transforms.rotations import random_rotation
        cam = _simple_camera()._replace(
            R=random_rotation(jax.random.PRNGKey(2)), T=jnp.asarray([1.0, 2.0, 3.0]))
        c = cam.center
        v = cam.world_to_view(c)
        np.testing.assert_allclose(np.asarray(v), np.zeros(3), atol=1e-5)

    def test_rescale_preserves_vertical_fov(self):
        cam = _simple_camera(H=256, W=320, f=200.0)
        cam2 = cam.rescaled(512, 640)
        # same view ray must land at proportionally scaled pixel
        p = jnp.asarray([0.3, -0.2, 2.0])
        uv1, _ = cam.project(p)
        uv2, _ = cam2.project(p)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv1) * 2.0, atol=1e-4)


class TestNpzContract:
    def test_roundtrip(self, tmp_path, rng):
        npz = str(tmp_path / "camera.npz")
        B = np.eye(4)
        B[:3, 3] = [1.0, 2.0, 3.0]
        save_camera_npz(npz, B, focal_px=800.0, image_wh=(1024, 768))
        data = np.load(npz)
        assert set(data.keys()) == {"extrinsic", "focal", "image_size", "camera_angle_x"}
        assert data["image_size"].dtype == np.int32
        assert float(data["camera_angle_x"]) == pytest.approx(
            2 * np.arctan(1024 / 1600.0))
        cam = camera_from_npz(npz)
        assert cam.image_size == (768, 1024)
        # projection of a point straight ahead of this camera lands in-image
        center_world = np.asarray(cam.center)
        # view +Z forward: build a world point 2m along the view z axis
        fwd_world = cam.view_to_world(jnp.asarray([0.0, 0.0, 2.0]))
        uv, z = cam.project(fwd_world)
        assert float(z) == pytest.approx(2.0, abs=1e-4)
        np.testing.assert_allclose(np.asarray(uv), [512.0, 384.0], atol=1e-3)
        assert np.all(np.isfinite(center_world))

    def test_rescaled_loading(self, tmp_path):
        npz = str(tmp_path / "camera.npz")
        save_camera_npz(npz, np.eye(4), focal_px=800.0, image_wh=(1024, 768))
        cam = camera_from_npz(npz, render_hw=(384, 512))
        # focal scaled by height ratio 384/768 = 0.5 (cam_utils.py:56-70)
        np.testing.assert_allclose(np.asarray(cam.focal), [400.0, 400.0])
        np.testing.assert_allclose(np.asarray(cam.principal), [256.0, 192.0])


class TestPixelRaysWorld:
    """pixel_rays_world is the inverse of the P3D-sign pinhole projection
    (used by the phase-8 HDRI environment background)."""

    def test_principal_point_ray_is_forward(self):
        cam = _simple_camera()
        d = cam.pixel_rays_world(jnp.asarray(160.0), jnp.asarray(128.0))
        np.testing.assert_allclose(np.asarray(d), [0.0, 0.0, 1.0],
                                   atol=1e-6)

    def test_rays_are_unit_and_reproject(self):
        """A point placed along any pixel's ray projects back onto that
        pixel — over a grid of pixels, with a rotated camera."""
        from regen3d_tpu.transforms.rotations import so3_exp
        R = so3_exp(jnp.asarray([0.2, -0.3, 0.1]))
        cam = Camera(R=R, T=jnp.asarray([0.4, -0.2, 0.1]),
                     focal=jnp.asarray([180.0, 190.0]),
                     principal=jnp.asarray([150.0, 130.0]),
                     image_size=(256, 320))
        xs = jnp.asarray([10.0, 150.0, 300.0])
        ys = jnp.asarray([5.0, 130.0, 250.0])
        xx, yy = jnp.meshgrid(xs, ys)
        d = cam.pixel_rays_world(xx, yy)              # (3, 3, 3)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-6)
        pts = cam.center[None, None] + 2.7 * d        # along each ray
        uv, z = cam.project(pts.reshape(-1, 3))
        np.testing.assert_allclose(np.asarray(uv[:, 0]),
                                   np.asarray(xx).ravel(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(uv[:, 1]),
                                   np.asarray(yy).ravel(), atol=1e-3)
        assert np.all(np.asarray(z) > 0)
