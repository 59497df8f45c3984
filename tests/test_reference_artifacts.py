"""Phase-4 artifact contract fixture: pins the reference's exact math.

Every expected value here is computed by an INDEPENDENT numpy transcription
of the reference implementation (cited per function), so a drift in our
conventions/camera/export code fails against reference-derived numbers —
not against itself.

Reference sources transcribed:
  * R_fix + extrinsic layout ........ minimal_demo_vggt.py:160-204
  * scene_vggt.ply point fix ........ minimal_demo_vggt.py:176-186
  * per-frame cloud split / bbox .... minimal_demo_vggt.py:534-580
  * B2P ............................. global_utils.py:835-844
  * phase-5 cloud reload ............ pc_utils.py:25-37
  * pixel-space camera + projection . cam_utils.py:28-87 (pytorch3d
    PerspectiveCameras(in_ndc=False) + transform_points_screen semantics)
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

# ---- independent transcription of the reference math -------------------------

R_FIX_REF = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)


def ref_B2P(B):
    """global_utils.py:835-844 (literal transcription)."""
    R1 = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
    R2 = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, -1]], np.float64)
    Tm = np.array([[-1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)
    R = R1 @ B[:3, :3] @ R2
    T = Tm @ B[:3, 3] @ R
    return R, T


def ref_export(R_cw, t_cw, points, scale):
    """minimal_demo_vggt.py:160-204: npz extrinsic + scene ply points."""
    ext = np.eye(4)
    ext[:3, :3] = R_FIX_REF @ R_cw
    ext[:3, 3] = R_FIX_REF @ t_cw
    R_p3d, T_p3d = ref_B2P(ext)
    pf = points @ R_FIX_REF.T
    pf = pf @ R_p3d.T
    pf = pf + T_p3d
    pf[:, 1] *= -1
    pf = pf * scale
    return ext, pf


def ref_phase5_reload(ply_points):
    """pc_utils.py:25-37."""
    R_np, t_np = ref_B2P(np.eye(4))
    p = ply_points @ R_np.T + t_np
    p[:, 1] *= -1
    return p


def ref_project_screen(ext, focal, orig_hw, render_hw, world_points):
    """cam_utils.py:28-87 + pytorch3d transform_points_screen for
    in_ndc=False cameras: x_view = x @ R + T (P3D view frame +X left/+Y up),
    u = cx − fx·x/z, v = cy − fy·y/z."""
    R, T = ref_B2P(ext)
    H, W = render_hw
    f = focal * (H / orig_hw[0])
    cx, cy = W / 2.0, H / 2.0
    v = world_points @ R + T
    z = v[:, 2]
    return np.stack([cx - f * v[:, 0] / z, cy - f * v[:, 1] / z], -1), z


# ---- fixtures ------------------------------------------------------------------


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """Run our phase-4 export on synthetic geometry with a NON-identity
    second camera so the frame-0 rebase is exercised."""
    from regen3d_tpu.config import default_config
    from regen3d_tpu.artifacts import Artifacts
    from regen3d_tpu.pipeline.phase4_camera import export_reconstruction

    rng = np.random.default_rng(7)
    pts0 = rng.normal(size=(400, 3)) * 0.6 + [0, 0, 3.0]
    pts1 = rng.normal(size=(300, 3)) * 0.8 + [0.1, -0.1, 3.2]

    out = str(tmp_path_factory.mktemp("ref") / "output")
    cfg = default_config(out, vggt_scene_scale=2.0)
    art = Artifacts(cfg)

    th = 0.13
    R1 = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    frames = {
        "in.png": dict(points=pts0, R=np.eye(3), t=np.zeros(3),
                       fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                       width=640, height=480),
        "empty_room.png": dict(points=pts1, R=R1, t=np.array([0.05, 0.02, -0.1]),
                               fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                               width=640, height=480),
    }
    export_reconstruction(cfg, frames)
    return cfg, art, pts0, pts1


class TestNpzLayout:
    def test_extrinsic_is_rfix_identity_unscaled(self, exported):
        """Frame 0 is the identity camera ⇒ extrinsic == R_fix exactly,
        translation unscaled (zero) despite vggt_scene_scale=2."""
        _, art, *_ = exported
        data = np.load(art.camera_npz)
        ext = np.asarray(data["extrinsic"], np.float64)
        np.testing.assert_allclose(ext[:3, :3], R_FIX_REF, atol=1e-6)
        np.testing.assert_allclose(ext[:3, 3], 0.0, atol=1e-6)
        assert float(data["focal"]) == pytest.approx(500.0)

    def test_our_rfix_equals_reference(self):
        from regen3d_tpu.transforms.conventions import R_FIX_CV2BLENDER
        np.testing.assert_array_equal(R_FIX_CV2BLENDER, R_FIX_REF)

    def test_second_camera_rebased(self, exported):
        """camera_emptyRoom.npz holds R_fix·[R|t] of the REBASED frame-1
        camera (frame-0 was already identity here, so rebase == original)."""
        _, art, _, _ = exported
        data = np.load(art.camera_empty_npz)
        ext = np.asarray(data["extrinsic"], np.float64)
        # rotation part must be R_fix @ R1 — orthonormal, det +1
        R = R_FIX_REF.T @ ext[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)


class TestSceneCloudContract:
    def test_scene_ply_matches_reference_point_fix(self, exported):
        """scene_vggt.ply == the literal reference transform chain."""
        from regen3d_tpu.utils.ply import load_ply
        _, art, pts0, _ = exported
        ours = load_ply(art.scene_cloud_ply).vertices
        ext, expected = ref_export(np.eye(3), np.zeros(3), pts0.copy(), 2.0)
        np.testing.assert_allclose(ours, expected, atol=1e-4)

    def test_raw_points_ply(self, exported):
        """points.ply stores the raw (rebased) VGGT cloud."""
        from regen3d_tpu.utils.ply import load_ply
        _, art, pts0, _ = exported
        p = load_ply(os.path.join(art.colmap_sparse, "points.ply")).vertices
        np.testing.assert_allclose(p, pts0, atol=1e-4)

    def test_empty_room_bbox_scale_matching(self, exported):
        """points_emptyRoom.ply: per-axis extents match frame 0's
        (minimal_demo_vggt.py:560-578), _pre stores the raw cloud."""
        from regen3d_tpu.utils.ply import load_ply
        _, art, pts0, pts1 = exported
        pre = load_ply(os.path.join(
            art.colmap_sparse, "points_emptyRoom_pre.ply")).vertices
        np.testing.assert_allclose(pre, pts1, atol=1e-4)
        fit = load_ply(os.path.join(
            art.colmap_sparse, "points_emptyRoom.ply")).vertices
        np.testing.assert_allclose(fit.max(0) - fit.min(0),
                                   pts0.max(0) - pts0.min(0), rtol=1e-4)
        # scaled about its own centroid
        np.testing.assert_allclose(fit.mean(0), pts1.mean(0), atol=1e-4)


class TestProjectionConsistency:
    def test_reload_reprojects_exactly(self, exported):
        """camera.npz + scene_vggt.ply through OUR loaders reproject every
        point onto its original OpenCV pixel (the property that makes the
        whole phase 5/6 chain correct)."""
        from regen3d_tpu.camera import camera_from_npz
        from regen3d_tpu.pipeline.phase5_extract import scene_cloud_to_world
        from regen3d_tpu.utils.ply import load_ply
        _, art, pts0, _ = exported
        cam = camera_from_npz(art.camera_npz)
        world = scene_cloud_to_world(
            load_ply(art.scene_cloud_ply).vertices.astype(np.float64))
        uv, z = cam.project(jnp.asarray(world, jnp.float32))
        # OpenCV ground truth (frame-0 camera is the identity)
        u0 = 320.0 + 500.0 * pts0[:, 0] / pts0[:, 2]
        v0 = 240.0 + 500.0 * pts0[:, 1] / pts0[:, 2]
        np.testing.assert_allclose(np.asarray(uv)[:, 0], u0, atol=2e-2)
        np.testing.assert_allclose(np.asarray(uv)[:, 1], v0, atol=2e-2)
        assert np.all(np.asarray(z) > 0)

    def test_camera_matches_p3d_transform_points_screen(self, exported):
        """Our Camera == transcribed cam_utils.py camera at a different
        render resolution (height-ratio focal rescale)."""
        from regen3d_tpu.camera import camera_from_npz
        _, art, *_ = exported
        data = np.load(art.camera_npz)
        ext = np.asarray(data["extrinsic"], np.float64)
        world = np.random.default_rng(3).normal(size=(64, 3)) + [0, 0, 3]
        expected_uv, expected_z = ref_project_screen(
            ext, float(data["focal"]), (480, 640), (240, 320), world)
        cam = camera_from_npz(art.camera_npz, render_hw=(240, 320))
        uv, z = cam.project(jnp.asarray(world, jnp.float32))
        np.testing.assert_allclose(np.asarray(uv), expected_uv, atol=1e-2)
        np.testing.assert_allclose(np.asarray(z), expected_z, atol=1e-4)

    def test_nonidentity_frame0_is_rebased_exact(self, tmp_path):
        """A NON-identity frame-0 pose (random-init model) must still yield
        an exactly consistent artifact set (the explicit rebase)."""
        from regen3d_tpu.config import default_config
        from regen3d_tpu.artifacts import Artifacts
        from regen3d_tpu.pipeline.phase4_camera import export_reconstruction
        from regen3d_tpu.camera import camera_from_npz
        from regen3d_tpu.pipeline.phase5_extract import scene_cloud_to_world
        from regen3d_tpu.utils.ply import load_ply

        rng = np.random.default_rng(11)
        th = 0.4
        R = np.array([[1, 0, 0],
                      [0, np.cos(th), -np.sin(th)],
                      [0, np.sin(th), np.cos(th)]])
        t = np.array([0.3, -0.2, 0.5])
        # world points in front of THIS camera
        cam_pts = rng.normal(size=(200, 3)) * 0.5 + [0, 0, 4.0]
        pts_w = (cam_pts - t) @ R   # R^-1 (x - t), row form

        cfg = default_config(str(tmp_path / "out"), vggt_scene_scale=2.0)
        art = Artifacts(cfg)
        export_reconstruction(cfg, {
            "in.png": dict(points=pts_w, R=R, t=t, fx=400.0, fy=400.0,
                           cx=256.0, cy=256.0, width=512, height=512)})
        cam = camera_from_npz(art.camera_npz)
        world = scene_cloud_to_world(
            load_ply(art.scene_cloud_ply).vertices.astype(np.float64))
        uv, z = cam.project(jnp.asarray(world, jnp.float32))
        x_cv = pts_w @ R.T + t
        u0 = 256.0 + 400.0 * x_cv[:, 0] / x_cv[:, 2]
        v0 = 256.0 + 400.0 * x_cv[:, 1] / x_cv[:, 2]
        np.testing.assert_allclose(np.asarray(uv)[:, 0], u0, atol=5e-2)
        np.testing.assert_allclose(np.asarray(uv)[:, 1], v0, atol=5e-2)


class TestRawToWorld:
    def test_matches_composed_chain(self):
        """vggt_raw_to_world == scene-ply fix ∘ phase-5 reload for the
        identity frame-0 camera, == the reference's set_vggt_cloud
        diag(s,−s,−s) — the reference's two routes into the pose world
        agree and we pin both."""
        from regen3d_tpu.transforms.conventions import vggt_raw_to_world
        pts = np.random.default_rng(5).normal(size=(100, 3)) + [0, 0, 3]
        _, ply = ref_export(np.eye(3), np.zeros(3), pts.copy(), 2.0)
        expected = ref_phase5_reload(ply)
        got = vggt_raw_to_world(pts, 2.0)
        np.testing.assert_allclose(got, expected, atol=1e-10)
        np.testing.assert_allclose(got, pts @ np.diag([2.0, -2.0, -2.0]),
                                   atol=1e-10)
