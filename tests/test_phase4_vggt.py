"""Phase 4 with a (tiny, random-init) VGGT model: the non-oracle path."""

import os

import jax
import numpy as np
import pytest

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.config import default_config
from regen3d_tpu.models.vggt import VGGT, VGGTConfig
from regen3d_tpu.utils.image import save_image


class TestPhase4VGGT:
    def test_run_inference_and_export(self, tmp_path, rng):
        out = str(tmp_path / "output")
        img = rng.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)
        inp = str(tmp_path / "in.png")
        save_image(inp, img)
        cfg = default_config(out, input_image=inp, vggt_scene_scale=1.0,
                             conf_thres_value=0.0)
        art = Artifacts(cfg)

        vcfg = VGGTConfig.tiny()
        model = VGGT(vcfg)
        import jax.numpy as jnp
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 1, vcfg.image_size, vcfg.image_size, 3)))

        from regen3d_tpu.pipeline import phase4_camera
        frames = phase4_camera.run_vggt_inference(
            cfg, params, model, (inp,), resolution=vcfg.image_size)
        assert len(frames) == 1
        fr = next(iter(frames.values()))
        assert fr["points"].shape[1] == 3 and len(fr["points"]) > 0
        assert fr["width"] == 128 and fr["height"] == 96

        phase4_camera.export_reconstruction(cfg, frames)
        assert os.path.exists(art.camera_npz)
        assert os.path.exists(art.scene_cloud_ply)
        assert os.path.exists(os.path.join(art.colmap_sparse, "points.ply"))

        # contract: loading the camera + reloading the scene cloud through
        # phase 5's transform must land points in front of the camera
        from regen3d_tpu.camera import camera_from_npz
        from regen3d_tpu.pipeline.phase5_extract import scene_cloud_to_world
        from regen3d_tpu.utils.ply import load_ply
        cam = camera_from_npz(art.camera_npz)
        world = scene_cloud_to_world(
            load_ply(art.scene_cloud_ply).vertices.astype(np.float64))
        import jax.numpy as jnp
        uv, z = cam.project(jnp.asarray(world, jnp.float32))
        z = np.asarray(z)
        assert (z > 0).mean() > 0.99  # depths positive through the roundtrip
        # Reprojection contract: camera.npz stores a single focal
        # f̄ = mean(fx, fy) (the reference's layout, minimal_demo_vggt.py:105).
        # A point unprojected with per-axis focal fx and reprojected with f̄
        # lands at u' − cx = (f̄/fx)(u − cx), so with uniform pixels the
        # inside fraction is ≈ min(1, fx/f̄)·min(1, fy/f̄) for ANY head
        # numerics (random-init included). Pin against that prediction —
        # with trained weights fx≈fy and both approach 1.0.
        u = np.asarray(uv)
        inside = ((u[:, 0] >= 0) & (u[:, 0] < 128)
                  & (u[:, 1] >= 0) & (u[:, 1] < 96))
        fbar = (fr["fx"] + fr["fy"]) / 2.0
        expected = min(1.0, fr["fx"] / fbar) * min(1.0, fr["fy"] / fbar)
        assert abs(inside.mean() - expected) < 0.15, \
            (inside.mean(), expected)

    def test_run_inference_use_ba(self, tmp_path, rng):
        """use_ba: true end-to-end through run_vggt_inference (regression:
        the '_ba' diagnostics dict must not reach the per-frame tree.map)."""
        import jax.numpy as jnp
        from regen3d_tpu.pipeline import phase4_camera

        out = str(tmp_path / "output")
        img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
        inp1 = str(tmp_path / "a.png")
        inp2 = str(tmp_path / "b.png")
        save_image(inp1, img)
        save_image(inp2, np.roll(img, 3, axis=1))
        cfg = default_config(out, input_image=inp1, conf_thres_value=0.0,
                             use_ba=True, max_query_pts=64)

        vcfg = VGGTConfig.tiny()
        model = VGGT(vcfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, vcfg.image_size,
                                       vcfg.image_size, 3)))
        frames = phase4_camera.run_vggt_inference(
            cfg, params, model, (inp1, inp2), resolution=vcfg.image_size)
        assert len(frames) == 2
        first = frames["a.png"]
        assert "ba_rmse_px" in first and np.isfinite(first["ba_rmse_px"])
        assert first["ba_n_tracks_used"] >= 0
        for fr in frames.values():
            assert fr["points"].shape[1] == 3
        phase4_camera.export_reconstruction(cfg, frames)
        art = Artifacts(cfg)
        assert os.path.exists(art.camera_npz)

    def test_preprocessing_preserves_aspect(self, tmp_path, rng):
        """Non-square inputs are square-PADDED (centered), never distorted
        (upstream load_and_preprocess_images_square semantics), the
        intrinsic rescale is uniform by max-side, and pad pixels are
        excluded from the cloud."""
        import jax.numpy as jnp
        from regen3d_tpu.pipeline import phase4_camera

        out = str(tmp_path / "output")
        # tall thin image: 96 high, 32 wide → pad columns left/right
        img = rng.integers(0, 255, size=(96, 32, 3)).astype(np.uint8)
        inp = str(tmp_path / "thin.png")
        save_image(inp, img)
        cfg = default_config(out, input_image=inp, conf_thres_value=0.0)

        vcfg = VGGTConfig.tiny()
        model = VGGT(vcfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 1, vcfg.image_size, vcfg.image_size, 3)))
        res = vcfg.image_size
        frames = phase4_camera.run_vggt_inference(
            cfg, params, model, (inp,), resolution=res)
        fr = next(iter(frames.values()))

        # a manually pre-padded square version of the same image must see
        # the IDENTICAL model input, hence identical model-space focals;
        # its rescale factor (96/res) matches the thin image's max-side
        # factor — so the exported fx/fy must agree. An anisotropic resize
        # would warp the thin image's fx by 3×.
        sq = np.full((96, 96, 3), 255, np.uint8)
        sq[:, 32:64] = img
        inp_sq = str(tmp_path / "square.png")
        save_image(inp_sq, sq)
        fr_sq = next(iter(phase4_camera.run_vggt_inference(
            cfg, params, model, (inp_sq,), resolution=res).values()))
        assert fr["fx"] == pytest.approx(fr_sq["fx"], rel=1e-4), \
            "anisotropic rescale detected (aspect not preserved)"
        assert fr["fy"] == pytest.approx(fr_sq["fy"], rel=1e-4)
        assert fr["cx"] == 16.0 and fr["cy"] == 48.0
        # pad exclusion: at conf_thres 0 every VALID pixel unprojects; the
        # pad is 2/3 of the square, so the kept fraction must be ≈ 1/3
        kept = len(fr["points"]) / (res * res)
        assert kept <= 0.40, f"padded pixels leaked into the cloud ({kept:.2f})"
        assert kept >= 0.20, "valid pixels were over-masked"


class TestUnprojectAlignmentVariant:
    """minimal_demo_vggt_unproject.py:39-186 alignment pair."""

    def test_obb_alignment_exact_on_transformed_box(self):
        from regen3d_tpu.pipeline.phase4_camera import align_pointclouds_obb
        rng = np.random.default_rng(3)
        tgt = rng.uniform(-1, 1, (500, 3)).astype(np.float64) * [2, 1, 3]
        src = tgt / [2.0, 4.0, 0.5] + [5.0, -2.0, 1.0]
        aligned, scale, R, t = align_pointclouds_obb(src, tgt)
        np.testing.assert_allclose(scale, [2.0, 4.0, 0.5], rtol=1e-6)
        np.testing.assert_allclose(R, np.eye(3))
        # extents and center match the target exactly
        np.testing.assert_allclose(aligned.mean(0), tgt.mean(0), atol=1e-9)
        np.testing.assert_allclose(
            aligned.max(0) - aligned.min(0), tgt.max(0) - tgt.min(0),
            rtol=1e-9)
        # affine formula consistency: aligned == src*scale + t
        np.testing.assert_allclose(aligned, src * scale + t, atol=1e-9)

    def test_pca_alignment_recovers_rotation(self):
        from regen3d_tpu.pipeline.phase4_camera import align_pointclouds_pca
        from regen3d_tpu.transforms.rotations import so3_exp
        import jax.numpy as jnp
        rng = np.random.default_rng(4)
        tgt = rng.normal(size=(800, 3)) * [3.0, 1.0, 0.3]
        R_true = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
        src = tgt @ R_true.T + [1.0, 2.0, 3.0]
        aligned, R, t = align_pointclouds_pca(src, tgt)
        # principal frames coincide up to axis sign; check the cloud shape
        cov_a = np.cov(aligned.T)
        cov_t = np.cov(tgt.T)
        np.testing.assert_allclose(np.linalg.eigvalsh(cov_a),
                                   np.linalg.eigvalsh(cov_t), rtol=1e-6)
        np.testing.assert_allclose(aligned.mean(0), tgt.mean(0), atol=1e-9)
        assert abs(abs(np.linalg.det(R)) - 1.0) < 1e-8

    def test_export_writes_aligned_artifact(self, tmp_path):
        import yaml

        from regen3d_tpu.artifacts import Artifacts
        from regen3d_tpu.config import default_config
        from regen3d_tpu.pipeline.phase4_camera import export_reconstruction
        from regen3d_tpu.utils.ply import load_ply

        cfg = default_config(str(tmp_path / "output"))
        rng = np.random.default_rng(5)
        pts = rng.uniform(-1, 1, (200, 3)).astype(np.float64) + [0, 0, 3]
        frames = {
            "a.png": dict(points=pts, R=np.eye(3), t=np.zeros(3),
                          fx=100.0, fy=100.0, cx=32.0, cy=32.0,
                          width=64, height=64),
            "b.png": dict(points=pts * 0.5 + [1, 0, 0], R=np.eye(3),
                          t=np.zeros(3), fx=100.0, fy=100.0, cx=32.0,
                          cy=32.0, width=64, height=64),
        }
        export_reconstruction(cfg, frames)
        art = Artifacts(cfg)
        p = os.path.join(art.colmap_sparse, "points_emptyRoom_aligned.ply")
        assert os.path.exists(p)
        aligned = load_ply(p).vertices
        main = load_ply(os.path.join(art.colmap_sparse,
                                     "points.ply")).vertices
        np.testing.assert_allclose(aligned.mean(0), main.mean(0), atol=1e-4)
