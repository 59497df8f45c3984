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
        # most points must reproject inside the image. NOTE: camera.npz
        # stores a single focal = mean(fx, fy) (the reference's contract,
        # minimal_demo_vggt.py:105); a random-init camera head predicts
        # unequal FoVs, so edge points drift — bound accordingly. With
        # trained weights fx≈fy and this approaches 1.0.
        u = np.asarray(uv)
        inside = ((u[:, 0] >= 0) & (u[:, 0] < 128)
                  & (u[:, 1] >= 0) & (u[:, 1] < 96))
        assert inside.mean() > 0.75

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
