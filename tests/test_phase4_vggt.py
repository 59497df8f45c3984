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
