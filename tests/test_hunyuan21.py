"""Hunyuan3D-2.1 variant: PBR multiview texgen, MR-textured GLBs, ESRGAN.

Reference: run_hunyuan21.py:49-129 — same flow-matching shape pipeline with
hy21 knobs, plus the hunyuan-paint-pbr texture path (albedo + metallic-
roughness multiview) and a RealESRGAN ×4 texture upscale."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from regen3d_tpu.utils.glb import MeshData, SceneData, load_glb, save_glb


def _png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


class TestGLBMetallicRoughnessTexture:
    def test_roundtrip(self, tmp_path):
        tex = np.full((8, 8, 3), 200, np.uint8)
        mr = np.zeros((8, 8, 3), np.uint8)
        mr[..., 1] = 180   # roughness in G
        mr[..., 2] = 90    # metallic in B
        v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.asarray([[0, 1, 2]], np.int32)
        uv = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
        p = str(tmp_path / "m.glb")
        save_glb(p, SceneData(meshes=[MeshData(
            name="t", vertices=v, faces=f, uvs=uv,
            texture_png=_png(tex), mr_texture_png=_png(mr),
            metallic=1.0, roughness=1.0)]))
        back = load_glb(p).meshes[0]
        assert back.texture_png is not None
        assert back.mr_texture_png is not None
        got = np.asarray(Image.open(io.BytesIO(back.mr_texture_png)))
        np.testing.assert_array_equal(got[..., 1], 180)
        np.testing.assert_array_equal(got[..., 2], 90)

    def test_mr_absent_stays_none(self, tmp_path):
        v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.asarray([[0, 1, 2]], np.int32)
        p = str(tmp_path / "p.glb")
        save_glb(p, SceneData(meshes=[MeshData(name="t", vertices=v,
                                               faces=f)]))
        assert load_glb(p).meshes[0].mr_texture_png is None


class TestPBRTexgen:
    def test_generate_views_pbr_shapes(self):
        from regen3d_tpu.models.sd_unet import SDUNetConfig
        from regen3d_tpu.models.sd_vae import SDVAEConfig
        from regen3d_tpu.pipeline import texgen as tg

        tcfg = tg.TexGenConfig.tiny()
        ucfg = SDUNetConfig.tiny(in_channels=12,
                                 class_embeddings=2 * tcfg.num_views)
        vcfg = SDVAEConfig.tiny()
        tp, vp, ucfg, vcfg = tg.init_texgen(tcfg, unet_cfg=ucfg,
                                            vae_cfg=vcfg)
        ref = (np.random.default_rng(0).random((40, 40, 3)) * 255
               ).astype(np.uint8)
        albedo, mr = tg.generate_views_pbr(tp, vp, tcfg, ref, ucfg, vcfg)
        r = tcfg.resolution
        assert albedo.shape == (tcfg.num_views, r, r, 3)
        assert mr.shape == (tcfg.num_views, r, r, 3)
        assert np.all(albedo >= 0) and np.all(albedo <= 1)
        # the two material branches see different class embeddings → the
        # outputs must differ (a shared-branch bug would make them equal)
        assert not np.allclose(albedo, mr)

    def test_texture_mesh_pbr_glb_ready(self, tmp_path):
        from regen3d_tpu.models.sd_unet import SDUNetConfig
        from regen3d_tpu.models.sd_vae import SDVAEConfig
        from regen3d_tpu.pipeline import texgen as tg

        tcfg = tg.TexGenConfig.tiny()
        ucfg = SDUNetConfig.tiny(in_channels=12,
                                 class_embeddings=2 * tcfg.num_views)
        vcfg = SDVAEConfig.tiny()
        tp, vp, ucfg, vcfg = tg.init_texgen(tcfg, unet_cfg=ucfg,
                                            vae_cfg=vcfg)
        v = np.asarray([[-.5, -.5, -.5], [.5, -.5, -.5], [.5, .5, -.5],
                        [-.5, .5, -.5], [-.5, -.5, .5], [.5, -.5, .5],
                        [.5, .5, .5], [-.5, .5, .5]], np.float32)
        f = np.asarray([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                        [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]],
                       np.int32)
        ref = (np.random.default_rng(1).random((32, 32, 3)) * 255
               ).astype(np.uint8)
        nv, nf, uvs, png, mr_png = tg.texture_mesh_pbr(
            v, f, ref, tcfg, tp, vp, ucfg, vcfg, texels_per_face=4)
        p = str(tmp_path / "pbr.glb")
        save_glb(p, SceneData(meshes=[MeshData(
            name="o", vertices=nv, faces=nf, uvs=uvs, texture_png=png,
            mr_texture_png=mr_png)]))
        back = load_glb(p).meshes[0]
        assert back.mr_texture_png is not None
        a = np.asarray(Image.open(io.BytesIO(back.texture_png)))
        m = np.asarray(Image.open(io.BytesIO(back.mr_texture_png)))
        assert a.shape == m.shape    # shared texel layout


class TestESRGAN:
    def test_x4_shape_and_range(self):
        from regen3d_tpu.models.esrgan import (ESRGANConfig, RRDBNet,
                                               upscale_x4)
        cfg = ESRGANConfig.tiny()
        p = RRDBNet(cfg).init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        img = np.random.default_rng(0).random((12, 16, 3)).astype(np.float32)
        out = upscale_x4(p, cfg, img, tile=None)
        assert out.shape == (48, 64, 3)
        assert np.all(out >= 0) and np.all(out <= 1)

    def test_tiled_matches_full_interior(self):
        from regen3d_tpu.models.esrgan import (ESRGANConfig, RRDBNet,
                                               upscale_x4)
        cfg = ESRGANConfig.tiny()
        p = RRDBNet(cfg).init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
        img = np.random.default_rng(1).random((24, 24, 3)).astype(np.float32)
        full = upscale_x4(p, cfg, img, tile=None)
        tiled = upscale_x4(p, cfg, img, tile=16, overlap=4)
        assert tiled.shape == full.shape
        # small boundary deviation only (receptive-field truncation)
        assert np.abs(full - tiled).mean() < 0.01


class TestPhase3Hy21EndToEnd:
    def test_hy21_pbr_asset(self, tmp_path):
        """Phase 3 with use_hunyuan21 + multiview texgen emits a GLB with
        albedo AND metallic-roughness textures."""
        from regen3d_tpu.artifacts import Artifacts
        from regen3d_tpu.config import default_config
        from regen3d_tpu.pipeline import phase3_assets

        out = str(tmp_path / "output")
        cfg = default_config(out, input_image=str(tmp_path / "x.png"),
                             use_hunyuan21=True, use_multiview_texgen=True,
                             texgen_resolution=32, texgen_steps=2,
                             max_num_view_hy21=3,
                             steps_hy21=2, octree_resolution_hy21=24,
                             num_chunks_hy21=2048, texels_per_face=4)
        art = Artifacts(cfg)
        os.makedirs(art.prepped_dir, exist_ok=True)
        img = np.zeros((64, 64, 4), np.uint8)
        img[16:48, 16:48] = (200, 60, 60, 255)
        Image.fromarray(img).save(
            os.path.join(art.prepped_dir, "obj__(32, 32).png"))
        done = phase3_assets.run(cfg)
        assert done == ["obj__(32, 32)"]
        mesh = load_glb(art.asset_glb("obj__(32, 32)")).meshes[0]
        assert mesh.texture_png is not None
        assert mesh.mr_texture_png is not None
