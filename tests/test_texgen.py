"""Multiview texture generation: SD UNet/VAE archs + joint denoising + bake."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.models.sd_unet import SDUNet, SDUNetConfig
from regen3d_tpu.models.sd_vae import SDAutoencoderKL, SDVAEConfig
from regen3d_tpu.pipeline import texgen


class TestSDUNet:
    def test_forward_shapes(self):
        c = SDUNetConfig.tiny()
        m = SDUNet(c)
        x = jnp.zeros((2, 16, 16, c.in_channels))
        ctx = jnp.zeros((2, 5, c.cross_attn_dim))
        p = m.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), ctx)
        y = jax.jit(m.apply)(p, x, jnp.full((2,), 10.0), ctx)
        assert y.shape == (2, 16, 16, c.out_channels)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_class_conditioning_changes_output(self):
        c = SDUNetConfig.tiny(class_embeddings=4)
        m = SDUNet(c)
        x = jnp.ones((1, 16, 16, c.in_channels))
        ctx = jnp.ones((1, 5, c.cross_attn_dim))
        p = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx,
                   jnp.zeros((1,), jnp.int32))
        y0 = m.apply(p, x, jnp.zeros((1,)), ctx, jnp.asarray([0]))
        y1 = m.apply(p, x, jnp.zeros((1,)), ctx, jnp.asarray([2]))
        assert not np.allclose(np.asarray(y0), np.asarray(y1))

    def test_cross_attention_conditioning(self):
        c = SDUNetConfig.tiny()
        m = SDUNet(c)
        x = jnp.ones((1, 16, 16, c.in_channels))
        p = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                   jnp.ones((1, 5, c.cross_attn_dim)))
        rng = np.random.default_rng(0)
        c1 = jnp.asarray(rng.normal(size=(1, 5, c.cross_attn_dim)),
                         jnp.float32)
        c2 = jnp.asarray(rng.normal(size=(1, 5, c.cross_attn_dim)),
                         jnp.float32)
        y1 = m.apply(p, x, jnp.zeros((1,)), c1)
        y2 = m.apply(p, x, jnp.zeros((1,)), c2)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))


class TestSDVAE:
    def test_roundtrip_shapes(self):
        c = SDVAEConfig.tiny()
        m = SDAutoencoderKL(c)
        x = jnp.zeros((1, 32, 32, 3))
        p = m.init(jax.random.PRNGKey(0), x)
        mean, logvar = m.apply(p, x, method=SDAutoencoderKL.encode)
        down = texgen.vae_down(c)
        assert mean.shape == (1, 32 // down, 32 // down, c.latent_channels)
        y = m.apply(p, mean, method=SDAutoencoderKL.decode)
        assert y.shape == (1, 32, 32, 3)
        assert np.all(np.isfinite(np.asarray(y)))


class TestTexGen:
    @pytest.fixture(scope="class")
    def tiny_stack(self):
        tcfg = texgen.TexGenConfig.tiny()
        ucfg = SDUNetConfig.tiny(in_channels=8,
                                 class_embeddings=tcfg.num_views)
        vcfg = SDVAEConfig.tiny()
        tp, vp, ucfg, vcfg = texgen.init_texgen(tcfg, unet_cfg=ucfg,
                                                vae_cfg=vcfg)
        return tcfg, ucfg, vcfg, tp, vp

    def test_generate_views(self, tiny_stack):
        tcfg, ucfg, vcfg, tp, vp = tiny_stack
        rng = np.random.default_rng(1)
        ref = rng.integers(0, 255, size=(48, 48, 3)).astype(np.uint8)
        views = texgen.generate_views(tp, vp, tcfg, ref, ucfg, vcfg)
        assert views.shape == (tcfg.num_views, tcfg.resolution,
                               tcfg.resolution, 3)
        assert np.all(views >= 0) and np.all(views <= 1)
        # camera conditioning ⇒ different views differ
        assert not np.allclose(views[0], views[1])

    def test_texture_mesh_contract(self, tiny_stack):
        """Generated views flow into the texel-atlas baker → GLB-ready
        (verts', faces', uvs, png) with per-corner UVs."""
        tcfg, ucfg, vcfg, tp, vp = tiny_stack
        verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                           np.float32)
        faces = np.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]],
                           np.int32)
        rng = np.random.default_rng(2)
        ref = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
        nv, nf, uvs, png = texgen.texture_mesh(
            verts, faces, ref, tcfg, tp, vp, ucfg, vcfg, texels_per_face=4)
        assert nv.shape == (3 * len(faces), 3)
        assert nf.shape == (len(faces), 3)
        assert uvs.shape == (3 * len(faces), 2)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
