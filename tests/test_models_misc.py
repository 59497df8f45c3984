"""Tests: LPIPS, UNet family + DDIM, open-vocab detector, weight conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.models.detector import DetectorConfig, OpenVocabDetector, tokenize_bytes
from regen3d_tpu.models.lpips import LPIPS, make_lpips_fn
from regen3d_tpu.models.unet import MattingUNet, UNet, UNetConfig, ddim_sample
from regen3d_tpu.models.weights import (
    convert_state_dict,
    t2j_conv,
    t2j_linear,
    verify_tree_shapes,
)


class TestLPIPS:
    def test_zero_for_identical(self, rng):
        fn = make_lpips_fn(image_size=64)
        img = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        assert float(fn(img, img)) == pytest.approx(0.0, abs=1e-6)

    def test_monotone_in_noise(self, rng):
        fn = make_lpips_fn(image_size=64)
        img = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(64, 64, 3)).astype(np.float32))
        d1 = float(fn(img, jnp.clip(img + 0.05 * noise, 0, 1)))
        d2 = float(fn(img, jnp.clip(img + 0.3 * noise, 0, 1)))
        assert 0 < d1 < d2


class TestUNet:
    def test_forward_shapes(self, rng):
        cfg = UNetConfig.tiny(in_channels=4, out_channels=4)
        model = UNet(cfg)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
        t = jnp.asarray([100.0])
        params = model.init(jax.random.PRNGKey(0), x, t)
        y = model.apply(params, x, t)
        assert y.shape == (1, 16, 16, 4)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_cond_concat(self, rng):
        cfg = UNetConfig.tiny(in_channels=7, out_channels=4)
        model = UNet(cfg)
        x = jnp.zeros((1, 16, 16, 4))
        cond = jnp.zeros((1, 16, 16, 3))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(1), cond)
        y = model.apply(params, x, jnp.zeros(1), cond)
        assert y.shape == (1, 16, 16, 4)

    def test_ddim_sampler_runs(self, rng):
        cfg = UNetConfig.tiny(in_channels=7, out_channels=4)
        model = UNet(cfg)
        cond = jnp.zeros((1, 8, 8, 3))
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                            jnp.zeros(1), cond)
        out = ddim_sample(model, params, jax.random.PRNGKey(1), (1, 8, 8, 4),
                          cond_img=cond, num_steps=3, guidance_scale=2.0)
        assert out.shape == (1, 8, 8, 4)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_matting_unet(self, rng):
        model = MattingUNet(base=8)
        img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), img)
        alpha = model.apply(params, img)
        assert alpha.shape == (1, 32, 32, 1)
        assert np.all((np.asarray(alpha) >= 0) & (np.asarray(alpha) <= 1))


class TestDetector:
    def test_detect_api(self, rng):
        cfg = DetectorConfig.tiny()
        model = OpenVocabDetector(cfg)
        tokens = jnp.asarray(tokenize_bytes(["chair", "table"], cfg.text_len))
        img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        params = model.init(jax.random.PRNGKey(0), img, tokens)
        image = rng.integers(0, 255, size=(120, 160, 3)).astype(np.uint8)
        dets = model.detect(params, image, ["chair", "table"], threshold=0.0,
                            max_dets=5)
        assert len(dets) == 5
        for d in dets:
            assert d.label in ("chair", "table")
            assert 0 <= d.score <= 1
            assert np.isfinite([d.box.xmin, d.box.ymin,
                                d.box.xmax, d.box.ymax]).all()
            assert d.box.xmax >= d.box.xmin and d.box.ymax >= d.box.ymin

    def test_tokenizer(self):
        t = tokenize_bytes(["chair"], 12)
        assert t.shape == (1, 12)
        assert t[0, 5] == 1  # EOS after 'chair'


class TestWeightConversion:
    def test_linear_conv_transforms(self, rng):
        w = rng.normal(size=(8, 4)).astype(np.float32)
        assert t2j_linear(w).shape == (4, 8)
        wc = rng.normal(size=(16, 3, 3, 3)).astype(np.float32)
        assert t2j_conv(wc).shape == (3, 3, 3, 16)

    def test_convert_and_verify(self, rng):
        state = {
            "encoder.fc.weight": rng.normal(size=(8, 4)).astype(np.float32),
            "encoder.fc.bias": rng.normal(size=(8,)).astype(np.float32),
        }
        rules = [
            (r"encoder\.fc\.weight", lambda k, m: ("enc", "fc", "kernel"), t2j_linear),
            (r"encoder\.fc\.bias", lambda k, m: ("enc", "fc", "bias"), None),
        ]
        tree = convert_state_dict(state, rules)
        assert tree["params"]["enc"]["fc"]["kernel"].shape == (4, 8)
        ref = {"params": {"enc": {"fc": {
            "kernel": np.zeros((4, 8)), "bias": np.zeros(8)}}}}
        assert verify_tree_shapes(tree, ref) == []
        bad = {"params": {"enc": {"fc": {
            "kernel": np.zeros((4, 9)), "bias": np.zeros(8)}}}}
        assert len(verify_tree_shapes(tree, bad)) == 1


class TestVAE:
    def test_roundtrip_shapes(self, rng):
        from regen3d_tpu.models.vae import AutoencoderKL, VAEConfig
        cfg = VAEConfig.tiny()
        model = AutoencoderKL(cfg)
        img = jnp.asarray(rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), img)
        z = model.apply(params, img, method=AutoencoderKL.encode)
        assert z.shape == (1, 16, 16, cfg.latent_channels)  # 2x down (tiny)
        out = model.apply(params, z, method=AutoencoderKL.decode)
        assert out.shape == (1, 32, 32, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestUpscalePipeline:
    def test_weightless_fallback_and_artifacts(self, rng, tmp_path):
        import os
        from regen3d_tpu.artifacts import Artifacts
        from regen3d_tpu.config import default_config
        from regen3d_tpu.pipeline.upscale import run, square_pad
        from regen3d_tpu.utils.image import save_image
        assert square_pad(np.zeros((10, 20, 3), np.uint8)).shape == (20, 20, 3)
        cfg = default_config(str(tmp_path / "output"))
        art = Artifacts(cfg)
        os.makedirs(art.findings_cropped, exist_ok=True)
        save_image(os.path.join(art.findings_cropped, "chair__(5, 5).png"),
                   rng.integers(0, 255, size=(40, 30, 3)).astype(np.uint8))
        n = run(cfg)
        assert n == 1
        from PIL import Image
        out = Image.open(os.path.join(art.findings, "upscaled", "cropped",
                                      "chair__(5, 5).png"))
        assert out.size == (512, 512)


class TestDepthAnything:
    def test_forward_shape_and_range(self):
        from regen3d_tpu.models.depth_anything import (
            DepthAnything,
            DepthAnythingConfig,
        )
        c = DepthAnythingConfig.tiny()
        m = DepthAnything(c)
        p = m.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, c.image_size, c.image_size, 3)))
        img = jax.random.uniform(jax.random.PRNGKey(1),
                                 (2, c.image_size, c.image_size, 3))
        d = m.apply(p, img)
        assert d.shape == (2, c.image_size, c.image_size)
        assert bool(jnp.all(d >= 0))

    def test_estimate_depth_dispatch(self):
        import numpy as np

        from regen3d_tpu.models.depth_anything import (
            DepthAnything,
            DepthAnythingConfig,
        )
        from regen3d_tpu.pipeline.depth import estimate_depth
        c = DepthAnythingConfig.tiny()
        m = DepthAnything(c)
        p = m.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, c.image_size, c.image_size, 3)))
        img = (np.random.default_rng(0).random((40, 60, 3)) * 255
               ).astype(np.uint8)
        d = estimate_depth(img, m, p)
        assert d.shape == (40, 60)
        assert d.min() >= 0.0 and d.max() <= 1.0
