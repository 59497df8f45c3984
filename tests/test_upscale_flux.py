"""FLUX ControlNet upscaler variant (upscaler_model_name: "FLUX").

Reference: upscaler.py:13-41 — Upscaler(model_name="SD"|"FLUX"); the FLUX
path is FLUX.1-dev + a ControlNet upscaler. Ours: rectified-flow DiT over
patchified VAE latents with control-latent cross-attention conditioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.config import default_config
from regen3d_tpu.pipeline.upscale import (
    FluxUpscaler,
    Upscaler,
    make_upscaler,
)


class TestMakeUpscaler:
    def test_switch(self, tmp_path):
        cfg_sd = default_config(str(tmp_path / "o"),
                                upscaler_model_name="SD")
        cfg_flux = default_config(str(tmp_path / "o"),
                                  upscaler_model_name="FLUX")
        assert isinstance(make_upscaler(cfg_sd), Upscaler)
        assert isinstance(make_upscaler(cfg_flux), FluxUpscaler)
        cfg_bad = default_config(str(tmp_path / "o"),
                                 upscaler_model_name="DALLE")
        with pytest.raises(ValueError, match="SD.*FLUX"):
            make_upscaler(cfg_bad)

    def test_weightless_lanczos_contract(self, tmp_path):
        cfg = default_config(str(tmp_path / "o"))
        img = np.random.default_rng(0).integers(
            0, 255, (12, 16, 3), dtype=np.uint8)
        out = FluxUpscaler().upscale(img, cfg)
        assert out.shape == (48, 64, 3)


class TestFluxWeightedPath:
    def test_flow_sampled_x4(self, tmp_path):
        """Tiny random-init DiT+VAE: the full FLUX-style latent flow runs
        jitted end to end and produces a 4x image."""
        from regen3d_tpu.models.dit import DiTConfig, ShapeDiT
        from regen3d_tpu.models.sd_vae import SDAutoencoderKL, SDVAEConfig

        side = 8                    # control crop side; target 32x32
        vcfg = SDVAEConfig.tiny()   # 2x downsampling, 4 latent channels
        lat = side * 4 // 2         # 16
        tok = (lat // 2) ** 2       # 64 tokens of dim 16
        dcfg = DiTConfig(latent_tokens=tok, latent_dim=16, width=32,
                         depth=1, num_heads=2, cond_dim=16)
        dit = ShapeDiT(dcfg)
        vae = SDAutoencoderKL(vcfg)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        dp = dit.init(k1, jnp.zeros((1, tok, 16)), jnp.zeros((1,)),
                      jnp.zeros((1, tok, 16)))
        vp = vae.init(k2, jnp.zeros((1, 8, 8, 3)))
        up = FluxUpscaler(dit=dit, dit_params=dp, vae=vae, vae_params=vp)
        assert up.has_weights
        cfg = default_config(str(tmp_path / "o"), num_inference_steps=2)
        img = np.random.default_rng(1).integers(
            0, 255, (side, side, 3), dtype=np.uint8)
        out = up.upscale(img, cfg)
        assert out.shape == (32, 32, 3)
        assert out.dtype == np.uint8
