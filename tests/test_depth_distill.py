"""Depth distillation: synthetic rooms with exact z-buffer depth, trained
DepthAnything beats the luminance prior, and the depth artifact consumes
the checkpoint (round-2 verdict weak #6; reference depth role:
global_utils.py:357-418)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regen3d_tpu.pipeline.depth_distill import (
    distill_depth,
    load_depth_checkpoint,
    luminance_prior,
    micro_config,
    save_depth_checkpoint,
    ssi_rmse,
    synth_depth_batch,
)


class TestSynthRooms:
    def test_batch_contract(self):
        rng = np.random.default_rng(0)
        imgs, disps = synth_depth_batch(rng, 3, 56)
        assert imgs.shape == (3, 56, 56, 3)
        assert disps.shape == (3, 56, 56)
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0
        assert disps.min() >= 0.0 and disps.max() <= 1.0001
        # depth has structure: floor rows nearer (higher disparity) than
        # the back wall region at the top
        for d in disps:
            assert d[-4:].mean() > d[:4].mean()

    def test_luminance_prior_is_weak(self):
        """The fallback correlates with height, not geometry — nonzero
        SSI-RMSE well above a trained net's reach."""
        rng = np.random.default_rng(1)
        imgs, disps = synth_depth_batch(rng, 4, 56)
        errs = [ssi_rmse(luminance_prior(im), gt)
                for im, gt in zip(imgs, disps)]
        assert float(np.mean(errs)) > 0.05


@pytest.fixture(scope="module")
def trained():
    cfg = micro_config(56)
    params, model = distill_depth(cfg, steps=120, batch=6, lr=2e-3, seed=0,
                                  log_every=0)
    return params, model, cfg


class TestDistilled:
    def test_beats_luminance_prior(self, trained):
        params, model, cfg = trained
        rng = np.random.default_rng(999)
        imgs, disps = synth_depth_batch(rng, 8, cfg.image_size)
        apply = jax.jit(model.apply)
        net, prior = [], []
        for im, gt in zip(imgs, disps):
            pred = np.asarray(apply(params, jnp.asarray(im[None])),
                              np.float32)[0]
            net.append(ssi_rmse(pred, gt))
            prior.append(ssi_rmse(luminance_prior(im), gt))
        assert np.mean(net) < np.mean(prior) - 0.01, (np.mean(net),
                                                      np.mean(prior))

    def test_checkpoint_roundtrip_and_depth_artifact(self, trained,
                                                     tmp_path):
        """save → load (config.json sidecar) → pipeline depth run writes a
        depth.png from the NET (not the prior)."""
        import os

        from PIL import Image

        from regen3d_tpu.config import default_config
        from regen3d_tpu.pipeline import depth as depth_phase

        params, model, cfg = trained
        ckpt = str(tmp_path / "depth_ckpt")
        save_depth_checkpoint(ckpt, params, cfg)
        lp, lm = load_depth_checkpoint(ckpt)
        assert lm.cfg.image_size == cfg.image_size
        assert lm.cfg.width == cfg.width

        rng = np.random.default_rng(5)
        imgs, _ = synth_depth_batch(rng, 1, cfg.image_size)
        room = (imgs[0] * 255).astype(np.uint8)
        room_png = str(tmp_path / "room.png")
        Image.fromarray(room).save(room_png)

        c = default_config(str(tmp_path / "out"), input_image=room_png,
                           depth_anything_checkpoint=ckpt)
        out = depth_phase.run(c)
        assert out and os.path.isfile(out)
        written = np.asarray(Image.open(out)).astype(np.float32) / 255.0
        # the artifact equals the net's (resized) output, not the prior
        direct = depth_phase.estimate_depth(room, lm, lp)
        prior = depth_phase.estimate_depth(room)
        err_net = np.abs(written - direct).mean()
        err_prior = np.abs(written - prior).mean()
        assert err_net < 0.02, err_net
        assert err_prior > err_net
