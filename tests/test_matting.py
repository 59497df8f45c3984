"""Matting distillation: synthetic compositing data, trained MattingUNet
beats the threshold fallback, and the phase-2 prep consumes the checkpoint
(VERDICT r2 next-round #9; reference rembg role:
inpaint_nanoBanana.py:157-189)."""

import numpy as np
import pytest

from regen3d_tpu.pipeline.matting import (
    MattingModel,
    distill_matting,
    iou,
    synth_matting_batch,
    threshold_alpha,
)


class TestSynthData:
    def test_batch_contract(self):
        rng = np.random.default_rng(0)
        imgs, alphas = synth_matting_batch(rng, 4, 64)
        assert imgs.shape == (4, 64, 64, 3)
        assert alphas.shape == (4, 64, 64, 1)
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0
        assert alphas.min() >= 0.0 and alphas.max() <= 1.0
        # every sample has both foreground and background
        for a in alphas:
            frac = (a > 0.5).mean()
            assert 0.005 < frac < 0.95

    def test_threshold_keeps_shadows(self):
        """The fallback's defining failure: sub-threshold background
        (shadow) pixels are matted as foreground."""
        rng = np.random.default_rng(1)
        imgs, alphas = synth_matting_batch(rng, 8, 64)
        false_pos = 0
        for im, a in zip(imgs, alphas):
            thr = threshold_alpha(im)[..., 0]
            false_pos += np.logical_and(thr > 0.5, a[..., 0] < 0.5).sum()
        assert false_pos > 50   # shadows / gradient lows leak in


@pytest.fixture(scope="module")
def trained():
    params, _ = distill_matting(steps=150, batch=12, size=64, base=8,
                                lr=2e-3, seed=0, log_every=0)
    return MattingModel(params, base=8, eval_size=64)


class TestDistilled:
    def test_beats_threshold_on_holdout(self, trained):
        rng = np.random.default_rng(999)
        imgs, alphas = synth_matting_batch(rng, 16, 64)
        net = float(np.mean([iou(trained.alpha(im), a[..., 0])
                             for im, a in zip(imgs, alphas)]))
        thr = float(np.mean([iou(threshold_alpha(im)[..., 0], a[..., 0])
                             for im, a in zip(imgs, alphas)]))
        assert net > thr + 0.1, (net, thr)
        assert net > 0.7, net

    def test_checkpoint_roundtrip_and_phase2_prep(self, trained, tmp_path):
        """Save → MattingModel.load → prepare_for_3d(matting=...) produces
        an RGBA crop whose alpha tracks the object, not the shadow."""
        from PIL import Image

        from regen3d_tpu.pipeline.phase2_inpaint import prepare_for_3d

        ckpt = str(tmp_path / "matting_ckpt")
        trained.save(ckpt)
        loaded = MattingModel.load(ckpt, base=8, eval_size=64)

        # synthetic finding: red disc + gray shadow on white
        s = 96
        img = np.full((s, s, 3), 252, np.uint8)
        yy, xx = np.mgrid[0:s, 0:s]
        disc = (yy - 40) ** 2 + (xx - 48) ** 2 < 20 ** 2
        shadow = (yy - 62) ** 2 / 2 + (xx - 48) ** 2 < 24 ** 2
        img[shadow & ~disc] = 225          # sub-threshold gray shadow
        img[disc] = (200, 40, 40)
        src = str(tmp_path / "finding.png")
        Image.fromarray(img).save(src)

        out = str(tmp_path / "prepped.png")
        prepare_for_3d(src, out, size=64, matting=loaded)
        rgba = np.asarray(Image.open(out))
        assert rgba.shape == (64, 64, 4)
        assert (rgba[..., 3] > 127).any()

        # the net's matte rejects most of the shadow the threshold keeps
        a_net = loaded.alpha(img)
        a_thr = threshold_alpha(img.astype(np.float32) / 255.0)[..., 0]
        sh = shadow & ~disc
        assert (a_thr[sh] > 0.5).mean() > 0.9        # threshold keeps it
        assert (a_net[sh] > 0.5).mean() < 0.5        # net drops most
        assert (a_net[disc] > 0.5).mean() > 0.8      # object kept
