"""Saliency distillation: trained SaliencyTransformer beats the center
prior and drives phase-1 `saliency` point generation (third diverged
family with a working distillation path; reference VST role:
segmentation.py point strategies)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regen3d_tpu.pipeline.saliency_distill import (
    SaliencyModel,
    center_prior,
    distill_saliency,
    mae,
    save_saliency_checkpoint,
    small_config,
    synth_saliency_batch,
)


class TestSynthScenes:
    def test_batch_contract(self):
        rng = np.random.default_rng(0)
        imgs, gts = synth_saliency_batch(rng, 4, 64)
        assert imgs.shape == (4, 64, 64, 3)
        assert gts.shape == (4, 64, 64)
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0
        for g in gts:
            frac = g.mean()
            assert 0.005 < frac < 0.6

    def test_objects_are_off_center_often(self):
        """The center prior must be genuinely beatable: object centroids
        spread over the frame."""
        rng = np.random.default_rng(1)
        _, gts = synth_saliency_batch(rng, 16, 64)
        cents = []
        for g in gts:
            ys, xs = np.nonzero(g > 0.5)
            if len(ys):
                cents.append([xs.mean() / 64, ys.mean() / 64])
        cents = np.asarray(cents)
        assert cents.std(0).min() > 0.1     # real spread in both axes


@pytest.fixture(scope="module")
def trained():
    cfg = small_config(64)
    params, model = distill_saliency(cfg, steps=120, batch=8, seed=0,
                                     log_every=0)
    return params, model, cfg


class TestDistilled:
    def test_beats_center_prior(self, trained):
        params, model, cfg = trained
        rng = np.random.default_rng(999)
        imgs, gts = synth_saliency_batch(rng, 12, cfg.image_size)
        apply = jax.jit(model.apply)
        prior = center_prior(cfg.image_size)
        net = [mae(np.asarray(apply(params, jnp.asarray(im[None])))[0], gt)
               for im, gt in zip(imgs, gts)]
        base = [mae(prior, gt) for gt in gts]
        assert np.mean(net) < np.mean(base) - 0.02, (np.mean(net),
                                                     np.mean(base))

    def test_checkpoint_and_point_generation(self, trained, tmp_path):
        """save → SaliencyModel.load → generate_points('saliency') picks
        points on the salient object, not just mask-interior peaks."""
        from regen3d_tpu.pipeline.detection import generate_points

        params, model, cfg = trained
        ckpt = str(tmp_path / "sal_ckpt")
        save_saliency_checkpoint(ckpt, params, cfg)
        sm = SaliencyModel.load(ckpt)
        assert sm.model.cfg.image_size == cfg.image_size

        rng = np.random.default_rng(5)
        imgs, gts = synth_saliency_batch(rng, 4, cfg.image_size)
        hits = 0
        total = 0
        for im, gt in zip(imgs, gts):
            mask = np.ones(gt.shape, bool)      # whole-image mask
            pts = generate_points("saliency", (im * 255).astype(np.uint8),
                                  mask, 3, saliency_model=sm)
            assert len(pts) >= 1
            for x, y in pts:
                total += 1
                hits += bool(gt[int(y), int(x)] > 0.5)
        assert hits / total > 0.5               # majority land on object

    def test_fallback_without_model(self):
        """No saliency model → max_distance behavior (mask-interior)."""
        from regen3d_tpu.pipeline.detection import (
            generate_points,
            points_max_distance,
        )
        mask = np.zeros((48, 48), bool)
        mask[10:30, 8:40] = True
        img = np.zeros((48, 48, 3), np.uint8)
        a = generate_points("saliency", img, mask, 2)
        b = points_max_distance(mask, 2)
        np.testing.assert_array_equal(a, b)
