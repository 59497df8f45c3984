"""SAM family tests at tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.models.sam import SAM, SamConfig


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = SamConfig.tiny()
    model = SAM(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    pts = jnp.zeros((1, 2, 2))
    labs = -jnp.ones((1, 2))
    boxes = jnp.asarray([[[0.2, 0.2], [0.8, 0.8]]])
    params = model.init(jax.random.PRNGKey(0), img, pts, labs, boxes)
    return cfg, model, params


class TestSAM:
    def test_mask_shapes(self, tiny_sam, rng):
        cfg, model, params = tiny_sam
        img = jnp.asarray(rng.uniform(size=(1, cfg.image_size, cfg.image_size, 3)),
                          dtype=jnp.float32)
        pts = jnp.asarray([[[0.5, 0.5], [0.3, 0.7]]])
        labs = jnp.asarray([[1.0, 0.0]])
        boxes = jnp.asarray([[[0.25, 0.25], [0.75, 0.75]]])
        masks, iou = model.apply(params, img, pts, labs, boxes)
        g = cfg.image_size // cfg.patch
        assert masks.shape == (1, 4, 4 * g, 4 * g)
        assert iou.shape == (1, 4)
        assert np.all(np.isfinite(np.asarray(masks)))

    def test_encode_decode_split(self, tiny_sam, rng):
        """The interactive-editor path: encode once, decode many prompts
        (manual_editor.py re-prompts the same embedding repeatedly)."""
        cfg, model, params = tiny_sam
        img = jnp.asarray(rng.uniform(size=(1, cfg.image_size, cfg.image_size, 3)),
                          dtype=jnp.float32)
        emb = model.apply(params, img, method=SAM.encode)
        g = cfg.image_size // cfg.patch
        assert emb.shape == (1, g, g, cfg.prompt_dim)
        for px in (0.3, 0.6):
            masks, iou = model.apply(
                params, emb, jnp.asarray([[[px, 0.5]]]), jnp.asarray([[1.0]]),
                jnp.asarray([[[0.0, 0.0], [1.0, 1.0]]]), method=SAM.decode)
            assert masks.shape[1] == 4  # upstream num_mask_tokens = 3 multimask + 1 single

    def test_prompt_sensitivity(self, tiny_sam, rng):
        """Different prompts must give different masks (plumbing check)."""
        cfg, model, params = tiny_sam
        img = jnp.asarray(rng.uniform(size=(1, cfg.image_size, cfg.image_size, 3)),
                          dtype=jnp.float32)
        boxes = jnp.asarray([[[0.0, 0.0], [0.4, 0.4]]])
        m1, _ = model.apply(params, img, jnp.zeros((1, 1, 2)),
                            -jnp.ones((1, 1)), boxes)
        boxes2 = jnp.asarray([[[0.6, 0.6], [1.0, 1.0]]])
        m2, _ = model.apply(params, img, jnp.zeros((1, 1, 2)),
                            -jnp.ones((1, 1)), boxes2)
        assert float(jnp.abs(m1 - m2).max()) > 1e-6
