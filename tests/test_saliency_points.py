"""Saliency transformer + prompt-point strategies + ICP replay utility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestSaliency:
    def test_forward(self, rng):
        from regen3d_tpu.models.saliency import SaliencyConfig, SaliencyTransformer
        cfg = SaliencyConfig.tiny()
        model = SaliencyTransformer(cfg)
        img = jnp.asarray(rng.uniform(size=(1, cfg.image_size, cfg.image_size, 3)),
                          dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), img)
        sal = model.apply(params, img)
        assert sal.shape == (1, cfg.image_size, cfg.image_size)
        a = np.asarray(sal)
        assert np.all((a >= 0) & (a <= 1))


class TestPointStrategies:
    def _mask(self):
        m = np.zeros((60, 80), bool)
        m[20:40, 30:60] = True
        return m

    def test_random_points_inside(self, rng):
        from regen3d_tpu.pipeline.detection import points_random
        pts = points_random(self._mask(), 5, rng)
        assert pts.shape == (5, 2)
        for x, y in pts:
            assert self._mask()[int(y), int(x)]

    def test_max_distance_points_deep_inside(self):
        from regen3d_tpu.pipeline.detection import points_max_distance
        pts = points_max_distance(self._mask(), 2)
        assert len(pts) >= 1
        # first point is near the mask centre (deepest)
        x, y = pts[0]
        assert 35 <= x <= 55 and 25 <= y <= 35

    def test_max_entropy_points(self, rng):
        from regen3d_tpu.pipeline.detection import points_max_entropy
        img = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
        pts = points_max_entropy(img, self._mask(), 3)
        assert pts.shape == (3, 2)
        for x, y in pts:
            assert self._mask()[int(y), int(x)]

    def test_dispatch(self, rng):
        from regen3d_tpu.pipeline.detection import generate_points
        img = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
        for method in ("random", "max_entropy", "max_distance", "saliency"):
            pts = generate_points(method, img, self._mask(), 2)
            assert pts.shape[1] == 2


class TestIcpReplay:
    def test_apply_similarity_to_glb(self, tmp_path, rng):
        from regen3d_tpu.pipeline.phase7_assemble import apply_similarity_to_glb
        from regen3d_tpu.utils.glb import MeshData, SceneData, load_glb, save_glb
        v = rng.normal(size=(12, 3)).astype(np.float32)
        f = rng.integers(0, 12, size=(8, 3)).astype(np.int32)
        p = str(tmp_path / "m.glb")
        save_glb(p, SceneData(meshes=[MeshData(name="m", vertices=v, faces=f)]))
        R = np.eye(3)
        out = apply_similarity_to_glb(p, R, np.asarray([1.0, 2, 3]), 2.0,
                                      str(tmp_path / "m2.glb"))
        v2 = load_glb(out).meshes[0].vertices
        np.testing.assert_allclose(v2, v * 2.0 + [1, 2, 3], atol=1e-5)
