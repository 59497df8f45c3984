"""Metric suite + Poisson reconstruction tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.ops.metrics import (
    chamfer_metrics,
    evaluate_clouds,
    fscore,
    psnr,
    ssim,
    volume_iou_bbox,
    wasserstein_flat,
)
from regen3d_tpu.ops.poisson import poisson_reconstruct


class TestMetrics:
    def test_identical_clouds(self, rng):
        x = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32))
        m = evaluate_clouds(x, x, chunk=128)
        assert m["chamfer_p3d"] == pytest.approx(0.0, abs=1e-6)
        assert m["chamfer_pcu"] == pytest.approx(0.0, abs=1e-4)
        assert m["hausdorff"] == pytest.approx(0.0, abs=1e-4)
        assert m["fscore"] == pytest.approx(1.0)
        assert m["volume_iou_bbox"] == pytest.approx(1.0, abs=1e-5)
        assert m["wasserstein"] == pytest.approx(0.0, abs=1e-5)
        assert m["precision_001"] == pytest.approx(1.0)

    def test_shifted_cloud(self, rng):
        x = rng.normal(size=(400, 3)).astype(np.float32)
        y = x + np.asarray([0.05, 0, 0], np.float32)
        m = chamfer_metrics(jnp.asarray(x), jnp.asarray(y), chunk=128)
        assert float(m["chamfer_pcu"]) <= 0.05 + 1e-4
        f = fscore(jnp.asarray(x), jnp.asarray(y), tau=0.1, chunk=128)
        assert float(f["fscore"]) > 0.95

    def test_volume_iou(self):
        a = jnp.asarray([[0.0, 0, 0], [1, 1, 1]])
        b = jnp.asarray([[0.5, 0, 0], [1.5, 1, 1]])
        assert float(volume_iou_bbox(a, b)) == pytest.approx(0.5 / 1.5, abs=1e-5)

    def test_wasserstein_shift(self, rng):
        x = rng.normal(size=(1000, 3)).astype(np.float32)
        w = wasserstein_flat(jnp.asarray(x), jnp.asarray(x + 0.3))
        assert float(w) == pytest.approx(0.3, abs=0.02)

    def test_psnr_ssim(self, rng):
        img = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        assert float(psnr(img, img)) > 100
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
        noisy = jnp.clip(img + 0.1 * jnp.asarray(
            rng.normal(size=(64, 64, 3)).astype(np.float32)), 0, 1)
        assert 15 < float(psnr(noisy, img)) < 30
        assert 0.2 < float(ssim(noisy, img)) < 0.999


class TestEvalStore:
    def test_dump_and_compare(self, tmp_path):
        from regen3d_tpu.utils.evalstore import dump_evaluation, get_previous_evaluation
        root = str(tmp_path / "evaluation")
        d1 = dump_evaluation(root, {"chamfer": 0.5, "psnr": 20.0},
                             {"seed": 1}, timestamp="24_01_01_000000")
        d2 = dump_evaluation(root, {"chamfer": 0.4, "psnr": 21.0},
                             {"seed": 1}, timestamp="24_01_02_000000")
        import os
        assert os.path.exists(os.path.join(d1, "metrics.json"))
        assert os.path.exists(os.path.join(d2, "comparison.csv"))
        prev = get_previous_evaluation(root)
        assert prev["chamfer"] == 0.4  # latest


class TestPoisson:
    def test_sphere_reconstruction(self, rng):
        # oriented samples of a unit sphere
        n = 4000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = v.astype(np.float32)
        normals = v.astype(np.float32)
        verts, faces = poisson_reconstruct(pts, normals, resolution=48)
        assert len(verts) > 200 and len(faces) > 200
        radii = np.linalg.norm(verts - verts.mean(0), axis=1)
        assert abs(radii.mean() - 1.0) < 0.1
        assert radii.std() < 0.08

    def test_plane_patch(self, rng):
        pts = np.stack([rng.uniform(-1, 1, 3000), rng.uniform(-1, 1, 3000),
                        np.zeros(3000)], -1).astype(np.float32)
        normals = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (3000, 1))
        # density trim removes the closure 'bubble' an open scan produces
        verts, faces = poisson_reconstruct(pts, normals, resolution=48,
                                           density_quantile=0.2)
        assert len(faces) > 50
        # reconstructed surface near z=0 inside the support region
        inner = verts[(np.abs(verts[:, 0]) < 0.7) & (np.abs(verts[:, 1]) < 0.7)]
        assert len(inner) > 0
        assert np.median(np.abs(inner[:, 2])) < 0.12
