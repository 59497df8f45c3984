"""Gauss-Newton camera refinement: recover a perturbed camera exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.ops.bundle_adjust import refine_camera_gn
from regen3d_tpu.transforms.rotations import so3_exp


def _setup(rng, noise_px=0.0):
    pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    R_true = np.asarray(so3_exp(jnp.asarray([0.05, -0.1, 0.02])), np.float32)
    T_true = np.asarray([0.1, -0.05, 0.2], np.float32)
    f_true = 500.0
    pp = jnp.asarray([320.0, 240.0])
    v = pts @ R_true + T_true
    obs = np.stack([320 + f_true * v[:, 0] / v[:, 2],
                    240 + f_true * v[:, 1] / v[:, 2]], -1).astype(np.float32)
    obs += rng.normal(size=obs.shape).astype(np.float32) * noise_px
    return pts, obs, R_true, T_true, f_true, pp


class TestBundleAdjust:
    def test_recovers_exact_camera(self, rng):
        pts, obs, R_true, T_true, f_true, pp = _setup(rng)
        res = refine_camera_gn(
            jnp.asarray(pts), jnp.asarray(obs),
            R_init=jnp.eye(3), T_init=jnp.zeros(3),
            focal_init=400.0, principal=pp, max_iterations=30)
        np.testing.assert_allclose(np.asarray(res.R), R_true, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.T), T_true, atol=1e-2)
        assert float(res.focal) == pytest.approx(f_true, rel=0.01)
        assert float(res.rmse_px) < 0.5

    def test_noisy_observations(self, rng):
        pts, obs, R_true, T_true, f_true, pp = _setup(rng, noise_px=0.5)
        res = refine_camera_gn(
            jnp.asarray(pts), jnp.asarray(obs),
            R_init=jnp.eye(3), T_init=jnp.zeros(3),
            focal_init=450.0, principal=pp, max_iterations=30)
        np.testing.assert_allclose(np.asarray(res.R), R_true, atol=5e-3)
        assert float(res.focal) == pytest.approx(f_true, rel=0.05)

    def test_fixed_focal(self, rng):
        pts, obs, R_true, T_true, f_true, pp = _setup(rng)
        res = refine_camera_gn(
            jnp.asarray(pts), jnp.asarray(obs),
            R_init=jnp.eye(3), T_init=jnp.zeros(3),
            focal_init=f_true, principal=pp, max_iterations=30,
            refine_focal=False)
        assert float(res.focal) == pytest.approx(f_true, abs=1e-4)
        np.testing.assert_allclose(np.asarray(res.R), R_true, atol=1e-3)

    def test_jittable(self, rng):
        pts, obs, *_rest, pp = _setup(rng)
        fn = jax.jit(lambda p, o: refine_camera_gn(
            p, o, jnp.eye(3), jnp.zeros(3), 400.0, pp))
        res = fn(jnp.asarray(pts), jnp.asarray(obs))
        assert np.isfinite(float(res.rmse_px))
