"""Convention test matrix (SURVEY §7.3 item 5: sign errors silently ruin poses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.transforms import (
    blender_to_p3d,
    kabsch,
    matrix_to_quat,
    p3d_to_blender,
    quat_to_matrix,
    so3_exp,
    so3_log,
    Transform3d,
    umeyama,
    yaw_rotation,
)
from regen3d_tpu.transforms.rotations import random_rotation, rotation_about_axis


def _random_blender_world(rng):
    """A plausible Blender camera matrix_world-style 4x4."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    B = np.eye(4)
    B[:3, :3] = R
    B[:3, 3] = rng.normal(size=3) * 3
    return B


class TestConventions:
    def test_b2p_p2b_roundtrip(self, rng):
        for _ in range(10):
            B = _random_blender_world(rng)
            R, T = blender_to_p3d(B)
            B2 = p3d_to_blender(R, T)
            np.testing.assert_allclose(B, B2, atol=1e-10)

    def test_b2p_rotation_orthonormal(self, rng):
        B = _random_blender_world(rng)
        R, _ = blender_to_p3d(B)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-9)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        # log returns the canonical (angle ≤ π) representative, so compare
        # via exp: exp(log(exp(v))) == exp(v) for any v.
        v = jnp.asarray(rng.normal(size=(32, 3)) * 1.5)
        R = so3_exp(v)
        R2 = so3_exp(so3_log(R))
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_exp_log_roundtrip_small_angles(self, rng):
        v = jnp.asarray(rng.normal(size=(32, 3)) * 0.5)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1.0)  # ‖v‖ ≤ 1 < π
        v2 = so3_log(so3_exp(v))
        np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-4)

    def test_exp_orthonormal(self, rng):
        v = jnp.asarray(rng.normal(size=(8, 3)))
        R = so3_exp(v)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-5)

    def test_exp_zero_is_identity_and_differentiable(self):
        R = so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        g = jax.grad(lambda v: jnp.sum(so3_exp(v)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_yaw_rotation_preserves_y(self):
        R = yaw_rotation(jnp.asarray(0.7))
        up = jnp.asarray([0.0, 1.0, 0.0])
        np.testing.assert_allclose(np.asarray(up @ R), np.asarray(up), atol=1e-6)

    def test_quat_matrix_roundtrip(self, rng):
        key = jax.random.PRNGKey(0)
        R = random_rotation(key, (16,))
        q = matrix_to_quat(R)
        R2 = quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_elementary_rotation(self):
        R = rotation_about_axis(jnp.asarray(np.pi / 2), "z")
        # column convention: R @ x rotates x→y
        np.testing.assert_allclose(np.asarray(R @ jnp.asarray([1.0, 0, 0])),
                                   [0, 1, 0], atol=1e-6)


class TestRigid:
    def test_umeyama_recovers_similarity(self, rng):
        src = jnp.asarray(rng.normal(size=(100, 3)))
        R_true = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.9])))
        s_true, t_true = 2.5, np.asarray([1.0, -2.0, 0.5])
        dst = (np.asarray(src) @ R_true) * s_true + t_true
        R, t, s = umeyama(src, jnp.asarray(dst), estimate_scale=True)
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
        np.testing.assert_allclose(float(s), s_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)

    def test_kabsch_rigid_only(self, rng):
        src = jnp.asarray(rng.normal(size=(50, 3)))
        R_true = np.asarray(so3_exp(jnp.asarray([-1.0, 0.4, 0.1])))
        dst = np.asarray(src) @ R_true + np.asarray([0.3, 0.0, -1.0])
        R, t = kabsch(src, jnp.asarray(dst))
        aligned = np.asarray(src) @ np.asarray(R) + np.asarray(t)
        np.testing.assert_allclose(aligned, dst, atol=1e-5)

    def test_transform3d_compose_inverse(self, rng):
        key = jax.random.PRNGKey(3)
        t1 = Transform3d(random_rotation(key), jnp.asarray([1.0, 2, 3]), jnp.asarray(2.0))
        t2 = Transform3d(random_rotation(jax.random.PRNGKey(4)),
                         jnp.asarray([-1.0, 0, 1]), jnp.asarray(0.5))
        pts = jnp.asarray(rng.normal(size=(20, 3)), dtype=jnp.float32)
        a = t2.apply(t1.apply(pts))
        b = t1.compose(t2).apply(pts)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        c = t1.inverse().apply(t1.apply(pts))
        np.testing.assert_allclose(np.asarray(c), np.asarray(pts), atol=1e-4)

    def test_transform3d_matrix(self, rng):
        t = Transform3d(random_rotation(jax.random.PRNGKey(9)),
                        jnp.asarray([0.5, -1.0, 2.0]), jnp.asarray(1.5))
        pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
        hom = jnp.concatenate([pts, jnp.ones((10, 1))], axis=-1)
        via_matrix = (hom @ t.as_matrix())[:, :3]
        np.testing.assert_allclose(np.asarray(via_matrix), np.asarray(t.apply(pts)), atol=1e-4)
