"""Binned rasterizer: equivalence with the dense version + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.camera import Camera
from regen3d_tpu.ops.rasterize import soft_silhouette, soft_silhouette_binned

H = W = 128


def _cam():
    return Camera(R=jnp.eye(3), T=jnp.zeros(3),
                  focal=jnp.asarray([128.0, 128.0]),
                  principal=jnp.asarray([W / 2.0, H / 2.0]),
                  image_size=(H, W))


def _random_mesh(rng, n_faces=64, spread=0.6):
    v = rng.normal(size=(n_faces * 3, 3)).astype(np.float32) * 0.08
    centers = rng.uniform(-spread, spread, size=(n_faces, 1, 3)).astype(np.float32)
    v = v.reshape(n_faces, 3, 3) + centers + np.asarray([0, 0, 2.5], np.float32)
    verts = v.reshape(-1, 3)
    faces = np.arange(n_faces * 3, dtype=np.int32).reshape(-1, 3)
    return jnp.asarray(verts), jnp.asarray(faces)


class TestBinnedEquivalence:
    def test_matches_dense(self, rng):
        cam = _cam()
        verts, faces = _random_mesh(rng)
        vs = cam.view_to_screen(verts)
        dense = soft_silhouette(vs, faces, (H, W), sigma=1e-5, chunk=64)
        binned = soft_silhouette_binned(vs, faces, (H, W), sigma=1e-5,
                                        tile=32, faces_per_tile=64)
        np.testing.assert_allclose(np.asarray(binned), np.asarray(dense),
                                   atol=1e-4)

    def test_matches_with_mask(self, rng):
        cam = _cam()
        verts, faces = _random_mesh(rng, n_faces=40)
        mask = jnp.asarray(rng.random(40) > 0.3)
        vs = cam.view_to_screen(verts)
        dense = soft_silhouette(vs, faces, (H, W), sigma=1e-5, chunk=32,
                                faces_mask=mask)
        binned = soft_silhouette_binned(vs, faces, (H, W), sigma=1e-5,
                                        faces_mask=mask, tile=32,
                                        faces_per_tile=40)
        np.testing.assert_allclose(np.asarray(binned), np.asarray(dense),
                                   atol=1e-4)

    def test_gradients_match(self, rng):
        cam = _cam()
        verts, faces = _random_mesh(rng, n_faces=24)

        def loss_dense(v):
            vs = cam.view_to_screen(v)
            return jnp.mean(soft_silhouette(vs, faces, (H, W), sigma=1e-4,
                                            chunk=24))

        def loss_binned(v):
            vs = cam.view_to_screen(v)
            return jnp.mean(soft_silhouette_binned(vs, faces, (H, W),
                                                   sigma=1e-4, tile=32,
                                                   faces_per_tile=24))

        g1 = jax.grad(loss_dense)(verts)
        g2 = jax.grad(loss_binned)(verts)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   atol=1e-5, rtol=1e-3)

    def test_overflowing_bins_degrade_gracefully(self, rng):
        """With K < true overlap the result underestimates but stays valid."""
        cam = _cam()
        verts, faces = _random_mesh(rng, n_faces=128, spread=0.1)  # clustered
        vs = cam.view_to_screen(verts)
        binned = soft_silhouette_binned(vs, faces, (H, W), sigma=1e-5,
                                        tile=32, faces_per_tile=16)
        a = np.asarray(binned)
        assert np.all((a >= 0) & (a <= 1))
