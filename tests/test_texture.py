"""Texture baking: visibility + facing-weight vertex color projection."""

import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.camera import Camera
from regen3d_tpu.pipeline.texture import bake_vertex_colors, orbit_views


def _box(half=0.4):
    v = np.asarray([[x, y, z] for x in (-half, half) for y in (-half, half)
                    for z in (-half, half)], np.float32)
    f = np.asarray([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                    [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                    [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v + np.asarray([0, 0, 2.0], np.float32), f


class TestBaking:
    def test_front_face_gets_image_color_back_gets_fallback(self):
        verts, faces = _box()
        img = np.zeros((64, 64, 3), np.float32)
        img[:, :] = (1.0, 0.0, 0.0)  # red view
        cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                     focal=jnp.asarray([64.0, 64.0]),
                     principal=jnp.asarray([32.0, 32.0]), image_size=(64, 64))
        fallback = np.full((8, 3), 0.5, np.float32)
        rgba = bake_vertex_colors(verts, faces, [(cam, img)], fallback=fallback)
        assert rgba.shape == (8, 4)
        # front vertices (z = 1.6, closest) visible → red
        front = verts[:, 2] < 1.8
        np.testing.assert_allclose(rgba[front, 0], 1.0, atol=1e-3)
        np.testing.assert_allclose(rgba[front, 1], 0.0, atol=1e-3)
        # back vertices occluded → fallback gray
        back = ~front
        np.testing.assert_allclose(rgba[back, :3], 0.5, atol=1e-3)

    def test_orbit_views_cover_all_vertices(self):
        verts, faces = _box()
        img = np.full((64, 64, 3), 0.8, np.float32)
        views = orbit_views(verts.mean(0), radius=2.5, image=img, n_views=6)
        assert len(views) == 6
        rgba = bake_vertex_colors(verts, faces, views)
        # every vertex visible from some orbit view → all near 0.8
        np.testing.assert_allclose(rgba[:, :3], 0.8, atol=0.05)
