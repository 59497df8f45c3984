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


class TestAtlasBaking:
    def test_atlas_roundtrip_via_glb(self, tmp_path):
        """Texel atlas bakes a red front view; the textured GLB reloads and
        front-face texels sample red."""
        import io
        from PIL import Image
        from regen3d_tpu.pipeline.texture import bake_texture_atlas
        from regen3d_tpu.utils.glb import MeshData, SceneData, load_glb, save_glb

        verts, faces = _box()
        img = np.zeros((64, 64, 3), np.float32)
        img[:, :] = (1.0, 0.1, 0.1)
        cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                     focal=jnp.asarray([64.0, 64.0]),
                     principal=jnp.asarray([32.0, 32.0]), image_size=(64, 64))
        nv, nf, uvs, png = bake_texture_atlas(verts, faces, [(cam, img)],
                                              texels_per_face=4)
        assert nv.shape == (36, 3) and nf.shape == (12, 3)
        assert uvs.shape == (36, 2)
        assert np.all((uvs >= 0) & (uvs <= 1))

        p = str(tmp_path / "tex.glb")
        save_glb(p, SceneData(meshes=[MeshData(
            name="t", vertices=nv, faces=nf, uvs=uvs, texture_png=png)]))
        loaded = load_glb(p)
        m = loaded.meshes[0]
        tex = np.asarray(Image.open(io.BytesIO(m.texture_png)).convert("RGB"),
                         np.float32) / 255.0
        # sample the texture at the UV of a front-face (z min) corner
        front_faces = [i for i in range(12)
                       if verts[faces[i], 2].mean() < 1.9]
        fi = front_faces[0]
        uv = m.uvs[m.faces[fi]].mean(0)
        h, w = tex.shape[:2]
        texel = tex[int(uv[1] * (h - 1)), int(uv[0] * (w - 1))]
        assert texel[0] > 0.7 and texel[1] < 0.4  # red-ish


class TestBakePadding:
    """Row-bucket padding in the shared accumulate-view program must not
    leak padded queries or padded faces into the result."""

    def test_bucket_edge_counts(self):
        import jax.numpy as jnp
        from regen3d_tpu.camera import lookat_camera
        from regen3d_tpu.pipeline.texture import _ROW_BUCKET, bake_point_colors

        rng = np.random.default_rng(3)
        # two quads facing the camera; queries ON the front surface
        verts = np.asarray([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]],
                           np.float32)
        faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        n = _ROW_BUCKET + 7          # force a pad on the query rows
        uv = rng.random((n, 2)).astype(np.float32) * 1.6 - 0.8
        pos = np.stack([uv[:, 0], uv[:, 1], np.full(n, 2.0, np.float32)], -1)
        nrm = np.tile(np.asarray([[0, 0, -1]], np.float32), (n, 1))
        img = np.full((64, 64, 3), 0.25, np.float32)
        cam = lookat_camera(np.asarray([0, 0, 0], np.float32),
                            np.asarray([0, 0, 2.0], np.float32),
                            (64, 64), focal_px=48.0)
        colors, cov = bake_point_colors(pos, nrm, (verts, faces), [(cam, img)])
        assert colors.shape == (n, 3)
        assert cov.shape == (n,)
        assert (cov > 0).mean() > 0.5          # surface queries see the view
        np.testing.assert_allclose(colors[cov > 0], 0.25, atol=1e-5)
