"""Pallas edge-silhouette kernel vs the XLA implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.camera import Camera
from regen3d_tpu.ops.pallas_rasterize import soft_silhouette_edge_pallas
from regen3d_tpu.ops.rasterize import soft_silhouette_edge

H = W = 128


def _cam():
    return Camera(R=jnp.eye(3), T=jnp.zeros(3),
                  focal=jnp.asarray([128.0, 128.0]),
                  principal=jnp.asarray([W / 2.0, H / 2.0]),
                  image_size=(H, W))


def _mesh(rng, n_faces=48):
    v = rng.normal(size=(n_faces, 3, 3)).astype(np.float32) * 0.08
    v += rng.uniform(-0.5, 0.5, size=(n_faces, 1, 3)).astype(np.float32)
    v += np.asarray([0, 0, 2.5], np.float32)
    return (jnp.asarray(v.reshape(-1, 3)),
            jnp.asarray(np.arange(n_faces * 3, dtype=np.int32).reshape(-1, 3)))


class TestPallasEdge:
    def test_forward_matches_xla(self, rng):
        cam = _cam()
        verts, faces = _mesh(rng)
        vs = cam.view_to_screen(verts)
        ref = soft_silhouette_edge(vs, faces, (H, W), sigma=1e-5,
                                   tile=32, faces_per_tile=48)
        out = soft_silhouette_edge_pallas(vs, faces, (H, W), sigma=1e-5,
                                          faces_per_tile=48, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_gradients_match_xla(self, rng):
        cam = _cam()
        verts, faces = _mesh(rng, n_faces=24)

        def loss_ref(v):
            vs = cam.view_to_screen(v)
            return jnp.mean(soft_silhouette_edge(vs, faces, (H, W), sigma=1e-4,
                                                 tile=32, faces_per_tile=24))

        def loss_pl(v):
            vs = cam.view_to_screen(v)
            return jnp.mean(soft_silhouette_edge_pallas(
                vs, faces, (H, W), sigma=1e-4, faces_per_tile=24,
                interpret=True))

        g_ref = np.asarray(jax.grad(loss_ref)(verts))
        g_pl = np.asarray(jax.grad(loss_pl)(verts))
        np.testing.assert_allclose(g_pl, g_ref, atol=2e-6, rtol=1e-3)

    def test_masked_faces(self, rng):
        cam = _cam()
        verts, faces = _mesh(rng, n_faces=32)
        mask = jnp.asarray(rng.random(32) > 0.4)
        vs = cam.view_to_screen(verts)
        ref = soft_silhouette_edge(vs, faces, (H, W), sigma=1e-5, tile=32,
                                   faces_per_tile=32, faces_mask=mask)
        out = soft_silhouette_edge_pallas(vs, faces, (H, W), sigma=1e-5,
                                          faces_per_tile=32, faces_mask=mask,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestPallasInFitEngine:
    def test_fit_poses_with_pallas_raster(self):
        """The kernel path works under the fit engine's vmap+jit+grad
        (interpret mode on CPU); parity vs the XLA edge path."""
        import numpy as np

        from regen3d_tpu.camera import Camera
        from regen3d_tpu.pipeline.pose_fit import (
            FitConfig,
            ObjectBatch,
            PoseParams,
            fit_poses,
        )

        rng = np.random.default_rng(0)
        b, nf = 2, 64
        nv = 32
        verts = rng.normal(size=(b, nv, 3)).astype(np.float32) * 0.2
        verts[..., 2] += 2.5
        faces = rng.integers(0, nv, (b, nf, 3)).astype(np.int32)
        img = 64
        cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                     focal=jnp.asarray([64.0, 64.0]),
                     principal=jnp.asarray([32.0, 32.0]),
                     image_size=(img, img))
        mask = np.zeros((b, img, img), np.float32)
        mask[:, 16:48, 16:48] = 1.0
        pts = rng.normal(size=(b, 64, 3)).astype(np.float32) * 0.2
        pts[..., 2] += 2.5
        batch = ObjectBatch(
            verts=jnp.asarray(verts), verts_mask=jnp.ones((b, nv), bool),
            faces=jnp.asarray(faces), faces_mask=jnp.ones((b, nf), bool),
            target_mask=jnp.asarray(mask), target_points=jnp.asarray(pts),
            points_mask=jnp.ones((b, 64), bool),
            pivot_R=jnp.tile(jnp.eye(3)[None], (b, 1, 1)),
            pivot_t=jnp.zeros((b, 3)),
            on_floor=jnp.zeros(b, bool), object_valid=jnp.ones(b, bool),
            bbox_lo=jnp.asarray([-10.0, -10.0, 0.0]),
            bbox_hi=jnp.asarray([10.0, 10.0, 10.0]))
        init = PoseParams.zeros(b)._replace(
            translation=jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (b, 1)))

        def run(pallas):
            cfg = FitConfig(image_hw=(img, img), sigma=1e-4,
                            max_iterations=3, early_stop_min_iters=3,
                            use_edge_raster=True, bin_tile=32,
                            faces_per_tile=16, record_history=False,
                            use_pallas_raster=pallas)
            return fit_poses(init, batch, cam, cfg)

        r_pal = run(True)
        r_xla = run(False)
        assert np.all(np.isfinite(np.asarray(r_pal.params.translation)))
        np.testing.assert_allclose(np.asarray(r_pal.params.translation),
                                   np.asarray(r_xla.params.translation),
                                   atol=5e-4)
