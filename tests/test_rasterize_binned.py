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


class TestEdgeRaster:
    def test_matches_dense_modulo_corners(self, rng):
        from regen3d_tpu.ops.rasterize import soft_silhouette_edge
        cam = _cam()
        verts, faces = _random_mesh(rng)
        vs = cam.view_to_screen(verts)
        dense = np.asarray(soft_silhouette(vs, faces, (H, W), sigma=1e-5,
                                           chunk=64))
        edge = np.asarray(soft_silhouette_edge(vs, faces, (H, W), sigma=1e-5,
                                               tile=32, faces_per_tile=64))
        # binary coverage agrees everywhere except a sub-pixel corner halo
        agree = ((dense > 0.5) == (edge > 0.5)).mean()
        assert agree > 0.995
        # interiors identical
        interior = dense > 0.999
        if interior.any():
            np.testing.assert_allclose(edge[interior], dense[interior],
                                       atol=1e-3)

    def test_gradients_flow(self, rng):
        import jax
        import jax.numpy as jnp
        from regen3d_tpu.ops.rasterize import soft_silhouette_edge
        cam = _cam()
        verts, faces = _random_mesh(rng, n_faces=16)

        def loss(v):
            vs = cam.view_to_screen(v)
            return jnp.mean(soft_silhouette_edge(vs, faces, (H, W),
                                                 sigma=1e-4, tile=32,
                                                 faces_per_tile=16))

        g = np.asarray(jax.grad(loss)(verts))
        assert np.all(np.isfinite(g)) and np.abs(g).max() > 1e-7

    def test_precomputed_bins_with_margin(self, rng):
        import jax.numpy as jnp
        from regen3d_tpu.ops.rasterize import (
            compute_silhouette_bins, soft_silhouette_edge)
        cam = _cam()
        verts, faces = _random_mesh(rng, n_faces=32)
        vs = cam.view_to_screen(verts)
        bins = compute_silhouette_bins(vs, faces, (H, W), sigma=1e-5,
                                       tile=32, faces_per_tile=32,
                                       margin_px=12.0)
        # shift vertices a few pixels — stale bins with margin still exact
        vs2 = cam.view_to_screen(verts + jnp.asarray([0.05, 0.03, 0.0]))
        with_bins = np.asarray(soft_silhouette_edge(
            vs2, faces, (H, W), sigma=1e-5, tile=32, faces_per_tile=32,
            bins=bins))
        fresh = np.asarray(soft_silhouette_edge(
            vs2, faces, (H, W), sigma=1e-5, tile=32, faces_per_tile=32))
        # identical up to the softplus falloff tail at the pad radius
        np.testing.assert_allclose(with_bins, fresh, atol=0.02)
        assert (np.abs(with_bins - fresh) > 1e-4).mean() < 0.001

    def test_fit_with_edge_raster(self, rng):
        """The engine converges with the MXU edge path enabled."""
        import jax.numpy as jnp
        from regen3d_tpu.ops.sampling import sample_points_from_meshes
        from regen3d_tpu.pipeline.pose_fit import (
            FitConfig, ObjectBatch, PoseParams, fit_poses)
        import jax
        cam = _cam()
        hx = 0.35
        v = np.asarray([[x, y, z] for x in (-hx, hx) for y in (-hx, hx)
                        for z in (-0.2, 0.2)], np.float32)
        f = np.asarray([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
        gt_shift = jnp.asarray([0.25, -0.1, 2.5])
        gt_v = jnp.asarray(v) + gt_shift
        from regen3d_tpu.ops.rasterize import soft_silhouette
        vs = cam.view_to_screen(gt_v)
        mask = (soft_silhouette(vs, jnp.asarray(f), (H, W), sigma=1e-5,
                                chunk=12) > 0.5).astype(jnp.float32)
        (pts,) = sample_points_from_meshes(gt_v, jnp.asarray(f), 256,
                                           jax.random.PRNGKey(0))
        batch = ObjectBatch(
            verts=jnp.asarray(v)[None], verts_mask=jnp.ones((1, 8), bool),
            faces=jnp.asarray(f)[None], faces_mask=jnp.ones((1, 12), bool),
            target_mask=mask[None], target_points=pts[None],
            points_mask=jnp.ones((1, 256), bool),
            pivot_R=jnp.eye(3)[None], pivot_t=jnp.zeros((1, 3)),
            on_floor=jnp.zeros(1, bool), object_valid=jnp.ones(1, bool),
            bbox_lo=jnp.asarray([-5.0, -5.0, 0.0]),
            bbox_hi=jnp.asarray([5.0, 5.0, 10.0]))
        cfg = FitConfig(image_hw=(H, W), sigma=1e-5, max_iterations=80,
                        early_stop_min_iters=80, learning_rate=0.02,
                        face_chunk=12, point_chunk=256, record_history=False,
                        use_edge_raster=True, bin_tile=32, faces_per_tile=12,
                        bin_margin_px=40.0)
        init = PoseParams.zeros(1)._replace(
            translation=jnp.asarray([[0.0, 0.0, 2.5]]))
        res = fit_poses(init, batch, cam, cfg)
        t = np.asarray(res.params.translation[0])
        np.testing.assert_allclose(t, np.asarray(gt_shift), atol=0.08)


class TestHardBinned:
    """rasterize_hard_binned / rasterize_hard_auto vs the dense z-buffer."""

    def test_matches_dense(self, rng):
        from regen3d_tpu.ops.rasterize import (
            rasterize_hard,
            rasterize_hard_binned,
        )
        cam = _cam()
        verts, faces = _random_mesh(rng, n_faces=200)
        vs = cam.view_to_screen(verts)
        dense = rasterize_hard(vs, faces, (H, W), chunk=64)
        binned = rasterize_hard_binned(vs, faces, (H, W), tile=32,
                                       faces_per_tile=200)
        np.testing.assert_array_equal(np.asarray(binned.face_idx),
                                      np.asarray(dense.face_idx))
        np.testing.assert_allclose(np.asarray(binned.depth),
                                   np.asarray(dense.depth), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(binned.bary),
                                   np.asarray(dense.bary), atol=1e-5)

    def test_faces_mask(self, rng):
        from regen3d_tpu.ops.rasterize import (
            rasterize_hard,
            rasterize_hard_binned,
        )
        cam = _cam()
        verts, faces = _random_mesh(rng, n_faces=150)
        mask = jnp.asarray(rng.random(150) > 0.4)
        vs = cam.view_to_screen(verts)
        dense = rasterize_hard(vs, faces, (H, W), faces_mask=mask, chunk=64)
        binned = rasterize_hard_binned(vs, faces, (H, W), faces_mask=mask,
                                       tile=32, faces_per_tile=150)
        np.testing.assert_array_equal(np.asarray(binned.face_idx),
                                      np.asarray(dense.face_idx))

    def test_auto_dispatch_lossless(self, rng):
        """auto path must pick a K >= the true overlap and match dense."""
        from regen3d_tpu.ops.rasterize import (
            max_faces_per_tile,
            rasterize_hard,
            rasterize_hard_auto,
        )
        cam = _cam()
        verts, faces = _random_mesh(rng, n_faces=400)
        vs = cam.view_to_screen(verts)
        kmax = int(jax.jit(max_faces_per_tile,
                           static_argnames=("image_hw", "tile"))(
            vs, faces, image_hw=(H, W), tile=64))
        assert 0 < kmax <= 400
        auto = rasterize_hard_auto(vs, faces, (H, W))
        dense = rasterize_hard(vs, faces, (H, W), chunk=64)
        np.testing.assert_array_equal(np.asarray(auto.face_idx),
                                      np.asarray(dense.face_idx))

    def test_auto_fallback_unaligned(self, rng):
        """Non-tile-aligned images fall back to the dense path."""
        from regen3d_tpu.ops.rasterize import (
            rasterize_hard,
            rasterize_hard_auto,
        )
        hw = (96, 100)
        cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                     focal=jnp.asarray([96.0, 96.0]),
                     principal=jnp.asarray([50.0, 48.0]), image_size=hw)
        verts, faces = _random_mesh(rng, n_faces=300)
        vs = cam.view_to_screen(verts)
        auto = rasterize_hard_auto(vs, faces, hw)
        dense = rasterize_hard(vs, faces, hw, chunk=64)
        np.testing.assert_array_equal(np.asarray(auto.face_idx),
                                      np.asarray(dense.face_idx))
