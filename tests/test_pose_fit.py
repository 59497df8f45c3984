"""Phase-6 engine test: recover a known pose from synthetic supervision.

Mirrors the reference's de-facto verification (SURVEY §4): fit a mesh to a
silhouette + target cloud produced from a ground-truth pose and check
convergence — but as a proper automated test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.camera import Camera
from regen3d_tpu.ops.rasterize import soft_silhouette
from regen3d_tpu.ops.sampling import sample_points_from_meshes
from regen3d_tpu.pipeline.pose_fit import (
    FitConfig,
    ObjectBatch,
    PoseParams,
    batch_loss,
    find_best_initial_yaw,
    fit_poses,
    pose_transform,
)

H = W = 64


def _camera():
    return Camera(R=jnp.eye(3), T=jnp.zeros(3),
                  focal=jnp.asarray([64.0, 64.0]),
                  principal=jnp.asarray([W / 2.0, H / 2.0]),
                  image_size=(H, W))


def _box_mesh(hx=0.4, hy=0.3, hz=0.2):
    v = np.array([[x, y, z] for x in (-hx, hx) for y in (-hy, hy) for z in (-hz, hz)],
                 np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int32)
    return jnp.asarray(v), jnp.asarray(f)


def _make_batch(gt_shift, init_params=None, on_floor=False):
    """One-object batch whose supervision comes from the GT-shifted box."""
    cam = _camera()
    verts, faces = _box_mesh()
    gt_verts = verts + jnp.asarray(gt_shift)

    vs = cam.view_to_screen(cam.world_to_view(gt_verts))
    target_mask = (soft_silhouette(vs, faces, (H, W), sigma=1e-5, chunk=12) > 0.5
                   ).astype(jnp.float32)
    (gt_pts,) = sample_points_from_meshes(gt_verts, faces, 256, jax.random.PRNGKey(7))

    b = ObjectBatch(
        verts=verts[None], verts_mask=jnp.ones((1, 8), bool),
        faces=faces[None], faces_mask=jnp.ones((1, 12), bool),
        target_mask=target_mask[None],
        target_points=gt_pts[None], points_mask=jnp.ones((1, 256), bool),
        pivot_R=jnp.eye(3)[None], pivot_t=jnp.zeros((1, 3)),
        on_floor=jnp.asarray([on_floor]),
        object_valid=jnp.asarray([True]),
        bbox_lo=jnp.asarray([-5.0, -5.0, 0.0]),
        bbox_hi=jnp.asarray([5.0, 5.0, 10.0]),
    )
    return cam, b


CFG = FitConfig(image_hw=(H, W), sigma=1e-5, max_iterations=150,
                early_stop_min_iters=40, early_stop_grad=1e-4,
                learning_rate=0.02, face_chunk=12, point_chunk=256,
                use_focal=True, record_history=False)


class TestPoseFit:
    def test_recovers_translation(self):
        gt_shift = [0.3, -0.2, 2.5]
        cam, batch = _make_batch(gt_shift)
        init = PoseParams.zeros(1)
        # start in front of the camera, offset from the truth
        init = init._replace(translation=jnp.asarray([[0.0, 0.0, 2.5]]))
        res = fit_poses(init, batch, cam, CFG)
        t = np.asarray(res.params.translation[0])
        np.testing.assert_allclose(t, gt_shift, atol=0.06)
        assert float(res.losses[0]) < 0.05

    def test_recovers_scale(self):
        cam, batch = _make_batch([0.0, 0.0, 2.5])
        # same translation, wrong scale
        init = PoseParams.zeros(1)._replace(
            translation=jnp.asarray([[0.0, 0.0, 2.5]]),
            log_scale=jnp.asarray([0.4]))
        res = fit_poses(init, batch, cam, CFG)
        assert abs(float(res.params.log_scale[0])) < 0.08

    def test_loss_decreases(self):
        cam, batch = _make_batch([0.2, 0.1, 2.5])
        init = PoseParams.zeros(1)._replace(translation=jnp.asarray([[0.0, 0.0, 2.5]]))
        loss0 = float(batch_loss(init, batch, cam, CFG)[0])
        res = fit_poses(init, batch, cam, CFG)
        assert float(res.losses[0]) < loss0 * 0.5
        assert int(res.num_iters) > 0

    def test_padding_object_untouched(self):
        cam, batch = _make_batch([0.0, 0.0, 2.5])
        # add an invalid padding slot
        pad = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0)
                           if x.ndim >= 1 and x.shape[0] == 1 else x, batch)
        pad = pad._replace(object_valid=jnp.asarray([True, False]),
                           bbox_lo=batch.bbox_lo, bbox_hi=batch.bbox_hi)
        init = PoseParams.zeros(2)._replace(
            translation=jnp.asarray([[0.0, 0.0, 2.5], [0.0, 0.0, 2.5]]))
        res = fit_poses(init, pad, cam, CFG)
        # padding object's params must remain exactly at init
        np.testing.assert_allclose(np.asarray(res.params.translation[1]),
                                   [0, 0, 2.5], atol=1e-7)
        assert float(res.params.log_scale[1]) == 0.0

    def test_on_floor_freezes_height(self):
        cam, batch = _make_batch([0.3, 0.0, 2.5], on_floor=True)
        init = PoseParams.zeros(1)._replace(translation=jnp.asarray([[0.0, 0.0, 2.5]]))
        res = fit_poses(init, batch, cam, CFG)
        # the vertical (pivot-frame y) translation is gated out of the
        # transform for on-floor objects: the box stays centred at y=0
        # regardless of what the optimizer wrote into translation[1]
        v = np.asarray(pose_transform(res.params, batch, CFG)[0])
        assert abs(v[:, 1].min() + v[:, 1].max()) < 1e-5  # symmetric about 0

    def test_history_recorded(self):
        cam, batch = _make_batch([0.1, 0.0, 2.5])
        cfg = FitConfig(**{**CFG.__dict__, "record_history": True,
                           "max_iterations": 20, "early_stop_min_iters": 20})
        init = PoseParams.zeros(1)._replace(translation=jnp.asarray([[0.0, 0.0, 2.5]]))
        res = fit_poses(init, batch, cam, cfg)
        h = np.asarray(res.history)
        assert h.shape == (21, 1, 8)
        assert not np.allclose(h[0], h[int(res.num_iters)])


class TestYawGrid:
    def test_finds_rotation(self, rng):
        pts = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32) * np.asarray([3, 1, 0.3])
        yaw_true = 2 * np.pi * 3 / 8
        c, s = np.cos(yaw_true), np.sin(yaw_true)
        R = np.asarray([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)  # row-vec yaw
        target = pts @ np.asarray(R)
        best = find_best_initial_yaw(jnp.asarray(pts), jnp.asarray(target),
                                     num_steps=8, chunk=128)
        # the hand-built R above is yaw_rotation(-yaw_true); box has mod-π
        # symmetry, so the best grid angle is (−yaw_true) mod π
        expect = (-yaw_true) % np.pi
        assert float(best) % np.pi == pytest.approx(expect, abs=1e-4)


class TestBinnedBudgetGuard:
    """Large meshes at coarse resolutions overflow the fixed per-tile face
    bins (top_k keeps the lowest-index faces → silhouette fragments →
    divergence — bench fidelity probe r4). _binned_budget_ok must route
    such fits to the exact streaming rasterizer."""

    @staticmethod
    def _subdivided_box(n=4, hx=0.4, hy=0.3, hz=0.2):
        verts, faces = [], []
        lin = np.linspace(-1.0, 1.0, n + 1)
        for axis, sign in [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]:
            u_ax, v_ax = [a for a in range(3) if a != axis]
            uu, vv = np.meshgrid(lin, lin, indexing="ij")
            grid = np.zeros((n + 1, n + 1, 3), np.float32)
            grid[..., axis] = sign
            grid[..., u_ax] = uu
            grid[..., v_ax] = vv
            base = sum(len(v) for v in verts)
            verts.append(grid.reshape(-1, 3))
            idx = np.arange((n + 1) ** 2).reshape(n + 1, n + 1) + base
            a = idx[:-1, :-1].ravel()
            b = idx[1:, :-1].ravel()
            c = idx[1:, 1:].ravel()
            d = idx[:-1, 1:].ravel()
            faces.append(np.concatenate(
                [np.stack([a, b, c], -1), np.stack([a, c, d], -1)]))
        v = np.concatenate(verts) * np.asarray([hx, hy, hz], np.float32)
        return (jnp.asarray(v.astype(np.float32)),
                jnp.asarray(np.concatenate(faces).astype(np.int32)))

    def test_guard_trips_and_fit_converges(self):
        from regen3d_tpu.pipeline.pose_fit import _binned_budget_ok

        cam = _camera()
        verts, faces = self._subdivided_box()          # 192 faces
        nf, nv = faces.shape[0], verts.shape[0]
        gt_shift = [0.25, -0.15, 2.5]
        gt_verts = verts + jnp.asarray(gt_shift)
        vs = cam.view_to_screen(cam.world_to_view(gt_verts))
        target = (soft_silhouette(vs, faces, (H, W), sigma=1e-5,
                                  chunk=64) > 0.5).astype(jnp.float32)
        (gt_pts,) = sample_points_from_meshes(gt_verts, faces, 256,
                                              jax.random.PRNGKey(7))
        batch = ObjectBatch(
            verts=verts[None], verts_mask=jnp.ones((1, nv), bool),
            faces=faces[None], faces_mask=jnp.ones((1, nf), bool),
            target_mask=target[None],
            target_points=gt_pts[None], points_mask=jnp.ones((1, 256), bool),
            pivot_R=jnp.eye(3)[None], pivot_t=jnp.zeros((1, 3)),
            on_floor=jnp.asarray([False]), object_valid=jnp.asarray([True]),
            bbox_lo=jnp.asarray([-5.0, -5.0, 0.0]),
            bbox_hi=jnp.asarray([5.0, 5.0, 10.0]),
        )
        # 64² image, 32-px tiles -> 4 tiles; k=16 -> budget 64 << 192·4
        cfg = FitConfig(image_hw=(H, W), sigma=1e-5, max_iterations=150,
                        early_stop_min_iters=40, early_stop_grad=1e-4,
                        learning_rate=0.02, face_chunk=64, point_chunk=256,
                        use_focal=True, record_history=False,
                        use_edge_raster=True, bin_tile=32, faces_per_tile=16)
        assert not _binned_budget_ok(cfg, nf)
        init = PoseParams.zeros(1)._replace(
            translation=jnp.asarray([[0.0, 0.0, 2.5]]))
        res = fit_poses(init, batch, cam, cfg)
        t = np.asarray(res.params.translation[0])
        np.testing.assert_allclose(t, gt_shift, atol=0.06)


class TestObjectChunk:
    """object_chunk (checkpointed lax.map groups over the object axis) must
    be a pure memory knob: losses, grads and full fits match the vmap path.
    It exists so the fused full-resolution scene step fits in HBM
    (scene_step.py; VERDICT r4 item 4)."""

    def _four_object_batch(self):
        cam, b1 = _make_batch([0.3, -0.2, 2.5])
        _, b2 = _make_batch([-0.2, 0.1, 2.2])
        _, b3 = _make_batch([0.1, 0.2, 2.8])
        _, b4 = _make_batch([0.0, 0.0, 2.4])
        batch = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0)
            if xs[0].ndim and xs[0].shape[0] == 1 else xs[0],
            b1, b2, b3, b4)
        return cam, batch

    @pytest.mark.parametrize("oc", [1, 2])
    def test_loss_and_grad_match_vmap(self, oc):
        cam, batch = self._four_object_batch()
        init = PoseParams.zeros(4)._replace(
            translation=jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (4, 1)))
        import dataclasses
        cfg_c = dataclasses.replace(CFG, object_chunk=oc)
        tot0, per0 = batch_loss(init, batch, cam, CFG)
        tot1, per1 = batch_loss(init, batch, cam, cfg_c)
        np.testing.assert_allclose(np.asarray(per1), np.asarray(per0),
                                   rtol=1e-6, atol=1e-7)
        g0 = jax.grad(lambda p: batch_loss(p, batch, cam, CFG)[0])(init)
        g1 = jax.grad(lambda p: batch_loss(p, batch, cam, cfg_c)[0])(init)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-7)

    def test_full_fit_matches_vmap(self):
        cam, batch = self._four_object_batch()
        init = PoseParams.zeros(4)._replace(
            translation=jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (4, 1)))
        import dataclasses
        cfg = dataclasses.replace(CFG, max_iterations=30,
                                  early_stop_min_iters=30)
        cfg_c = dataclasses.replace(cfg, object_chunk=2)
        r0 = fit_poses(init, batch, cam, cfg)
        r1 = fit_poses(init, batch, cam, cfg_c)
        np.testing.assert_allclose(np.asarray(r1.params.translation),
                                   np.asarray(r0.params.translation),
                                   rtol=1e-4, atol=1e-5)

    def test_non_divisible_falls_back_to_vmap(self):
        cam, batch = self._four_object_batch()
        init = PoseParams.zeros(4)._replace(
            translation=jnp.tile(jnp.asarray([[0.0, 0.0, 2.5]]), (4, 1)))
        import dataclasses
        cfg_c = dataclasses.replace(CFG, object_chunk=3)  # 4 % 3 != 0
        tot0, per0 = batch_loss(init, batch, cam, CFG)
        tot1, per1 = batch_loss(init, batch, cam, cfg_c)
        np.testing.assert_allclose(np.asarray(per1), np.asarray(per0),
                                   rtol=1e-6, atol=1e-7)
