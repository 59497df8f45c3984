"""VGGT family tests (tiny config): shapes, finiteness, unprojection math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.models.vggt import (
    VGGT,
    VGGTConfig,
    pose_encoding_to_camera,
    unproject_depth,
)


@pytest.fixture(scope="module")
def tiny_vggt():
    cfg = VGGTConfig.tiny()
    model = VGGT(cfg)
    imgs = jnp.zeros((1, 2, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    return cfg, model, params


class TestVGGT:
    def test_forward_shapes(self, tiny_vggt, rng):
        cfg, model, params = tiny_vggt
        imgs = jnp.asarray(rng.uniform(size=(1, 2, cfg.image_size, cfg.image_size, 3)),
                           dtype=jnp.float32)
        out = model.apply(params, imgs)
        assert out["pose_enc"].shape == (1, 2, 9)
        assert out["depth"].shape == (1, 2, cfg.image_size, cfg.image_size)
        assert out["depth_conf"].shape == out["depth"].shape
        assert np.all(np.isfinite(np.asarray(out["pose_enc"])))
        assert np.all(np.asarray(out["depth"]) >= 0)
        assert np.all(np.asarray(out["depth_conf"]) >= 1.0)

    def test_pose_decoding(self):
        # identity pose (xyzw scalar-last ⇒ w at index 6), 90° fov at 100×200
        enc = jnp.asarray([[[0.0, 0, 0, 0, 0, 0, 1, np.pi / 2, np.pi / 2]]])
        cam = pose_encoding_to_camera(enc, (100, 200))
        np.testing.assert_allclose(np.asarray(cam["R"][0, 0]), np.eye(3), atol=1e-6)
        assert float(cam["fy"][0, 0]) == pytest.approx(50.0, rel=1e-5)
        assert float(cam["fx"][0, 0]) == pytest.approx(100.0, rel=1e-5)

    def test_pose_encoding_golden(self):
        """Pin the absT_quaR_FoV convention against an independent
        transcription of the upstream decode (vggt/utils/pose_enc.py +
        rotation.py: quat is SCALAR-LAST xyzw; fov_h decodes with H, fov_w
        with W; principal point at the image center).

        Golden: quat (x,y,z,w) = normalized (0.1, 0.2, 0.3, 0.9),
        t = (0.5, −0.25, 1.5), fov_h = 1.2, fov_w = 0.9, image 480×640.
        Expected R computed by hand from the scalar-last quaternion formula
        R = I + 2w[q]ₓ + 2[q]ₓ² with q = (x,y,z)/‖q‖."""
        q = np.array([0.1, 0.2, 0.3, 0.9])
        q = q / np.linalg.norm(q)
        x, y, z, w = q
        # independent formula (NOT the repo helper): scalar-last quat → R
        K = np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
        R_expected = np.eye(3) + 2 * w * K + 2 * (K @ K)
        enc = jnp.asarray(
            [[[0.5, -0.25, 1.5, q[0], q[1], q[2], q[3], 1.2, 0.9]]],
            jnp.float32)
        cam = pose_encoding_to_camera(enc, (480, 640))
        np.testing.assert_allclose(np.asarray(cam["R"][0, 0]), R_expected,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam["t"][0, 0]),
                                   [0.5, -0.25, 1.5], atol=1e-6)
        assert float(cam["fy"][0, 0]) == pytest.approx(
            (480 / 2) / np.tan(1.2 / 2), rel=1e-5)
        assert float(cam["fx"][0, 0]) == pytest.approx(
            (640 / 2) / np.tan(0.9 / 2), rel=1e-5)
        assert float(cam["cx"][0, 0]) == 320.0
        assert float(cam["cy"][0, 0]) == 240.0
        # rotation must be proper (det +1) and orthonormal
        R = np.asarray(cam["R"][0, 0])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)

    def test_unproject_roundtrip(self):
        """Unprojected points re-project to their pixels."""
        h = w = 16
        depth = jnp.full((h, w), 2.0)
        cam = {
            "R": jnp.eye(3)[None], "t": jnp.zeros((1, 3)),
            "fx": jnp.asarray([20.0]), "fy": jnp.asarray([20.0]),
            "cx": jnp.asarray([w / 2.0]), "cy": jnp.asarray([h / 2.0]),
        }
        pts = unproject_depth(depth, cam, 0)
        assert pts.shape == (h, w, 3)
        # reproject: u = fx·x/z + cx
        u = 20.0 * pts[..., 0] / pts[..., 2] + w / 2.0
        v = 20.0 * pts[..., 1] / pts[..., 2] + h / 2.0
        uu = np.arange(w) + 0.5
        np.testing.assert_allclose(np.asarray(u)[0], uu, atol=1e-4)
        np.testing.assert_allclose(np.asarray(v)[:, 0], np.arange(h) + 0.5, atol=1e-4)

    def test_unproject_with_pose(self, rng):
        from regen3d_tpu.transforms.rotations import random_rotation
        h = w = 8
        depth = jnp.asarray(rng.uniform(1, 3, size=(h, w)).astype(np.float32))
        R = random_rotation(jax.random.PRNGKey(5))
        t = jnp.asarray([0.2, -0.1, 0.4])
        cam = {"R": R[None], "t": t[None],
               "fx": jnp.asarray([10.0]), "fy": jnp.asarray([10.0]),
               "cx": jnp.asarray([4.0]), "cy": jnp.asarray([4.0])}
        pts_w = unproject_depth(depth, cam, 0)
        # transform back to camera frame: x_cam = x_w @ R.T + t ... (column conv: R @ x_w + t)
        cam_pts = pts_w @ np.asarray(R).T + np.asarray(t)
        np.testing.assert_allclose(np.asarray(cam_pts[..., 2]), np.asarray(depth),
                                   atol=1e-4)

    def test_jit_full_model(self, tiny_vggt):
        cfg, model, params = tiny_vggt
        imgs = jnp.ones((1, 1, cfg.image_size, cfg.image_size, 3))
        out = jax.jit(model.apply)(params, imgs)
        assert np.all(np.isfinite(np.asarray(out["depth"])))


class TestFastVGGTTokenMerging:
    """FastVGGT-style training-free token merging (PAPERS.md: arXiv
    2509.02560): merged non-reference patch tokens ride their most similar
    frame-0 token through global attention."""

    def test_merge_unmerge_identity_structure(self):
        from regen3d_tpu.models.vggt import (
            _merge_global_tokens,
            _unmerge_global_tokens,
        )
        rng = np.random.default_rng(0)
        f, n_tok, n_special, d = 3, 8, 2, 16
        g = jnp.asarray(rng.normal(size=(f * n_tok, d)).astype(np.float32))
        r = 4
        compact, info = _merge_global_tokens(g, f, n_tok, n_special, r)
        assert compact.shape == (f * n_tok - r, d)
        # identity "attention": unmerge of the compact set reproduces the
        # kept tokens exactly and maps merged ones onto their destination
        out = _unmerge_global_tokens(compact, info, f, n_tok, n_special)
        assert out.shape == g.shape
        best, kept_idx, merged_idx = info
        src_patch = g[n_tok:].reshape(f - 1, n_tok, d)[:, n_special:] \
            .reshape(-1, d)
        np.testing.assert_allclose(
            np.asarray(out[n_tok:].reshape(f - 1, n_tok, d)[:, n_special:]
                       .reshape(-1, d)[np.asarray(kept_idx)]),
            np.asarray(src_patch[np.asarray(kept_idx)]), atol=1e-6)

    def test_duplicate_tokens_merge_losslessly(self):
        """When a source patch token EQUALS a frame-0 token, merging it is
        exact: the destination average is unchanged and the copy-back
        returns the destination output."""
        from regen3d_tpu.models.vggt import (
            _merge_global_tokens,
            _unmerge_global_tokens,
        )
        rng = np.random.default_rng(1)
        f, n_tok, n_special, d = 2, 6, 1, 8
        dst = rng.normal(size=(n_tok, d)).astype(np.float32)
        src = dst.copy()          # frame 1 duplicates frame 0
        g = jnp.asarray(np.concatenate([dst, src]))
        r = 3
        compact, info = _merge_global_tokens(g, f, n_tok, n_special, r)
        best, kept_idx, merged_idx = info
        # each merged duplicate matched its own duplicate destination
        patch_src = src[n_special:]
        for mi in np.asarray(merged_idx):
            np.testing.assert_allclose(
                np.asarray(compact[np.asarray(best)[mi]]),
                patch_src[mi], atol=1e-5)

    def test_full_model_runs_with_merging(self):
        from regen3d_tpu.models.vggt import VGGT, VGGTConfig
        import dataclasses
        c = dataclasses.replace(VGGTConfig.tiny(), token_merge_ratio=0.5)
        m = VGGT(c)
        imgs = jnp.zeros((1, 3, c.image_size, c.image_size, 3))
        p = m.init(jax.random.PRNGKey(0), imgs)
        out = jax.jit(m.apply)(p, imgs)
        assert out["depth"].shape == (1, 3, c.image_size, c.image_size)
        assert bool(jnp.all(jnp.isfinite(out["depth"])))

    def test_params_identical_with_and_without_merging(self):
        """Training-free: the merge knob must not change the parameter
        tree (converted checkpoints load either way)."""
        import dataclasses

        from regen3d_tpu.models.vggt import VGGT, VGGTConfig
        c0 = VGGTConfig.tiny()
        c1 = dataclasses.replace(c0, token_merge_ratio=0.7)
        imgs = jnp.zeros((1, 2, c0.image_size, c0.image_size, 3))
        p0 = VGGT(c0).init(jax.random.PRNGKey(0), imgs)
        p1 = VGGT(c1).init(jax.random.PRNGKey(0), imgs)
        t0 = jax.tree_util.tree_structure(p0)
        t1 = jax.tree_util.tree_structure(p1)
        assert t0 == t1
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            assert a.shape == b.shape
