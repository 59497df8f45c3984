"""dust3r alternative phase 4: model, aligner, PairViewer, export contract."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.models.dust3r import (
    AsymmetricCroCo3DStereo,
    Dust3rConfig,
    estimate_focal,
    rope_2d,
)
from regen3d_tpu.pipeline import phase4_dust3r


@pytest.fixture(scope="module")
def tiny_dust3r():
    cfg = Dust3rConfig.tiny()
    model = AsymmetricCroCo3DStereo(cfg)
    size = cfg.patch * 3
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)),
                        jnp.zeros((1, size, size, 3)))
    return cfg, model, params, size


def _synthetic_scene(n_views, h, w, focal, seed=0):
    """Random smooth depth + known poses → per-view pointmaps in their own
    frames and ground-truth cam→world transforms."""
    rng = np.random.default_rng(seed)
    from regen3d_tpu.transforms.rotations import so3_exp

    c2ws = [np.eye(4)]
    for k in range(1, n_views):
        R = np.asarray(so3_exp(jnp.asarray(rng.normal(0, 0.1, 3),
                                           jnp.float32)))
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = rng.normal(0, 0.3, 3)
        c2ws.append(M)
    # one shared world surface: a bumpy plane in front of the cameras
    vv, uu = np.mgrid[0:h, 0:w].astype(np.float64)
    own_pts = []
    for k in range(n_views):
        depth = 2.0 + 0.3 * np.sin(uu / w * 3 + k) * np.cos(vv / h * 2)
        x = (uu + 0.5 - w / 2) / focal * depth
        y = (vv + 0.5 - h / 2) / focal * depth
        own_pts.append(np.stack([x, y, depth], -1))
    return c2ws, own_pts


class TestDust3rModel:
    def test_rope_orthogonal(self):
        """RoPE rotation preserves norms and relative-position structure."""
        rng = np.random.default_rng(0)
        t = jnp.asarray(rng.normal(size=(1, 2, 6, 16)).astype(np.float32))
        pos = jnp.asarray(rng.integers(0, 8, size=(6, 2)))
        r = rope_2d(t, pos)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(r), axis=-1),
                                   np.linalg.norm(np.asarray(t), axis=-1),
                                   rtol=1e-5)
        # same position ⇒ dot products preserved (relative encoding)
        pos_same = jnp.zeros((6, 2), jnp.int32)
        r0 = np.asarray(rope_2d(t, pos_same))
        np.testing.assert_allclose(r0, np.asarray(t), atol=1e-5)

    def test_forward_shapes(self, tiny_dust3r):
        cfg, model, params, size = tiny_dust3r
        rng = np.random.default_rng(1)
        im1 = jnp.asarray(rng.uniform(size=(2, size, size, 3)), jnp.float32)
        im2 = jnp.asarray(rng.uniform(size=(2, size, size, 3)), jnp.float32)
        out = jax.jit(model.apply)(params, im1, im2)
        assert out["pts3d1"].shape == (2, size, size, 3)
        assert out["pts3d2"].shape == (2, size, size, 3)
        assert out["conf1"].shape == (2, size, size)
        assert np.all(np.asarray(out["conf1"]) >= 1.0)
        assert np.all(np.isfinite(np.asarray(out["pts3d1"])))

    def test_asymmetric(self, tiny_dust3r):
        """Swapping the input order must change the outputs (two decoders)."""
        cfg, model, params, size = tiny_dust3r
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(size=(1, size, size, 3)), jnp.float32)
        b = jnp.asarray(rng.uniform(size=(1, size, size, 3)), jnp.float32)
        o1 = model.apply(params, a, b)
        o2 = model.apply(params, b, a)
        assert not np.allclose(np.asarray(o1["pts3d1"]),
                               np.asarray(o2["pts3d1"]))

    def test_estimate_focal(self):
        """Weiszfeld recovers the focal of a synthetic unprojection."""
        h, w, f = 24, 32, 40.0
        vv, uu = np.mgrid[0:h, 0:w].astype(np.float64)
        depth = 2.0 + 0.1 * np.sin(uu / 3)
        x = (uu + 0.5 - w / 2) / f * depth
        y = (vv + 0.5 - h / 2) / f * depth
        pts = jnp.asarray(np.stack([x, y, depth], -1), jnp.float32)
        assert float(estimate_focal(pts)) == pytest.approx(f, rel=1e-3)


class TestAligner:
    def test_pair_viewer_recovers_pose(self):
        """Feed exact synthetic pairwise predictions → PairViewer must
        reproduce the ground-truth relative pose."""
        h, w, f = 16, 20, 30.0
        c2ws, own = _synthetic_scene(2, h, w, f, seed=3)
        # view 1's points expressed in frame 0: world == frame 0 here, and
        # world pts of view 1 = own[1] @ R.T + t
        R1, t1 = c2ws[1][:3, :3], c2ws[1][:3, 3]
        pts1_in0 = own[1] @ R1.T + t1
        pred = {
            "pts3d1": np.stack([own[0], own[1]]).astype(np.float32),
            "pts3d2": np.stack([pts1_in0, own[0]]).astype(np.float32),
            "conf1": np.full((2, h, w), 5.0, np.float32),
            "conf2": np.full((2, h, w), 5.0, np.float32),
        }
        scene = phase4_dust3r.pair_viewer(pred, [(0, 1), (1, 0)])
        np.testing.assert_allclose(scene["c2w"][0], np.eye(4), atol=1e-6)
        np.testing.assert_allclose(scene["c2w"][1], c2ws[1], atol=1e-3)
        assert scene["focal"][0] == pytest.approx(f, rel=1e-2)
        # aligned pointmaps of both views agree with the world surface
        np.testing.assert_allclose(scene["pts3d"][1], pts1_in0, atol=1e-3)

    def test_global_align_recovers_poses(self):
        """3 views, exact pairwise pointmaps → the jitted aligner converges
        to the ground-truth geometry (up to the fixed gauge)."""
        h, w, f = 12, 16, 24.0
        c2ws, own = _synthetic_scene(3, h, w, f, seed=4)
        pairs = phase4_dust3r.make_pairs(3)
        pts1, pts2 = [], []
        for (i, j) in pairs:
            w2c_i = np.linalg.inv(c2ws[i])
            pts_j_world = own[j] @ c2ws[j][:3, :3].T + c2ws[j][:3, 3]
            pts_j_in_i = pts_j_world @ w2c_i[:3, :3].T + w2c_i[:3, 3]
            pts1.append(own[i])
            pts2.append(pts_j_in_i)
        pred = {
            "pts3d1": np.stack(pts1).astype(np.float32),
            "pts3d2": np.stack(pts2).astype(np.float32),
            "conf1": np.full((len(pairs), h, w), 8.0, np.float32),
            "conf2": np.full((len(pairs), h, w), 8.0, np.float32),
        }
        scene = phase4_dust3r.global_align(pred, pairs, 3, niter=150)
        # gauge: frame 0 = identity; compare relative poses
        for k in range(3):
            got = scene["c2w"][k]
            want = np.linalg.inv(c2ws[0]) @ c2ws[k]
            np.testing.assert_allclose(got[:3, :3], want[:3, :3], atol=0.05)
            np.testing.assert_allclose(got[:3, 3], want[:3, 3], atol=0.05)
        # depths recovered
        np.testing.assert_allclose(scene["depth"][0], own[0][..., 2],
                                   rtol=0.05)


class TestPhase4Dust3rEndToEnd:
    def test_single_image_run_and_export(self, tiny_dust3r, tmp_path):
        """Full phase-4 path on ONE image (duplicated into a pair, the
        reference behavior) with a random-init tiny model: artifacts must
        appear and satisfy the standard contract."""
        from regen3d_tpu.artifacts import Artifacts
        from regen3d_tpu.config import default_config
        from regen3d_tpu.utils.image import save_image

        cfg_m, model, params, size = tiny_dust3r
        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        inp = str(tmp_path / "room.png")
        save_image(inp, img)
        cfg = default_config(str(tmp_path / "output"), input_image=inp,
                             Use_VGGT=False, image_size=size)
        art = Artifacts(cfg)

        phase4_dust3r.run_from_model(cfg, params, model, (inp,),
                                     resolution=size)
        assert os.path.exists(os.path.join(art.pre3d_dir, "scene.glb"))
        assert os.path.exists(art.camera_npz)
        assert os.path.exists(art.scene_cloud_ply)
        assert os.path.exists(os.path.join(art.colmap_sparse, "points.ply"))
        cam = np.load(art.camera_npz)
        assert cam["extrinsic"].shape == (4, 4)
        # identical duplicated views ⇒ frame-0 camera is the rebased
        # identity ⇒ extrinsic == R_fix with zero translation
        R_fix = np.array([[1.0, 0, 0], [0, 0, -1], [0, 1, 0]])
        np.testing.assert_allclose(cam["extrinsic"][:3, :3], R_fix, atol=2e-2)
        np.testing.assert_allclose(cam["extrinsic"][:3, 3], 0, atol=2e-2)

    def test_orchestrator_dispatch(self, tmp_path):
        """Use_VGGT: false routes phase 4 to the dust3r path (no more
        NotImplementedError); without weights it must raise the missing-
        checkpoint RuntimeError, not NotImplementedError."""
        from regen3d_tpu.config import default_config
        from regen3d_tpu.orchestrator import run_phases
        inp = str(tmp_path / "in.png")
        from regen3d_tpu.utils.image import save_image
        save_image(inp, np.zeros((16, 16, 3), np.uint8))
        cfg = default_config(str(tmp_path / "output"), input_image=inp,
                             Use_VGGT=False)
        with pytest.raises(RuntimeError, match="dust3r"):
            run_phases(cfg, [4])
