"""End-to-end slice (SURVEY §7.2): synthetic artifacts → phase 5 → phase 6.

Builds a fake scene on the artifact bus (camera.npz, scene_vggt.ply,
findings, a 3D asset GLB), runs per-object cloud extraction and the batched
pose fit, and checks the fitted GLB lands on the target object.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.artifacts import Artifacts, finding_stem
from regen3d_tpu.camera import Camera, save_camera_npz
from regen3d_tpu.config import default_config
from regen3d_tpu.transforms.conventions import blender_to_p3d, p3d_to_blender
from regen3d_tpu.utils.glb import MeshData, SceneData, load_glb, save_glb
from regen3d_tpu.utils.image import save_image
from regen3d_tpu.utils.ply import load_ply, save_ply

RES = 160
FOCAL = 160.0
GT_CENTER = np.asarray([0.3, -0.1, 2.5], np.float32)
GT_HALF = 0.3


def _box(center, half, n=16):
    """Dense surface point cloud of an axis-aligned cube."""
    lin = np.linspace(-half, half, n)
    faces = []
    for fix in range(3):
        for s in (-half, half):
            a, b = np.meshgrid(lin, lin)
            pts = np.zeros((n * n, 3), np.float32)
            other = [k for k in range(3) if k != fix]
            pts[:, other[0]] = a.ravel()
            pts[:, other[1]] = b.ravel()
            pts[:, fix] = s
            faces.append(pts)
    return np.concatenate(faces) + center


def _box_mesh(half=0.5):
    v = np.asarray([[x, y, z] for x in (-half, half) for y in (-half, half)
                    for z in (-half, half)], np.float32)
    f = np.asarray([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int32)
    return v, f


def _world_to_artifact_cloud(world: np.ndarray) -> np.ndarray:
    """Inverse of phase5.scene_cloud_to_world (store frame of scene_vggt.ply)."""
    R, t = blender_to_p3d(np.eye(4))
    q = world.copy().astype(np.float64)
    q[:, 1] *= -1
    return (q @ R).astype(np.float32)  # inverse of p @ R.T


@pytest.fixture(scope="module")
def synthetic_scene(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scene") / "output")
    cfg = default_config(
        out,
        image_size_DR=96,
        max_iterations=50,
        early_stop_min_iterations=50,
        learning_rate=0.02,
        mask_shrink_pixels=1,
        mask_shrink_iterations=1,
        filter_vggt_quantile=False,
        use_rotation_grid_search=False,
        vggt_scene_scale=1.0,
        sigma=1e-5,
        fit_max_faces=256,     # CPU-test budget
        fit_max_points=512,
    )
    art = Artifacts(cfg)
    cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                 focal=jnp.asarray([FOCAL, FOCAL]),
                 principal=jnp.asarray([RES / 2, RES / 2]),
                 image_size=(RES, RES))

    # --- camera.npz: Blender matrix whose B2P is the identity pose ----------
    B = p3d_to_blender(np.eye(3), np.zeros(3))
    save_camera_npz(art.camera_npz, B, FOCAL, (RES, RES))

    # --- world geometry -------------------------------------------------------
    box_pts = _box(GT_CENTER, GT_HALF, 24)
    floor_y = GT_CENTER[1] - GT_HALF
    fx, fz = np.meshgrid(np.linspace(-2, 2, 40), np.linspace(1.2, 4, 40))
    floor_pts = np.stack([fx.ravel(),
                          np.full(fx.size, floor_y),
                          fz.ravel()], -1).astype(np.float32)
    world = np.concatenate([box_pts, floor_pts])
    save_ply(art.scene_cloud_ply, _world_to_artifact_cloud(world))

    # --- findings: white-background masks -----------------------------------
    def mask_of(points):
        uv, z = cam.project(jnp.asarray(points))
        uv = np.asarray(uv).round().astype(int)
        m = np.zeros((RES, RES), bool)
        ok = (uv[:, 0] >= 0) & (uv[:, 0] < RES) & (uv[:, 1] >= 0) & (uv[:, 1] < RES)
        m[uv[ok, 1], uv[ok, 0]] = True
        from regen3d_tpu.utils.image import dilate_mask, erode_mask
        return erode_mask(dilate_mask(m, 2), 1, 1)

    os.makedirs(art.findings_fullsize, exist_ok=True)
    box_stem = finding_stem("chair", (80, 80))
    floor_stem = finding_stem("floor", (80, 140))
    for stem, pts in ((box_stem, box_pts), (floor_stem, floor_pts)):
        m = mask_of(pts)
        img = np.full((RES, RES, 3), 255, np.uint8)
        img[m] = (90, 120, 150)
        save_image(os.path.join(art.findings_fullsize, f"{stem}.png"), img)

    # --- asset GLB: unit cube (wrong scale/position on purpose) --------------
    v, f = _box_mesh(0.5)
    os.makedirs(os.path.dirname(art.asset_glb(box_stem)), exist_ok=True)
    save_glb(art.asset_glb(box_stem),
             SceneData(meshes=[MeshData(name=box_stem, vertices=v, faces=f)]))

    return cfg, art, box_stem, floor_stem


class TestPhase5:
    def test_extraction(self, synthetic_scene):
        cfg, art, box_stem, floor_stem = synthetic_scene
        from regen3d_tpu.pipeline import phase5_extract
        counts = phase5_extract.run(cfg)
        assert counts.get(box_stem, 0) > 200
        assert os.path.exists(os.path.join(art.masks_dir, f"{box_stem}.png"))
        assert os.path.exists(os.path.join(art.pointclouds_dir, f"{box_stem}.ply"))
        assert os.path.exists(os.path.join(art.normals_dir,
                                           f"{box_stem}_normals.ply"))
        # extracted cloud sits at the GT box location
        pc = load_ply(os.path.join(art.pointclouds_dir, f"{box_stem}.ply"))
        np.testing.assert_allclose(pc.vertices.mean(0), GT_CENTER, atol=0.15)

    def test_floor_extracted(self, synthetic_scene):
        cfg, art, box_stem, floor_stem = synthetic_scene
        p = os.path.join(art.pointclouds_dir, f"{floor_stem}.ply")
        assert os.path.exists(p)
        pc = load_ply(p)
        # floor points lie at the floor height
        np.testing.assert_allclose(pc.vertices[:, 1].mean(),
                                   GT_CENTER[1] - GT_HALF, atol=0.1)


class TestPhase6:
    def test_pose_fit_places_object(self, synthetic_scene):
        cfg, art, box_stem, floor_stem = synthetic_scene
        from regen3d_tpu.pipeline import phase6_pose
        losses = phase6_pose.run(cfg)
        assert box_stem in losses
        fitted = art.fitted_glb(box_stem)
        assert os.path.exists(fitted)
        scene = load_glb(fitted)
        v = np.concatenate([m.vertices for m in scene.meshes])
        center = 0.5 * (v.min(0) + v.max(0))
        np.testing.assert_allclose(center, GT_CENTER, atol=0.2)
        # the fixture's rasterized mask is dilated ~1px (≈10% of the box at
        # 96px), which the silhouette term faithfully matches — allow the
        # corresponding size slack; pose precision is covered in
        # tests/test_pose_fit.py
        extent = (v.max(0) - v.min(0))
        np.testing.assert_allclose(extent, 2 * GT_HALF, rtol=0.45)


class TestDebugArtifacts:
    def test_rot_grid_and_silhouette_debug(self, synthetic_scene):
        """debug_save emits the reference's rotation-grid PLYs
        (pose_matching_planar.py:243-330) and current_silhouette / mask
        PNGs (save_img_to_temp at :947,1620)."""
        import glob as globlib

        from regen3d_tpu.config import Config
        from regen3d_tpu.pipeline import phase6_pose

        from regen3d_tpu.pipeline import phase5_extract

        base = synthetic_scene[0]
        cfg2 = Config({**base.values, "debug_save": True,
                       "use_rotation_grid_search": True,
                       "grid_rotation_steps": 4,
                       "max_iterations": 3,
                       "early_stop_min_iterations": 3,
                       "write_fit_gifs": False}, base.base_dir)
        phase5_extract.run(cfg2)   # standalone-safe: (re)produce clouds
        phase6_pose.run(cfg2)
        out_root = cfg2.path("output")
        grids = globlib.glob(os.path.join(out_root, "rot_grid_debug", "*"))
        assert grids, "no rotation-grid debug dirs"
        d = grids[0]
        names = set(os.listdir(d))
        assert "target_centered.ply" in names
        assert "mesh_centered.ply" in names
        assert any(n.startswith("mesh_rot_best_") for n in names)
        assert sum(n.startswith("mesh_rot_") and "best" not in n
                   for n in names) == 4
        temp_dir = cfg2.path("temp")
        pngs = os.listdir(temp_dir)
        assert any(p.startswith("current_silhouette_") for p in pngs)
        assert any(p.startswith("mask_") for p in pngs)
