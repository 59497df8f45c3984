"""DeepPriorAssembly comparison baseline (the `Use_DPA: true` workflow).

Reference: /root/reference/src/evaluation/run_dpa.py:20-53 + run.py:477-482
— a five-stage chain of separate venvs/repos, each writing a stage dir
under ``../outputs/dpa``:

  segmentation → inpainting → object_generation (shap-e) →
  geometry (dust3r) → final_registration (5-DOF optimization)

TPU-native adapter: one process, same stage-directory contract, each stage
backed by this framework's own engine — phase-1 detector+SAM for
segmentation, the phase-2 inpainting client for per-object amodal
completion, the batched flow-matching DiT for object generation (the
shap-e role), the monocular depth prior (Depth-Anything slot,
pipeline/depth.py) unprojected to a cloud for geometry (the dust3r CroCo
path plugs in when weights land), and the vmapped 5-DOF silhouette+cloud
pose optimizer for final registration — run_dpa's
registration/optimization_5dof.py role on our jitted fit engine.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from regen3d_tpu.config import Config
from regen3d_tpu.utils.glb import MeshData, SceneData, save_glb
from regen3d_tpu.utils.image import load_image_rgb, save_image
from regen3d_tpu.utils.ply import save_ply

log = logging.getLogger(__name__)


def run(cfg: Config, sam=None, sam_params=None,
        detector=None, detector_params=None,
        generator=None, inpaint_client=None,
        depth_model=None, depth_params=None) -> Optional[str]:
    """Run the five-stage DPA chain; returns the final scene GLB path."""
    import jax
    import jax.numpy as jnp

    from regen3d_tpu.camera import Camera
    from regen3d_tpu.pipeline.phase1_segmentation import detect_and_segment
    from regen3d_tpu.pipeline.phase2_inpaint import OfflineInpainter
    from regen3d_tpu.pipeline.phase3_assets import (
        AssetGenerator,
        extract_and_clean,
    )
    from regen3d_tpu.pipeline.depth import estimate_depth
    from regen3d_tpu.pipeline.pose_fit import (
        FitConfig,
        ObjectBatch,
        PoseParams,
        fit_poses,
    )

    out_root = cfg.path("dpa_output", "../output/dpa/")
    dirs = {s: os.path.join(out_root, s) for s in
            ("segmentation", "inpainting", "object_generation", "geometry",
             "final_registration")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    image = load_image_rgb(cfg.path("input_image"), max_side=None)
    h, w = image.shape[:2]

    # --- stage 1: segmentation ------------------------------------------------
    dets = detect_and_segment(cfg, image, sam, sam_params,
                              detector, detector_params)
    if not dets:
        log.warning("dpa: no detections")
        return None
    for i, d in enumerate(dets):
        save_image(os.path.join(dirs["segmentation"], f"mask_{i}.png"),
                   d.mask.astype(np.float32))

    # --- stage 2: inpainting (amodal completion per object) -------------------
    client = inpaint_client or OfflineInpainter(dirs["segmentation"])
    seed = int(cfg.get("seed", 1234567))
    inpainted: List[np.ndarray] = []
    for i, d in enumerate(dets):
        x0, y0 = max(int(d.box.xmin), 0), max(int(d.box.ymin), 0)
        x1, y1 = int(np.ceil(d.box.xmax)), int(np.ceil(d.box.ymax))
        crop = image[y0:y1, x0:x1]
        m = d.mask[y0:y1, x0:x1]
        masked = (crop * m[..., None]
                  + 255 * (1 - m[..., None])).astype(np.uint8)
        prompt = f"complete the {d.label} object, white background"
        try:
            out = client.generate(prompt, masked, temperature=0.4,
                                  top_p=0.95, seed=seed)
        except Exception as e:                      # pragma: no cover
            log.warning("dpa: inpaint failed (%s) — masked crop", e)
            out = masked
        inpainted.append(np.asarray(out))
        Image.fromarray(np.asarray(out).astype(np.uint8)).save(
            os.path.join(dirs["inpainting"], f"object_{i}.png"))

    # --- stage 3: object generation (shap-e role) -----------------------------
    if generator is None:
        log.warning("dpa: no checkpoint — random-init generator")
        generator = AssetGenerator.random_init(
            jax.random.PRNGKey(int(cfg.get("seed", 1234567))), tiny=True)
    size = 64 if generator.dit_cfg.width < 512 else 512
    crops = []
    for i, (d, img_i) in enumerate(zip(dets, inpainted)):
        rgba = np.concatenate(
            [np.asarray(img_i, np.float32) / 255.0,
             np.ones((*np.asarray(img_i).shape[:2], 1), np.float32)], -1)
        crops.append(np.asarray(jax.image.resize(
            jnp.asarray(rgba), (size, size, 4), "bilinear")))
    res = int(cfg.get("octree_resolution_hy", 256))
    if generator.dit_cfg.width < 512:
        res = min(res, 96)
    vols = generator.generate_sdf_batch(
        jax.random.PRNGKey(int(cfg.get("seed", 1234567))), np.stack(crops),
        int(cfg.get("num_inf_steps_hy", 50)) // 2,
        float(cfg.get("guidance_scale", 5.0)), res, 2048)
    objects = []
    for i in range(len(dets)):
        verts, faces = extract_and_clean(vols[i], 2048)
        if len(faces):
            objects.append((i, verts, faces))
            save_glb(os.path.join(dirs["object_generation"],
                                  f"object_{i}.glb"),
                     SceneData(meshes=[MeshData(name=f"object_{i}",
                                                vertices=verts,
                                                faces=faces)]))
    if not objects:
        log.warning("dpa: no non-empty objects")
        return None

    # --- stage 4: scene geometry (dust3r role; depth-prior fallback) ----------
    depth = estimate_depth(image, depth_model, depth_params)
    focal = max(h, w) * 1.0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32) + 0.5
    z = depth.astype(np.float32) * 4.0 + 1.0
    cloud = np.stack([(xx - w / 2) / focal * z,
                      (yy - h / 2) / focal * z, z], -1)
    save_ply(os.path.join(dirs["geometry"], "scene.ply"),
             cloud.reshape(-1, 3)[::7])

    # --- stage 5: 5-DOF registration (optimization_5dof role) -----------------
    cam = Camera(R=jnp.eye(3), T=jnp.zeros(3),
                 focal=jnp.asarray([focal, focal]),
                 principal=jnp.asarray([w / 2.0, h / 2.0]),
                 image_size=(h, w))
    n = len(objects)
    vmax = max(len(v) for _, v, _ in objects)
    fmax = max(len(f) for _, _, f in objects)
    pmax = 1024
    V = np.zeros((n, vmax, 3), np.float32)
    Vm = np.zeros((n, vmax), bool)
    F = np.zeros((n, fmax, 3), np.int32)
    Fm = np.zeros((n, fmax), bool)
    M = np.zeros((n, h, w), np.float32)
    P = np.zeros((n, pmax, 3), np.float32)
    Pm = np.zeros((n, pmax), bool)
    for bi, (i, verts, faces) in enumerate(objects):
        c = verts.mean(0)
        verts = (verts - c) / (np.abs(verts - c).max() + 1e-6)
        V[bi, :len(verts)] = verts
        Vm[bi, :len(verts)] = True
        F[bi, :len(faces)] = faces
        Fm[bi, :len(faces)] = True
        M[bi] = dets[i].mask
        pts = cloud[dets[i].mask]
        if len(pts):
            sel = np.random.default_rng(0).choice(
                len(pts), min(pmax, len(pts)), replace=False)
            P[bi, :len(sel)] = pts[sel]
            Pm[bi, :len(sel)] = True
    med_z = np.asarray([np.median(P[bi][Pm[bi]][:, 2]) if Pm[bi].any()
                        else 3.0 for bi in range(n)], np.float32)
    batch = ObjectBatch(
        verts=jnp.asarray(V), verts_mask=jnp.asarray(Vm),
        faces=jnp.asarray(F), faces_mask=jnp.asarray(Fm),
        target_mask=jnp.asarray(M), target_points=jnp.asarray(P),
        points_mask=jnp.asarray(Pm),
        pivot_R=jnp.tile(jnp.eye(3)[None], (n, 1, 1)),
        pivot_t=jnp.zeros((n, 3)),
        on_floor=jnp.zeros(n, bool), object_valid=jnp.ones(n, bool),
        bbox_lo=jnp.asarray([-100.0, -100.0, 0.1]),
        bbox_hi=jnp.asarray([100.0, 100.0, 100.0]))
    init = PoseParams.zeros(n)._replace(
        translation=jnp.asarray(np.stack([np.zeros(n), np.zeros(n), med_z],
                                         -1)))
    fit_cfg = FitConfig(
        image_hw=(h, w), use_5dof=True,
        max_iterations=int(cfg.get("dpa_iterations", 60)),
        early_stop_min_iters=int(cfg.get("dpa_iterations", 60)),
        sigma=float(cfg.get("sigma", 1e-5)),
        record_history=False,
        # binned edge raster when the image tiles evenly — the dense path
        # is quadratic in pixels×faces and dominates wall time otherwise
        use_edge_raster=(h % 32 == 0 and w % 32 == 0),
        bin_tile=32, faces_per_tile=64)
    result = fit_poses(init, batch, cam, fit_cfg)

    from regen3d_tpu.pipeline.pose_fit import pose_transform
    fitted = np.asarray(pose_transform(result.params, batch, fit_cfg))
    meshes = []
    for bi, (i, verts, faces) in enumerate(objects):
        meshes.append(MeshData(name=f"{dets[i].label}_{i}",
                               vertices=fitted[bi][Vm[bi]],
                               faces=faces))
    out_glb = os.path.join(dirs["final_registration"], "scene.glb")
    save_glb(out_glb, SceneData(meshes=meshes))
    log.info("dpa: %d objects registered → %s", len(meshes), out_glb)
    return out_glb
