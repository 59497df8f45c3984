"""Phase 4 (alternative): dust3r pairwise stereo + global alignment.

The reference's `Use_VGGT: false` path (run.py:422-433,
minimal_demo_dust3r.py:123-175): load images at `image_size`, duplicate a
single input, build a complete symmetrized pair graph, run
AsymmetricCroCo3DStereo on every pair, then globally align the pairwise
pointmaps — PairViewer for 2 images (direct closed-form), a 300-iteration
lr=0.01 optimizer (PointCloudOptimizer) for more — and export scene.glb +
camera.npz into pre_3D (config keys model_name/weights/image_size/tmp_dir/
as_pointcloud/min_conf_thr, config.yaml:198-218).

TPU-native design decisions:
- pairwise inference is ONE jitted vmapped program over the pair axis (the
  reference loops pairs through batch_size=1 inference);
- the global aligner is a single jitted Adam program over
  (log-depthmaps, per-image quaternions/translations, log-focals, per-edge
  log-scales) with a `lax.scan` step loop — the reference's torch loop;
- MST pose initialization via confidence-weighted Umeyama on pairwise
  pointmaps (upstream init='mst');
- exports BOTH the reference's dust3r artifact pair (scene.glb pointcloud +
  dust3r-layout camera.npz semantics) AND the full downstream artifact set
  via phase4_camera.export_reconstruction, so phases 5-7 run unchanged in
  dust3r mode (the reference's own dust3r variant skips phase 5; writing the
  full set is a documented superset, not a deviation).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.config import Config
from regen3d_tpu.models.dust3r import (
    AsymmetricCroCo3DStereo,
    Dust3rConfig,
    estimate_focal,
)
from regen3d_tpu.transforms.rigid import umeyama
from regen3d_tpu.transforms.rotations import quat_to_matrix
from regen3d_tpu.utils.image import load_image_rgb

log = logging.getLogger(__name__)


def make_pairs(n: int) -> List[Tuple[int, int]]:
    """Complete symmetrized scene graph (upstream make_pairs
    scene_graph='complete', symmetrize=True): all ordered (i, j), i≠j."""
    return [(i, j) for i in range(n) for j in range(n) if i != j]


def run_pairwise(params, model, images: jnp.ndarray,
                 pairs: Sequence[Tuple[int, int]]) -> Dict[str, jnp.ndarray]:
    """All pairs through ONE vmapped jitted forward.

    images: (N, H, W, 3) float in [0,1]. Returns dict of (E, H, W, ...)
    arrays: pts1/conf1 (view i in frame i), pts2/conf2 (view j in frame i).
    """
    ii = jnp.asarray([p[0] for p in pairs])
    jj = jnp.asarray([p[1] for p in pairs])

    @jax.jit
    def fwd(params, images):
        def one(i, j):
            out = model.apply(params, images[i][None], images[j][None])
            return {k: v[0] for k, v in out.items()}
        return jax.vmap(one)(ii, jj)

    return fwd(params, images)


# --------------------------------------------------------------------------
# Global alignment
# --------------------------------------------------------------------------

def _unproject(depth: jnp.ndarray, focal: jnp.ndarray) -> jnp.ndarray:
    """(H, W) depth + scalar focal → camera-frame pointmap (H, W, 3);
    principal point at the image center."""
    h, w = depth.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5 - h / 2.0
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5 - w / 2.0
    return jnp.stack([uu / focal * depth, vv / focal * depth, depth], -1)


def _c2w(quat: jnp.ndarray, trans: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(4,), (3,) → rotation matrix + translation of the cam→world map
    (points_world = pts_cam @ R.T + t ... column convention R @ p + t)."""
    return quat_to_matrix(quat / jnp.linalg.norm(quat)), trans


def mst_init(pred: Dict[str, np.ndarray], pairs: Sequence[Tuple[int, int]],
             n_images: int) -> Dict[str, np.ndarray]:
    """Pose/depth/focal init by spanning-tree propagation (upstream
    init='mst'): edges sorted by mean confidence; for a tree edge (i, j)
    with i already placed, solve the similarity X^{(j,i),j} → X^{(i,j),j}
    (j's own-frame pointmap onto j's pointmap in i's frame) and compose."""
    e_of = {p: k for k, p in enumerate(pairs)}
    conf_means = {p: float(np.mean(pred["conf2"][e_of[p]])) for p in pairs}
    order = sorted(pairs, key=lambda p: -conf_means[p])

    c2w = [None] * n_images
    c2w[0] = np.eye(4)
    placed = {0}
    # Prim-style growth over the symmetrized graph
    progress = True
    while len(placed) < n_images and progress:
        progress = False
        for (i, j) in order:
            if i in placed and j not in placed:
                own = np.asarray(pred["pts3d1"][e_of[(j, i)]]).reshape(-1, 3)
                in_i = np.asarray(pred["pts3d2"][e_of[(i, j)]]).reshape(-1, 3)
                wgt = np.asarray(pred["conf2"][e_of[(i, j)]]).reshape(-1)
                R, t, s = jax.tree.map(np.asarray, umeyama(
                    jnp.asarray(own, jnp.float32), jnp.asarray(in_i, jnp.float32),
                    weights=jnp.asarray(wgt, jnp.float32)))
                # row convention: own @ R * s + t ≈ in_i  ⇒ column M = s·Rᵀ
                M = np.eye(4)
                M[:3, :3] = s * R.T
                M[:3, 3] = t
                c2w[j] = c2w[i] @ M
                placed.add(j)
                progress = True
    for k in range(n_images):
        if c2w[k] is None:   # disconnected fallback
            c2w[k] = np.eye(4)

    depths = np.stack([np.maximum(np.asarray(pred["pts3d1"][e_of[
        (i, (i + 1) % n_images) if (i, (i + 1) % n_images) in e_of
        else next(p for p in pairs if p[0] == i)]])[..., 2], 1e-3)
        for i in range(n_images)])
    focals = np.stack([np.asarray(estimate_focal(jnp.asarray(
        pred["pts3d1"][e_of[next(p for p in pairs if p[0] == i)]])))
        for i in range(n_images)])
    return {"c2w": np.stack(c2w), "depth": depths, "focal": focals}


def global_align(pred, pairs: Sequence[Tuple[int, int]], n_images: int,
                 niter: int = 300, lr: float = 0.01,
                 ) -> Dict[str, np.ndarray]:
    """Jitted global aligner (upstream PointCloudOptimizer role,
    minimal_demo_dust3r.py:142-148: 300 iters, lr 0.01, linear schedule).

    Variables: per-image log-depthmaps, cam→world quaternion+translation,
    log-focals; per-edge log-scales. Loss: confidence-weighted distance
    between each edge's (scaled, pose-transformed) pairwise pointmaps and
    the global pointmaps they should equal. Image 0's pose and the first
    edge's scale are frozen to fix the gauge."""
    import optax

    init = mst_init(jax.tree.map(np.asarray, pred), pairs, n_images)
    h, w = pred["pts3d1"].shape[1:3]
    ii = jnp.asarray([p[0] for p in pairs])
    jj = jnp.asarray([p[1] for p in pairs])
    conf1 = jnp.asarray(pred["conf1"])
    conf2 = jnp.asarray(pred["conf2"])
    x1 = jnp.asarray(pred["pts3d1"])
    x2 = jnp.asarray(pred["pts3d2"])
    # log-confidence weights (upstream conf_trf = log), ≥ 0
    w1 = jnp.maximum(jnp.log(conf1), 0.0)
    w2 = jnp.maximum(jnp.log(conf2), 0.0)

    from regen3d_tpu.transforms.rotations import matrix_to_quat
    q0 = jnp.asarray(np.stack([np.asarray(matrix_to_quat(
        jnp.asarray(init["c2w"][k][:3, :3] /
                    np.cbrt(max(np.linalg.det(init["c2w"][k][:3, :3]), 1e-9)),
                    jnp.float32))) for k in range(n_images)]))
    t0 = jnp.asarray(init["c2w"][:, :3, 3], jnp.float32)

    params0 = {
        "log_depth": jnp.log(jnp.asarray(init["depth"], jnp.float32)),
        "quat": q0,
        "trans": t0,
        "log_focal": jnp.log(jnp.asarray(init["focal"], jnp.float32))[:, None],
        "log_scale": jnp.zeros((len(pairs), 1), jnp.float32),
    }

    def global_pointmaps(p):
        def one(k):
            depth = jnp.exp(p["log_depth"][k])
            pts_cam = _unproject(depth, jnp.exp(p["log_focal"][k, 0]))
            R, t = _c2w(p["quat"][k], p["trans"][k])
            return pts_cam @ R.T + t
        return jax.vmap(one)(jnp.arange(n_images))

    def loss_fn(p):
        # freeze gauge: image-0 pose identity, edge-0 scale 1
        quat = p["quat"].at[0].set(jnp.asarray([1.0, 0, 0, 0]))
        trans = p["trans"].at[0].set(0.0)
        logs = p["log_scale"].at[0].set(0.0)
        p = dict(p, quat=quat, trans=trans, log_scale=logs)
        chi = global_pointmaps(p)  # (N, H, W, 3)

        def edge_loss(e):
            i, j = ii[e], jj[e]
            s = jnp.exp(p["log_scale"][e, 0])
            R, t = _c2w(p["quat"][i], p["trans"][i])
            pr1 = (s * x1[e]) @ R.T + t
            pr2 = (s * x2[e]) @ R.T + t
            # eps-safe norm: plain ‖·‖ has a NaN gradient at exactly-zero
            # residuals (hit whenever the init is already perfect)
            d1 = jnp.sqrt(jnp.sum((chi[i] - pr1) ** 2, -1) + 1e-12)
            d2 = jnp.sqrt(jnp.sum((chi[j] - pr2) ** 2, -1) + 1e-12)
            return jnp.sum(w1[e] * d1) + jnp.sum(w2[e] * d2)

        total = jnp.sum(jax.vmap(edge_loss)(jnp.arange(len(pairs))))
        return total / (len(pairs) * h * w)

    sched = optax.linear_schedule(lr, lr * 1e-3, niter)
    opt = optax.adam(sched)

    @jax.jit
    def fit(params0):
        state0 = opt.init(params0)

        def step(carry, _):
            params, state = carry
            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, state = opt.update(g, state, params)
            return (optax.apply_updates(params, updates), state), loss

        (params, _), losses = jax.lax.scan(step, (params0, state0),
                                           None, length=niter)
        return params, losses

    params, losses = fit(params0)
    params = jax.tree.map(np.array, params)  # writable host copies
    params["quat"][0] = np.asarray([1.0, 0, 0, 0])
    params["trans"][0] = 0.0
    quats = params["quat"] / np.linalg.norm(params["quat"], axis=-1,
                                            keepdims=True)
    R = np.asarray(quat_to_matrix(jnp.asarray(quats)))
    c2w = np.tile(np.eye(4), (n_images, 1, 1))
    c2w[:, :3, :3] = R
    c2w[:, :3, 3] = params["trans"]
    depth = np.exp(params["log_depth"]).reshape(n_images, h, w)
    focal = np.exp(params["log_focal"][:, 0])
    pts = np.asarray(jax.vmap(
        lambda d, f, q, t: _unproject(jnp.asarray(d), jnp.asarray(f))
        @ quat_to_matrix(jnp.asarray(q)).T + jnp.asarray(t))(
        depth, focal, quats, params["trans"]))
    log.info("dust3r aligner: %d iters, loss %.5f → %.5f",
             niter, float(losses[0]), float(losses[-1]))
    return {"c2w": c2w, "depth": depth, "focal": focal, "pts3d": pts}


def pair_viewer(pred, pairs: Sequence[Tuple[int, int]]
                ) -> Dict[str, np.ndarray]:
    """2-image closed-form scene (upstream PairViewer): frame 0 is world;
    focals by Weiszfeld; camera 1's pose from the conf-weighted similarity
    of its own-frame pointmap onto its pointmap in frame 0."""
    e01 = pairs.index((0, 1))
    e10 = pairs.index((1, 0))
    pts0 = np.asarray(pred["pts3d1"][e01])          # view 0 in frame 0
    pts1_in0 = np.asarray(pred["pts3d2"][e01])      # view 1 in frame 0
    pts1_own = np.asarray(pred["pts3d1"][e10])      # view 1 in frame 1
    conf1 = np.asarray(pred["conf2"][e01])

    f0 = float(np.asarray(estimate_focal(jnp.asarray(pts0))))
    f1 = float(np.asarray(estimate_focal(jnp.asarray(pts1_own))))
    R, t, s = jax.tree.map(np.asarray, umeyama(
        jnp.asarray(pts1_own.reshape(-1, 3), jnp.float32),
        jnp.asarray(pts1_in0.reshape(-1, 3), jnp.float32),
        weights=jnp.asarray(conf1.reshape(-1), jnp.float32)))
    c2w1 = np.eye(4)
    c2w1[:3, :3] = float(s) * R.T
    c2w1[:3, 3] = t
    c2w = np.stack([np.eye(4), c2w1])
    depth = np.stack([np.maximum(pts0[..., 2], 1e-6),
                      np.maximum(pts1_own[..., 2], 1e-6)])
    pts1_world = (pts1_own.reshape(-1, 3) @ c2w1[:3, :3].T
                  + c2w1[:3, 3]).reshape(pts0.shape)
    pts3d = np.stack([pts0, pts1_world])
    return {"c2w": c2w, "depth": depth,
            "focal": np.asarray([f0, f1]), "pts3d": pts3d}


# --------------------------------------------------------------------------
# Export
# --------------------------------------------------------------------------

def export_dust3r_scene(cfg: Config, scene: Dict[str, np.ndarray],
                        images: np.ndarray, names: Sequence[str],
                        confs: np.ndarray) -> None:
    """Write the reference dust3r artifacts (scene.glb pointcloud +
    camera.npz, minimal_demo_dust3r.py:30-95) AND the standard phase-4
    artifact set so downstream phases run unchanged."""
    art = Artifacts(cfg)
    os.makedirs(art.pre3d_dir, exist_ok=True)
    min_conf = float(cfg.get("min_conf_thr", 3.0))
    h, w = scene["depth"].shape[1:3]

    masks = confs >= min_conf
    # fall back to keep-all if the threshold wipes a frame (random-init nets)
    for k in range(len(masks)):
        if not masks[k].any():
            masks[k][:] = True

    # reference scene.glb: one point cloud, rebased by inv(c2w0·OPENGL·RotY180)
    opengl = np.diag([1.0, -1.0, -1.0, 1.0])
    roty = np.diag([-1.0, 1.0, -1.0, 1.0])
    world_fix = np.linalg.inv(scene["c2w"][0] @ opengl @ roty)
    pts = np.concatenate([scene["pts3d"][k][masks[k]]
                          for k in range(len(names))])
    cols = np.concatenate([images[k][masks[k]] for k in range(len(names))])
    pts_fixed = pts @ world_fix[:3, :3].T + world_fix[:3, 3]
    from regen3d_tpu.utils.glb import save_pointcloud_glb
    save_pointcloud_glb(os.path.join(art.pre3d_dir, "scene.glb"),
                        pts_fixed.reshape(-1, 3),
                        (cols.reshape(-1, 3) * 255).astype(np.uint8))

    # standard downstream artifact set (camera.npz/scene_vggt.ply/COLMAP):
    # world→cam from cams2world, per-frame clouds from the aligned pointmaps
    from regen3d_tpu.pipeline.phase4_camera import export_reconstruction
    frames: Dict[str, Dict[str, np.ndarray]] = {}
    for k, name in enumerate(names):
        w2c = np.linalg.inv(scene["c2w"][k])
        frames[name] = {
            "points": scene["pts3d"][k][masks[k]].reshape(-1, 3),
            "colors": (images[k][masks[k]].reshape(-1, 3) * 255
                       ).astype(np.uint8),
            "R": w2c[:3, :3], "t": w2c[:3, 3],
            "fx": float(scene["focal"][k]), "fy": float(scene["focal"][k]),
            "cx": w / 2.0, "cy": h / 2.0, "width": w, "height": h,
        }
    export_reconstruction(cfg, frames)


def run(cfg: Config, params=None, model=None) -> None:
    """Phase-4 dust3r entry (Use_VGGT: false)."""
    art = Artifacts(cfg)
    inputs = [cfg.path("input_image")]
    if os.path.exists(art.empty_room):
        inputs.append(art.empty_room)
    if model is None or params is None:
        raise RuntimeError(
            "dust3r phase 4 requires a model + params (no pretrained "
            "weights ship in this environment — convert a checkpoint via "
            "scripts/convert_weights.py and pass it in)")
    run_from_model(cfg, params, model, tuple(inputs))


def run_from_model(cfg: Config, params, model,
                   image_paths: Tuple[str, ...],
                   resolution: int = None) -> None:
    """Load → (duplicate single image) → pairwise inference → align →
    export. The reference duplicates a lone input so the pair graph is
    non-empty (minimal_demo_dust3r.py:131-132,201-203)."""
    mcfg = getattr(model, "cfg", None)
    res = resolution or int(cfg.get("image_size", 512))
    if mcfg is not None:
        res = max(mcfg.patch, (res // mcfg.patch) * mcfg.patch)

    names = [os.path.basename(p) for p in image_paths]
    if len(image_paths) == 1:
        image_paths = (image_paths[0], image_paths[0])
        names = [names[0], "duplicate_" + names[0]]
    imgs = []
    for p in image_paths:
        arr = load_image_rgb(p, max_side=None).astype(np.float32) / 255.0
        imgs.append(np.asarray(jax.image.resize(
            jnp.asarray(arr), (res, res, 3), "bilinear")))
    images = np.stack(imgs)

    pairs = make_pairs(len(images))
    pred = run_pairwise(params, model, jnp.asarray(images), pairs)
    pred = jax.tree.map(np.asarray, pred)

    if len(images) > 2:
        scene = global_align(pred, pairs, len(images),
                             niter=int(cfg.get("dust3r_niter", 300)))
    else:
        scene = pair_viewer(pred, pairs)

    confs = np.stack([np.asarray(pred["conf1"][pairs.index(
        (k, (k + 1) % len(images)))]) for k in range(len(images))])
    export_dust3r_scene(cfg, scene, images, names, confs)
    log.info("phase4-dust3r: %d frames aligned and exported", len(names))
