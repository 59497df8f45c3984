"""Whole-scene single-jit serving step: phases 4→6 fused into ONE program.

The phased pipeline (run.py -p 4 5 6) round-trips every phase boundary
through the filesystem artifact bus — right for the reference's CLI
contract, wrong for production serving. This module compiles the hot path
end to end: VGGT forward → depth unprojection → per-object static-size
cloud extraction (the phase-5 mask crop as a top-k selection) → the
vmapped pose-fit engine → posed scene vertices, with NO host transfer
between stages. One `jit`, static shapes throughout, so XLA fuses across
what used to be phase boundaries and the TPU never waits on the host.

Scope notes (what the fused step deliberately skips vs the full CLI):
segmentation/inpainting (phases 1–2 gate on external generative APIs),
mesh *generation* (phase 3 runs once per asset, is cached, and its
marching-cubes extraction is host-side by design), and the export/IO
tails. Those stay phased; this is the per-scene inference recurrence.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from regen3d_tpu.camera import Camera
from regen3d_tpu.pipeline.pose_fit import (
    FitConfig,
    ObjectBatch,
    PoseParams,
    fit_poses,
)


class SceneStepResult(NamedTuple):
    params: PoseParams          # fitted per-object poses
    verts_world: jnp.ndarray    # (K, Vmax, 3) posed mesh vertices
    losses: jnp.ndarray         # (K,) final fit losses
    depth: jnp.ndarray          # (H, W) VGGT depth of the query frame
    points: jnp.ndarray         # (K, P, 3) extracted per-object clouds
    points_valid: jnp.ndarray   # (K, P) bool


def _extract_object_points(cloud, conf, masks, num_points):
    """Static-size phase-5 crop: for each object mask, pick the
    `num_points` highest-confidence cloud points that land in the mask.

    cloud (N, 3) world points with pixel-aligned layout, conf (N,),
    masks (K, N) bool hit test (precomputed by projection or pixel
    alignment). Returns ((K, P, 3) points, (K, P) valid)."""
    def one(mask):
        score = jnp.where(mask, conf, -jnp.inf)
        # deterministic tie-break: quantize to bf16 so the ~1e-6
        # reduction-order noise between a tp-sharded and a single-device
        # VGGT cannot reorder near-tied confidences; within a bf16 bucket
        # lax.top_k breaks ties by lowest index, which is stable across
        # both programs. Lets the dryrun equality hold at rtol=1e-3.
        score = score.astype(jnp.bfloat16).astype(jnp.float32)
        val, idx = jax.lax.top_k(score, num_points)
        return cloud[idx], jnp.isfinite(val)

    return jax.vmap(one)(masks)


@functools.partial(jax.jit,
                   static_argnames=("model", "fit_cfg", "num_points",
                                    "image_hw"))
def scene_step(
    vggt_params,
    model,
    images: jnp.ndarray,        # (F, S, S, 3) in [0, 1] (frame 0 = query)
    masks: jnp.ndarray,         # (K, S, S) bool object masks (query frame)
    verts: jnp.ndarray,         # (K, Vmax, 3) canonical asset meshes
    verts_mask: jnp.ndarray,    # (K, Vmax) bool
    faces: jnp.ndarray,         # (K, Fmax, 3) int32
    faces_mask: jnp.ndarray,    # (K, Fmax) bool
    fit_cfg: FitConfig,
    num_points: int = 1024,
    image_hw: Tuple[int, int] = None,
) -> SceneStepResult:
    """One fused scene inference step (phases 4→6)."""
    from regen3d_tpu.models.vggt import (
        pose_encoding_to_camera,
        unproject_depth,
    )

    s = images.shape[1]
    k = masks.shape[0]

    # --- phase 4: VGGT forward + unprojection -----------------------------
    out = model.apply(vggt_params, images[None])
    cam_dec = pose_encoding_to_camera(out["pose_enc"][0], (s, s))
    depth = out["depth"][0, 0]
    conf = out["depth_conf"][0, 0].reshape(-1)
    cloud = unproject_depth(depth, cam_dec, 0).reshape(-1, 3)

    # --- phase 5: per-object static-size cloud extraction ------------------
    # the cloud is pixel-aligned with frame 0, so the mask IS the hit test
    hit = masks.reshape(k, -1)
    pts, pts_valid = _extract_object_points(cloud, conf, hit, num_points)

    # --- phase 6: vmapped differentiable-rendering pose fit ----------------
    # bridge conventions: the VGGT camera is OpenCV (u = cx + fx·x/z); our
    # Camera is P3D-sign (u = cx − fx·x/z, +X left +Y up). view_p3d =
    # D·(R_cv·x + t) with D = diag(−1, −1, 1), i.e. row form
    # x @ (R_cvᵀ D) + t·D — pinned by the parity test against the mask.
    D = jnp.asarray([-1.0, -1.0, 1.0])
    fx = cam_dec["fx"][0]
    fy = cam_dec["fy"][0]
    cam = Camera(R=jnp.asarray(cam_dec["R"][0], jnp.float32).T * D[None, :],
                 T=jnp.asarray(cam_dec["t"][0], jnp.float32) * D,
                 focal=jnp.stack([fx, fy]),
                 principal=jnp.stack([cam_dec["cx"][0], cam_dec["cy"][0]]),
                 image_size=image_hw or (s, s))

    # fit at fit_cfg.image_hw, which may be COARSER than the VGGT frame
    # (phase 6's coarse leg): max-pool the masks and rescale the camera.
    # Full-frame (518²) fits set fit_cfg.object_chunk (pose_fit.batch_loss):
    # the object axis runs in checkpointed lax.map groups, so live memory
    # is one group's (pixels × face_chunk) rasterizer tile instead of K of
    # them (the r4 half-res fallback existed because K=8 vmapped tiles at
    # 518² cost ~2 GB). NOTE: coarse legs need sigma ≳1e-4 — at
    # quarter-area resolutions a 1e-5 blur is sub-pixel and the fit
    # diverges on real (16k-face structured) meshes; see bench_fidelity.
    fh, fw = fit_cfg.image_hw
    if (fh, fw) != (s, s):
        if s % fh or s % fw:
            raise ValueError(
                f"fit_cfg.image_hw {fit_cfg.image_hw} must divide the "
                f"frame size {s} for mask pooling")
        masks_fit = masks.reshape(k, fh, s // fh, fw, s // fw).max((2, 4))
        cam = cam.rescaled(fh, fw)
    else:
        masks_fit = masks

    med = jnp.nanmedian(jnp.where(pts_valid[..., None], pts, jnp.nan),
                        axis=1)
    med = jnp.nan_to_num(med, nan=2.0)
    batch = ObjectBatch(
        verts=verts, verts_mask=verts_mask,
        faces=faces, faces_mask=faces_mask,
        target_mask=masks_fit.astype(jnp.float32),
        target_points=jnp.where(pts_valid[..., None], pts, 0.0),
        points_mask=pts_valid,
        pivot_R=jnp.tile(jnp.eye(3)[None], (k, 1, 1)),
        pivot_t=jnp.zeros((k, 3)),
        on_floor=jnp.zeros((k,), bool),
        object_valid=pts_valid.any(axis=1),
        bbox_lo=jnp.asarray([-100.0, -100.0, 1e-3]),
        bbox_hi=jnp.asarray([100.0, 100.0, 100.0]))
    init = PoseParams.zeros(k)._replace(translation=med)
    res = fit_poses(init, batch, cam, fit_cfg)

    from regen3d_tpu.pipeline.pose_fit import pose_transform
    posed = pose_transform(res.params, batch, fit_cfg)
    return SceneStepResult(params=res.params, verts_world=posed,
                           losses=res.losses, depth=depth,
                           points=pts, points_valid=pts_valid)
