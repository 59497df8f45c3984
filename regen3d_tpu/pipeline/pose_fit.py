"""Phase 6 numerical core: batched differentiable-rendering pose fitting.

The reference optimizes each object's pose in its own OS process
(scene_reconstruction/run.py:88-96 — mp.Pool of pose_matching jobs, each a
300-iteration Adam loop over a CUDA silhouette render, diff_model.py /
diff_model_planar.py).

TPU redesign: ONE jitted program optimizes ALL objects simultaneously —
the per-object models become a vmapped batch, Adam states are banked
per-object arrays, and early stopping is a per-object freeze mask inside a
single ``lax.while_loop`` (exit when every object converged or the
iteration cap is hit). Losses and semantics match the reference:

  loss = silhoutte_loss·(0.75·dice + 0.25·(BCE|focal))
       + loss_3d·point_mesh_face_distance
       + loss_bbox·bbox_hinge                       (diff_model.py:229-240)
  Adam lr=0.005, ≤300 iters, per-object grad clip 1.0,
  early stop ‖g‖<5e-3 after ≥200 iters              (pose_matching_planar.py:1594-1716)

Pose parametrization (use_5DOF=True default, config.yaml:298):
  planar objects:  (u, w) translation on the fitted floor plane, yaw about
                   the plane normal × rotation_speed_mult, log-scale
                   (diff_model_planar.py:72-227)
  free objects:    3-DOF translation + yaw (or 3-DOF axis-angle when
                   use_5DOF=False), log-scale (diff_model.py:71-253)
Both are expressed in a per-object *pivot frame* carried by (pivot_R,
pivot_t): for planar objects the plane frame (normal = +Y, pivot at the
object's bottom centre), identity for free objects.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from regen3d_tpu.camera import Camera
from regen3d_tpu.ops.losses import bbox_hinge_loss, silhouette_loss
from regen3d_tpu.ops.point_mesh import point_mesh_face_distance
from regen3d_tpu.ops.rasterize import soft_silhouette
from regen3d_tpu.transforms.rotations import so3_exp, yaw_rotation


class ObjectBatch(NamedTuple):
    """Static-shape padded batch of objects to fit."""

    verts: jnp.ndarray         # (B, Vmax, 3) pivot-frame vertices
    verts_mask: jnp.ndarray    # (B, Vmax) bool
    faces: jnp.ndarray         # (B, Fmax, 3) int32 (padded faces → (0,0,0))
    faces_mask: jnp.ndarray    # (B, Fmax) bool
    target_mask: jnp.ndarray   # (B, H, W) float32 — binary object masks
    target_points: jnp.ndarray  # (B, Pmax, 3) world-frame target clouds
    points_mask: jnp.ndarray   # (B, Pmax) bool
    pivot_R: jnp.ndarray       # (B, 3, 3) pivot→world rotation (row-vector)
    pivot_t: jnp.ndarray       # (B, 3)
    on_floor: jnp.ndarray      # (B,) bool — freeze vertical translation
    object_valid: jnp.ndarray  # (B,) bool — padding slots in the batch
    bbox_lo: jnp.ndarray       # (3,) background AABB (world)
    bbox_hi: jnp.ndarray       # (3,)


class PoseParams(NamedTuple):
    translation: jnp.ndarray   # (B, 3) in pivot frame
    yaw: jnp.ndarray           # (B,)
    rot_aa: jnp.ndarray        # (B, 3) axis-angle (use_5dof=False path)
    log_scale: jnp.ndarray     # (B,)

    @classmethod
    def zeros(cls, b: int, dtype=jnp.float32) -> "PoseParams":
        return cls(jnp.zeros((b, 3), dtype), jnp.zeros(b, dtype),
                   jnp.zeros((b, 3), dtype), jnp.zeros(b, dtype))


@dataclass(frozen=True)
class FitConfig:
    """Static knobs (mirror config.yaml keys — see module docstring)."""

    image_hw: Tuple[int, int] = (256, 256)
    sigma: float = 5e-7
    w_sil: float = 0.1          # silhoutte_loss
    w_3d: float = 0.1           # loss_3d
    w_bbox: float = 0.01        # loss_bbox
    use_focal: bool = True      # planar model pixel term
    use_5dof: bool = True
    rotation_speed_mult: float = 8.0
    learning_rate: float = 0.005
    max_iterations: int = 300
    early_stop_grad: float = 5e-3
    early_stop_min_iters: int = 200
    grad_clip: float = 1.0
    face_chunk: int = 256
    point_chunk: int = 512
    record_history: bool = True
    # tile-binned silhouette (ops/rasterize.soft_silhouette_binned): large
    # wins at high resolution; requires image_hw divisible by bin_tile.
    use_binned_raster: bool = False
    bin_tile: int = 64
    faces_per_tile: int = 256
    # MXU edge-function silhouette (ops/rasterize.soft_silhouette_edge) with
    # binning hoisted out of the optimization loop: fastest path. The bin
    # margin must cover vertex screen motion across the whole fit.
    use_edge_raster: bool = False
    bin_margin_px: float = 64.0
    # Pallas silhouette kernel (ops/pallas_rasterize.py): "auto" uses it on
    # TPU at ≥512² with 32-px tiles (where the empty-tile skip wins —
    # measured 6.4 vs 8.2 ms at 1024²); True forces, False disables
    use_pallas_raster: object = "auto"
    # candidate-pruned 3D loss: exact point-triangle on the k nearest faces
    # (MXU centroid KNN); 0 = full exact loss
    pm_topk: int = 0
    # process the object axis in checkpointed groups of this size via
    # lax.map instead of one big vmap (0 = vmap all). The streaming
    # rasterizer keeps a live (pixels × face_chunk) tile per object; at
    # 518² × K=8 that is ~2 GB under vmap — sequential groups trade a
    # little wall-clock for a K/object_chunk× smaller live set so the
    # fused full-resolution scene step fits in HBM. Requires the object
    # count to be a multiple of object_chunk (pad_batch_to).
    object_chunk: int = 0


def pose_transform(
    params: PoseParams, batch: ObjectBatch, cfg: FitConfig
) -> jnp.ndarray:
    """Apply per-object pose → world-space vertices (B, Vmax, 3)."""
    scale = jnp.exp(params.log_scale)[:, None, None]
    if cfg.use_5dof:
        R = yaw_rotation(params.yaw * cfg.rotation_speed_mult)  # (B, 3, 3)
    else:
        R = so3_exp(params.rot_aa)
    t = params.translation
    # planar objects keep their pivot-frame height (y) fixed
    t = jnp.where(batch.on_floor[:, None],
                  t * jnp.asarray([1.0, 0.0, 1.0], t.dtype), t)
    v = jnp.einsum("bvj,bjk->bvk", batch.verts * scale, R) + t[:, None, :]
    return jnp.einsum("bvj,bjk->bvk", v, batch.pivot_R) + batch.pivot_t[:, None, :]


def _binned_budget_ok(cfg: "FitConfig", n_faces: int) -> bool:
    """Static guard for the fixed-size per-tile bins.

    build_face_bins keeps top-K overlapping faces per tile; when a mesh
    is large relative to the tile budget (few tiles at coarse
    resolutions), top_k silently drops all but the LOWEST-INDEX faces —
    the silhouette collapses to a mesh fragment and the fit diverges
    (bench fidelity probe: 16k-face furniture at 256², IoU 0.12 vs 0.59).
    Require 4× average headroom: n_faces·4 ≤ n_tiles·faces_per_tile,
    else fall back to the exact streaming rasterizer."""
    nty = cfg.image_hw[0] // cfg.bin_tile
    ntx = cfg.image_hw[1] // cfg.bin_tile
    return n_faces * 4 <= nty * ntx * cfg.faces_per_tile


def _use_pallas(cfg: "FitConfig") -> bool:
    if cfg.use_pallas_raster is True:
        return True
    if cfg.use_pallas_raster == "auto":
        import jax
        return (jax.default_backend() == "tpu"
                and min(cfg.image_hw) >= 512 and cfg.bin_tile == 32)
    return False


def _object_loss(
    v_world: jnp.ndarray,
    verts_mask: jnp.ndarray,
    faces: jnp.ndarray,
    faces_mask: jnp.ndarray,
    target_mask: jnp.ndarray,
    target_points: jnp.ndarray,
    points_mask: jnp.ndarray,
    bins,
    camera: Camera,
    bbox_lo: jnp.ndarray,
    bbox_hi: jnp.ndarray,
    cfg: FitConfig,
) -> jnp.ndarray:
    vs = camera.view_to_screen(camera.world_to_view(v_world))
    binned_ok = _binned_budget_ok(cfg, faces.shape[0])
    if cfg.use_edge_raster and binned_ok and _use_pallas(cfg):
        # measured on v5e: the scalar-prefetch empty-tile skip makes the
        # Pallas kernel ~22% faster than the fused-XLA edge path at 1024²
        # (6.4 vs 8.2 ms fwd+bwd, K=64, 2048 faces) but launch overhead
        # loses at 256² — hence the size gate in _use_pallas
        from regen3d_tpu.ops.pallas_rasterize import (
            soft_silhouette_edge_pallas)
        alpha = soft_silhouette_edge_pallas(
            vs, faces, cfg.image_hw, sigma=cfg.sigma, faces_mask=faces_mask,
            faces_per_tile=cfg.faces_per_tile, bins=bins)
    elif cfg.use_edge_raster and binned_ok:
        from regen3d_tpu.ops.rasterize import soft_silhouette_edge
        alpha = soft_silhouette_edge(
            vs, faces, cfg.image_hw, sigma=cfg.sigma, faces_mask=faces_mask,
            tile=cfg.bin_tile, faces_per_tile=cfg.faces_per_tile, bins=bins)
    elif cfg.use_binned_raster and binned_ok:
        from regen3d_tpu.ops.rasterize import soft_silhouette_binned
        alpha = soft_silhouette_binned(
            vs, faces, cfg.image_hw, sigma=cfg.sigma, faces_mask=faces_mask,
            tile=cfg.bin_tile, faces_per_tile=cfg.faces_per_tile)
    else:
        alpha = soft_silhouette(vs, faces, cfg.image_hw, sigma=cfg.sigma,
                                faces_mask=faces_mask, chunk=cfg.face_chunk)
    l_sil = silhouette_loss(alpha, target_mask, use_focal=cfg.use_focal)
    if cfg.pm_topk > 0:
        from regen3d_tpu.ops.point_mesh import point_mesh_face_distance_topk
        l_3d = point_mesh_face_distance_topk(
            v_world, faces, target_points, points_mask=points_mask,
            faces_mask=faces_mask, k=cfg.pm_topk, chunk=cfg.point_chunk)
    else:
        # exact loss with the argmin-pair custom VJP (no scan residuals)
        from regen3d_tpu.ops.point_mesh import point_mesh_face_distance_fast
        l_3d = point_mesh_face_distance_fast(
            v_world, faces, target_points, points_mask, faces_mask,
            cfg.point_chunk)
    l_box = bbox_hinge_loss(v_world, bbox_lo, bbox_hi, verts_mask)
    return cfg.w_sil * l_sil + cfg.w_3d * l_3d + cfg.w_bbox * l_box


def batch_loss(
    params: PoseParams, batch: ObjectBatch, camera: Camera, cfg: FitConfig,
    bins=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(total scalar, per-object losses (B,)). Padding slots contribute 0."""
    v_world = pose_transform(params, batch, cfg)

    def loss_fn(v, vm, fc, fm, tm, tp, pm, bn):
        # camera/bbox/cfg are closed over (broadcast, not vmapped)
        return _object_loss(v, vm, fc, fm, tm, tp, pm, bn,
                            camera, batch.bbox_lo, batch.bbox_hi, cfg)

    b = v_world.shape[0]
    if bins is None:
        bins = (jnp.zeros((b, 1, 1), jnp.int32), jnp.zeros((b, 1, 1), bool))
    args = (v_world, batch.verts_mask, batch.faces, batch.faces_mask,
            batch.target_mask, batch.target_points, batch.points_mask, bins)
    oc = cfg.object_chunk
    if 0 < oc < b and b % oc == 0:
        # sequential object groups: lax.map over checkpointed vmap-groups.
        # checkpoint keeps the scan from banking each group's rasterizer
        # tiles for backward — live memory is ONE group's working set.
        grouped = jax.tree.map(lambda x: x.reshape(b // oc, oc, *x.shape[1:]),
                               args)
        per_obj = lax.map(
            jax.checkpoint(lambda a: jax.vmap(loss_fn)(*a)),
            grouped).reshape(b)
    else:
        per_obj = jax.vmap(loss_fn)(*args)
    per_obj = jnp.where(batch.object_valid, per_obj, 0.0)
    return jnp.sum(per_obj), per_obj


def compute_batch_bins(
    params: PoseParams, batch: ObjectBatch, camera: Camera, cfg: FitConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-object silhouette bins from the CURRENT pose, with a motion
    margin — hoists binning out of the optimization loop (edge raster path)."""
    from regen3d_tpu.ops.rasterize import compute_silhouette_bins

    v_world = pose_transform(params, batch, cfg)

    def one(v, fc, fm):
        vs = camera.view_to_screen(camera.world_to_view(v))
        return compute_silhouette_bins(
            vs, fc, cfg.image_hw, sigma=cfg.sigma, faces_mask=fm,
            tile=cfg.bin_tile, faces_per_tile=cfg.faces_per_tile,
            margin_px=cfg.bin_margin_px)

    return jax.vmap(one)(v_world, batch.faces, batch.faces_mask)


class FitResult(NamedTuple):
    params: PoseParams
    losses: jnp.ndarray         # (B,) final per-object losses
    num_iters: jnp.ndarray      # scalar iterations run
    converged: jnp.ndarray      # (B,) bool
    history: jnp.ndarray        # (T+1, B, 8) pose history (zeros if disabled)


def _flatten_params(p: PoseParams) -> jnp.ndarray:
    return jnp.concatenate(
        [p.translation, p.yaw[:, None], p.rot_aa, p.log_scale[:, None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fit_poses(
    init_params: PoseParams,
    batch: ObjectBatch,
    camera: Camera,
    cfg: FitConfig,
) -> FitResult:
    """Run the batched Adam pose optimization (single compiled program)."""
    b = init_params.yaw.shape[0]
    bins = (compute_batch_bins(init_params, batch, camera, cfg)
            if cfg.use_edge_raster
            and _binned_budget_ok(cfg, batch.faces.shape[1]) else None)
    grad_fn = jax.grad(lambda p: batch_loss(p, batch, camera, cfg, bins)[0])

    beta1, beta2, eps = 0.9, 0.999, 1e-8
    zeros_like = lambda p: jax.tree.map(jnp.zeros_like, p)

    hist_len = cfg.max_iterations + 1 if cfg.record_history else 1
    hist0 = jnp.zeros((hist_len, b, 8), jnp.float32)
    if cfg.record_history:
        hist0 = hist0.at[0].set(_flatten_params(init_params))

    def per_object_norm(g: PoseParams) -> jnp.ndarray:
        sq = (jnp.sum(g.translation ** 2, -1) + g.yaw ** 2
              + jnp.sum(g.rot_aa ** 2, -1) + g.log_scale ** 2)
        return jnp.sqrt(sq + 1e-20)

    def step(state):
        it, params, m, v, active, hist = state
        g = grad_fn(params)
        gnorm = per_object_norm(g)                       # (B,)
        # per-object grad clip to cfg.grad_clip (reference clips global 1.0)
        clip = jnp.minimum(1.0, cfg.grad_clip / jnp.maximum(gnorm, 1e-12))
        # freeze converged / padding objects
        gate = (active & batch.object_valid).astype(jnp.float32) * clip

        def apply_gate(x, axis1=False):
            return x * (gate[:, None] if axis1 else gate)

        g = PoseParams(apply_gate(g.translation, True), apply_gate(g.yaw),
                       apply_gate(g.rot_aa, True), apply_gate(g.log_scale))

        t = (it + 1).astype(jnp.float32)
        new_m = jax.tree.map(lambda m_, g_: beta1 * m_ + (1 - beta1) * g_, m, g)
        new_v = jax.tree.map(lambda v_, g_: beta2 * v_ + (1 - beta2) * g_ * g_, v, g)
        bc1 = 1 - beta1 ** t
        bc2 = 1 - beta2 ** t

        def upd(p_, m_, v_):
            return p_ - cfg.learning_rate * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps)

        new_params = jax.tree.map(upd, params, new_m, new_v)

        stop_now = (gnorm < cfg.early_stop_grad) & (it >= cfg.early_stop_min_iters)
        new_active = active & ~stop_now
        if cfg.record_history:
            hist = lax.dynamic_update_slice_in_dim(
                hist, _flatten_params(new_params)[None], it + 1, axis=0)
        return it + 1, new_params, new_m, new_v, new_active, hist

    def cond(state):
        it, _p, _m, _v, active, _h = state
        return jnp.logical_and(it < cfg.max_iterations,
                               jnp.any(active & batch.object_valid))

    init = (jnp.zeros((), jnp.int32), init_params,
            zeros_like(init_params), zeros_like(init_params),
            jnp.ones(b, bool), hist0)
    it, params, _m, _v, active, hist = lax.while_loop(cond, step, init)
    _, per_obj = batch_loss(params, batch, camera, cfg, bins)
    return FitResult(params=params, losses=per_obj, num_iters=it,
                     converged=~active, history=hist)


def pad_batch_to(batch: ObjectBatch, params: PoseParams, multiple: int
                 ) -> Tuple[ObjectBatch, PoseParams, int]:
    """Pad the object axis to a multiple (padding slots object_valid=False,
    identity pivots). Returns (batch, params, original_b)."""
    b = batch.verts.shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch, params, b

    def pad0(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad, *x.shape[1:]), fill, x.dtype)], axis=0)

    eye = jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))
    batch = ObjectBatch(
        verts=pad0(batch.verts), verts_mask=pad0(batch.verts_mask),
        faces=pad0(batch.faces), faces_mask=pad0(batch.faces_mask),
        target_mask=pad0(batch.target_mask),
        target_points=pad0(batch.target_points),
        points_mask=pad0(batch.points_mask),
        pivot_R=jnp.concatenate([batch.pivot_R, eye]),
        pivot_t=pad0(batch.pivot_t),
        on_floor=pad0(batch.on_floor),
        object_valid=pad0(batch.object_valid),  # False fill
        bbox_lo=batch.bbox_lo, bbox_hi=batch.bbox_hi)
    params = jax.tree.map(pad0, params)
    return batch, params, b


def fit_poses_sharded(
    init_params: PoseParams,
    batch: ObjectBatch,
    camera: Camera,
    cfg: FitConfig,
    mesh,
) -> FitResult:
    """fit_poses with the OBJECT axis sharded over the mesh's 'dp' axis.

    This is the TPU replacement for the reference's mp.Pool of per-object
    pose_matching processes (scene_reconstruction/run.py:88-96): the batch
    pads to a dp multiple, per-object leaves land on NamedSharding(P('dp')),
    and GSPMD partitions the single compiled optimization across chips —
    the only cross-chip traffic is the scalar convergence reduction in the
    while_loop condition (an ICI psum).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["dp"]
    batch, init_params, b = pad_batch_to(batch, init_params, dp)

    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == batch.verts.shape[0]:
            return jax.device_put(x, NamedSharding(mesh, P("dp")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    batch = jax.tree.map(put, batch)
    init_params = jax.tree.map(put, init_params)
    with mesh:
        res = fit_poses(init_params, batch, camera, cfg)
    # strip padding back off
    trim = lambda x: x[:b] if getattr(x, "ndim", 0) >= 1 and \
        x.shape[0] == batch.verts.shape[0] else x
    return FitResult(params=jax.tree.map(trim, res.params),
                     losses=res.losses[:b], num_iters=res.num_iters,
                     converged=res.converged[:b],
                     history=res.history[:, :b] if res.history.ndim == 3
                     else res.history)


def find_best_initial_yaw(
    verts: jnp.ndarray,
    target_points: jnp.ndarray,
    num_steps: int = 8,
    verts_mask: Optional[jnp.ndarray] = None,
    points_mask: Optional[jnp.ndarray] = None,
    chunk: int = 1024,
) -> jnp.ndarray:
    """Yaw grid search: score ``num_steps`` Y-rotations of the (pivot-centred)
    vertices against the target cloud with symmetric chamfer, pick the best
    (reference: find_best_initial_yaw, pose_matching_planar.py:185-334 —
    there too the candidates are batched through one chamfer call).
    """
    from regen3d_tpu.ops.knn import chamfer_loss

    angles = jnp.arange(num_steps, dtype=jnp.float32) * (2 * jnp.pi / num_steps)
    Rs = yaw_rotation(angles)                       # (S, 3, 3)
    cand = jnp.einsum("vj,sjk->svk", verts, Rs)     # (S, V, 3)
    scores = jax.vmap(
        lambda v: chamfer_loss(v, target_points, verts_mask, points_mask, chunk)
    )(cand)
    return angles[jnp.argmin(scores)]
