"""Analytic ground truth for synthetic rooms.

The bench + pipeline tests reconstruct rooms whose geometry is known in
closed form (an oracle depth map per frame). Triangulating that depth
gives an INDEPENDENT ``GT_scene`` mesh for the phase-7 alignment and
phase-9 metric path — the reference evaluates against exactly such an
external GT scene (evaluation/run_eval.py:106-125), never against its
own output.
"""

from __future__ import annotations

import numpy as np

from regen3d_tpu.utils.glb import MeshData, SceneData, save_glb


def triangulate_depth_frame(frame: dict, path: str,
                            max_depth_jump: float = 0.15,
                            mask: np.ndarray | None = None,
                            pose_world: bool = True) -> None:
    """Triangulate one oracle depth frame into a true-GT scene mesh GLB.

    ``frame`` is a phase-4 style frame dict: ``points`` (H·W, 3) camera-
    space backprojections in row-major pixel order plus ``width`` /
    ``height``. Grid cells spanning a depth discontinuity larger than
    ``max_depth_jump`` are dropped so foreground objects do not grow
    phantom skirts to the background.

    ``mask`` (H, W bool) restricts triangulation to cells whose four
    corners are all inside it. The pipeline's predicted scene cloud is
    OBJECTS-ONLY (reference parity: scene_optim.py samples the combined
    object GLB; the background mesh lives apart in pointclouds/meshed/
    and only the Blender render consumes it — blender run.py:748), so a
    meaningful GT must be masked to the objects too.

    ``pose_world`` maps the camera-frame points into the pipeline's pose
    world (raw → world is diag(s,−s,−s); scale is irrelevant post-
    normalization) so the phase-7 ICP resolves residual pose error, not
    a 180° frame flip it cannot recover from identity init."""
    h, w = frame["height"], frame["width"]
    pts = np.asarray(frame["points"], np.float32).reshape(h, w, 3)
    depth = pts[..., 2]
    idx = np.arange(h * w).reshape(h, w)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel()
    d = idx[:-1, 1:].ravel()
    z = np.stack([depth[:-1, :-1], depth[1:, :-1],
                  depth[1:, 1:], depth[:-1, 1:]], 0)
    keep = (z.max(0) - z.min(0)).ravel() < max_depth_jump
    if mask is not None:
        m = np.asarray(mask, bool)
        cell = (m[:-1, :-1] & m[1:, :-1] & m[1:, 1:] & m[:-1, 1:]).ravel()
        keep = keep & cell
    faces = np.concatenate([
        np.stack([a, b, c], -1)[keep],
        np.stack([a, c, d], -1)[keep]]).astype(np.int32)
    verts = pts.reshape(-1, 3)
    if pose_world:
        verts = verts * np.asarray([1.0, -1.0, -1.0], np.float32)
    save_glb(path, SceneData(meshes=[MeshData(
        name="gt_room", vertices=verts, faces=faces)]))
