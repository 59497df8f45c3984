"""Texture baking: project view images onto mesh color with visibility.

The reference's ``Hunyuan3DPaintPipeline`` bakes multiview SD-generated
images onto the mesh through its own CUDA rasterizer (SURVEY §2.10). This
module is the TPU equivalent of the baking stage: for each view, the mesh
is depth-rasterized (ops/rasterize.rasterize_hard) for occlusion, every
vertex samples the view image where visible, and views blend by facing
weight. Runs at vertex resolution today (the reference decimates to ~50k
faces, where vertex and texel resolution are comparable); texel-space
atlases are ROADMAP item 6. The multiview image *generator* (SD multiview
UNet) plugs in via models/unet.py once weights convert.
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regen3d_tpu.camera import Camera
from regen3d_tpu.ops.rasterize import rasterize_hard
from regen3d_tpu.utils.meshproc import vertex_normals

log = logging.getLogger(__name__)

# Rows are padded to this quantum so objects with different vertex/face
# counts land in a handful of compilation buckets. The previous design
# defined a fresh jit per CALL that CLOSED OVER the mesh arrays — every
# object recompiled a program with the mesh embedded as an XLA constant
# (~25 s/object of pure compile on the phase-3 path).
_ROW_BUCKET = 4096


def _pad_rows(a: np.ndarray, fill=0) -> Tuple[np.ndarray, int]:
    n = a.shape[0]
    p = (-n) % _ROW_BUCKET
    if p:
        a = np.concatenate(
            [a, np.full((p,) + a.shape[1:], fill, a.dtype)], axis=0)
    return a, n


@functools.partial(jax.jit,
                   static_argnames=("image_hw", "chunk", "depth_eps"))
def _accumulate_view(v, f, fmask, pos, nrm, qmask, acc, wsum, img,
                     cam_R, cam_T, cam_f, cam_p, *, image_hw, chunk,
                     depth_eps):
    """One view's occlusion-tested, facing-weighted color accumulation.

    All mesh/query arrays arrive as ARGUMENTS (padded to _ROW_BUCKET
    multiples), so one compilation serves every same-bucket object."""
    h, w = image_hw
    cam = Camera(R=cam_R, T=cam_T, focal=cam_f, principal=cam_p,
                 image_size=image_hw)
    vs = cam.view_to_screen(cam.world_to_view(v))
    frag = rasterize_hard(vs, f, image_hw, faces_mask=fmask, chunk=chunk)
    uv, z = cam.project(pos)
    xi = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
    zbuf = frag.depth[yi, xi]
    visible = (z > 0) & (z <= zbuf * (1 + depth_eps) + depth_eps)
    inb = (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
    to_cam = cam.center - pos
    to_cam = to_cam / jnp.maximum(
        jnp.linalg.norm(to_cam, axis=-1, keepdims=True), 1e-9)
    facing = jnp.abs(jnp.sum(nrm * to_cam, axis=-1))
    wgt = jnp.where(visible & inb & qmask, facing, 0.0)[:, None]
    return acc + wgt * img[yi, xi], wsum + wgt


def bake_point_colors(
    positions: np.ndarray,
    normals: np.ndarray,
    occluder: Tuple[np.ndarray, np.ndarray],
    views: Sequence[Tuple[Camera, np.ndarray]],
    depth_eps: float = 5e-3,
    chunk: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """Core baker: blend view images onto arbitrary surface samples.

    positions/normals: (N, 3); occluder: the (verts, faces) mesh used for
    the visibility z-test. Returns (colors (N, 3), coverage (N,))."""
    v, _ = _pad_rows(np.asarray(occluder[0], np.float32))
    f, n_faces = _pad_rows(np.asarray(occluder[1], np.int32))
    fmask = np.arange(len(f)) < n_faces
    pos, n_q = _pad_rows(np.asarray(positions, np.float32))
    nrm, _ = _pad_rows(np.asarray(normals, np.float32))
    qmask = np.arange(len(pos)) < n_q

    acc = jnp.zeros((len(pos), 3), jnp.float32)
    wsum = jnp.zeros((len(pos), 1), jnp.float32)
    for cam, img in views:
        img = np.asarray(img, np.float32)
        acc, wsum = _accumulate_view(
            v, f, fmask, pos, nrm, qmask, acc, wsum, jnp.asarray(img),
            cam.R, cam.T, cam.focal, cam.principal,
            image_hw=img.shape[:2], chunk=chunk, depth_eps=depth_eps)
    colors = np.array(acc / jnp.maximum(wsum, 1e-9))[:n_q]
    coverage = np.asarray(wsum)[:n_q, 0]
    if (coverage > 1e-6).any():
        colors[coverage <= 1e-6] = colors[coverage > 1e-6].mean(0)
    return np.clip(colors, 0, 1), coverage


def bake_texture_atlas(
    verts: np.ndarray,
    faces: np.ndarray,
    views: Sequence[Tuple[Camera, np.ndarray]],
    texels_per_face: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, bytes]:
    """Texel-space texture baking with a per-face grid atlas.

    Every face gets a (texels+2)² atlas cell (1-texel gutter); texel world
    positions come from barycentric interpolation, colors from
    :func:`bake_point_colors`. Returns a NEW mesh with per-corner UVs
    (vertices duplicated per face, the standard auto-atlas layout):
    (verts' (3F, 3), faces' (F, 3), uvs (3F, 2), texture PNG bytes).

    This is the texel-space half of the reference's Hunyuan3DPaintPipeline
    baking (its CUDA custom_rasterizer role — SURVEY §2.10); the multiview
    image generator plugs into `views`.
    """
    import io
    from PIL import Image
    from regen3d_tpu.utils.meshproc import vertex_normals  # noqa: F401

    F = len(faces)
    T = texels_per_face
    cell = T + 2
    G = int(np.ceil(np.sqrt(F)))
    atlas_px = G * cell

    tri = verts[faces]                                   # (F, 3, 3)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    fn = np.cross(e1, e2)
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)

    # texel barycentric lattice covering the lower-left triangle of each cell
    us = (np.arange(T) + 0.5) / T
    uu, vv = np.meshgrid(us, us)
    w1 = uu.ravel()
    w2 = vv.ravel()
    inside = w1 + w2 <= 1.0 + 1e-6
    # fold outside texels back onto the triangle (fills the gutter side)
    w1f = np.where(inside, w1, 1.0 - w1)
    w2f = np.where(inside, w2, 1.0 - w2)
    w0f = 1.0 - w1f - w2f
    bary = np.stack([w0f, w1f, w2f], -1).astype(np.float32)   # (T², 3)

    positions = np.einsum("tk,fkd->ftd", bary, tri).reshape(-1, 3)
    normals = np.repeat(fn, T * T, axis=0)
    colors, _cov = bake_point_colors(positions, normals, (verts, faces), views)
    colors = colors.reshape(F, T, T, 3)

    # vectorized cell scatter: build (G·G) padded cells, tile into the atlas
    cells = np.zeros((G * G, cell, cell, 3), np.float32)
    cells[:F, 1:1 + T, 1:1 + T] = colors
    atlas = (cells.reshape(G, G, cell, cell, 3)
             .transpose(0, 2, 1, 3, 4)
             .reshape(atlas_px, atlas_px, 3))
    img = Image.fromarray((np.clip(atlas, 0, 1) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")

    # per-corner UVs: triangle corners at the cell's lattice corners
    new_verts = tri.reshape(-1, 3).astype(np.float32)
    new_faces = np.arange(3 * F, dtype=np.int32).reshape(F, 3)
    fi = np.arange(F)
    cy, cx = np.divmod(fi, G)
    x0 = (cx * cell + 1) / atlas_px
    y0 = (cy * cell + 1) / atlas_px
    side = T / atlas_px
    # corner order matches bary (w0 at (0,0), w1 at (1,0), w2 at (0,1))
    uvs = np.zeros((F, 3, 2), np.float32)
    uvs[:, 0] = np.stack([x0, y0], -1)
    uvs[:, 1] = np.stack([x0 + side, y0], -1)
    uvs[:, 2] = np.stack([x0, y0 + side], -1)
    return new_verts, new_faces, uvs.reshape(-1, 2), buf.getvalue()


def bake_vertex_colors(
    verts: np.ndarray,
    faces: np.ndarray,
    views: Sequence[Tuple[Camera, np.ndarray]],
    depth_eps: float = 5e-3,
    fallback: Optional[np.ndarray] = None,
    chunk: int = 256,
) -> np.ndarray:
    """Blend view images onto mesh vertices with occlusion + facing weights.

    Args:
      verts: (V, 3) world. faces: (F, 3). views: [(camera, (H, W, 3) float
        image in [0,1])]. fallback: (V, 3/4) colors for never-visible verts.

    Returns (V, 4) RGBA float vertex colors.
    """
    normals = vertex_normals(verts, faces)
    colors, coverage = bake_point_colors(verts, normals, (verts, faces),
                                         views, depth_eps=depth_eps,
                                         chunk=chunk)
    covered = coverage > 1e-6
    if fallback is not None:
        colors = np.array(colors)
        colors[~covered] = np.asarray(fallback)[~covered, :3]
    # fallback=None: bake_point_colors already filled uncovered vertices
    # with the mean visible color
    rgba = np.concatenate([np.clip(colors, 0, 1),
                           np.ones((len(colors), 1), np.float32)], -1)
    return rgba


def orbit_views(center: np.ndarray, radius: float, image: np.ndarray,
                n_views: int = 6, elevation: float = 0.3,
                focal_scale: float = 1.2) -> List[Tuple[Camera, np.ndarray]]:
    """Camera ring around an object (the reference's max_num_view=6 layout,
    config.yaml:190). All views share `image` until the multiview generator
    lands — layout utility + single-view baking path."""
    views = []
    h = image.shape[0]
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        eye = center + radius * np.asarray([
            np.sin(ang), elevation, -np.cos(ang)], np.float32)
        from regen3d_tpu.camera import lookat_camera
        cam = lookat_camera(eye, center, image.shape[:2], focal_px=h * focal_scale)
        views.append((cam, image))
    return views
