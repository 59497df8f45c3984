"""Phase 8: scene rendering.

The reference renders with headless Blender Cycles (blender_rendering/
run.py:604-979: camera from camera.npz, a second bird-eye camera, the
ground_aligned.glb background with projected/PBR materials, the combined
scene, HDRI world, Filmic color management, 8 samples). Blender stays a
host-side subprocess BY DESIGN (SURVEY §2.10) — when a `blender` binary is
present we drive it the same way; in environments without Blender (this
image) a TPU software renderer produces the same artifact set:

    rendering/render_cam1.png, render_cam1_white_bg.png, render_cam2.png
    (+ the camera contract consumed by phase 9).

The software path (all jitted JAX): hard z-buffer rasterization →
TEXEL-SPACE texture sampling (per-pixel barycentric UV interpolation +
bilinear atlas fetch — not vertex-baked colors) → GGX metallic/roughness
shading (the reference's global metallic/roughness + *_strength keys,
config.yaml:325-384) → HDRI world (equirect background with
hdri_rotation/hdri_strength/hdri_white_bg semantics, run.py:279-354; a
Radiance .hdr loader lives in utils/image.py) → Filmic tone map with
exposure/gamma/look (set_color_management, run.py:376-384) → white-bg
composites.
"""

from __future__ import annotations

import functools
import io
import logging
import os
import shutil
import subprocess
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.camera import Camera, camera_from_npz, lookat_camera
from regen3d_tpu.config import Config
from regen3d_tpu.ops.rasterize import (
    interpolate_attributes,
    rasterize_hard,
    rasterize_hard_auto,
)
from regen3d_tpu.utils.glb import MeshData, SceneData, load_glb
from regen3d_tpu.utils.image import save_image
from regen3d_tpu.utils.meshproc import vertex_normals

log = logging.getLogger(__name__)


class PackedScene:
    """Flattened multi-GLB scene with a stacked texture atlas.

    Per-mesh textures are resized to a common tile and stacked vertically;
    vertex UVs are remapped into the atlas (v' = (v + tile_row)/n_tiles).
    Untextured meshes carry base/vertex colors with tex_weight 0."""

    def __init__(self, verts, faces, normals, colors, uvs, tex_weight,
                 metallic, roughness, atlas):
        self.verts = verts
        self.faces = faces
        self.normals = normals
        self.colors = colors          # (V, 3) fallback colors
        self.uvs = uvs                # (V, 2) atlas UVs
        self.tex_weight = tex_weight  # (V, 1) 1 = sample atlas
        self.metallic = metallic      # (V, 1)
        self.roughness = roughness    # (V, 1)
        self.atlas = atlas            # (N*T, T, 3) float or None


def _load_scene_for_render(paths: List[str], cfg: Optional[Config] = None,
                           tile: int = 256) -> Optional[PackedScene]:
    meshes: List[MeshData] = []
    for p in paths:
        if os.path.exists(p):
            meshes += load_glb(p).meshes
    if not meshes:
        return None
    g_metal = float(cfg.get("metallic", 0.2)) if cfg else 0.2
    g_rough = float(cfg.get("roughness", 0.5)) if cfg else 0.5
    m_strength = float(cfg.get("metallic_strength", 1.0)) if cfg else 1.0
    r_strength = float(cfg.get("roughness_strength", 1.0)) if cfg else 1.0

    from PIL import Image
    textured = [m for m in meshes if m.texture_png is not None
                and m.uvs is not None]
    tiles = []
    tile_of = {}
    for m in textured:
        tex = np.asarray(Image.open(io.BytesIO(m.texture_png))
                         .convert("RGB").resize((tile, tile)),
                         np.float32) / 255.0
        tile_of[id(m)] = len(tiles)
        tiles.append(tex)
    atlas = np.concatenate(tiles, axis=0) if tiles else None
    n_tiles = max(len(tiles), 1)

    verts, faces, colors, uvs, tw, met, rgh = [], [], [], [], [], [], []
    off = 0
    for m in meshes:
        v = m.vertices
        f = m.faces + off
        base = m.base_color[:3] if m.base_color is not None else np.asarray(
            [0.7, 0.7, 0.7])
        col = (m.vertex_colors[:, :3] if m.vertex_colors is not None
               else np.tile(base[None].astype(np.float32), (len(v), 1)))
        if id(m) in tile_of:
            row = tile_of[id(m)]
            # clip (not modulo) — a modulo wraps the legitimate u/v == 1.0
            # edge coordinate to 0, smearing the opposite texture border
            uu = np.clip(m.uvs[:, 0], 0.0, 1.0)
            vv = np.clip(m.uvs[:, 1], 0.0, 1.0)
            uv = np.stack([uu, (vv + row) / n_tiles], -1)
            w_ = np.ones((len(v), 1), np.float32)
        else:
            uv = np.zeros((len(v), 2), np.float32)
            w_ = np.zeros((len(v), 1), np.float32)
        # per-mesh material: GLB factors scaled by the reference's global
        # strength keys, defaulting to the global scene values
        mm = getattr(m, "metallic", g_metal)
        rr = getattr(m, "roughness", g_rough)
        met.append(np.full((len(v), 1), float(mm) * m_strength, np.float32))
        rgh.append(np.full((len(v), 1),
                           np.clip(float(rr) * r_strength, 0.03, 1.0),
                           np.float32))
        verts.append(v)
        faces.append(f)
        colors.append(col.astype(np.float32))
        uvs.append(uv.astype(np.float32))
        tw.append(w_)
        off += len(v)
    allv = np.concatenate(verts)
    allf = np.concatenate(faces).astype(np.int32)
    alln = vertex_normals(allv, allf)
    return PackedScene(allv, allf, alln, np.concatenate(colors),
                       np.concatenate(uvs), np.concatenate(tw),
                       np.concatenate(met), np.concatenate(rgh), atlas)


def tone_map(img: np.ndarray, exposure: float = 0.4, gamma: float = 0.8,
             view_transform: str = "Filmic",
             look: str = "Low Contrast") -> np.ndarray:
    """Color management (reference: set_color_management,
    blender_rendering/run.py:376-384 — view_transform/look/exposure/gamma).

    Filmic approximated by the Hejl/Burgess-style filmic curve; the 'look'
    applies a contrast S-curve around mid-grey (Low/Medium/High Contrast);
    'Standard' passes linear through. HDR input ≥ 0, output in [0, 1]."""
    x = np.maximum(img, 0.0) * (2.0 ** exposure)
    if view_transform.lower() == "filmic":
        x = np.maximum(x - 0.004, 0.0)
        x = (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    contrast = {"very low contrast": 0.7, "low contrast": 0.85,
                "medium contrast": 1.0, "none": 1.0,
                "high contrast": 1.25,
                "very high contrast": 1.5}.get(look.lower(), 1.0)
    if contrast != 1.0:
        x = np.clip(x, 0.0, 1.0)
        x = 0.5 + np.tanh((x - 0.5) * 2 * contrast) / max(
            2 * np.tanh(contrast), 1e-6)
    out = np.clip(x, 0.0, 1.0) ** (1.0 / max(gamma, 1e-3))
    return np.clip(out, 0.0, 1.0)


def _bilinear_sample(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch tex (TH, TW, 3) at uv (..., 2) in [0, 1]."""
    th, tw = tex.shape[:2]
    x = jnp.clip(uv[..., 0] * tw - 0.5, 0.0, tw - 1.0)
    y = jnp.clip(uv[..., 1] * th - 0.5, 0.0, th - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, tw - 1)
    y1 = jnp.minimum(y0 + 1, th - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return ((tex[y0, x0] * (1 - fx) + tex[y0, x1] * fx) * (1 - fy)
            + (tex[y1, x0] * (1 - fx) + tex[y1, x1] * fx) * fy)


def _sample_equirect(env: jnp.ndarray, d: jnp.ndarray,
                     rotation_deg: float) -> jnp.ndarray:
    """Equirect HDRI lookup along directions d (..., 3); Blender-style Z
    rotation of the mapping node (setup_hdri, run.py:46)."""
    rot = jnp.deg2rad(rotation_deg)
    x = d[..., 0] * jnp.cos(rot) - d[..., 2] * jnp.sin(rot)
    z = d[..., 0] * jnp.sin(rot) + d[..., 2] * jnp.cos(rot)
    y = d[..., 1]
    u = (jnp.arctan2(x, -z) / (2 * jnp.pi)) % 1.0
    v = jnp.clip(0.5 - jnp.arcsin(jnp.clip(y, -1, 1)) / jnp.pi, 0.0, 1.0)
    return _bilinear_sample(env, jnp.stack([u, v], -1))


def _ggx_shade(base, metallic, roughness, n, v, l, light_col, ambient_col):
    """Single-light GGX metallic-roughness BRDF + ambient irradiance
    (the Principled-BSDF role for the reference's metallic/roughness keys)."""
    h = l + v
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)
    ndl = jnp.clip(jnp.sum(n * l, -1, keepdims=True), 0.0, 1.0)
    ndv = jnp.clip(jnp.sum(n * v, -1, keepdims=True), 1e-4, 1.0)
    ndh = jnp.clip(jnp.sum(n * h, -1, keepdims=True), 0.0, 1.0)
    vdh = jnp.clip(jnp.sum(v * h, -1, keepdims=True), 0.0, 1.0)
    a = jnp.maximum(roughness, 0.03) ** 2
    a2 = a * a
    D = a2 / jnp.maximum(jnp.pi * ((ndh * ndh * (a2 - 1) + 1) ** 2), 1e-8)
    k = (roughness + 1) ** 2 / 8.0
    G = (ndl / jnp.maximum(ndl * (1 - k) + k, 1e-8)) * \
        (ndv / jnp.maximum(ndv * (1 - k) + k, 1e-8))
    f0 = 0.04 * (1 - metallic) + base * metallic
    F = f0 + (1 - f0) * (1 - vdh) ** 5
    spec = D * G * F / jnp.maximum(4 * ndl * ndv, 1e-8)
    diffuse = base * (1 - metallic) / jnp.pi
    direct = (diffuse + spec) * light_col * ndl * jnp.pi
    ambient = (diffuse * jnp.pi + f0 * 0.5) * ambient_col
    return direct + ambient


@functools.partial(jax.jit, static_argnames=("image_hw",))
def _screen_verts(verts, cam_R, cam_T, cam_f, cam_p, *, image_hw):
    cam = Camera(R=cam_R, T=cam_T, focal=cam_f, principal=cam_p,
                 image_size=image_hw)
    return cam.view_to_screen(cam.world_to_view(verts))


@functools.partial(jax.jit, static_argnames=("image_hw", "white_bg"))
def _shade_pixels(frag, verts, faces, normals, colors, uvs, tw, met, rgh,
                  atlas, env_map, ambient_col, hdri_strength, hdri_rotation,
                  cam_R, cam_T, cam_f, cam_p, *, image_hw, white_bg):
    cam = Camera(R=cam_R, T=cam_T, focal=cam_f, principal=cam_p,
                 image_size=image_hw)
    pos = interpolate_attributes(frag, faces, verts)
    nrm = interpolate_attributes(frag, faces, normals)
    col = interpolate_attributes(frag, faces, colors)
    uv = interpolate_attributes(frag, faces, uvs)
    w_tex = interpolate_attributes(frag, faces, tw)
    metallic = interpolate_attributes(frag, faces, met)
    roughness = interpolate_attributes(frag, faces, rgh)

    tex_col = _bilinear_sample(atlas, uv)
    base = col * (1 - w_tex) + tex_col * w_tex

    n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)
    eye = cam.center
    vdir = eye - pos
    vdir = vdir / jnp.maximum(jnp.linalg.norm(vdir, axis=-1, keepdims=True),
                              1e-8)
    n = n * jnp.sign(jnp.sum(n * vdir, -1, keepdims=True) + 1e-12)
    ldir = (eye + jnp.asarray([0.0, 2.0, 0.0])) - pos
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir, axis=-1, keepdims=True),
                              1e-8)
    shaded = _ggx_shade(base, metallic, roughness, n, vdir, ldir,
                        jnp.asarray([0.9, 0.9, 0.9]), ambient_col)

    # background: HDRI along camera rays (or white)
    hit = frag.face_idx >= 0
    h, w = image_hw
    yy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5)
    xx = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5)
    rays = cam.pixel_rays_world(xx, yy)
    bg = _sample_equirect(env_map, rays, hdri_rotation) * hdri_strength
    if white_bg:
        bg = jnp.ones_like(bg)
    img = jnp.where(hit[..., None], shaded, bg)
    return img, hit


def render_view(cam: Camera, scene: PackedScene, cfg: Optional[Config] = None,
                chunk: int = 512, env: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """One software-rendered frame (H, W, 3) linear + hit mask.

    Texel-space texture sampling (per-pixel UV interpolation + bilinear
    atlas fetch), GGX PBR shading, HDRI environment background. Two
    host-dispatched programs: the auto-binned hard rasterizer (scene meshes
    are tens of thousands of faces — binning is the difference between
    minutes and sub-second at render resolution) and the shading pass. All
    scene arrays travel as ARGUMENTS (no closure constants → no per-scene
    recompiles)."""
    hdri_strength = float(cfg.get("hdri_strength", 1.0)) if cfg else 1.0
    hdri_rotation = float(cfg.get("hdri_rotation", 0.0)) if cfg else 0.0
    white_bg = bool(cfg.get("hdri_white_bg", False)) if cfg else False

    atlas = (jnp.asarray(scene.atlas) if scene.atlas is not None
             else jnp.ones((2, 2, 3)))
    env_map = (jnp.asarray(env) if env is not None
               else jnp.ones((2, 4, 3)))
    # ambient irradiance: mean of the environment (one-bounce approximation)
    ambient_col = jnp.mean(env_map.reshape(-1, 3), axis=0) * hdri_strength

    verts = jnp.asarray(scene.verts)
    faces = jnp.asarray(scene.faces)
    vs = _screen_verts(verts, cam.R, cam.T, cam.focal, cam.principal,
                       image_hw=cam.image_size)
    frag = rasterize_hard_auto(vs, faces, cam.image_size, chunk=chunk)
    img, hit = _shade_pixels(
        frag, verts, faces, jnp.asarray(scene.normals),
        jnp.asarray(scene.colors), jnp.asarray(scene.uvs),
        jnp.asarray(scene.tex_weight), jnp.asarray(scene.metallic),
        jnp.asarray(scene.roughness), atlas, env_map, ambient_col,
        jnp.float32(hdri_strength), jnp.float32(hdri_rotation),
        cam.R, cam.T, cam.focal, cam.principal,
        image_hw=cam.image_size, white_bg=bool(white_bg or env is None))
    return np.asarray(img), np.asarray(hit)


def run(cfg: Config) -> List[str]:
    art = Artifacts(cfg)
    os.makedirs(art.rendering_dir, exist_ok=True)

    blender = shutil.which("blender")
    if blender and not bool(cfg.get("force_software_render", False)):
        return _run_blender(cfg, blender)

    t_stage = time.perf_counter()
    scene = _load_scene_for_render([art.combined_scene_glb,
                                    art.ground_aligned_glb], cfg)
    if scene is None:
        log.warning("phase8: nothing to render")
        return []
    t_load = time.perf_counter() - t_stage
    t_stage = time.perf_counter()

    res = int(cfg.get("render_resolution", 768))
    cam1 = camera_from_npz(art.camera_npz)
    h = res
    w = int(round(cam1.image_size[1] * res / cam1.image_size[0]))
    cam1 = cam1.rescaled(h, w)

    exposure = float(cfg.get("exposure", 0.4))
    gamma = float(cfg.get("gamma", 0.8))
    view_tf = str(cfg.get("view_transform", "Filmic"))
    look = str(cfg.get("look", "Low Contrast"))

    env = None
    hdri_path = cfg.path("hdri_path") if cfg.get("hdri_path") else None
    if hdri_path and os.path.exists(hdri_path):
        from regen3d_tpu.utils.image import load_hdr
        try:
            env = load_hdr(hdri_path)
            log.info("phase8: HDRI world %s (%dx%d)", hdri_path,
                     env.shape[1], env.shape[0])
        except Exception as e:
            log.warning("phase8: HDRI load failed (%s) — white world", e)

    img1, hit1 = render_view(cam1, scene, cfg, env=env)
    img1 = tone_map(img1, exposure, gamma, view_tf, look)
    save_image(os.path.join(art.rendering_dir, "render_cam1.png"), img1)
    white = img1.copy()
    white[~hit1] = 1.0
    save_image(os.path.join(art.rendering_dir, "render_cam1_white_bg.png"), white)

    # bird-eye second camera above the scene centroid
    verts = scene.verts
    center = verts.mean(0)
    extent = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    eye = center + np.asarray([0.3 * extent, 1.2 * extent, -0.3 * extent])
    cam2 = lookat_camera(eye, center, (res, res), focal_px=res * 1.0)
    img2, _ = render_view(cam2, scene, cfg, env=env)
    save_image(os.path.join(art.rendering_dir, "render_cam2.png"),
               tone_map(img2, exposure, gamma, view_tf, look))

    out = [os.path.join(art.rendering_dir, n) for n in
           ("render_cam1.png", "render_cam1_white_bg.png", "render_cam2.png")]
    t_render = time.perf_counter() - t_stage
    t_stage = time.perf_counter()
    out += _debug_artifacts(cfg, art, scene, cam1, cam2, env,
                            exposure, gamma, view_tf, look)
    log.info("phase8 (software): wrote %d renders at %dx%d — stage "
             "breakdown: load %.1fs, render 3 views %.1fs, debug %.1fs",
             len(out), h, w, t_load, t_render,
             time.perf_counter() - t_stage)
    return out


def _render_pointcloud(cam: Camera, pts: np.ndarray,
                       colors: Optional[np.ndarray],
                       radius_px: float) -> np.ndarray:
    """Point-splat preview of a cloud (the reference's io_mesh_ply import
    + set_pc_for_render path, blender run.py:108-156,882-905)."""
    from regen3d_tpu.ops.rasterize import render_points_soft

    vs = _screen_verts(jnp.asarray(pts, jnp.float32), cam.R, cam.T,
                       cam.focal, cam.principal, image_hw=cam.image_size)
    cols = (jnp.asarray(colors, jnp.float32)
            if colors is not None else None)
    img, alpha = render_points_soft(vs, cam.image_size,
                                    radius_px=radius_px, colors=cols)
    img = np.asarray(img, np.float32)
    a = np.asarray(alpha, np.float32)[..., None]
    return np.clip(img + (1.0 - a), 0.0, 1.0)  # white background


def _debug_artifacts(cfg: Config, art, scene, cam1: Camera, cam2: Camera,
                     env, exposure, gamma, view_tf, look) -> List[str]:
    """The reference's optional artifact set (blender run.py:604-979):
    `render_pointclouds` → point-splat renders of the back-projection
    cloud from both cameras; `render_GT` + GT_scene → the GT scene
    rendered from both cameras (+ the predicted cloud overlay when
    render_pointclouds is also on); always — a reloadable scene dump
    (tmp/blender_scene.blend analog → temp/blender_scene.npz)."""
    from regen3d_tpu.utils.ply import load_ply

    out: List[str] = []
    res_y = cam1.image_size[0]
    render_pc = bool(cfg.get("render_pointclouds", False))
    pc_path = art.combined_scene_bp_ply
    pc = None
    if render_pc and os.path.exists(pc_path):
        cloud = load_ply(pc_path)
        cols = (cloud.colors.astype(np.float32) / 255.0
                if cloud.colors is not None else None)
        pc = (cloud.vertices, cols)
        # pytorch3d NDC radius 0.003 ≈ 1.5 px @1024, scaled to the render
        # size; floored at 1.5 px so points stay visible at preview sizes
        radius = max(1.5, 1.5 * res_y / 1024.0 * (
            float(cfg.get("pointcloud_scale", 0.002)) / 0.002))
        for cam, tag in ((cam1, "cam1"), (cam2, "cam2")):
            img = _render_pointcloud(cam, pc[0], pc[1], radius)
            p = os.path.join(art.rendering_dir,
                             f"render_pointcloud_{tag}.png")
            save_image(p, img)
            save_image(p.replace(".png", "_white_bg.png"), img)
            out.append(p)

    gt_path = cfg.path("GT_scene") if cfg.get("GT_scene") else None
    if bool(cfg.get("render_GT", False)) and gt_path \
            and os.path.exists(gt_path):
        gt_scene = _load_scene_for_render([gt_path], cfg)
        if gt_scene is not None:
            for cam, tag in ((cam1, "cam1"), (cam2, "cam2")):
                img, hit = render_view(cam, gt_scene, cfg, env=env)
                img = tone_map(img, exposure, gamma, view_tf, look)
                if pc is not None:
                    # overlay the predicted cloud on the GT render
                    radius = max(1.5, 1.5 * res_y / 1024.0)
                    pimg = _render_pointcloud(cam, pc[0], pc[1], radius)
                    mask = (pimg < 0.999).any(-1, keepdims=True)
                    img = np.where(mask, pimg, img)
                p = os.path.join(art.rendering_dir,
                                 f"render_GT_PC_{tag}.png")
                save_image(p, img)
                white = img.copy()
                white[~hit] = 1.0
                save_image(p.replace(".png", "_white_bg.png"), white)
                out.append(p)

    # scene dump (reference: tmp/blender_scene.blend, run.py:909-911) —
    # the packed render-ready scene, reloadable for re-rendering
    dump = os.path.join(art.temp, "blender_scene.npz")
    os.makedirs(art.temp, exist_ok=True)
    np.savez_compressed(
        dump, verts=scene.verts, faces=scene.faces, normals=scene.normals,
        colors=scene.colors, uvs=scene.uvs, tex_weight=scene.tex_weight,
        metallic=scene.metallic, roughness=scene.roughness,
        atlas=(scene.atlas if scene.atlas is not None
               else np.ones((2, 2, 3), np.float32)),
        cam1_R=cam1.R, cam1_T=cam1.T, cam1_focal=cam1.focal,
        cam1_principal=cam1.principal,
        cam1_image_size=np.asarray(cam1.image_size),
        cam2_R=cam2.R, cam2_T=cam2.T, cam2_focal=cam2.focal,
        cam2_principal=cam2.principal,
        cam2_image_size=np.asarray(cam2.image_size))
    log.info("phase8: scene dump → %s", dump)
    return out


def _run_blender(cfg: Config, blender: str) -> List[str]:
    """Drive headless Blender with a generated script (same artifact set as
    the reference's bpy pipeline). Only reached when a blender binary
    exists on the host."""
    art = Artifacts(cfg)
    script = os.path.join(art.temp, "render_scene.py")
    os.makedirs(art.temp, exist_ok=True)
    with open(script, "w") as f:
        f.write(_BLENDER_SCRIPT)
    env = dict(os.environ,
               REGEN3D_SCENE=art.combined_scene_glb,
               REGEN3D_BG=art.ground_aligned_glb,
               REGEN3D_CAMERA=art.camera_npz,
               REGEN3D_OUT=art.rendering_dir,
               REGEN3D_SAMPLES=str(cfg.get("blender_render_samples", 8)))
    subprocess.run([blender, "-b", "-P", script], check=True, env=env)
    return [os.path.join(art.rendering_dir, "render_cam1.png"),
            os.path.join(art.rendering_dir, "render_cam1_white_bg.png")]


_BLENDER_SCRIPT = '''\
"""Generated headless-Blender scene builder (reference parity: Cycles,
denoising, camera from camera.npz, combined scene + background import)."""
import os
import bpy
import numpy as np

bpy.ops.wm.read_factory_settings(use_empty=True)
scene = bpy.context.scene
scene.render.engine = "CYCLES"
scene.cycles.samples = int(os.environ.get("REGEN3D_SAMPLES", "8"))

for key in ("REGEN3D_BG", "REGEN3D_SCENE"):
    path = os.environ.get(key, "")
    if path and os.path.exists(path):
        bpy.ops.import_scene.gltf(filepath=path)

cam_data = np.load(os.environ["REGEN3D_CAMERA"])
cam = bpy.data.cameras.new("cam1")
cam.angle_x = float(cam_data["camera_angle_x"])
ob = bpy.data.objects.new("cam1", cam)
ob.matrix_world = np.asarray(cam_data["extrinsic"]).T.tolist()
scene.collection.objects.link(ob)
scene.camera = ob

w, h = [int(x) for x in cam_data["image_size"]]
scene.render.resolution_x = w
scene.render.resolution_y = h
out = os.environ["REGEN3D_OUT"]
scene.render.filepath = os.path.join(out, "render_cam1.png")
bpy.ops.render.render(write_still=True)
scene.render.film_transparent = True
scene.render.filepath = os.path.join(out, "render_cam1_white_bg.png")
bpy.ops.render.render(write_still=True)
'''
