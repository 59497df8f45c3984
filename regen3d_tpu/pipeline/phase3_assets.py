"""Phase 3: per-object image → 3D asset generation.

Reference flow (src/2d_to_3d_models/run.py): for each prepped object image —
Hunyuan3DDiTFlowMatchingPipeline (50 flow steps) → octree SDF decode
(resolution 256, 16k chunks) → marching cubes → cleanup
(NaN repair, optional decimation, floater/degenerate removal) → texture
painting → output/3D/<name>/<name>.glb; one spawned process per image with
`jobs_per_gpu` slots (:108-194).

TPU redesign: the whole generator is ONE jitted pipeline — image-condition
encoder → flow-matching ShapeDiT sampler (lax.scan) → ShapeVAE grid decode
(lax.map chunks) — batched over objects on the 'dp' mesh axis instead of
process-per-image. Mesh extraction (native marching tetrahedra) + GLB export
stay host-side. Texturing: vertex colors projected from the input image
(full multiview texture baking is the texgen milestone — see models/texgen
plan in ROADMAP).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.config import Config
from regen3d_tpu.models.dit import DiTConfig, ShapeDiT, sample as dit_sample
from regen3d_tpu.models.layers import PatchEmbed, TransformerBlock, posemb_sincos_2d
from regen3d_tpu.models.shapevae import ShapeDecoder, ShapeVAEConfig, decode_grid
from regen3d_tpu.ops.marching_cubes import marching_tetrahedra
from regen3d_tpu.utils.glb import MeshData, SceneData, save_glb
from regen3d_tpu.utils.meshproc import (
    clean_mesh,
    decimate_vertex_clustering,
    fix_winding_outward,
)

log = logging.getLogger(__name__)


class CondEncoder(nn.Module):
    """Object-image → condition tokens (the DINOv2-giant role in the
    reference's pipeline; convertible ViT stem + blocks)."""

    width: int = 768
    depth: int = 4
    num_heads: int = 8
    patch: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img):  # (B, H, W, 4) RGBA in [0,1]
        x, (gh, gw) = PatchEmbed(self.patch, self.width, dtype=self.dtype,
                                 name="patch")(img.astype(self.dtype))
        x = x + posemb_sincos_2d(gh, gw, self.width)[None].astype(self.dtype)
        for i in range(self.depth):
            x = TransformerBlock(self.num_heads, dtype=self.dtype,
                                 name=f"block{i}")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="out_norm")(x)


@dataclasses.dataclass
class AssetGenerator:
    """Bundled image→3D generator (cond encoder + DiT + SDF decoder)."""

    dit_cfg: DiTConfig
    vae_cfg: ShapeVAEConfig
    cond: CondEncoder
    dit: ShapeDiT
    decoder: ShapeDecoder
    params: Dict
    # serving knobs: the condition-image resolution the params were
    # trained/initialized for, and whether the params carry real signal
    # (random-init generators cap the decode grid — there is nothing to
    # resolve — while trained/distilled ones run the full resolution)
    image_size: int = 512
    trained: bool = False

    @classmethod
    def random_init(cls, key: jax.Array, tiny: bool = False,
                    image_size: int = 512,
                    cross_instance: bool = False) -> "AssetGenerator":
        dit_cfg = DiTConfig.tiny() if tiny else DiTConfig.base()
        if cross_instance:
            dit_cfg = dataclasses.replace(dit_cfg, cross_instance=True)
        vae_cfg = ShapeVAEConfig.tiny() if tiny else ShapeVAEConfig(
            latent_tokens=dit_cfg.latent_tokens, latent_dim=dit_cfg.latent_dim)
        if tiny:
            vae_cfg = dataclasses.replace(
                vae_cfg, latent_tokens=dit_cfg.latent_tokens,
                latent_dim=dit_cfg.latent_dim)
        cond = CondEncoder(width=dit_cfg.cond_dim,
                           depth=2 if tiny else 4,
                           num_heads=4 if tiny else 8)
        dit = ShapeDiT(dit_cfg)
        decoder = ShapeDecoder(vae_cfg)
        k1, k2, k3 = jax.random.split(key, 3)
        img = jnp.zeros((1, image_size, image_size, 4))
        cond_p = cond.init(k1, img)
        tokens = (image_size // cond.patch) ** 2
        dit_p = dit.init(k2, jnp.zeros((1, dit_cfg.latent_tokens,
                                        dit_cfg.latent_dim)),
                         jnp.zeros((1,)),
                         jnp.zeros((1, tokens, dit_cfg.cond_dim)))
        dec_p = decoder.init(k3, jnp.zeros((1, vae_cfg.latent_tokens,
                                            vae_cfg.latent_dim)),
                             jnp.zeros((1, 8, 3)))
        return cls(dit_cfg=dit_cfg, vae_cfg=vae_cfg, cond=cond, dit=dit,
                   decoder=decoder,
                   params={"cond": cond_p, "dit": dit_p, "dec": dec_p},
                   image_size=64 if tiny else image_size, trained=False)

    def generate_sdf(self, key: jax.Array, image: np.ndarray,
                     num_steps: int, guidance: float, resolution: int,
                     chunk: int) -> np.ndarray:
        """image (H, W, 4) float[0,1] → SDF volume (R, R, R)."""
        return self.generate_sdf_batch(key, image[None], num_steps, guidance,
                                       resolution, chunk)[0]

    def generate_sdf_batch(self, key: jax.Array, images: np.ndarray,
                           num_steps: int, guidance: float, resolution: int,
                           chunk: int,
                           extra_cond_tokens: Optional[np.ndarray] = None,
                           max_batch_per_program: int = 8) -> np.ndarray:
        """Batched generation: (B, H, W, 4) → (B, R, R, R) SDF volumes.

        One jitted pipeline (cond encoder → flow sampler → grid decode) for
        all objects — the device-batch replacement for the reference's
        process-per-image fan-out (2d_to_3d_models/run.py:108-194).
        ``extra_cond_tokens`` (B, T, cond_dim) are appended to the image
        condition sequence (e.g. the MIDI adapter's per-instance box
        tokens).

        The whole path runs as ONE compiled XLA program per
        (modules, workload-knobs, shapes) — eager dispatch of the 50-step
        sampler through the remote-TPU tunnel costs ~50 ms/launch and was
        measured at 47–78 s wall for a 1.3 s-device-time sample.

        Large object batches are segmented into programs of at most
        ``max_batch_per_program`` objects (padded to buckets of 4 so the
        jit cache is reused): the tunnel kills single XLA programs that
        run >~60 s, and one program over ALL objects at 256³ could cross
        that line where per-segment programs cannot."""
        b_total = images.shape[0]
        if b_total > max_batch_per_program:
            outs = []
            for s0 in range(0, b_total, max_batch_per_program):
                sl = slice(s0, min(s0 + max_batch_per_program, b_total))
                ex = None if extra_cond_tokens is None \
                    else extra_cond_tokens[sl]
                key, sub = jax.random.split(key)
                outs.append(self.generate_sdf_batch(
                    sub, images[sl], num_steps, guidance, resolution, chunk,
                    extra_cond_tokens=ex,
                    max_batch_per_program=max_batch_per_program))
            return np.concatenate(outs)
        bucket = b_total if b_total in (1, 2) else 4 * ((b_total + 3) // 4)
        pad = bucket - b_total
        if pad:
            images = np.concatenate([images, images[-1:].repeat(pad, 0)])
            if extra_cond_tokens is not None:
                extra_cond_tokens = np.concatenate(
                    [extra_cond_tokens,
                     extra_cond_tokens[-1:].repeat(pad, 0)])
        imgs = jnp.asarray(images, jnp.float32)
        extra = (None if extra_cond_tokens is None
                 else jnp.asarray(extra_cond_tokens))
        hierarchical = resolution % 4 == 0 and resolution >= 128
        run = _jitted_generate(self.cond, self.dit, self.decoder,
                               int(num_steps), float(guidance),
                               int(resolution), int(chunk), hierarchical)
        if hierarchical:
            # octree-style two-level decode (the reference's octree eval,
            # run.py:77-84): ~16× fewer SDF queries AND ~16× less
            # device→host traffic than the dense grid — both matter (the
            # dense 256³ f32 volume is 67 MB/object)
            from regen3d_tpu.models.shapevae import assemble_volume
            vol_c, cell_idx, fine = run(self.params, imgs, key, extra)
            return assemble_volume(np.asarray(vol_c), np.asarray(cell_idx),
                                   np.asarray(fine), resolution)[:b_total]
        vols = run(self.params, imgs, key, extra)
        if vols.ndim == 3:
            vols = vols[None]
        return np.asarray(vols)[:b_total]


@functools.lru_cache(maxsize=4)
def _jitted_generate(cond_mod: nn.Module, dit_mod: nn.Module,
                     dec_mod: nn.Module, num_steps: int, guidance: float,
                     resolution: int, chunk: int, hierarchical: bool):
    """One compiled cond→sample→decode program per (modules, knobs).

    Cached at module level so repeated scenes (the fleet driver, the e2e
    bench repeats) reuse the executable instead of re-tracing."""
    from regen3d_tpu.models.shapevae import decode_grid_hierarchical

    @jax.jit
    def run(params, imgs, key, extra):
        cond_tok = cond_mod.apply(params["cond"], imgs)
        if extra is not None:
            cond_tok = jnp.concatenate(
                [cond_tok, extra.astype(cond_tok.dtype)], axis=1)
        lat = dit_sample(dit_mod, params["dit"], key, cond_tok,
                         num_steps=num_steps, guidance_scale=guidance)
        if hierarchical:
            return decode_grid_hierarchical(
                dec_mod, params["dec"], lat, resolution=resolution,
                chunk=chunk)
        return decode_grid(dec_mod, params["dec"], lat,
                           resolution=resolution, chunk=chunk)

    return run


def extract_and_clean(vol: np.ndarray, target_faces: Optional[int] = None):
    """SDF → cleaned mesh (reference: clean_and_validate_trimesh +
    FloaterRemover/DegenerateFaceRemover/FaceReducer, run.py:24-64,93-95)."""
    verts, faces = marching_tetrahedra(vol, 0.0, bounds=(-1.0, 1.0))
    if len(faces) == 0:
        return verts, faces
    verts, faces = clean_mesh(verts, faces)
    # floater removal: keep the largest connected component
    faces = _largest_component(verts, faces)
    if target_faces and len(faces) > target_faces:
        verts, faces = decimate_vertex_clustering(verts, faces, target_faces)
    faces = fix_winding_outward(verts, faces)
    return verts, faces


def _largest_component(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Largest connected component over shared vertices (FloaterRemover
    analog). Sparse-graph BFS in scipy — the Python union-find it replaces
    cost ~2.5 s per 500k-face marching-tetrahedra mesh on the phase-3 host
    path."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = len(verts)
    rows = np.concatenate([faces[:, 0], faces[:, 1]])
    cols = np.concatenate([faces[:, 1], faces[:, 2]])
    adj = coo_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                     shape=(n, n))
    _, labels = connected_components(adj, directed=False)
    roots = labels[faces[:, 0]]
    vals, counts = np.unique(roots, return_counts=True)
    return faces[roots == vals[np.argmax(counts)]]


def vertex_colors_from_image(verts: np.ndarray, faces: np.ndarray,
                             image: np.ndarray) -> np.ndarray:
    """Visibility-aware texture bake from the object image (the
    Hunyuan3DPaint baking stage; multiview generation pending — ROADMAP 6).

    The object view is treated as a frontal camera; occluded (back-facing /
    hidden) vertices fall back to the mean visible color."""
    from regen3d_tpu.camera import lookat_camera
    from regen3d_tpu.pipeline.texture import bake_vertex_colors

    rgb = image[..., :3].astype(np.float32)
    if rgb.max() > 1.001:
        rgb = rgb / 255.0
    # vertex-resolution baking doesn't benefit from views beyond ~256px
    if max(rgb.shape[:2]) > 256:
        import jax.image as jimage
        import jax.numpy as jnp2
        scale = 256 / max(rgb.shape[:2])
        nh = int(rgb.shape[0] * scale)
        nw = int(rgb.shape[1] * scale)
        rgb = np.asarray(jimage.resize(jnp2.asarray(rgb), (nh, nw, 3),
                                       "bilinear"))
    center = verts.mean(0)
    extent = float(np.linalg.norm(verts.max(0) - verts.min(0))) + 1e-6
    cam = lookat_camera(center + np.asarray([0, 0, -2.2 * extent], np.float32),
                        center, rgb.shape[:2],
                        focal_px=rgb.shape[0] * 1.1)
    return bake_vertex_colors(verts, faces, [(cam, rgb)])


def default_shape_checkpoint() -> str:
    """Repo-root checkpoints/shape_distilled.npz (scripts/distill_shape.py)."""
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "checkpoints", "shape_distilled.npz")


def load_default_generator(cfg: Config) -> Optional["AssetGenerator"]:
    """The ``shape_checkpoint`` config key, else the repo-default distilled
    checkpoint when it exists (the Hunyuan checkpoint role —
    2d_to_3d_models/run.py:67-76; zero egress means ours is distilled on
    synthetic furniture, see pipeline/shape_distill.py)."""
    path = str(cfg.get("shape_checkpoint", "") or "")
    if not path:
        cand = default_shape_checkpoint()
        path = cand if os.path.exists(cand) else ""
    if not path:
        return None
    if not os.path.exists(path):
        log.warning("phase3: shape_checkpoint %s not found", path)
        return None
    from regen3d_tpu.pipeline.shape_distill import load_generator
    gen = load_generator(path)
    log.info("phase3: loaded distilled shape generator from %s "
             "(dit width %d, cond %d^2)", path, gen.dit_cfg.width,
             gen.image_size)
    return gen


def run(cfg: Config, generator: Optional[AssetGenerator] = None,
        key: Optional[jax.Array] = None) -> List[str]:
    art = Artifacts(cfg)
    src_dir = art.prepped_dir if os.path.isdir(art.prepped_dir) else \
        cfg.path("input_folder_hy")
    names = [os.path.splitext(f)[0] for f in sorted(os.listdir(src_dir))
             if f.lower().endswith(".png")] if os.path.isdir(src_dir) else []
    if not names:
        log.warning("phase3: no prepped object images in %s", src_dir)
        return []

    if key is None:
        key = jax.random.PRNGKey(int(cfg.get("seed", 1234567)))
    if generator is None:
        generator = load_default_generator(cfg)
    if generator is None:
        log.warning("phase3: no checkpoint — random-init generator "
                    "(geometry will be uninformative until weights load)")
        generator = AssetGenerator.random_init(key, tiny=True)

    if bool(cfg.get("use_hunyuan21", False)):
        # Hunyuan3D-2.1 variant knobs (reference: run_hunyuan21.py:49-129,
        # config.yaml:176-192) — same generator, different sampling budget
        num_steps = int(cfg.get("steps_hy21", 30))
        guidance = float(cfg.get("guidance_scale_hy21", 5.0))
        resolution = int(cfg.get("octree_resolution_hy21", 256))
        chunk = int(cfg.get("num_chunks_hy21", 8000))
    else:
        num_steps = int(cfg.get("num_inf_steps_hy", 50))
        guidance = float(cfg.get("guidance_scale", 5.0))
        resolution = int(cfg.get("octree_resolution_hy", 256))
        chunk = int(cfg.get("num_chunks_hy", 16000))
    # chunk is "queries per decode batch" — round to a TPU-friendly size
    chunk = max(1024, 1 << (chunk - 1).bit_length() >> 1)
    target_faces = (int(cfg.get("remesh_target_num_faces", 50000))
                    if bool(cfg.get("remesh", False)) else None)

    # --- batched generation: all objects through ONE jitted pipeline ----------
    import jax.image as jimage
    size = generator.image_size
    # random-init generators cap the decode grid (nothing to resolve);
    # trained/distilled ones (shape_distill.load_generator) run it in full
    res = resolution if generator.trained else \
        (min(resolution, 128) if generator.dit_cfg.width < 512 else resolution)
    raw_imgs = []
    imgs_r = []
    for name in names:
        img = np.asarray(Image.open(os.path.join(src_dir, f"{name}.png"))
                         .convert("RGBA"), np.float32) / 255.0
        raw_imgs.append(img)
        imgs_r.append(np.asarray(jimage.resize(jnp.asarray(img),
                                               (size, size, 4), "bilinear")))
    t0 = time.perf_counter()
    vols = generator.generate_sdf_batch(key, np.stack(imgs_r), num_steps,
                                        guidance, res, chunk)
    t_gen = time.perf_counter() - t0

    t_mesh = t_tex = 0.0
    done = []
    for i, name in enumerate(names):
        img = raw_imgs[i]
        t0 = time.perf_counter()
        verts, faces = extract_and_clean(vols[i], target_faces)
        t_mesh += time.perf_counter() - t0
        if len(faces) == 0:
            # random-weight decoders may produce empty level sets; emit a
            # unit placeholder so downstream contracts stay exercisable
            log.warning("phase3: %s produced an empty level set", name)
            verts = np.asarray([[-.5, -.5, -.5], [.5, -.5, -.5], [.5, .5, -.5],
                                [-.5, .5, -.5], [-.5, -.5, .5], [.5, -.5, .5],
                                [.5, .5, .5], [-.5, .5, .5]], np.float32)
            faces = np.asarray([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                                [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                                [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]],
                               np.int32)
        out_path = art.asset_glb(name)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        t0 = time.perf_counter()
        if bool(cfg.get("use_multiview_texgen", False)):
            # full Hunyuan3DPaintPipeline role: GENERATE the view ring with
            # the camera-conditioned multiview diffusion model, then bake
            # the texel atlas (pipeline/texgen.py). Without converted
            # weights the views are random-init diffusion output — the
            # contract runs end to end; quality arrives with checkpoints.
            from regen3d_tpu.models.sd_unet import SDUNetConfig
            from regen3d_tpu.models.sd_vae import SDVAEConfig
            from regen3d_tpu.pipeline import texgen as tg
            hy21_pbr = (bool(cfg.get("use_hunyuan21", False))
                        and bool(cfg.get("enable_texture_hy21", True)))
            tcfg = tg.TexGenConfig(
                num_views=int(cfg.get("max_num_view_hy21", 6) if hy21_pbr
                              else cfg.get("max_num_view", 6)),
                resolution=int(cfg.get("texgen_resolution", 64)),
                steps=int(cfg.get("texgen_steps", 4)))
            n_embed = (2 if hy21_pbr else 1) * tcfg.num_views
            ucfg = SDUNetConfig.tiny(in_channels=12,
                                     class_embeddings=n_embed)
            vcfg = SDVAEConfig.tiny()
            tp, vp, ucfg, vcfg = tg.init_texgen(tcfg, unet_cfg=ucfg,
                                                vae_cfg=vcfg)
            if hy21_pbr:
                # Hunyuan3D-2.1 PBR texture path (run_hunyuan21.py:105-123):
                # albedo + metallic-roughness atlases; optional RealESRGAN
                # ×4 on the albedo when a converted checkpoint is configured
                esrgan = None
                es_ckpt = str(cfg.get("realesrgan_ckpt_path", "") or "")
                if es_ckpt and os.path.exists(es_ckpt):
                    from regen3d_tpu.models.esrgan import ESRGANConfig
                    from regen3d_tpu.models.weights import load_checkpoint
                    esrgan = (load_checkpoint(es_ckpt),
                              ESRGANConfig.x4plus())
                nv, nf, uvs, png, mr_png = tg.texture_mesh_pbr(
                    verts, faces, img[..., :3], tcfg, tp, vp, ucfg, vcfg,
                    texels_per_face=int(cfg.get("texels_per_face", 8)),
                    seed=int(cfg.get("seed", 1234567)), esrgan=esrgan)
                save_glb(out_path, SceneData(meshes=[MeshData(
                    name=name, vertices=nv, faces=nf, uvs=uvs,
                    texture_png=png, mr_texture_png=mr_png,
                    metallic=1.0, roughness=1.0)]))
            else:
                nv, nf, uvs, png = tg.texture_mesh(
                    verts, faces, img[..., :3], tcfg, tp, vp, ucfg, vcfg,
                    texels_per_face=int(cfg.get("texels_per_face", 8)),
                    seed=int(cfg.get("seed", 1234567)))
                save_glb(out_path, SceneData(meshes=[MeshData(
                    name=name, vertices=nv, faces=nf, uvs=uvs,
                    texture_png=png)]))
        elif bool(cfg.get("bake_texture_atlas", False)):
            # texel-space atlas (Hunyuan3DPaint output contract)
            from regen3d_tpu.camera import lookat_camera
            from regen3d_tpu.pipeline.texture import bake_texture_atlas
            rgb = img[..., :3]
            center = verts.mean(0)
            ext = float(np.linalg.norm(verts.max(0) - verts.min(0))) + 1e-6
            cam = lookat_camera(center + np.asarray([0, 0, -2.2 * ext],
                                                    np.float32),
                                center, rgb.shape[:2],
                                focal_px=rgb.shape[0] * 1.1)
            nv, nf, uvs, png = bake_texture_atlas(
                verts, faces, [(cam, rgb)],
                texels_per_face=int(cfg.get("texels_per_face", 8)))
            save_glb(out_path, SceneData(meshes=[MeshData(
                name=name, vertices=nv, faces=nf, uvs=uvs, texture_png=png)]))
        else:
            colors = vertex_colors_from_image(verts, faces, img)
            save_glb(out_path, SceneData(meshes=[MeshData(
                name=name, vertices=verts, faces=faces,
                vertex_colors=colors)]))
        t_tex += time.perf_counter() - t0
        done.append(name)
        log.info("phase3: %s → %d verts / %d faces", name, len(verts), len(faces))
    log.info("phase3: stage breakdown — generate(batch) %.1fs, "
             "mesh-extract+clean %.1fs, texture+glb %.1fs (%d objects)",
             t_gen, t_mesh, t_tex, len(names))
    return done
