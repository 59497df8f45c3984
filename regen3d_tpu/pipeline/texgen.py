"""Multiview texture GENERATION: camera-conditioned diffusion → baked atlas.

Completes the Hunyuan3DPaintPipeline role
(/root/reference/src/2d_to_3d_models/run.py:97): the reference *generates*
the multiview images it bakes — a multiview SD UNet conditioned on the
reference image and per-view cameras (max_num_view=6 at 512²,
config.yaml:190-191). Round-1 shipped only the baker (pipeline/texture.py);
this module adds the generator:

  * ``MultiviewTexGen`` — one flax module: the diffusers-layout SDUNet
    (models/sd_unet.py, ``SDUNetConfig.multiview``) with per-view camera
    indices as class embeddings, the reference image supplied BOTH as a
    channel-concatenated VAE latent (each view sees it) and as
    cross-attention tokens (patchified latent through a projection);
  * ``generate_views`` — ONE jitted program: all N views denoise together
    in a single batch through a ``lax.scan`` DDIM loop (the N-view joint
    denoising that gives multiview consistency), then VAE-decode;
  * ``texture_mesh`` — generate views on the phase-3 orbit ring and feed
    the existing occlusion-tested texel-atlas baker.

TPU-first: the view axis IS the batch axis (one MXU stream, no per-view
Python loop); the step loop is a compiled scan; everything bf16 with f32
latents. With converted weights this reproduces the reference texture
path; random-init runs exercise the full contract in tests.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from regen3d_tpu.models.sd_unet import SDUNet, SDUNetConfig
from regen3d_tpu.models.sd_vae import SDAutoencoderKL, SDVAEConfig

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TexGenConfig:
    num_views: int = 6
    resolution: int = 512          # config.yaml:191 resolution 512
    steps: int = 15
    guidance: float = 3.0
    latent_down: int = 8

    @classmethod
    def tiny(cls) -> "TexGenConfig":
        return cls(num_views=3, resolution=32, steps=2, guidance=1.0)


class MultiviewTexGen(nn.Module):
    """UNet + conditioning projection; __call__ = one denoising step for all
    views (B = num_views).

    Geometry conditioning (the Hunyuan paint role — the reference's
    pipeline consumes the MESH, /root/reference/src/2d_to_3d_models/run.py:97):
    each view's channel input is [noisy latent ‖ reference-image latent ‖
    VAE-encoded normal-map render of the mesh FROM THAT VIEW'S CAMERA], and
    the actual camera pose (R, t, focal) enters as an extra cross-attention
    token — so generated views are geometrically tied to the mesh the baker
    projects them onto, not just to a view index."""

    unet_cfg: SDUNetConfig

    @nn.compact
    def __call__(self, latents, t, ref_latent, view_ids, geom_latent,
                 cam_feats):
        """latents: (V, h, w, 4); t: scalar; ref_latent: (h, w, 4);
        view_ids: (V,) int32; geom_latent: (V, h, w, 4) per-view encoded
        geometry renders; cam_feats: (V, 13) flattened camera pose.
        Returns noise prediction (V, h, w, 4)."""
        v = latents.shape[0]
        ref = jnp.broadcast_to(ref_latent[None], (v, *ref_latent.shape))
        x = jnp.concatenate([latents, ref, geom_latent], axis=-1)
        # cross-attention tokens: patchified reference latent, projected,
        # plus one camera-pose token per view
        toks = ref_latent.reshape(1, -1, ref_latent.shape[-1])
        toks = nn.Dense(self.unet_cfg.cross_attn_dim,
                        name="cond_proj")(toks)
        toks = jnp.broadcast_to(toks, (v, *toks.shape[1:]))
        cam_tok = nn.Dense(self.unet_cfg.cross_attn_dim,
                           name="cam_proj")(cam_feats)[:, None, :]
        toks = jnp.concatenate([toks, cam_tok], axis=1)
        tt = jnp.full((v,), t, jnp.float32)
        return SDUNet(self.unet_cfg, name="unet")(x, tt, toks, view_ids)


def render_geometry_maps(verts: np.ndarray, faces: np.ndarray,
                         cams: Sequence, resolution: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-view geometry conditioning renders: camera-space normal maps
    (V, R, R, 3) in [0,1] over 0.5-gray background, and coverage masks
    (V, R, R) float — the geometry image the Hunyuan paint UNet sees."""
    from regen3d_tpu.ops.rasterize import rasterize_hard

    v = jnp.asarray(verts, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    tri = v[f]
    fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-9)
    normals, masks = [], []
    for cam in cams:
        vs = cam.view_to_screen(cam.world_to_view(v))
        frag = rasterize_hard(vs, f, (resolution, resolution))
        mask = frag.face_idx >= 0
        n_cam = fn @ cam.R                    # world→view (row convention)
        nmap = jnp.where(mask[..., None],
                         n_cam[jnp.maximum(frag.face_idx, 0)] * 0.5 + 0.5,
                         0.5)
        normals.append(np.asarray(nmap, np.float32))
        masks.append(np.asarray(mask, np.float32))
    return np.stack(normals), np.stack(masks)


def camera_feats(cams: Sequence) -> np.ndarray:
    """(V, 13) flattened per-view camera conditioning: rotation (9),
    normalized translation (3), focal/image-height (1)."""
    feats = []
    for cam in cams:
        R = np.asarray(cam.R, np.float32).reshape(-1)
        T = np.asarray(cam.T, np.float32)
        T = T / (np.linalg.norm(T) + 1.0)
        fscale = float(np.asarray(cam.focal)[0]) / float(cam.image_size[0])
        feats.append(np.concatenate([R, T, [fscale]]))
    return np.stack(feats).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _jitted_ddim_run(model: MultiviewTexGen, shape: Tuple[int, ...],
                     steps: int, num_train_steps: int):
    """One compiled DDIM program per (module, shape, steps) — the previous
    per-call jit closed over ref_latent (constant-embedded) and recompiled
    for every object."""
    v = shape[0]
    view_ids = jnp.arange(v, dtype=jnp.int32)
    ts = jnp.linspace(num_train_steps - 1, 0, steps).astype(jnp.float32)
    betas = jnp.linspace(8.5e-4, 1.2e-2, num_train_steps)
    alphas_bar = jnp.cumprod(1.0 - betas)

    def a_bar(t):
        return alphas_bar[jnp.clip(t.astype(jnp.int32), 0,
                                   num_train_steps - 1)]

    @jax.jit
    def run(params, key, ref_latent, geom_latent, cam_feats):
        x0 = jax.random.normal(key, shape, jnp.float32)

        def step(x, i):
            t = ts[i]
            t_prev = jnp.where(i + 1 < steps, ts[jnp.minimum(i + 1,
                                                             steps - 1)], 0.0)
            eps = model.apply(params, x, t, ref_latent, view_ids,
                              geom_latent, cam_feats)
            ab, ab_prev = a_bar(t), a_bar(t_prev)
            x0_pred = (x - jnp.sqrt(1 - ab) * eps) / jnp.sqrt(ab)
            x_next = jnp.sqrt(ab_prev) * x0_pred + jnp.sqrt(1 - ab_prev) * eps
            return x_next, None

        x, _ = jax.lax.scan(step, x0, jnp.arange(steps))
        return x

    return run


def ddim_sample(params, model: MultiviewTexGen, ref_latent: jnp.ndarray,
                shape: Tuple[int, ...], steps: int, key,
                geom_latent: jnp.ndarray, cam_feats: jnp.ndarray,
                num_train_steps: int = 1000) -> jnp.ndarray:
    """Jitted DDIM (eta=0) over a lax.scan: all views in one batch."""
    run = _jitted_ddim_run(model, tuple(shape), int(steps),
                           int(num_train_steps))
    return run(params, key, ref_latent, geom_latent, cam_feats)


@functools.lru_cache(maxsize=4)
def _jitted_vae(vae_cfg):
    """Batched encode/decode programs per VAE config (shared by the RGB and
    PBR paths; single images go through as batch-1)."""
    vae = SDAutoencoderKL(vae_cfg)

    @jax.jit
    def encode(vae_params, x):          # (B, H, W, 3) → (B, h, w, C)
        mean, _ = vae.apply(vae_params, x, method=SDAutoencoderKL.encode)
        return mean * vae_cfg.scaling_factor

    @jax.jit
    def decode(vae_params, z):
        return vae.apply(vae_params, z / vae_cfg.scaling_factor,
                         method=SDAutoencoderKL.decode)

    return encode, decode


def _encode_geometry(vae, vae_params, vae_cfg, geom_maps, n_views, lh):
    """Geometry normal maps (V, R, R, 3) → per-view latents (V, h, w, 4);
    zeros (the unconditioned null) when no mesh renders are supplied."""
    if geom_maps is None:
        return jnp.zeros((n_views, lh, lh, vae_cfg.latent_channels),
                         jnp.float32)

    enc, _ = _jitted_vae(vae_cfg)
    g = jnp.asarray(geom_maps, jnp.float32) * 2.0 - 1.0
    if g.shape[1] != lh * vae_down(vae_cfg):
        g = jax.image.resize(
            g, (g.shape[0], lh * vae_down(vae_cfg),
                lh * vae_down(vae_cfg), 3), "bilinear")
    return enc(vae_params, g)


def generate_views(
    tex_params,
    vae_params,
    cfg: TexGenConfig,
    ref_image: np.ndarray,
    unet_cfg: Optional[SDUNetConfig] = None,
    vae_cfg: Optional[SDVAEConfig] = None,
    seed: int = 0,
    geom_maps: Optional[np.ndarray] = None,
    cam_feats_arr: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Reference image (H, W, 3) uint8 [+ per-view geometry renders and
    camera poses] → (V, R, R, 3) float views in [0,1]."""
    unet_cfg = unet_cfg or SDUNetConfig.multiview(cfg.num_views)
    vae_cfg = vae_cfg or SDVAEConfig()
    vae = SDAutoencoderKL(vae_cfg)
    model = MultiviewTexGen(unet_cfg)

    r = cfg.resolution
    img = jnp.asarray(ref_image, jnp.float32) / 255.0 * 2.0 - 1.0
    img = jax.image.resize(img, (r, r, 3), "bilinear")

    encode, decode = _jitted_vae(vae_cfg)
    ref_latent = encode(vae_params, img[None])[0]
    lh = ref_latent.shape[0]  # the VAE's own downsampling sets the grid
    geom_latent = _encode_geometry(vae, vae_params, vae_cfg, geom_maps,
                                   cfg.num_views, lh)
    cams = (jnp.asarray(cam_feats_arr, jnp.float32)
            if cam_feats_arr is not None
            else jnp.zeros((cfg.num_views, 13), jnp.float32))
    latents = ddim_sample(tex_params, model, ref_latent,
                          (cfg.num_views, lh, lh, vae_cfg.latent_channels),
                          cfg.steps, jax.random.PRNGKey(seed),
                          geom_latent, cams)
    out = decode(vae_params, latents)
    out = jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)
    return np.asarray(jax.image.resize(
        out, (cfg.num_views, r, r, 3), "bilinear"))


def generate_views_pbr(
    tex_params,
    vae_params,
    cfg: TexGenConfig,
    ref_image: np.ndarray,
    unet_cfg: Optional[SDUNetConfig] = None,
    vae_cfg: Optional[SDVAEConfig] = None,
    seed: int = 0,
    geom_maps: Optional[np.ndarray] = None,
    cam_feats_arr: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """PBR multiview generation (the Hunyuan3D-2.1 hunyuan-paint-pbr role,
    run_hunyuan21.py:113): albedo AND metallic-roughness view rings
    denoised JOINTLY in one 2V batch — material selects the second half of
    the class-embedding table (id = view + V·material), so the two
    material branches share the UNet but get distinct conditioning, and
    the whole thing stays a single MXU stream.

    Returns (albedo (V, R, R, 3), mr (V, R, R, 3)) in [0, 1]; mr packs
    glTF layout G=roughness, B=metallic."""
    unet_cfg = unet_cfg or SDUNetConfig.multiview(2 * cfg.num_views)
    vae_cfg = vae_cfg or SDVAEConfig()
    vae = SDAutoencoderKL(vae_cfg)
    model = MultiviewTexGen(unet_cfg)

    r = cfg.resolution
    v = cfg.num_views
    img = jnp.asarray(ref_image, jnp.float32) / 255.0 * 2.0 - 1.0
    img = jax.image.resize(img, (r, r, 3), "bilinear")

    encode, decode = _jitted_vae(vae_cfg)
    ref_latent = encode(vae_params, img[None])[0]
    lh = ref_latent.shape[0]
    # geometry + camera conditioning shared by both material rings
    geom_one = _encode_geometry(vae, vae_params, vae_cfg, geom_maps, v, lh)
    geom_latent = jnp.concatenate([geom_one, geom_one], axis=0)
    cams_one = (jnp.asarray(cam_feats_arr, jnp.float32)
                if cam_feats_arr is not None
                else jnp.zeros((v, 13), jnp.float32))
    cams2 = jnp.concatenate([cams_one, cams_one], axis=0)
    # 2V batch: ids 0..V-1 = albedo views, V..2V-1 = MR views
    latents = ddim_sample(
        tex_params, model, ref_latent,
        (2 * v, lh, lh, vae_cfg.latent_channels), cfg.steps,
        jax.random.PRNGKey(seed), geom_latent, cams2)
    out = jnp.clip(decode(vae_params, latents) * 0.5 + 0.5, 0.0, 1.0)
    out = jax.image.resize(out, (2 * v, r, r, 3), "bilinear")
    return np.asarray(out[:v]), np.asarray(out[v:])


def texture_mesh_pbr(
    verts: np.ndarray,
    faces: np.ndarray,
    ref_image: np.ndarray,
    cfg: TexGenConfig,
    tex_params,
    vae_params,
    unet_cfg: Optional[SDUNetConfig] = None,
    vae_cfg: Optional[SDVAEConfig] = None,
    texels_per_face: int = 8,
    seed: int = 0,
    esrgan=None,
):
    """PBR texgen: generate albedo+MR view rings, bake BOTH texel atlases
    on the shared layout, optionally RealESRGAN-upscale the albedo atlas
    (run_hunyuan21.py:112, ``esrgan=(params, ESRGANConfig)``).

    Returns (new_verts, new_faces, uvs, albedo_png, mr_png)."""
    import io

    from PIL import Image

    from regen3d_tpu.pipeline.texture import bake_texture_atlas, orbit_views

    center = verts.mean(0)
    radius = 2.2 * float(np.abs(verts - center).max())
    ring = orbit_views(center, radius, np.zeros(
        (cfg.resolution, cfg.resolution, 3), np.float32),
        n_views=cfg.num_views)
    cams = [cam for cam, _ in ring]
    geom, masks = render_geometry_maps(verts, faces, cams, cfg.resolution)
    feats = camera_feats(cams)
    albedo, mr = generate_views_pbr(tex_params, vae_params, cfg, ref_image,
                                    unet_cfg, vae_cfg, seed,
                                    geom_maps=geom, cam_feats_arr=feats)
    # composite on white outside the mesh silhouette (the reference's
    # white-background views; keeps baked texels mesh-aligned)
    m = masks[..., None]
    albedo = albedo * m + (1.0 - m)
    mr = mr * m + (1.0 - m)
    views_a = [(cam, albedo[i]) for i, (cam, _) in enumerate(ring)]
    views_m = [(cam, mr[i]) for i, (cam, _) in enumerate(ring)]
    nv, nf, uvs, albedo_png = bake_texture_atlas(
        verts, faces, views_a, texels_per_face=texels_per_face)
    # same geometry → identical texel layout/uvs; bake the MR channels on it
    _, _, _, mr_png = bake_texture_atlas(
        verts, faces, views_m, texels_per_face=texels_per_face)
    if esrgan is not None:
        from regen3d_tpu.models.esrgan import upscale_x4
        es_params, es_cfg = esrgan
        img = np.asarray(Image.open(io.BytesIO(albedo_png)).convert("RGB"),
                         np.float32) / 255.0
        up = upscale_x4(es_params, es_cfg, img)
        buf = io.BytesIO()
        Image.fromarray((up * 255).astype(np.uint8)).save(buf, "PNG")
        albedo_png = buf.getvalue()
    return nv, nf, uvs, albedo_png, mr_png


def vae_down(vae_cfg: SDVAEConfig) -> int:
    return 2 ** (len(vae_cfg.block_channels) - 1)


def init_texgen(cfg: TexGenConfig, key=None,
                unet_cfg: Optional[SDUNetConfig] = None,
                vae_cfg: Optional[SDVAEConfig] = None):
    """Random-init params (tests / weightless runs). Returns
    (tex_params, vae_params, unet_cfg, vae_cfg)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    unet_cfg = unet_cfg or SDUNetConfig.multiview(cfg.num_views)
    vae_cfg = vae_cfg or SDVAEConfig()
    down = vae_down(vae_cfg)
    lh = max(cfg.resolution // down, 1)
    model = MultiviewTexGen(unet_cfg)
    vae = SDAutoencoderKL(vae_cfg)
    k1, k2 = jax.random.split(key)
    n_batch = (unet_cfg.class_embeddings if unet_cfg.class_embeddings
               else cfg.num_views)
    tex_params = model.init(
        k1, jnp.zeros((n_batch, lh, lh, vae_cfg.latent_channels)),
        jnp.zeros(()), jnp.zeros((lh, lh, vae_cfg.latent_channels)),
        jnp.arange(n_batch, dtype=jnp.int32),
        jnp.zeros((n_batch, lh, lh, vae_cfg.latent_channels)),
        jnp.zeros((n_batch, 13)))
    vae_params = vae.init(k2, jnp.zeros((1, cfg.resolution, cfg.resolution,
                                         3)))
    return tex_params, vae_params, unet_cfg, vae_cfg


def texture_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    ref_image: np.ndarray,
    cfg: TexGenConfig,
    tex_params,
    vae_params,
    unet_cfg: Optional[SDUNetConfig] = None,
    vae_cfg: Optional[SDVAEConfig] = None,
    texels_per_face: int = 8,
    seed: int = 0,
):
    """Full texgen: generate the view ring, bake a texel atlas.

    Returns (new_verts, new_faces, uvs, texture_png_bytes) — the
    bake_texture_atlas output contract (GLB-ready)."""
    from regen3d_tpu.pipeline.texture import bake_texture_atlas, orbit_views

    center = verts.mean(0)
    radius = 2.2 * float(np.abs(verts - center).max())
    ring = orbit_views(center, radius, np.zeros(
        (cfg.resolution, cfg.resolution, 3), np.float32),
        n_views=cfg.num_views)
    cams = [cam for cam, _ in ring]
    geom, masks = render_geometry_maps(verts, faces, cams, cfg.resolution)
    feats = camera_feats(cams)
    views_imgs = generate_views(tex_params, vae_params, cfg, ref_image,
                                unet_cfg, vae_cfg, seed,
                                geom_maps=geom, cam_feats_arr=feats)
    m = masks[..., None]
    views_imgs = views_imgs * m + (1.0 - m)
    views = [(cam, views_imgs[i]) for i, (cam, _) in enumerate(ring)]
    return bake_texture_atlas(verts, faces, views,
                              texels_per_face=texels_per_face)
