"""VGGT-family geometry transformer: camera + depth + point maps from images.

Rebuilds the reference's VGGT-1B usage (minimal_demo_vggt.py:295-321): a
DINO-patchified ViT **aggregator** with alternating frame-wise / global
attention, a **camera head** decoding per-frame pose encodings
(translation, quaternion, vertical FoV) by iterative refinement, and a
DPT-style **depth head** with per-pixel confidence. The reference runs it at
518², 1–2 frames, bf16 autocast — here everything is flax + the Pallas flash
kernel, jit end to end.

Weight conversion from the torch checkpoint maps 1:1 onto these modules
(models/weights.py); no weights ship in this image, so tests run tiny
random-init configs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import (
    Attention,
    Mlp,
    PatchEmbed,
    posemb_sincos_2d,
)


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    image_size: int = 518
    patch: int = 14
    width: int = 1024
    depth: int = 24            # aggregator blocks (each = frame + global attn)
    num_heads: int = 16
    num_register_tokens: int = 4
    camera_iterations: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @classmethod
    def tiny(cls) -> "VGGTConfig":
        return cls(image_size=28, patch=14, width=64, depth=2, num_heads=4,
                   num_register_tokens=1, camera_iterations=2)


class AggregatorBlock(nn.Module):
    """One alternating unit: frame-local attention then global attention.

    Frame attention: tokens reshaped to (B·F, N, D) — each frame attends to
    itself. Global attention: (B, F·N, D) — every token sees every frame.
    """

    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):  # (B, F, N, D)
        b, f, n, d = x.shape

        h = x.reshape(b * f, n, d)
        h = h + Attention(self.num_heads, dtype=self.dtype, name="frame_attn")(
            nn.LayerNorm(dtype=self.dtype, name="frame_norm")(h))
        h = h + Mlp(d * 4, dtype=self.dtype, name="frame_mlp")(
            nn.LayerNorm(dtype=self.dtype, name="frame_mlp_norm")(h))
        x = h.reshape(b, f, n, d)

        g = x.reshape(b, f * n, d)
        g = g + Attention(self.num_heads, dtype=self.dtype, name="global_attn")(
            nn.LayerNorm(dtype=self.dtype, name="global_norm")(g))
        g = g + Mlp(d * 4, dtype=self.dtype, name="global_mlp")(
            nn.LayerNorm(dtype=self.dtype, name="global_mlp_norm")(g))
        return g.reshape(b, f, n, d)


class Aggregator(nn.Module):
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, images):  # (B, F, H, W, 3) in [0, 1]
        c = self.cfg
        b, f = images.shape[:2]
        x, (gh, gw) = PatchEmbed(c.patch, c.width, dtype=c.dtype, name="patch")(
            images.reshape(b * f, *images.shape[2:]))
        x = x + posemb_sincos_2d(gh, gw, c.width)[None].astype(c.dtype)
        n = x.shape[1]

        cam_tok = self.param("camera_token", nn.initializers.normal(0.02),
                             (1, c.width), jnp.float32)
        reg_tok = self.param("register_tokens", nn.initializers.normal(0.02),
                             (c.num_register_tokens, c.width), jnp.float32)
        # frame 0 gets a distinct camera token role via a learned frame embedding
        frame_emb = self.param("frame_emb", nn.initializers.normal(0.02),
                               (2, c.width), jnp.float32)
        fidx = jnp.minimum(jnp.arange(f), 1)
        extra = jnp.concatenate([cam_tok, reg_tok], axis=0)  # (1+R, D)
        extra = jnp.broadcast_to(extra[None, None], (b, f, extra.shape[0], c.width))
        extra = extra + frame_emb[fidx][None, :, None, :]
        x = x.reshape(b, f, n, c.width)
        x = jnp.concatenate([extra.astype(c.dtype), x], axis=2)

        feats = []
        for i in range(c.depth):
            x = AggregatorBlock(c.num_heads, c.dtype, name=f"block{i}")(x)
            feats.append(x)
        # expose the 4 evenly spaced intermediate maps (DPT consumes several)
        taps = [feats[max(0, (len(feats) * k) // 4 - 1)] for k in (1, 2, 3, 4)]
        return x, taps, (gh, gw)


class CameraHead(nn.Module):
    """Camera tokens → pose encoding (tx ty tz, qx qy qz qw, fov_h fov_w)
    by iterative residual refinement (the reference's absT_quaR_FoV
    convention, decoded to extrinsics/intrinsics downstream)."""

    cfg: VGGTConfig

    @nn.compact
    def __call__(self, cam_tokens):  # (B, F, D)
        c = self.cfg
        h = nn.LayerNorm(dtype=c.dtype, name="norm")(cam_tokens)
        enc = jnp.zeros((*cam_tokens.shape[:2], 9), jnp.float32)
        # identity pose in absT_quaR_FoV layout: quat xyzw ⇒ w sits at idx 6
        base = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 0.8, 0.8], jnp.float32)
        enc = enc + base
        trunk = Mlp(c.width * 2, out=c.width, dtype=c.dtype, name="trunk")
        head = nn.Dense(9, dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros, name="delta")
        emb = nn.Dense(c.width, dtype=c.dtype, name="enc_in")
        for _ in range(c.camera_iterations):
            z = trunk(h + emb(enc.astype(c.dtype)))
            enc = enc + head(z)
        return enc  # (B, F, 9)


def pose_encoding_to_camera(enc: jnp.ndarray, image_hw: Tuple[int, int]
                            ) -> Dict[str, jnp.ndarray]:
    """Pose encoding → extrinsic [R|t] (OpenCV world→cam) + intrinsics.

    Mirrors the reference's pose_encoding_to_extri_intri contract
    (minimal_demo_vggt.py:311-313) for pose_encoding_type="absT_quaR_FoV":
    layout [tx ty tz, qx qy qz qw, fov_h fov_w] — the quaternion is
    SCALAR-LAST (xyzw, upstream vggt/utils/rotation.py "ijkr"), fov_h is the
    vertical FoV (decoded with the image height). Pinned by the golden test
    in tests/test_models_vggt.py::test_pose_encoding_golden.
    """
    from regen3d_tpu.transforms.rotations import quat_to_matrix

    t = enc[..., 0:3]
    q = enc[..., 3:7]                      # xyzw (scalar-last)
    fov = enc[..., 7:9]
    R = quat_to_matrix(q[..., jnp.array([3, 0, 1, 2])])  # → wxyz helper
    h, w = image_hw
    fy = (h / 2.0) / jnp.tan(jnp.clip(fov[..., 0], 1e-3, 3.0) / 2.0)
    fx = (w / 2.0) / jnp.tan(jnp.clip(fov[..., 1], 1e-3, 3.0) / 2.0)
    return {"R": R, "t": t, "fx": fx, "fy": fy,
            "cx": jnp.full_like(fx, w / 2.0), "cy": jnp.full_like(fy, h / 2.0)}


class DPTHead(nn.Module):
    """Multi-scale dense prediction head: 4 aggregator taps → per-pixel
    (value, confidence) maps at input resolution."""

    cfg: VGGTConfig
    out_channels: int = 1
    name_prefix: str = "depth"

    @nn.compact
    def __call__(self, taps, grid_hw, out_hw):
        c = self.cfg
        gh, gw = grid_hw
        feats = []
        for i, t in enumerate(taps):
            # strip camera/register tokens; keep patch tokens
            patch = t[:, :, -(gh * gw):, :]
            b, f = patch.shape[:2]
            x = patch.reshape(b * f, gh, gw, c.width)
            x = nn.Dense(c.width // 2, dtype=c.dtype, name=f"proj{i}")(x)
            feats.append(x)
        h = jnp.concatenate(feats, axis=-1)
        h = nn.Conv(c.width, (3, 3), dtype=c.dtype, name="fuse1")(h)
        h = nn.gelu(h)
        h = nn.Conv(c.width // 2, (3, 3), dtype=c.dtype, name="fuse2")(h)
        h = nn.gelu(h)
        # upsample to full resolution
        oh, ow = out_hw
        h = jax.image.resize(h, (h.shape[0], oh, ow, h.shape[-1]), "bilinear")
        h = nn.Conv(c.width // 4, (3, 3), dtype=c.dtype, name="refine")(h)
        h = nn.gelu(h)
        out = nn.Conv(self.out_channels + 1, (1, 1), dtype=jnp.float32,
                      name="out")(h)
        value = out[..., :self.out_channels]
        conf = 1.0 + jax.nn.softplus(out[..., self.out_channels:])
        b_f = value.shape[0]
        return value, conf


class VGGT(nn.Module):
    """Full model: images → {pose_enc, depth, depth_conf, point_map}."""

    cfg: VGGTConfig

    @nn.compact
    def __call__(self, images):  # (B, F, H, W, 3)
        c = self.cfg
        b, f, h, w = images.shape[:4]
        x, taps, grid_hw = Aggregator(c, name="aggregator")(images)
        cam_tokens = x[:, :, 0, :].astype(jnp.float32)  # (B, F, D)
        pose_enc = CameraHead(c, name="camera_head")(cam_tokens)
        depth, depth_conf = DPTHead(c, 1, name="depth_head")(taps, grid_hw, (h, w))
        depth = jax.nn.softplus(depth)  # positive depths
        depth = depth.reshape(b, f, h, w)
        depth_conf = depth_conf.reshape(b, f, h, w)
        return {"pose_enc": pose_enc, "depth": depth, "depth_conf": depth_conf}


def unproject_depth(depth: jnp.ndarray, camera: Dict[str, jnp.ndarray],
                    frame: int = 0) -> jnp.ndarray:
    """Depth map (H, W) + decoded camera → world-space point map (H, W, 3)
    (reference: unproject_depth_map_to_point_map, minimal_demo_vggt.py:412).

    OpenCV convention: x_cam = K⁻¹·(u,v,1)·z, world = Rᵀ(x_cam − t).
    """
    h, w = depth.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    fx, fy = camera["fx"][frame], camera["fy"][frame]
    cx, cy = camera["cx"][frame], camera["cy"][frame]
    x = (uu - cx) / fx * depth
    y = (vv - cy) / fy * depth
    cam_pts = jnp.stack([x, y, depth], axis=-1)
    R = camera["R"][frame]  # world→cam (column convention: x_cam = R @ x_w + t)
    t = camera["t"][frame]
    return (cam_pts - t) @ R  # == Rᵀ·(x_cam − t) for row-stacked points
