"""VGGT-family geometry transformer: camera + depth + point maps from images.

Rebuilds the reference's VGGT-1B usage (minimal_demo_vggt.py:295-321) with
the UPSTREAM MODULE STRUCTURE so the facebook/VGGT-1B checkpoint converts
1:1 (models/conversion.py `vggt` family):

  * ``aggregator.patch_embed`` — a DINOv2-style ViT backbone (patch conv +
    cls token + pos embed + LayerScale blocks) producing 1024-d patch
    tokens;
  * ``aggregator.frame_blocks`` / ``aggregator.global_blocks`` — 24
    alternating attention layers: frame blocks attend within each frame
    (B·F, N, D), global blocks across all frames (B, F·N, D); per-layer the
    [frame_out ‖ global_out] concat (2048-d) feeds the heads (the upstream
    "aggregated tokens");
  * per-frame ``camera_token`` / ``register_token`` pairs (index 0 = query
    frame, 1 = the rest);
  * ``camera_head`` — iterative pose refinement: AdaLN-modulated trunk of
    ViT blocks over camera tokens, pose_branch MLP emitting absT_quaR_FoV
    deltas (quaternion SCALAR-LAST xyzw, fov_h then fov_w);
  * ``depth_head`` — a DPT head (per-tap projections, resize pyramid,
    fusion refinenets, output convs) with per-pixel confidence.

All flash-attention-backed, bf16 with f32 heads, jit end to end. The
reference runs it at 518², 1–2 frames (minimal_demo_vggt.py:398-411).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import (
    Mlp,
    PatchEmbed,
    ViTBlock,
    posemb_sincos_2d,
)


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    image_size: int = 518
    patch: int = 14
    width: int = 1024
    depth: int = 24            # alternating frame/global layer pairs
    num_heads: int = 16
    backbone_depth: int = 24   # DINOv2-L patch_embed blocks
    num_register_tokens: int = 4
    camera_iterations: int = 4
    camera_trunk_depth: int = 4
    # DPT depth-head widths — upstream VGGT-1B uses features=256 with
    # per-tap projection channels (256, 512, 1024, 1024); configurable so
    # the tiny test config scales down while full-size checkpoint
    # conversion of depth_head.projects/* stays shape-exact.
    dpt_features: int = 256
    dpt_out_channels: Tuple[int, int, int, int] = (256, 512, 1024, 1024)
    # FastVGGT-style training-free token merging for the GLOBAL attention
    # blocks (PAPERS.md: arXiv 2509.02560): fraction of non-reference-frame
    # patch tokens merged into their most similar reference token before
    # global attention and copied back after. 0 disables. No weight
    # changes — applies to converted checkpoints as-is.
    token_merge_ratio: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @classmethod
    def tiny(cls) -> "VGGTConfig":
        return cls(image_size=28, patch=14, width=64, depth=2, num_heads=4,
                   backbone_depth=2, num_register_tokens=1,
                   camera_iterations=2, camera_trunk_depth=1,
                   dpt_features=32, dpt_out_channels=(32, 32, 64, 64))


class DinoBackbone(nn.Module):
    """DINOv2-style ViT producing patch tokens (the upstream
    aggregator.patch_embed role): patch conv, cls token, interpolated pos
    embed, LayerScale blocks, final norm; returns patch tokens only."""

    cfg: VGGTConfig

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) in [0, 1]
        c = self.cfg
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (images - mean) / std
        x, (gh, gw) = PatchEmbed(c.patch, c.width, dtype=c.dtype,
                                 name="patch_embed")(x.astype(c.dtype))
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.width), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + gh * gw, c.width), jnp.float32)
        b = x.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(c.dtype), (b, 1, c.width)), x], 1)
        x = x + pos.astype(c.dtype)
        for i in range(c.backbone_depth):
            x = ViTBlock(c.num_heads, layer_scale=True, dtype=c.dtype,
                         name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=c.dtype, name="norm")(x)
        return x[:, 1:], (gh, gw)  # drop cls


def _merge_global_tokens(g, f, n_tok, n_special, r):
    """FastVGGT-style bipartite merge for one batch element.

    g (f·n_tok, D): frame-0 tokens are destinations; the r most-redundant
    non-reference PATCH tokens (highest cosine similarity to any
    destination) are averaged into their best destination; special tokens
    and the remaining sources pass through. Returns (compact tokens,
    info for :func:`_unmerge_global_tokens`). All shapes static.
    """
    d = g.shape[-1]
    dst = g[:n_tok]
    src = g[n_tok:].reshape(f - 1, n_tok, d)
    src_spec = src[:, :n_special].reshape(-1, d)
    src_patch = src[:, n_special:].reshape(-1, d)        # (M, D)
    m = src_patch.shape[0]

    a = src_patch / jnp.maximum(
        jnp.linalg.norm(src_patch, axis=-1, keepdims=True), 1e-6)
    bb = dst / jnp.maximum(jnp.linalg.norm(dst, axis=-1, keepdims=True),
                           1e-6)
    sim = (a @ bb.T).astype(jnp.float32)                 # (M, n_tok) MXU
    best = jnp.argmax(sim, axis=-1)                      # (M,)
    score = jnp.max(sim, axis=-1)
    order = jnp.argsort(score)                           # ascending
    kept_idx = order[:m - r]
    merged_idx = order[m - r:]
    merged_mask = jnp.zeros((m,), g.dtype).at[merged_idx].set(1.0)

    onehot = jax.nn.one_hot(best, n_tok, dtype=g.dtype) \
        * merged_mask[:, None]                           # (M, n_tok)
    counts = jnp.sum(onehot, axis=0)                     # (n_tok,)
    dst_new = (dst + onehot.T @ src_patch) / (1.0 + counts)[:, None]

    compact = jnp.concatenate(
        [dst_new, src_spec, src_patch[kept_idx]], axis=0)
    return compact, (best, kept_idx, merged_idx)


def _unmerge_global_tokens(out, info, f, n_tok, n_special):
    """Inverse of :func:`_merge_global_tokens`: merged sources take their
    destination token's output (the FastVGGT copy-back)."""
    best, kept_idx, merged_idx = info
    d = out.shape[-1]
    n_spec_all = (f - 1) * n_special
    out_dst = out[:n_tok]
    out_spec = out[n_tok:n_tok + n_spec_all]
    out_kept = out[n_tok + n_spec_all:]
    m = kept_idx.shape[0] + merged_idx.shape[0]
    patch = jnp.zeros((m, d), out.dtype)
    patch = patch.at[kept_idx].set(out_kept)
    patch = patch.at[merged_idx].set(out_dst[best[merged_idx]])
    src = jnp.concatenate(
        [out_spec.reshape(f - 1, n_special, d),
         patch.reshape(f - 1, -1, d)], axis=1)
    return jnp.concatenate([out_dst, src.reshape(-1, d)], axis=0)


class Aggregator(nn.Module):
    """Alternating-attention trunk; returns per-layer [frame‖global]
    concatenated tokens (the heads' 2·width input)."""

    cfg: VGGTConfig

    @nn.compact
    def __call__(self, images):  # (B, F, H, W, 3) in [0, 1]
        c = self.cfg
        b, f = images.shape[:2]
        x, (gh, gw) = DinoBackbone(c, name="patch_embed")(
            images.reshape(b * f, *images.shape[2:]))
        x = x + posemb_sincos_2d(gh, gw, c.width)[None].astype(c.dtype)
        n = x.shape[1]

        # per-frame special tokens: row 0 = query frame, row 1 = the rest
        cam_tok = self.param("camera_token", nn.initializers.normal(0.02),
                             (2, 1, c.width), jnp.float32)
        reg_tok = self.param("register_token", nn.initializers.normal(0.02),
                             (2, c.num_register_tokens, c.width), jnp.float32)
        fidx = jnp.minimum(jnp.arange(f), 1)
        extra = jnp.concatenate([cam_tok, reg_tok], axis=1)[fidx]  # (F,1+R,D)
        extra = jnp.broadcast_to(extra[None], (b, f, *extra.shape[1:]))
        x = x.reshape(b, f, n, c.width)
        x = jnp.concatenate([extra.astype(c.dtype), x], axis=2)
        n_tok = x.shape[2]

        taps: List[jnp.ndarray] = []
        for i in range(c.depth):
            h = x.reshape(b * f, n_tok, c.width)
            h = ViTBlock(c.num_heads, dtype=c.dtype,
                         name=f"frame_block{i}")(h)
            frame_out = h.reshape(b, f, n_tok, c.width)
            g = frame_out.reshape(b, f * n_tok, c.width)
            block = ViTBlock(c.num_heads, dtype=c.dtype,
                             name=f"global_block{i}")
            n_special = 1 + c.num_register_tokens
            n_patch_src = (f - 1) * (n_tok - n_special)
            r = int(c.token_merge_ratio * n_patch_src)
            if r > 0 and f > 1:
                # FastVGGT token merging: global attention runs on the
                # compact set; merged tokens copy their destination's
                # output back (training-free, weight-compatible)
                compact, info = jax.vmap(
                    lambda t: _merge_global_tokens(t, f, n_tok, n_special,
                                                   r))(g)
                out = block(compact)
                g = jax.vmap(
                    lambda t, bi, ki, mi: _unmerge_global_tokens(
                        t, (bi, ki, mi), f, n_tok, n_special)
                )(out, *info)
            else:
                g = block(g)
            x = g.reshape(b, f, n_tok, c.width)
            taps.append(jnp.concatenate([frame_out, x], axis=-1))  # 2·width
        return taps, (gh, gw)


class CameraHead(nn.Module):
    """Camera tokens → pose encoding [tx ty tz, qx qy qz qw, fov_h fov_w]
    (absT_quaR_FoV) by iterative AdaLN-modulated refinement (the upstream
    camera_head structure: token_norm, embed_pose, poseLN_modulation,
    trunk blocks, trunk_norm, pose_branch)."""

    cfg: VGGTConfig

    @nn.compact
    def __call__(self, cam_tokens):  # (B, F, 2·width)
        c = self.cfg
        d = 2 * c.width
        b, f = cam_tokens.shape[:2]
        h0 = nn.LayerNorm(dtype=c.dtype, name="token_norm")(
            cam_tokens).reshape(b, f, d)
        # identity pose in absT_quaR_FoV: quat xyzw ⇒ w at index 6
        base = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 0.8, 0.8], jnp.float32)
        enc = jnp.zeros((b, f, 9), jnp.float32) + base

        embed_pose = nn.Dense(d, dtype=c.dtype, name="embed_pose")
        modulation = nn.Dense(3 * d, dtype=c.dtype,
                              kernel_init=nn.initializers.zeros,
                              name="poseLN_modulation")
        trunk = [ViTBlock(c.num_heads, dtype=c.dtype, name=f"trunk{i}")
                 for i in range(c.camera_trunk_depth)]
        trunk_norm = nn.LayerNorm(dtype=c.dtype, name="trunk_norm")
        adaln_norm = nn.LayerNorm(use_scale=False, use_bias=False,
                                  dtype=c.dtype, name="adaln_norm")
        branch = Mlp(d // 2, out=9, dtype=jnp.float32, name="pose_branch")

        for _ in range(c.camera_iterations):
            mod = modulation(nn.silu(embed_pose(enc.astype(c.dtype))))
            shift, scale, gate = jnp.split(mod, 3, axis=-1)
            z = adaln_norm(h0) * (1 + scale) + shift
            # upstream adds the gated modulated tokens RESIDUALLY back to
            # the pose tokens, and the trunk attends over the frame axis
            # (B, F, D) so frames refine their poses jointly
            z = h0 + gate * z
            for blk in trunk:
                z = blk(z)
            z = trunk_norm(z)
            enc = enc + branch(z.astype(jnp.float32))
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


class ResidualConvUnit(nn.Module):
    """DPT fusion residual unit: two 3×3 convs with ReLU pre-activations."""

    ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv1")(nn.relu(x))
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv2")(nn.relu(h))
        return x + h


class DPTHead(nn.Module):
    """DPT dense head (upstream depth_head structure): 4 taps → per-tap
    projection convs → resize pyramid → scratch RN convs → refinenet fusion
    → output convs → (value, confidence) at input resolution."""

    cfg: VGGTConfig
    out_channels: int = 1

    @nn.compact
    def __call__(self, taps, grid_hw, out_hw):
        c = self.cfg
        gh, gw = grid_hw
        fe = c.dpt_features

        def resize_to(x, s):
            return jax.image.resize(
                x, (x.shape[0], max(1, int(gh * s)), max(1, int(gw * s)),
                    x.shape[-1]), "bilinear")

        # per-tap: strip special tokens, project, resize to the pyramid level
        outs = []
        scales = (4.0, 2.0, 1.0, 0.5)
        chans = c.dpt_out_channels
        for i, t in enumerate(taps):
            patch = t[:, :, -(gh * gw):, :]
            b, f = patch.shape[:2]
            x = patch.reshape(b * f, gh, gw, patch.shape[-1])
            x = nn.Conv(chans[i], (1, 1), dtype=c.dtype, name=f"project{i}")(x)
            x = resize_to(x, scales[i])
            x = nn.Conv(fe, (3, 3), use_bias=False, dtype=c.dtype,
                        name=f"layer{i + 1}_rn")(x)
            outs.append(x)

        # fusion: coarsest → finest, residual units + upsample
        path = None
        for i in (3, 2, 1, 0):
            x = outs[i]
            if path is not None:
                x = x + jax.image.resize(path, x.shape, "bilinear")
            x = ResidualConvUnit(fe, c.dtype, name=f"refinenet{i + 1}")(x)
            path = x

        h = nn.Conv(fe // 2, (3, 3), dtype=c.dtype, name="output_conv1")(path)
        oh, ow = out_hw
        h = jax.image.resize(h, (h.shape[0], oh, ow, h.shape[-1]), "bilinear")
        h = nn.Conv(32, (3, 3), dtype=c.dtype, name="output_conv2a")(h)
        h = nn.relu(h)
        out = nn.Conv(self.out_channels + 1, (1, 1), dtype=jnp.float32,
                      name="output_conv2b")(h)
        value = out[..., :self.out_channels]
        conf = 1.0 + jax.nn.softplus(out[..., self.out_channels:])
        return value, conf


class VGGT(nn.Module):
    """Full model: images → {pose_enc, depth, depth_conf}."""

    cfg: VGGTConfig

    @nn.compact
    def __call__(self, images):  # (B, F, H, W, 3)
        c = self.cfg
        b, f, h, w = images.shape[:4]
        taps_all, grid_hw = Aggregator(c, name="aggregator")(images)
        # heads consume 4 evenly spaced layer taps (DPT convention)
        k = len(taps_all)
        taps = [taps_all[max(0, (k * i) // 4 - 1)] for i in (1, 2, 3, 4)]
        cam_tokens = taps_all[-1][:, :, 0, :].astype(jnp.float32)  # (B,F,2D)
        pose_enc = CameraHead(c, name="camera_head")(cam_tokens)
        depth, depth_conf = DPTHead(c, 1, name="depth_head")(
            taps, grid_hw, (h, w))
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
