"""SAM family: promptable segmentation (image encoder + prompt encoder +
mask decoder).

Rebuilds the reference's mask head (segmentation.py:616-688 drives
``facebook/sam-vit-huge`` via HF AutoModelForMaskGeneration; the manual
editor drives the raw predictor, manual_editor.py:67-91): box- and
point-prompted masks with IoU predictions, multimask output, the standard
1024² input / 256² mask-logit contract.

TPU notes:
  * SAM's windowed attention was a CUDA memory optimization; the windows are
    kept (weights are identical either way) but global blocks run on the
    Pallas flash kernel. Decomposed relative-position bias is applied in the
    windowed blocks exactly as in SAM (needed for weight parity).
  * The two-way mask decoder is tiny; it runs as plain fused XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import Mlp
from regen3d_tpu.ops.attention import (
    flash_attention,
    flash_attention_grid_bias,
)


@dataclasses.dataclass(frozen=True)
class SamConfig:
    image_size: int = 1024
    patch: int = 16
    width: int = 1280            # ViT-H
    depth: int = 32
    num_heads: int = 16
    window: int = 14
    global_blocks: Tuple[int, ...] = (7, 15, 23, 31)
    prompt_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    # minimum token count for the fused grid-bias flash kernel. Global
    # blocks (64² = 4096 tokens) always qualify; at the default 1024 the
    # 14² = 196-token windowed blocks take the XLA einsum path. Set ≤196
    # to route windows through the kernel too — that skips materializing
    # the (B·25win·16heads, 196, 196) f32 logits + bias (~180 MB of HBM
    # round-trips per windowed block).
    flash_min_tokens: int = 1024

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @classmethod
    def tiny(cls) -> "SamConfig":
        return cls(image_size=64, patch=16, width=64, depth=2, num_heads=4,
                   window=2, global_blocks=(1,), prompt_dim=32)


def _window_partition(x, win):
    b, h, w, c = x.shape
    ph, pw = (-h) % win, (-w) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = x.shape[1] // win, x.shape[2] // win
    x = x.reshape(b, hh, win, ww, win, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * hh * ww, win, win, c), (hh, ww, h, w)


def _window_unpartition(x, win, meta):
    hh, ww, h, w = meta
    b = x.shape[0] // (hh * ww)
    x = x.reshape(b, hh, ww, win, win, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hh * win, ww * win, -1)
    return x[:, :h, :w]


def _rel_pos_bias(q_hw, k_hw, rel_h, rel_w, q):
    """Decomposed relative position bias (SAM-style): returns (B, H, qh*qw, kh*kw)."""
    qh, qw = q_hw
    kh, kw = k_hw

    def get(rel, qs, ks):
        # rel: (2*max-1, head_dim); relative coordinate lookup
        coords = (jnp.arange(qs)[:, None] - jnp.arange(ks)[None, :]) + (ks - 1)
        return rel[coords]  # (qs, ks, d)

    rh = get(rel_h, qh, kh)
    rw = get(rel_w, qw, kw)
    b, heads, _, d = q.shape
    qr = q.reshape(b, heads, qh, qw, d)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, rh)   # (B,H,qh,qw,kh)
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, rw)   # (B,H,qh,qw,kw)
    bias = bias_h[..., :, None] + bias_w[..., None, :]  # (B,H,qh,qw,kh,kw)
    return bias.reshape(b, heads, qh * qw, kh * kw)


def _rel_pos_bias_factored(q_hw, k_hw, rel_h, rel_w, q):
    """The same decomposed bias WITHOUT combining the factors: returns
    bias_h (B, H, S, kh) and bias_w (B, H, S, kw) for the fused
    flash_attention_grid_bias kernel — the (S, S) bias never exists."""
    qh, qw = q_hw
    kh, kw = k_hw

    def get(rel, qs, ks):
        coords = (jnp.arange(qs)[:, None] - jnp.arange(ks)[None, :]) + (ks - 1)
        return rel[coords]

    rh = get(rel_h, qh, kh)
    rw = get(rel_w, qw, kw)
    b, heads, _, d = q.shape
    qr = q.reshape(b, heads, qh, qw, d)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, rh)   # (B,H,qh,qw,kh)
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, rw)   # (B,H,qh,qw,kw)
    return (bias_h.reshape(b, heads, qh * qw, kh),
            bias_w.reshape(b, heads, qh * qw, kw))


class SamAttention(nn.Module):
    """ViT attention with optional decomposed rel-pos bias over a 2D token grid.

    With ``window`` set, attention runs per 14² window (SAM's layout) but the
    qkv/proj projections run ONCE on the full token grid: one MXU-shaped
    M=H·W matmul instead of 25 padded M=196 matmuls (measured: lifts SAM-H
    encode MFU — the windowed blocks' dense projections dominate their
    FLOPs). Exactness: SAM pads the block input with zeros BEFORE qkv, and
    padding the grid first reproduces that (Dense(0) = bias either way)."""

    num_heads: int
    use_rel_pos: bool
    input_hw: Tuple[int, int]
    dtype: jnp.dtype
    flash_min_tokens: int = 1024
    window: Optional[int] = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h0, w0, c = x.shape
        win = self.window
        windowed = bool(win) and (h0 > win or w0 > win)
        if windowed:
            # zero-pad post-norm input to a window multiple (SAM semantics)
            x = jnp.pad(x, ((0, 0), (0, (-h0) % win), (0, (-w0) % win),
                            (0, 0)))
        _, hg, wg, _ = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(
            x.reshape(b, hg * wg, c))
        if windowed:
            qkv, meta = _window_partition(qkv.reshape(b, hg, wg, 3 * c), win)
            nb, h, w = qkv.shape[0], win, win
            qkv = qkv.reshape(nb, h * w, 3 * c)
        else:
            nb, h, w = b, hg, wg
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(nb, h * w, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = hd ** -0.5
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * h - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * w - 1, hd), jnp.float32)
            if h * w >= self.flash_min_tokens:
                # fused kernel: the factored bias stays (S, kh) + (S, kw);
                # the (S, S) logits/bias never reach HBM — the XLA einsum
                # path materialized ~1 GB f32 per SAM-H 64² global block
                bias_h, bias_w = _rel_pos_bias_factored(
                    (h, w), (h, w), rel_h, rel_w,
                    q.astype(jnp.float32) * scale)
                o = flash_attention_grid_bias(q, k, v, bias_h, bias_w, w)
            else:
                # small windows (14²=196 tokens): the quadratic is tiny and
                # XLA's fused softmax wins over kernel tiling overhead
                logits = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                                    preferred_element_type=jnp.float32
                                    ) * scale
                logits = logits + _rel_pos_bias(
                    (h, w), (h, w), rel_h, rel_w,
                    q.astype(jnp.float32) * scale)
                p = jax.nn.softmax(logits, axis=-1)
                o = jnp.einsum("bnqk,bnkd->bnqd", p.astype(v.dtype), v)
        else:
            o = flash_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(nb, h, w, c)
        if windowed:
            o = _window_unpartition(o, win, meta)[:, :h0, :w0]
        # proj on the cropped grid: pads are discarded before the matmul
        o = nn.Dense(c, dtype=self.dtype, name="proj")(
            o.reshape(b, h0 * w0, c))
        return o.reshape(b, h0, w0, c)


class SamBlock(nn.Module):
    cfg: SamConfig
    is_global: bool

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        c = self.cfg
        shortcut = x
        h = nn.LayerNorm(dtype=c.dtype, name="norm1")(x)
        if self.is_global:
            h = SamAttention(c.num_heads, True, (x.shape[1], x.shape[2]),
                             c.dtype, c.flash_min_tokens, name="attn")(h)
        else:
            h = SamAttention(c.num_heads, True, (c.window, c.window),
                             c.dtype, c.flash_min_tokens, window=c.window,
                             name="attn")(h)
        x = shortcut + h
        x = x + Mlp(x.shape[-1] * 4, dtype=c.dtype, name="mlp")(
            nn.LayerNorm(dtype=c.dtype, name="norm2")(x))
        return x


class SamImageEncoder(nn.Module):
    """1024² image → (64, 64, 256) embedding (the SAM neck output)."""

    cfg: SamConfig

    @nn.compact
    def __call__(self, img):  # (B, H, W, 3) in [0,1] (normalization inside)
        c = self.cfg
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (img - mean) / std
        x = nn.Conv(c.width, (c.patch, c.patch), strides=(c.patch, c.patch),
                    dtype=c.dtype, name="patch_embed")(x.astype(c.dtype))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, c.grid, c.grid, c.width), jnp.float32)
        x = x + pos.astype(c.dtype)
        for i in range(c.depth):
            x = SamBlock(c, is_global=(i in c.global_blocks), name=f"block{i}")(x)
        # neck: 1x1 + 3x3 conv to prompt_dim with layernorm
        x = nn.Conv(c.prompt_dim, (1, 1), use_bias=False, dtype=c.dtype,
                    name="neck1")(x)
        x = nn.LayerNorm(dtype=c.dtype, name="neck_ln1")(x)
        x = nn.Conv(c.prompt_dim, (3, 3), use_bias=False, dtype=c.dtype,
                    name="neck2")(x)
        x = nn.LayerNorm(dtype=c.dtype, name="neck_ln2")(x)
        return x


class PromptEncoder(nn.Module):
    """Points/boxes → sparse prompt embeddings; + dense positional grid."""

    cfg: SamConfig

    def setup(self):
        d = self.cfg.prompt_dim
        self.pe_gauss = self.param("pe_gauss", nn.initializers.normal(1.0),
                                   (2, d // 2), jnp.float32)
        # four separate embeddings (pos, neg, box-tl, box-br) — matches the
        # upstream prompt_encoder.point_embeddings.{0..3} checkpoint layout
        self._pes = [self.param(f"point_embed{i}",
                                nn.initializers.normal(0.02), (d,),
                                jnp.float32) for i in range(4)]
        self.not_a_point = self.param("not_a_point",
                                      nn.initializers.normal(0.02), (d,),
                                      jnp.float32)

    @property
    def point_embed(self):
        return jnp.stack(self._pes)

    def _pe(self, coords01):
        """Random-fourier positional encoding of [0,1]² coords → (..., D)."""
        proj = (2.0 * coords01 - 1.0) @ self.pe_gauss * (2 * jnp.pi)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def __call__(self, points, point_labels, boxes):
        """points: (B, P, 2) in [0,1]; labels: (B, P) in {-1 pad, 0 neg, 1 pos};
        boxes: (B, 2, 2) in [0,1] (tl, br) or None-like zeros with label -1.

        Returns sparse embeddings (B, P+2, D).
        """
        pe_pts = self._pe(points)
        lab = point_labels[..., None]
        emb = jnp.where(lab == 1, pe_pts + self.point_embed[0],
                        jnp.where(lab == 0, pe_pts + self.point_embed[1],
                                  self.not_a_point))
        pe_box = self._pe(boxes) + self.point_embed[2:4]
        return jnp.concatenate([emb, pe_box], axis=1)

    def dense_pe(self, grid: int):
        """(grid, grid, D) positional grid for the decoder's image attention."""
        ys = (jnp.arange(grid) + 0.5) / grid
        xs = (jnp.arange(grid) + 0.5) / grid
        g = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        return self._pe(g)


class TwoWayBlock(nn.Module):
    """Mask-decoder block: token self-attn, token→image, MLP, image→token."""

    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, tokens, image, token_pe, image_pe, skip_first_pe=False):
        def attn(name, q, k, v, down=2):
            # upstream: self_attn is FULL-dim, cross attns downsample by 2
            d = q.shape[-1]
            di = d // down
            b = q.shape[0]
            proj = lambda t, nm: nn.Dense(di, dtype=self.dtype,
                                          name=f"{name}_{nm}")(t) \
                .reshape(b, -1, self.num_heads, di // self.num_heads) \
                .transpose(0, 2, 1, 3)
            o = flash_attention(proj(q, "q"), proj(k, "k"), proj(v, "v"))
            o = o.transpose(0, 2, 1, 3).reshape(b, -1, di)
            return nn.Dense(d, dtype=self.dtype, name=f"{name}_out")(o)

        q = tokens if skip_first_pe else tokens + token_pe
        tokens = nn.LayerNorm(dtype=self.dtype, name="ln1")(
            tokens + attn("self", q, q, tokens, down=1))
        q = tokens + token_pe
        k = image + image_pe
        tokens = nn.LayerNorm(dtype=self.dtype, name="ln2")(
            tokens + attn("t2i", q, k, image))
        tokens = nn.LayerNorm(dtype=self.dtype, name="ln3")(
            tokens + Mlp(tokens.shape[-1] * 8, dtype=self.dtype, name="mlp")(tokens))
        image = nn.LayerNorm(dtype=self.dtype, name="ln4")(
            image + attn("i2t", k, q, tokens))
        return tokens, image


class Mlp3(nn.Module):
    """3-layer ReLU MLP (the upstream SAM ``MLP`` with num_layers=3 —
    layers.0/1/2 in the checkpoint; needed for weight-layout parity of the
    hypernetworks and the IoU head)."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="lin0")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="lin1")(x))
        return nn.Dense(self.out, dtype=self.dtype, name="lin2")(x)


class MaskDecoder(nn.Module):
    """Two-way transformer → mask logits (B, 4, 4·grid, 4·grid) + IoU.

    Token 0 is the single-mask output, tokens 1..3 the multimask outputs
    (upstream num_mask_tokens = num_multimask_outputs + 1 = 4; callers pick
    masks[:, 1:] for multimask mode, the HF segment() default)."""

    cfg: SamConfig
    num_masks: int = 4

    @nn.compact
    def __call__(self, image_emb, image_pe, sparse_prompts):
        c = self.cfg
        d = c.prompt_dim
        b, gh, gw, _ = image_emb.shape
        iou_token = self.param("iou_token", nn.initializers.normal(0.02),
                               (1, d), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(0.02),
                                 (self.num_masks, d), jnp.float32)
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None], (b, *out_tokens.shape)),
             sparse_prompts], axis=1).astype(c.dtype)
        token_pe = tokens
        img = image_emb.reshape(b, gh * gw, d)
        img_pe = jnp.broadcast_to(image_pe.reshape(1, gh * gw, d), img.shape)

        for i in range(2):
            tokens, img = TwoWayBlock(8, c.dtype, name=f"block{i}")(
                tokens, img, token_pe, img_pe, skip_first_pe=(i == 0))

        # final token→image attention (upstream final_attn_token_to_image +
        # norm_final_attn — parameterized, so converted weights apply)
        def fattn(q, k, v):
            hd2 = (d // 2) // 8
            proj = lambda t, nm: nn.Dense(d // 2, dtype=c.dtype,
                                          name=f"final_{nm}")(t) \
                .reshape(b, -1, 8, hd2).transpose(0, 2, 1, 3)
            o = flash_attention(proj(q, "q"), proj(k, "k"), proj(v, "v"))
            o = o.transpose(0, 2, 1, 3).reshape(b, -1, d // 2)
            return nn.Dense(d, dtype=c.dtype, name="final_out")(o)

        q = tokens + token_pe
        k = img + img_pe
        tokens = nn.LayerNorm(dtype=c.dtype, name="norm_final")(
            tokens + fattn(q, k, img))

        iou_out = tokens[:, 0]
        mask_toks = tokens[:, 1:1 + self.num_masks]

        # upscale image features 4x
        up = img.reshape(b, gh, gw, d)
        up = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2), dtype=c.dtype,
                              name="up1")(up)
        up = nn.gelu(nn.LayerNorm(dtype=c.dtype, name="up_ln")(up))
        up = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2), dtype=c.dtype,
                              name="up2")(up)
        up = nn.gelu(up)

        hyper = []
        for m in range(self.num_masks):
            hyper.append(Mlp3(d, out=d // 8, dtype=c.dtype, name=f"hyper{m}")(
                mask_toks[:, m]))
        hyper = jnp.stack(hyper, axis=1)  # (B, M, d/8)
        masks = jnp.einsum("bmd,bhwd->bmhw", hyper.astype(jnp.float32),
                           up.astype(jnp.float32))
        iou_pred = Mlp3(d, out=self.num_masks, dtype=jnp.float32,
                        name="iou_head")(iou_out.astype(jnp.float32))
        return masks, iou_pred


class SAM(nn.Module):
    """End-to-end promptable segmentation."""

    cfg: SamConfig

    def setup(self):
        self.encoder = SamImageEncoder(self.cfg, name="image_encoder")
        self.prompts = PromptEncoder(self.cfg, name="prompt_encoder")
        self.decoder = MaskDecoder(self.cfg, name="mask_decoder")

    def __call__(self, img, points, point_labels, boxes):
        emb = self.encoder(img)
        return self.decode(emb, points, point_labels, boxes)

    def encode(self, img):
        return self.encoder(img)

    def decode(self, image_emb, points, point_labels, boxes):
        sparse = self.prompts(points, point_labels, boxes)
        pe = self.prompts.dense_pe(image_emb.shape[1])
        masks, iou = self.decoder(image_emb, pe, sparse)
        return masks, iou
