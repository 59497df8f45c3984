"""Open-vocabulary object detector (phase 1's Grounding-DINO role).

The reference drives ``IDEA-Research/grounding-dino-base`` through the HF
zero-shot-object-detection pipeline (segmentation.py:587-613, threshold
0.25). Deformable attention is a poor fit for the TPU's static-shape
vector model, so this family is an OWL-ViT-style detector — the standard
TPU-native open-vocab architecture: a ViT image encoder producing per-patch
embeddings, a byte-level text transformer producing label embeddings, a
patch↔label similarity head for scores, and a per-patch box head. Same
external contract: ``detect(params, image, labels, threshold) →
[DetectionResult]``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from regen3d_tpu.models.layers import PatchEmbed, TransformerBlock, posemb_sincos_2d
from regen3d_tpu.pipeline.detection import BoundingBox, DetectionResult


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    image_size: int = 768
    patch: int = 16
    width: int = 512
    depth: int = 12
    num_heads: int = 8
    text_width: int = 256
    text_depth: int = 4
    text_len: int = 24
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "DetectorConfig":
        return cls(image_size=64, patch=16, width=64, depth=2, num_heads=4,
                   text_width=32, text_depth=1, text_len=12, embed_dim=32)


def tokenize_bytes(labels: List[str], max_len: int) -> np.ndarray:
    """Self-contained byte-level tokenizer (no external vocab files)."""
    out = np.zeros((len(labels), max_len), np.int32)
    for i, s in enumerate(labels):
        b = s.lower().encode("utf-8")[: max_len - 1]
        out[i, :len(b)] = np.frombuffer(b, np.uint8)
        out[i, len(b)] = 1  # EOS
    return out


class TextEncoder(nn.Module):
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, tokens):  # (L, T) int32 → (L, embed_dim)
        c = self.cfg
        emb = nn.Embed(257, c.text_width, name="byte_embed")(tokens)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (c.text_len, c.text_width), jnp.float32)
        h = emb + pos[None]
        for i in range(c.text_depth):
            h = TransformerBlock(4, dtype=c.dtype, name=f"block{i}")(h)
        h = nn.LayerNorm(name="norm")(h)
        pooled = jnp.mean(h, axis=1)
        z = nn.Dense(c.embed_dim, name="proj")(pooled)
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)


class DetectorImageTower(nn.Module):
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, img):  # (B, S, S, 3) → (B, P, width)
        c = self.cfg
        x, (gh, gw) = PatchEmbed(c.patch, c.width, dtype=c.dtype,
                                 name="patch")(img.astype(c.dtype))
        x = x + posemb_sincos_2d(gh, gw, c.width)[None].astype(c.dtype)
        for i in range(c.depth):
            x = TransformerBlock(c.num_heads, dtype=c.dtype, name=f"block{i}")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(x), (gh, gw)


@functools.lru_cache(maxsize=4)
def _jitted_detector_apply(model: "OpenVocabDetector"):
    """One jitted forward per module instance (flax modules are frozen,
    hashable) — a fresh jit per detect() call recompiles per image."""
    return jax.jit(model.apply)


class OpenVocabDetector(nn.Module):
    cfg: DetectorConfig

    def setup(self):
        c = self.cfg
        self.image_tower = DetectorImageTower(c, name="image")
        self.text_tower = TextEncoder(c, name="text")
        self.patch_proj = nn.Dense(c.embed_dim, name="patch_proj")
        self.box_head = nn.Dense(4, name="box_head")
        self.obj_head = nn.Dense(1, name="obj_head")
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(2.0), ())

    def __call__(self, img, tokens, return_logits: bool = False):
        """Returns (scores (B, P, L), boxes (B, P, 4) cxcywh in [0,1]).

        With ``return_logits`` (the distillation trainer's path —
        pipeline/detector_distill.py) the pre-sigmoid similarity and
        objectness logits come back instead of the fused score."""
        feats, (gh, gw) = self.image_tower(img)
        z_img = self.patch_proj(feats)
        z_img = z_img / jnp.maximum(
            jnp.linalg.norm(z_img, axis=-1, keepdims=True), 1e-8)
        z_txt = self.text_tower(tokens)  # (L, E)
        sim = jnp.einsum("bpe,le->bpl", z_img, z_txt) * jnp.exp(self.logit_scale)
        obj = self.obj_head(feats)       # (B, P, 1) objectness
        # box head: per-patch offset from the patch centre (cx, cy, w, h)
        ys = (jnp.arange(gh) + 0.5) / gh
        xs = (jnp.arange(gw) + 0.5) / gw
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
        raw = self.box_head(feats)
        cxcy = jax.nn.sigmoid(raw[..., :2]) * 0.5 - 0.25 + grid[None]
        wh = jax.nn.sigmoid(raw[..., 2:])
        boxes = jnp.concatenate([cxcy, wh], axis=-1)
        if return_logits:
            return sim, obj, boxes
        scores = jax.nn.sigmoid(sim) * jax.nn.sigmoid(obj)
        return scores, boxes

    # --- host API used by phase 1 --------------------------------------------
    def detect(self, params, image: np.ndarray, labels: List[str],
               threshold: float = 0.25, max_dets: int = 32
               ) -> List[DetectionResult]:
        import jax.image as jimage

        c = self.cfg
        h, w = image.shape[:2]
        img = np.asarray(jimage.resize(
            jnp.asarray(image, jnp.float32) / 255.0,
            (c.image_size, c.image_size, 3), "bilinear"))[None]
        tokens = jnp.asarray(tokenize_bytes(labels, c.text_len))
        scores, boxes = _jitted_detector_apply(self)(params, jnp.asarray(img),
                                                     tokens)
        scores = np.asarray(scores)[0]   # (P, L)
        boxes = np.asarray(boxes)[0]     # (P, 4)
        out: List[DetectionResult] = []
        flat = scores.reshape(-1)
        order = np.argsort(flat)[::-1][:max_dets]
        for idx in order:
            p, l = divmod(int(idx), len(labels))
            s = float(flat[idx])
            if s < threshold:
                break
            cx, cy, bw, bh = boxes[p]
            out.append(DetectionResult(
                score=s, label=labels[l],
                box=BoundingBox((cx - bw / 2) * w, (cy - bh / 2) * h,
                                (cx + bw / 2) * w, (cy + bh / 2) * h)))
        return out
