"""Host-side image utilities: IO, normalization, mask ops, crops, GIF.

Covers the reference's input normalizer (webp/jpg→PNG alpha-over-white,
≤1280 resize — segmentation.py:762-821,1109-1117), mask erosion
(extract_pc_object.py:66-126), finding crops (save_masked_findings,
segmentation.py:828-906), and GIF writing for optimization previews.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def load_image_rgb(path: str, max_side: Optional[int] = 1280) -> np.ndarray:
    """Any format → RGB uint8 array; alpha composited over white; resized so
    the longest side ≤ max_side (reference default 1280)."""
    img = Image.open(path)
    if img.mode in ("RGBA", "LA", "P"):
        img = img.convert("RGBA")
        bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
        img = Image.alpha_composite(bg, img)
    img = img.convert("RGB")
    if max_side and max(img.size) > max_side:
        scale = max_side / max(img.size)
        img = img.resize((round(img.width * scale), round(img.height * scale)),
                         Image.LANCZOS)
    return np.asarray(img)


def save_image(path: str, arr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.0 + 1e-6 else arr,
                      0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_mask(path: str) -> np.ndarray:
    """Grayscale mask PNG → bool (H, W)."""
    return np.asarray(Image.open(path).convert("L")) > 127


def mask_from_finding(path: str, white_thr: int = 250) -> np.ndarray:
    """Binary mask from a white-background finding PNG: non-white pixels
    (reference: extract_pc_object.py:66-126)."""
    rgb = np.asarray(Image.open(path).convert("RGB"))
    return ~np.all(rgb >= white_thr, axis=-1)


def erode_mask(mask: np.ndarray, pixels: int = 4, iterations: int = 4) -> np.ndarray:
    """Erode with a (2p+1)² box kernel, `iterations` times
    (mask_shrink_pixels/iterations, config.yaml:265-267)."""
    try:
        import cv2
        kernel = np.ones((2 * pixels + 1, 2 * pixels + 1), np.uint8)
        out = cv2.erode(mask.astype(np.uint8), kernel, iterations=iterations)
        return out.astype(bool)
    except ImportError:
        out = mask.copy()
        for _ in range(iterations * pixels):
            inner = out[1:-1, 1:-1]
            inner &= out[:-2, 1:-1] & out[2:, 1:-1] & out[1:-1, :-2] & out[1:-1, 2:]
            shr = np.zeros_like(out)
            shr[1:-1, 1:-1] = inner
            out = shr
        return out


def dilate_mask(mask: np.ndarray, pixels: int = 3) -> np.ndarray:
    try:
        import cv2
        kernel = np.ones((2 * pixels + 1, 2 * pixels + 1), np.uint8)
        return cv2.dilate(mask.astype(np.uint8), kernel).astype(bool)
    except ImportError:
        out = mask.copy()
        for _ in range(pixels):
            grown = out.copy()
            grown[1:, :] |= out[:-1, :]
            grown[:-1, :] |= out[1:, :]
            grown[:, 1:] |= out[:, :-1]
            grown[:, :-1] |= out[:, 1:]
            out = grown
        return out


def mask_centroid(mask: np.ndarray) -> Tuple[int, int]:
    """Integer (cx, cy) pixel centroid — the identity half of the
    `<label>__(cx, cy)` finding-name contract."""
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return 0, 0
    return int(round(xs.mean())), int(round(ys.mean()))


def mask_bbox(mask: np.ndarray) -> Tuple[int, int, int, int]:
    """(x0, y0, x1, y1) inclusive-exclusive bounds."""
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return 0, 0, 0, 0
    return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1


def masked_on_white(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Object pixels on a white background (the finding PNG format,
    save_masked_findings, segmentation.py:828-906)."""
    out = np.full_like(image, 255)
    out[mask] = image[mask]
    return out


def padded_crop(image: np.ndarray, bbox: Tuple[int, int, int, int],
                padding: int = 5) -> np.ndarray:
    x0, y0, x1, y1 = bbox
    h, w = image.shape[:2]
    x0 = max(0, x0 - padding)
    y0 = max(0, y0 - padding)
    x1 = min(w, x1 + padding)
    y1 = min(h, y1 + padding)
    return image[y0:y1, x0:x1]


def draw_outline(image: np.ndarray, mask: np.ndarray,
                 color: Sequence[int] = (255, 0, 0), thickness: int = 3,
                 offset_px: int = 5) -> np.ndarray:
    """Red contour around a (dilated) mask — the 'banana' prompt image
    (save_findings_banana, segmentation.py:915-1028)."""
    grown = dilate_mask(mask, offset_px)
    ring = dilate_mask(grown, thickness) & ~grown
    out = image.copy()
    out[ring] = color
    return out


def draw_bbox(image: np.ndarray, bbox: Tuple[int, int, int, int],
              color: Sequence[int] = (255, 0, 0), thickness: int = 2,
              padding: int = 6) -> np.ndarray:
    x0, y0, x1, y1 = bbox
    h, w = image.shape[:2]
    x0 = max(0, x0 - padding)
    y0 = max(0, y0 - padding)
    x1 = min(w - 1, x1 + padding)
    y1 = min(h - 1, y1 + padding)
    out = image.copy()
    for t in range(thickness):
        out[max(0, y0 - t), x0:x1] = color
        out[min(h - 1, y1 + t), x0:x1] = color
        out[y0:y1, max(0, x0 - t)] = color
        out[y0:y1, min(w - 1, x1 + t)] = color
    return out


def segmentation_layout(image: np.ndarray, mask: np.ndarray,
                        panel_scale: float = 1.0) -> np.ndarray:
    """Side-by-side 'application UI' canvas: original with the object
    outlined on the left, empty white 'Extracted Object' panel on the right
    (reference: create_segmentation_layout, global_utils.py:18-190 — the
    prompt canvas for the AQ amodal-extraction path)."""
    h, w = image.shape[:2]
    left = draw_outline(image, mask)
    panel_w = int(w * panel_scale)
    canvas = np.full((h + 40, w + panel_w + 30, 3), 240, np.uint8)
    canvas[30:30 + h, 10:10 + w] = left
    canvas[30:30 + h, w + 20:w + 20 + panel_w] = 255
    return canvas


def extract_layout_panel(layout: np.ndarray, orig_hw: Tuple[int, int],
                         panel_scale: float = 1.0) -> np.ndarray:
    """Inverse of :func:`segmentation_layout`: crop the returned 'Extracted
    Object' panel (reference: extract_AQ_object, global_utils.py:193-257)."""
    h, w = orig_hw
    panel_w = int(w * panel_scale)
    return layout[30:30 + h, w + 20:w + 20 + panel_w]


def save_gif(path: str, frames: List[np.ndarray], fps: int = 10) -> None:
    """Optimization-preview GIF (reference: per-object GIFs,
    pose_matching_planar.py:1687-1716)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imgs = []
    for f in frames:
        if f.dtype != np.uint8:
            f = np.clip(f * 255.0 if f.max() <= 1.0 + 1e-6 else f,
                        0, 255).astype(np.uint8)
        imgs.append(Image.fromarray(f))
    if imgs:
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
