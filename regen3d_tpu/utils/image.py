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


def load_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) loader → (H, W, 3) float32 linear.

    Supports the common '-Y H +X W' layout with new-style RLE scanlines
    (what HDRI-haven files use — the reference's hdri_path assets,
    config.yaml:370-371). No dependency on imageio/OpenCV."""
    with open(path, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError("not a Radiance HDR file")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n"):
                break
        dims = f.readline().split()
        if dims[0] != b"-Y" or dims[2] != b"+X":
            raise ValueError(f"unsupported HDR layout: {dims}")
        h, w = int(dims[1]), int(dims[3])
        data = f.read()

    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if (pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2
                and (data[pos + 2] << 8 | data[pos + 3]) == w):
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = data[pos]
                    pos += 1
                    if count > 128:           # run
                        rgbe[y, x:x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:                      # literal
                        rgbe[y, x:x + count, c] = np.frombuffer(
                            data, np.uint8, count, pos)
                        pos += count
                        x += count
        else:                                  # flat scanline
            row = np.frombuffer(data, np.uint8, w * 4, pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 136), 0.0)
    return (rgbe[..., :3].astype(np.float32) * scale[..., None]
            ).astype(np.float32)


def save_hdr(path: str, img: np.ndarray) -> None:
    """Write a float32 linear image as flat (non-RLE) Radiance HDR."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    m = img.max(axis=-1)
    exp = np.where(m > 1e-32, np.floor(np.log2(np.maximum(m, 1e-32))) + 1, 0)
    # mantissa = c / 2^e * 256 = c * 2^(8-e)
    scale = np.where(m > 1e-32, np.ldexp(1.0, (8 - exp).astype(np.int32)),
                     0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(m > 1e-32, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
