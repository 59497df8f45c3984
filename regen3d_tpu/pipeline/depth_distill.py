"""Depth distillation: train DepthAnything so the depth artifact stops
being a luminance prior.

The reference's ``depth_from_image`` (global_utils.py:357-418) runs
Marigold or Depth-Anything-V2; in this zero-egress image neither
checkpoint exists, so every real run falls back to the luminance +
vertical-gradient prior in `pipeline/depth.py` (round-2 verdict weak #6:
"brightness = height fiction"). This module trains the real
DepthAnything architecture (models/depth_anything.py — the family that
converted checkpoints load into) on SYNTHETIC indoor scenes whose depth
is EXACT: random rooms (floor, back/side walls, boxes) are built in view
space, shaded with per-face lambert, and rasterized with the repo's own
z-buffer (`ops.rasterize.rasterize_hard`), whose `Fragments.depth` is the
ground truth. When a real checkpoint lands it replaces this one with no
code changes; until then the depth artifact is at least *depth-shaped*
(occlusion edges, floor gradient, box fronts) rather than luminance.

Training target is normalized DISPARITY (1/z), matching Depth-Anything's
output convention; the loss is the MiDaS scale-&-shift-invariant MSE plus
a multi-scale gradient term, so the net learns relative structure.

Checkpoints ride the standard orbax path plus a ``config.json`` sidecar
recording the architecture dims (read back by `pipeline.depth.run`).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regen3d_tpu.models.depth_anything import DepthAnything, DepthAnythingConfig

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# synthetic rooms with exact z-buffer depth
# ---------------------------------------------------------------------------

def _quad(p0, p1, p2, p3):
    """Two triangles for the quad p0-p1-p2-p3 (in order)."""
    return [[p0, p1, p2], [p0, p2, p3]]


def _box_tris(cx, cz, w, h, d):
    """Axis-aligned box sitting on the floor (y=+1 plane is 'down' in view
    space with +Y down); returns list of (3, 3) view-space triangles."""
    x0, x1 = cx - w / 2, cx + w / 2
    z0, z1 = cz - d / 2, cz + d / 2
    y0, y1 = 1.0 - h, 1.0            # floor at y=+1, box extends up
    tris = []
    tris += _quad([x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0])
    tris += _quad([x0, y0, z0], [x0, y0, z1], [x0, y1, z1], [x0, y1, z0])
    tris += _quad([x1, y0, z0], [x1, y0, z1], [x1, y1, z1], [x1, y1, z0])
    tris += _quad([x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1])
    return tris


def _room_tris(rng) -> Tuple[np.ndarray, np.ndarray]:
    """Random room in VIEW space (+Y down, +Z forward, camera at origin).

    Returns (tris (F, 3, 3) float32, albedo (F, 3) float32)."""
    zback = rng.uniform(4.0, 7.0)
    half = rng.uniform(1.6, 2.6)
    tris, alb = [], []

    def add(ts, color, jitter=0.06):
        for t in ts:
            tris.append(t)
            alb.append(np.clip(color + rng.normal(0, jitter, 3), 0.05, 1.0))

    floor_c = rng.uniform(0.25, 0.7, 3)
    wall_c = rng.uniform(0.5, 0.9, 3)
    add(_quad([-half * 2, 1.0, 0.3], [half * 2, 1.0, 0.3],
              [half * 2, 1.0, zback], [-half * 2, 1.0, zback]), floor_c)
    add(_quad([-half * 2, 1.0, zback], [half * 2, 1.0, zback],
              [half * 2, -2.0, zback], [-half * 2, -2.0, zback]), wall_c)
    add(_quad([-half, 1.0, 0.3], [-half, 1.0, zback],
              [-half, -2.0, zback], [-half, -2.0, 0.3]), wall_c * 0.9)
    add(_quad([half, 1.0, 0.3], [half, 1.0, zback],
              [half, -2.0, zback], [half, -2.0, 0.3]), wall_c * 0.85)

    for _ in range(rng.integers(1, 4)):
        cz = rng.uniform(1.6, zback - 0.8)
        cx = rng.uniform(-half * 0.7, half * 0.7)
        bw = rng.uniform(0.3, 0.9)
        bh = rng.uniform(0.3, 1.1)
        bd = rng.uniform(0.3, 0.9)
        add(_box_tris(cx, cz, bw, bh, bd), rng.uniform(0.1, 0.95, 3))

    return (np.asarray(tris, np.float32), np.asarray(alb, np.float32))


_MAX_FACES = 64


def _pad_faces(tris, alb, n=_MAX_FACES):
    f = len(tris)
    if f < n:
        pad_t = np.full((n - f, 3, 3), [0.0, 0.0, -1.0], np.float32)
        tris = np.concatenate([tris, pad_t])
        alb = np.concatenate([alb, np.zeros((n - f, 3), np.float32)])
    return tris[:n], alb[:n], min(f, n)


def _render_room(tris, alb, nfaces, size, light, fov_f):
    """jit-able: view-space tris → (rgb (S,S,3), disparity (S,S))."""
    from regen3d_tpu.ops.rasterize import rasterize_hard

    s = size
    fx = fy = fov_f * s
    cx = cy = s / 2.0
    v = tris.reshape(-1, 3)                     # (3F, 3)
    z = jnp.maximum(v[:, 2], 1e-3)
    u = cx + fx * v[:, 0] / z
    vv = cy + fy * v[:, 1] / z
    verts_screen = jnp.stack([u, vv, v[:, 2]], -1)
    faces = jnp.arange(tris.shape[0] * 3, dtype=jnp.int32).reshape(-1, 3)
    fmask = jnp.arange(tris.shape[0]) < nfaces
    frag = rasterize_hard(verts_screen, faces, (s, s), faces_mask=fmask,
                          chunk=64)
    # lambert shading from geometric normals + a headlight-ish key light
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    lam = 0.35 + 0.65 * jnp.abs(n @ light)
    shade = alb * lam[:, None]                  # (F, 3)
    fid = jnp.maximum(frag.face_idx, 0)
    rgb = jnp.where((frag.face_idx >= 0)[..., None], shade[fid], 1.0)
    disp = jnp.where(jnp.isfinite(frag.depth), 1.0 / frag.depth, 0.0)
    return rgb, disp


def synth_depth_batch(rng: np.random.Generator, batch: int, size: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(rgb (B,S,S,3) in [0,1], disparity (B,S,S) normalized to [0,1])."""
    render = jax.jit(_render_room, static_argnums=(2, 3))
    imgs = np.zeros((batch, size, size, 3), np.float32)
    disps = np.zeros((batch, size, size), np.float32)
    for i in range(batch):
        tris, alb = _room_tris(rng)
        tris, alb, nf = _pad_faces(tris, alb)
        light = rng.normal(size=3)
        light[2] = -abs(light[2]) - 0.5
        light /= np.linalg.norm(light)
        fov_f = rng.uniform(0.6, 1.1)
        rgb, disp = render(jnp.asarray(tris), jnp.asarray(alb), nf, size,
                           jnp.asarray(light, jnp.float32), float(fov_f))
        rgb = np.asarray(rgb)
        rgb = np.clip(rgb + rng.normal(0, 0.01, rgb.shape), 0, 1)
        disp = np.asarray(disp)
        lo, hi = disp.min(), disp.max()
        imgs[i] = rgb
        disps[i] = (disp - lo) / max(hi - lo, 1e-9)
    return imgs, disps


# ---------------------------------------------------------------------------
# MiDaS-style scale-&-shift-invariant loss
# ---------------------------------------------------------------------------

def _ssi_align(pred, target):
    """Per-image least-squares (scale, shift) aligning pred → target."""
    p = pred.reshape(pred.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    pm = p.mean(1, keepdims=True)
    tm = t.mean(1, keepdims=True)
    cov = ((p - pm) * (t - tm)).mean(1, keepdims=True)
    var = ((p - pm) ** 2).mean(1, keepdims=True)
    s = cov / jnp.maximum(var, 1e-9)
    b = tm - s * pm
    return (s * p + b).reshape(pred.shape)


def ssi_loss(pred, target):
    """Scale/shift-invariant MSE + 2-scale gradient matching (MiDaS)."""
    a = _ssi_align(pred, target)
    mse = jnp.mean((a - target) ** 2)
    g = 0.0
    x, t = a, target
    for _ in range(2):
        gx = jnp.abs(jnp.diff(x, axis=-1) - jnp.diff(t, axis=-1)).mean()
        gy = jnp.abs(jnp.diff(x, axis=-2) - jnp.diff(t, axis=-2)).mean()
        g = g + gx + gy
        x = x[:, ::2, ::2]
        t = t[:, ::2, ::2]
    return mse + 0.5 * g


def ssi_rmse(pred: np.ndarray, target: np.ndarray) -> float:
    """Eval metric: RMSE after per-image scale/shift alignment."""
    a = np.asarray(_ssi_align(jnp.asarray(pred)[None],
                              jnp.asarray(target)[None]))[0]
    return float(np.sqrt(np.mean((a - target) ** 2)))


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def micro_config(size: int = 112) -> DepthAnythingConfig:
    """A CPU-trainable DepthAnything (same arch class the converted
    checkpoint uses, smaller dims)."""
    return DepthAnythingConfig(image_size=size, patch=14, width=64, depth=4,
                               num_heads=4, out_idx=(0, 1, 2, 3),
                               features=16, out_channels=(8, 16, 32, 64))


def distill_depth(
    cfg: Optional[DepthAnythingConfig] = None,
    steps: int = 400,
    batch: int = 8,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 50,
):
    """Train DepthAnything on synthetic rooms; returns (params, model)."""
    cfg = cfg or micro_config()
    model = DepthAnything(cfg)
    rng = np.random.default_rng(seed)
    s = cfg.image_size
    imgs0, _ = synth_depth_batch(rng, 1, s)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(imgs0))
    opt = optax.adamw(optax.cosine_decay_schedule(lr, steps), b1=0.9,
                      b2=0.95, weight_decay=1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, disps):
        def loss_fn(p):
            pred = model.apply(p, imgs).astype(jnp.float32)
            return ssi_loss(pred, disps)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        imgs, disps = synth_depth_batch(rng, batch, s)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(imgs),
                                       jnp.asarray(disps))
        if log_every and (i % log_every == 0 or i == steps - 1):
            log.info("depth distill step %d/%d loss %.4f", i, steps,
                     float(loss))
    return params, model


def save_depth_checkpoint(path: str, params, cfg: DepthAnythingConfig
                          ) -> None:
    """Orbax params + config.json sidecar (read by pipeline.depth.run)."""
    from regen3d_tpu.models.weights import save_checkpoint
    save_checkpoint(path, jax.tree.map(np.asarray, params))
    d = dataclasses.asdict(cfg)
    d.pop("dtype", None)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(d, f)


def load_depth_checkpoint(path: str):
    """→ (params, DepthAnything) honoring the config.json sidecar."""
    from regen3d_tpu.models.weights import load_checkpoint
    cfg_path = os.path.join(path, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            d = json.load(f)
        d["out_idx"] = tuple(d["out_idx"])
        d["out_channels"] = tuple(d["out_channels"])
        cfg = DepthAnythingConfig(**d)
    else:
        cfg = DepthAnythingConfig.small()
    return load_checkpoint(path), DepthAnything(cfg)


def luminance_prior(image01: np.ndarray) -> np.ndarray:
    """The offline fallback (pipeline/depth.py estimate_depth) — baseline
    to beat; (H, W, 3) float [0,1] → (H, W) in [0,1]."""
    h = image01.shape[0]
    rows = np.linspace(1.0, 0.2, h)[:, None]
    lum = image01.mean(-1)
    d = 0.8 * rows + 0.2 * (1.0 - np.abs(lum - np.median(lum)))
    return ((d - d.min()) / max(d.max() - d.min(), 1e-9)).astype(np.float32)
