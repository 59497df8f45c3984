"""Shape-generator distillation: train the flagship image→3D stack on
synthetic parametric furniture with ANALYTIC SDFs.

The reference's phase 3 is ``Hunyuan3DDiTFlowMatchingPipeline`` →
octree SDF decode → marching cubes (src/2d_to_3d_models/run.py:67-105).
In this zero-egress image the Hunyuan checkpoint cannot land, so every
measured e2e run generated geometry from RANDOM weights (round-3 verdict
missing #2: "noise-blob meshes; Chamfer parity unmeasurable"). This
module trains the real serving stack — ``CondEncoder`` → ``ShapeDiT``
(rectified flow) → ``ShapeDecoder`` (SDF cross-attention) — end to end
on procedurally generated furniture (boxes / tables / chairs / stools /
shelves / sofas / lamps as unions of axis-aligned boxes and vertical
cylinders) whose signed distance is exact, following the same
synthetic-teacher recipe as the detector/depth/saliency distillations.

Two stages:

  A. **Shape autoencoder** — the vecset ``ShapeEncoder`` (surface points
     → latent tokens) + ``ShapeDecoder`` (latents × query → SDF) trained
     on truncated-SDF regression, with a mild latent-moment regularizer
     so the token set is roughly unit-scale for stage B.
  B. **Conditional rectified flow** — ``CondEncoder`` (rendered RGBA
     object view → tokens) + ``ShapeDiT`` trained with the repo's
     flow-matching objective on the stage-A latents, normalized
     per-channel; the exact normalization is FOLDED into the decoder's
     ``lat_in`` affine at save time (dec'(z) ≡ dec(z·σ+μ)), so the
     serving path (`phase3_assets._jitted_generate`) runs unchanged.

When a real converted Hunyuan checkpoint lands it replaces this one with
no code changes; until then phase 3 produces *furniture-shaped* geometry
and the e2e Chamfer-vs-true-GT number is meaningful.

Checkpoint: a single ``.npz`` (f16 leaves + a JSON config entry) read by
:func:`load_generator`; wired via the ``shape_checkpoint`` config key
(default ``checkpoints/shape_distilled.npz`` at the repo root).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regen3d_tpu.models.dit import DiTConfig, ShapeDiT
from regen3d_tpu.models.shapevae import (
    ShapeDecoder,
    ShapeEncoder,
    ShapeVAEConfig,
)

log = logging.getLogger(__name__)


# ===========================================================================
# Parametric furniture grammar (unions of AA boxes + vertical cylinders)
# ===========================================================================

FAMILIES = ("box", "table", "chair", "stool", "shelf", "sofa", "lamp")
FAMILY_P = (0.25, 0.17, 0.15, 0.10, 0.12, 0.13, 0.08)

_CYL_SEGS = 12
_F_PAD = 160  # max part-mesh faces over the grammar (lamp: 3 cyls = 144)


@dataclasses.dataclass
class ShapeSpec:
    """boxes: (Nb, 6) [cx cy cz hx hy hz]; cyls: (Nc, 5) [cx cy cz r hh]
    (vertical, y-axis). All axis-aligned, normalized to fit ~[-0.85,0.85]³."""

    boxes: np.ndarray
    cyls: np.ndarray
    family: str


def _u(rng, a, b):
    return float(rng.uniform(a, b))


def sample_spec(rng: np.random.Generator) -> ShapeSpec:
    fam = rng.choice(FAMILIES, p=FAMILY_P)
    boxes: List[List[float]] = []
    cyls: List[List[float]] = []

    def box(cx, cy, cz, hx, hy, hz):
        boxes.append([cx, cy, cz, hx, hy, hz])

    def cyl(cx, cy, cz, r, hh):
        cyls.append([cx, cy, cz, r, hh])

    if fam == "box":
        w, h, d = _u(rng, .5, 1.6), _u(rng, .5, 1.6), _u(rng, .5, 1.6)
        box(0, h / 2, 0, w / 2, h / 2, d / 2)
    elif fam == "table":
        h = _u(rng, .7, 1.1)
        w, d, t = _u(rng, 1.0, 2.0), _u(rng, .6, 1.4), _u(rng, .06, .12)
        box(0, h - t / 2, 0, w / 2, t / 2, d / 2)
        if rng.random() < 0.25:
            cyl(0, (h - t) / 2, 0, _u(rng, .08, .2), (h - t) / 2)
            cyl(0, .03, 0, _u(rng, .3, .5), .03)
        else:
            a = _u(rng, .04, .09)
            for sx in (-1, 1):
                for sz in (-1, 1):
                    box(sx * (w / 2 - a), (h - t) / 2, sz * (d / 2 - a),
                        a, (h - t) / 2, a)
    elif fam == "chair":
        h = _u(rng, .4, .55)
        w, d = _u(rng, .45, .7), _u(rng, .45, .7)
        bh = _u(rng, .4, .7)
        box(0, h - .04, 0, w / 2, .04, d / 2)                    # seat
        box(0, h + bh / 2, -d / 2 + .03, w / 2, bh / 2, .03)     # back
        a = _u(rng, .03, .05)
        for sx in (-1, 1):
            for sz in (-1, 1):
                box(sx * (w / 2 - a), (h - .08) / 2, sz * (d / 2 - a),
                    a, (h - .08) / 2, a)
    elif fam == "stool":
        h = _u(rng, .5, .8)
        cyl(0, h - .04, 0, _u(rng, .25, .4), .04)
        cyl(0, (h - .08) / 2, 0, _u(rng, .05, .12), (h - .08) / 2)
        cyl(0, .03, 0, _u(rng, .25, .4), .03)
    elif fam == "shelf":
        w, h, d = _u(rng, .8, 1.6), _u(rng, 1.2, 2.0), _u(rng, .3, .5)
        t = .04
        box(-(w / 2 - t), h / 2, 0, t, h / 2, d / 2)             # sides
        box(w / 2 - t, h / 2, 0, t, h / 2, d / 2)
        box(0, h / 2, -d / 2 + t, w / 2, h / 2, t)               # back
        for i in range(int(rng.integers(3, 6))):
            y = h * (i + 0.5) / 5.0 + _u(rng, -.03, .03)
            box(0, y, 0, w / 2, t / 2, d / 2)
    elif fam == "sofa":
        w, d = _u(rng, 1.4, 2.2), _u(rng, .8, 1.0)
        box(0, .3, 0, w / 2, .3, d / 2)                          # base
        box(0, .75, -d / 2 + .12, w / 2, .45, .12)               # back
        for sx in (-1, 1):
            box(sx * (w / 2 - .12), .55, 0, .12, .25, d / 2)     # arms
    else:  # lamp
        h = _u(rng, 1.2, 1.8)
        cyl(0, h / 2, 0, .04, h / 2)
        cyl(0, .04, 0, _u(rng, .25, .4), .04)
        cyl(0, h - .1, 0, _u(rng, .25, .45), _u(rng, .15, .3))

    b = np.asarray(boxes, np.float32).reshape(-1, 6)
    c = np.asarray(cyls, np.float32).reshape(-1, 5)
    # normalize: center the union AABB at the origin, max half-extent → s
    los, his = [], []
    if len(b):
        los.append((b[:, :3] - b[:, 3:]).min(0))
        his.append((b[:, :3] + b[:, 3:]).max(0))
    if len(c):
        los.append(np.stack([c[:, 0] - c[:, 3], c[:, 1] - c[:, 4],
                             c[:, 2] - c[:, 3]], -1).min(0))
        his.append(np.stack([c[:, 0] + c[:, 3], c[:, 1] + c[:, 4],
                             c[:, 2] + c[:, 3]], -1).max(0))
    lo = np.min(los, 0)
    hi = np.max(his, 0)
    center = (lo + hi) / 2
    scale = _u(rng, .6, .85) / max(float((hi - lo).max()) / 2, 1e-6)
    if len(b):
        b[:, :3] = (b[:, :3] - center) * scale
        b[:, 3:] *= scale
    if len(c):
        c[:, :3] = (c[:, :3] - center) * scale
        c[:, 3:] *= scale
    return ShapeSpec(boxes=b, cyls=c, family=str(fam))


def spec_sdf(spec: ShapeSpec, pts: np.ndarray) -> np.ndarray:
    """Exact union SDF at pts (N, 3) → (N,). Outside positive."""
    d = np.full(len(pts), 1e9, np.float32)
    for cx, cy, cz, hx, hy, hz in spec.boxes:
        q = np.abs(pts - [cx, cy, cz]) - [hx, hy, hz]
        outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
        inside = np.minimum(q.max(-1), 0.0)
        d = np.minimum(d, outside + inside)
    for cx, cy, cz, r, hh in spec.cyls:
        dr = np.hypot(pts[:, 0] - cx, pts[:, 2] - cz) - r
        dy = np.abs(pts[:, 1] - cy) - hh
        q = np.stack([dr, dy], -1)
        outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
        inside = np.minimum(q.max(-1), 0.0)
        d = np.minimum(d, outside + inside)
    return d.astype(np.float32)


def _box_mesh(cx, cy, cz, hx, hy, hz) -> np.ndarray:
    x0, x1, y0, y1, z0, z1 = cx - hx, cx + hx, cy - hy, cy + hy, cz - hz, cz + hz
    v = np.asarray([[x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
                    [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1]],
                   np.float32)
    f = np.asarray([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                    [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                    [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], np.int32)
    return v[f]


def _cyl_mesh(cx, cy, cz, r, hh, segs: int = _CYL_SEGS) -> np.ndarray:
    th = np.linspace(0, 2 * np.pi, segs, endpoint=False)
    x = cx + r * np.cos(th)
    z = cz + r * np.sin(th)
    lo = np.stack([x, np.full(segs, cy - hh), z], -1).astype(np.float32)
    hi = np.stack([x, np.full(segs, cy + hh), z], -1).astype(np.float32)
    tris = []
    clo = np.asarray([cx, cy - hh, cz], np.float32)
    chi = np.asarray([cx, cy + hh, cz], np.float32)
    for i in range(segs):
        j = (i + 1) % segs
        tris.append([lo[i], hi[i], hi[j]])
        tris.append([lo[i], hi[j], lo[j]])
        tris.append([clo, lo[j], lo[i]])
        tris.append([chi, hi[i], hi[j]])
    return np.asarray(tris, np.float32)


def spec_mesh(spec: ShapeSpec) -> Tuple[np.ndarray, np.ndarray]:
    """(tris (F, 3, 3), part_id (F,)) for rendering / surface sampling."""
    tris, pid = [], []
    p = 0
    for row in spec.boxes:
        t = _box_mesh(*row)
        tris.append(t)
        pid.append(np.full(len(t), p))
        p += 1
    for row in spec.cyls:
        t = _cyl_mesh(*row)
        tris.append(t)
        pid.append(np.full(len(t), p))
        p += 1
    return (np.concatenate(tris).astype(np.float32),
            np.concatenate(pid).astype(np.int32))


def spec_surface_points(spec: ShapeSpec, rng: np.random.Generator,
                        n: int) -> np.ndarray:
    """n area-weighted samples on the UNION surface (parts' surfaces with
    interior-of-another-part samples rejected)."""
    tris, _ = spec_mesh(spec)
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    p_face = area / area.sum()
    out: List[np.ndarray] = []
    need = n
    for _ in range(4):
        m = max(need * 2, 64)
        fi = rng.choice(len(tris), m, p=p_face)
        r1 = np.sqrt(rng.random(m, dtype=np.float32))
        r2 = rng.random(m, dtype=np.float32).astype(np.float32)
        pts = ((1 - r1)[:, None] * tris[fi, 0]
               + (r1 * (1 - r2))[:, None] * tris[fi, 1]
               + (r1 * r2)[:, None] * tris[fi, 2])
        keep = spec_sdf(spec, pts) > -1e-3
        out.append(pts[keep])
        need = n - sum(len(o) for o in out)
        if need <= 0:
            break
    pts = np.concatenate(out)
    if len(pts) < n:  # degenerate grammar corner: pad by repetition
        reps = int(np.ceil(n / max(len(pts), 1)))
        pts = np.tile(pts, (reps, 1))
    return pts[:n].astype(np.float32)


# ===========================================================================
# Condition-image rendering (the prepped-object RGBA contract of phase 3)
# ===========================================================================

def _render_rgba(tris, alb, fmask, eye, right, up, fwd, f_px, size,
                 light, lam_mix):
    """jit-able single-view render: world tris → RGBA (S, S, 4)."""
    from regen3d_tpu.ops.rasterize import rasterize_hard

    s = size
    v = tris.reshape(-1, 3) - eye
    x = v @ right
    y = v @ up
    z = jnp.maximum(v @ fwd, 1e-3)
    u_px = s / 2.0 + f_px * x / z
    v_px = s / 2.0 - f_px * y / z
    verts_screen = jnp.stack([u_px, v_px, z], -1)
    faces = jnp.arange(tris.shape[0] * 3, dtype=jnp.int32).reshape(-1, 3)
    frag = rasterize_hard(verts_screen, faces, (s, s), faces_mask=fmask,
                          chunk=_F_PAD)
    n = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    lam = 0.35 + 0.65 * jnp.abs(n @ light)
    shade = alb * ((1 - lam_mix) + lam_mix * lam)[:, None]
    fid = jnp.maximum(frag.face_idx, 0)
    hit = frag.face_idx >= 0
    rgb = jnp.where(hit[..., None], shade[fid], 1.0)
    return jnp.concatenate([rgb, hit[..., None].astype(jnp.float32)], -1)


def render_cond_batch(specs: List[ShapeSpec], rng: np.random.Generator,
                      size: int, batch: int = 64) -> np.ndarray:
    """Render each spec to an RGBA condition view (N, S, S, 4) in [0,1]:
    frontal-ish orbit camera, lambert or flat shading, transparent bg —
    the prepped-object image contract phase 3 consumes."""
    render = jax.jit(jax.vmap(_render_rgba,
                              in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, 0, 0)),
                     static_argnums=(8,))
    n = len(specs)
    out = np.zeros((n, size, size, 4), np.float32)
    for s0 in range(0, n, batch):
        sub = specs[s0:s0 + batch]
        bt = np.zeros((len(sub), _F_PAD, 3, 3), np.float32)
        bt[..., 2] = -1.0  # behind-camera padding
        ba = np.zeros((len(sub), _F_PAD, 3), np.float32)
        bm = np.zeros((len(sub), _F_PAD), bool)
        eyes, rights, ups, fwds, fps, lights, mixes = ([] for _ in range(7))
        for i, spec in enumerate(sub):
            tris, pid = spec_mesh(spec)
            f = min(len(tris), _F_PAD)
            bt[i, :f] = tris[:f]
            cols = rng.uniform(0.1, 0.95, (pid.max() + 1, 3)).astype(np.float32)
            ba[i, :f] = cols[pid[:f]]
            bm[i, :f] = True
            az = rng.uniform(-0.6, 0.6)
            el = rng.uniform(0.08, 0.5)
            dist = rng.uniform(3.0, 3.6)
            eye = dist * np.asarray([np.cos(el) * np.sin(az), np.sin(el),
                                     -np.cos(el) * np.cos(az)], np.float32)
            fwd = -eye / np.linalg.norm(eye)
            right = np.cross([0, 1, 0], fwd)
            right = right / np.linalg.norm(right)
            up = np.cross(fwd, right)
            eyes.append(eye)
            rights.append(right.astype(np.float32))
            ups.append(up.astype(np.float32))
            fwds.append(fwd.astype(np.float32))
            fps.append(size * rng.uniform(0.85, 1.05))
            li = rng.normal(size=3)
            li[2] = -abs(li[2]) - 0.5
            lights.append((li / np.linalg.norm(li)).astype(np.float32))
            # 20% flat shading — matches flat-colored synthetic crops
            mixes.append(0.0 if rng.random() < 0.2 else 1.0)
        rgba = render(jnp.asarray(bt), jnp.asarray(ba), jnp.asarray(bm),
                      jnp.asarray(np.stack(eyes)), jnp.asarray(np.stack(rights)),
                      jnp.asarray(np.stack(ups)), jnp.asarray(np.stack(fwds)),
                      jnp.asarray(np.asarray(fps, np.float32)), size,
                      jnp.asarray(np.stack(lights)),
                      jnp.asarray(np.asarray(mixes, np.float32)))
        arr = np.array(rgba, np.float32)
        arr[..., :3] = np.clip(arr[..., :3] + rng.normal(0, .01, arr[..., :3].shape), 0, 1)
        out[s0:s0 + len(sub)] = arr
    return out


# ===========================================================================
# Dataset
# ===========================================================================

def build_dataset(rng: np.random.Generator, n_shapes: int, image_size: int,
                  n_surface: int = 1024, n_query: int = 1024,
                  with_images: bool = True) -> Dict[str, np.ndarray]:
    """Procedural dataset: surface samples, SDF-labelled queries, cond
    images. Queries: 50% near-surface (two noise scales), 25% uniform
    cube, 25% padded-bbox uniform."""
    specs = [sample_spec(rng) for _ in range(n_shapes)]
    surf = np.zeros((n_shapes, n_surface, 3), np.float32)
    qpts = np.zeros((n_shapes, n_query, 3), np.float32)
    qsdf = np.zeros((n_shapes, n_query), np.float32)
    for i, spec in enumerate(specs):
        s = spec_surface_points(spec, rng, max(n_surface, n_query))
        surf[i] = s[:n_surface]
        k = n_query // 4
        near1 = s[:k] + rng.normal(0, .02, (k, 3))
        near2 = s[k:2 * k] + rng.normal(0, .08, (k, 3))
        unif = rng.uniform(-1.0, 1.0, (k, 3))
        lo = s.min(0) - .15
        hi = s.max(0) + .15
        bbox = rng.uniform(lo, hi, (n_query - 3 * k, 3))
        q = np.concatenate([near1, near2, unif, bbox]).astype(np.float32)
        qpts[i] = q
        qsdf[i] = spec_sdf(spec, q)
    data = {"surf": surf, "qpts": qpts, "qsdf": qsdf}
    if with_images:
        data["imgs"] = render_cond_batch(specs, rng, image_size)
    data["specs"] = specs  # type: ignore[assignment]
    return data


# ===========================================================================
# Configs
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class DistillConfig:
    dit: DiTConfig
    vae: ShapeVAEConfig
    cond_depth: int
    cond_heads: int
    cond_patch: int
    image_size: int

    @classmethod
    def small(cls) -> "DistillConfig":
        """The committed-checkpoint scale: ~10M params, trains in minutes
        on one chip, real capacity for the 7-family grammar."""
        dit = DiTConfig(latent_tokens=64, latent_dim=16, width=256, depth=6,
                        num_heads=8, cond_dim=256)
        vae = ShapeVAEConfig(latent_tokens=64, latent_dim=16, width=256,
                             enc_depth=2, dec_depth=4, num_heads=8,
                             num_freqs=8)
        return cls(dit=dit, vae=vae, cond_depth=2, cond_heads=8,
                   cond_patch=8, image_size=64)

    @classmethod
    def micro(cls) -> "DistillConfig":
        """CPU-test scale."""
        dit = DiTConfig(latent_tokens=16, latent_dim=8, width=64, depth=2,
                        num_heads=4, cond_dim=64)
        vae = ShapeVAEConfig(latent_tokens=16, latent_dim=8, width=64,
                             enc_depth=1, dec_depth=2, num_heads=4,
                             num_freqs=6)
        return cls(dit=dit, vae=vae, cond_depth=1, cond_heads=4,
                   cond_patch=8, image_size=32)

    def cond_encoder(self):
        from regen3d_tpu.pipeline.phase3_assets import CondEncoder

        return CondEncoder(width=self.dit.cond_dim, depth=self.cond_depth,
                           num_heads=self.cond_heads, patch=self.cond_patch)


# ===========================================================================
# Segmented training (one XLA program per `seg` steps — the remote-TPU
# tunnel kills single programs >~60 s and charges ~50 ms per dispatch)
# ===========================================================================

def _make_segment_runner(loss_fn, tx):
    @jax.jit
    def run(params, opt_state, batches, key):
        def one(carry, batch):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, sub)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            one, (params, opt_state, key), batches)
        return params, opt_state, losses

    return run


def _run_segments(loss_fn, tx, params, sample_batch, steps: int, seg: int,
                  seed: int, log_every: int, tag: str):
    """Generic segmented trainer: `sample_batch(rng, k)` returns a pytree
    of (k, ...) host arrays for k consecutive steps."""
    opt_state = tx.init(params)
    runner = _make_segment_runner(loss_fn, tx)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    done = 0
    losses: List[float] = []
    while done < steps:
        k = min(seg, steps - done)
        batches = sample_batch(rng, k)
        key, sub = jax.random.split(key)
        params, opt_state, seg_losses = runner(params, opt_state,
                                               jax.tree.map(jnp.asarray,
                                                            batches), sub)
        losses.extend(np.asarray(seg_losses, np.float32).tolist())
        done += k
        if log_every and (done % log_every < seg):
            log.info("%s step %d/%d loss %.4f", tag, done, steps, losses[-1])
    return params, losses


# ===========================================================================
# Stage A: shape autoencoder (truncated-SDF regression)
# ===========================================================================

SDF_TRUNC = 0.25


def train_shape_vae(cfg: DistillConfig, data: Dict[str, np.ndarray],
                    steps: int, batch: int = 32, lr: float = 1e-3,
                    seed: int = 0, seg: int = 25, log_every: int = 200):
    enc = ShapeEncoder(cfg.vae)
    dec = ShapeDecoder(cfg.vae)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    n_s = data["surf"].shape[1]
    params = {
        "enc": enc.init(k1, jnp.zeros((1, n_s, 3))),
        "dec": dec.init(k2, jnp.zeros((1, cfg.vae.latent_tokens,
                                       cfg.vae.latent_dim)),
                        jnp.zeros((1, 8, 3))),
    }

    def loss_fn(params, b, key):
        del key
        lat = enc.apply(params["enc"], b["surf"])
        pred = dec.apply(params["dec"], lat, b["qpts"])
        # clamp ONLY the target (clamping pred zeroes its gradient
        # wherever |pred| > τ and training never starts)
        t_gt = jnp.clip(b["qsdf"], -SDF_TRUNC, SDF_TRUNC)
        w = 1.0 + 3.0 * (jnp.abs(b["qsdf"]) < 0.05)
        rec = jnp.sum(jnp.abs(pred - t_gt) * w) / jnp.sum(w)
        mu = lat.mean((0, 1))
        sd = lat.std((0, 1))
        reg = (mu ** 2).mean() + ((sd - 1.0) ** 2).mean()
        return rec + 0.02 * reg

    n = data["surf"].shape[0]

    def sample_batch(rng, k):
        idx = rng.integers(0, n, (k, batch))
        return {"surf": data["surf"][idx], "qpts": data["qpts"][idx],
                "qsdf": data["qsdf"][idx]}

    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps, 0.05))
    params, losses = _run_segments(loss_fn, tx, params, sample_batch, steps,
                                   seg, seed, log_every, "vae")
    return params, enc, dec, losses


def encode_latents(enc: ShapeEncoder, enc_params, surf: np.ndarray,
                   chunk: int = 128) -> np.ndarray:
    apply = jax.jit(enc.apply)
    outs = [np.asarray(apply(enc_params, jnp.asarray(surf[i:i + chunk])))
            for i in range(0, len(surf), chunk)]
    return np.concatenate(outs).astype(np.float32)


# ===========================================================================
# Stage B: conditional rectified flow on normalized latents
# ===========================================================================

def train_flow(cfg: DistillConfig, latents: np.ndarray, imgs: np.ndarray,
               steps: int, batch: int = 32, lr: float = 1e-3, seed: int = 1,
               seg: int = 25, log_every: int = 200,
               cond_drop: float = 0.1):
    """latents must already be normalized (see :func:`latent_moments`)."""
    cond = cfg.cond_encoder()
    dit = ShapeDiT(cfg.dit)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    s = cfg.image_size
    tokens = (s // cfg.cond_patch) ** 2
    params = {
        "cond": cond.init(k1, jnp.zeros((1, s, s, 4))),
        "dit": dit.init(k2, jnp.zeros((1, cfg.dit.latent_tokens,
                                       cfg.dit.latent_dim)),
                        jnp.zeros((1,)),
                        jnp.zeros((1, tokens, cfg.dit.cond_dim))),
    }

    def loss_fn(params, b, key):
        k_t, k_eps, k_drop = jax.random.split(key, 3)
        cond_tok = cond.apply(params["cond"], b["img"])
        x0 = b["lat"]
        n = x0.shape[0]
        t = jax.random.uniform(k_t, (n,))
        eps = jax.random.normal(k_eps, x0.shape)
        x_t = (1.0 - t)[:, None, None] * x0 + t[:, None, None] * eps
        drop = jax.random.bernoulli(k_drop, cond_drop, (n,))
        cond_used = jnp.where(drop[:, None, None], 0.0, cond_tok)
        v = dit.apply(params["dit"], x_t, t, cond_used)
        return jnp.mean((v - (eps - x0)) ** 2)

    n = len(latents)

    def sample_batch(rng, k):
        idx = rng.integers(0, n, (k, batch))
        return {"lat": latents[idx], "img": imgs[idx]}

    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps, 0.05))
    params, losses = _run_segments(loss_fn, tx, params, sample_batch, steps,
                                   seg, seed, log_every, "flow")
    return params, cond, dit, losses


def latent_moments(latents: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel (D,) moments over (N, L)."""
    mu = latents.mean((0, 1)).astype(np.float32)
    sd = np.maximum(latents.std((0, 1)), 1e-4).astype(np.float32)
    return mu, sd


def fold_latent_norm(dec_params, mu: np.ndarray, sd: np.ndarray):
    """Return dec params with the latent normalization folded into the
    ``lat_in`` affine: dec'(z) == dec(z·σ+μ), so the serving sampler
    (which emits normalized latents) needs no extra op."""
    import flax

    p = flax.core.unfreeze(dec_params) if hasattr(dec_params, "unfreeze") \
        else jax.tree.map(lambda x: x, dec_params)
    lat_in = p["params"]["lat_in"]
    w = np.asarray(lat_in["kernel"], np.float32)        # (D, width)
    b = np.asarray(lat_in["bias"], np.float32)
    lat_in["kernel"] = jnp.asarray(sd[:, None] * w)
    lat_in["bias"] = jnp.asarray(b + mu @ w)
    return p


# ===========================================================================
# Generator assembly + npz checkpoint
# ===========================================================================

def build_generator(cfg: DistillConfig, cond_params, dit_params, dec_params):
    from regen3d_tpu.pipeline.phase3_assets import AssetGenerator

    return AssetGenerator(
        dit_cfg=cfg.dit, vae_cfg=cfg.vae, cond=cfg.cond_encoder(),
        dit=ShapeDiT(cfg.dit), decoder=ShapeDecoder(cfg.vae),
        params={"cond": cond_params, "dit": dit_params, "dec": dec_params},
        image_size=cfg.image_size, trained=True)


def _flatten(tree, prefix: str, dtype=np.float16) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for kp, leaf in flat:
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        out[f"{prefix}:{path}"] = np.asarray(leaf, dtype)
    return out


def _unflatten(npz, prefix: str):
    out: Dict = {}
    for key in npz.files:
        if not key.startswith(prefix + ":"):
            continue
        node = out
        parts = key[len(prefix) + 1:].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(npz[key], jnp.float32)
    return out


def save_generator(path: str, cfg: DistillConfig, params: Dict) -> None:
    """One .npz: f16 leaves + a JSON config entry."""
    meta = {
        "dit": {k: v for k, v in dataclasses.asdict(cfg.dit).items()
                if k != "dtype"},
        "vae": {k: v for k, v in dataclasses.asdict(cfg.vae).items()
                if k != "dtype"},
        "cond_depth": cfg.cond_depth, "cond_heads": cfg.cond_heads,
        "cond_patch": cfg.cond_patch, "image_size": cfg.image_size,
    }
    blobs = {}
    for name in ("cond", "dit"):
        blobs.update(_flatten(params[name], name))
    # the decoder's values PLACE the iso-surface — f16 storage was measured
    # to shift the SDF by ~0.015 (≈2 voxels at 256³); keep it f32
    blobs.update(_flatten(params["dec"], "dec", np.float32))
    blobs["__config__"] = np.frombuffer(
        json.dumps(meta).encode(), np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **blobs)


def load_generator(path: str):
    """Rebuild the serving AssetGenerator from a distilled .npz."""
    npz = np.load(path)
    meta = json.loads(bytes(npz["__config__"]).decode())
    cfg = DistillConfig(
        dit=DiTConfig(**meta["dit"]), vae=ShapeVAEConfig(**meta["vae"]),
        cond_depth=int(meta["cond_depth"]), cond_heads=int(meta["cond_heads"]),
        cond_patch=int(meta["cond_patch"]),
        image_size=int(meta["image_size"]))
    params = {name: _unflatten(npz, name) for name in ("cond", "dit", "dec")}
    return build_generator(cfg, params["cond"], params["dit"], params["dec"])


# ===========================================================================
# Evaluation: generated mesh vs analytic GT surface
# ===========================================================================

def chamfer_np(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric mean nearest-neighbor L2 distance (the pcu convention the
    reference's eval uses — evaluation/run_eval.py)."""
    from scipy.spatial import cKDTree

    da = cKDTree(b).query(a)[0]
    db = cKDTree(a).query(b)[0]
    return float(da.mean() + db.mean())


def eval_generator(generator, rng: np.random.Generator, n_shapes: int = 16,
                   num_steps: int = 25, guidance: float = 3.0,
                   resolution: int = 64, chunk: int = 4096,
                   n_gt: int = 4096, image_size: Optional[int] = None,
                   empty_penalty: float = 2.0) -> Dict[str, float]:
    """Generate from held-out cond images; Chamfer vs the analytic GT
    surface. Also reports the SHUFFLED-condition Chamfer (each generated
    mesh scored against a different shape's GT) — the gap proves the
    image conditioning carries signal."""
    from regen3d_tpu.ops.marching_cubes import marching_tetrahedra

    size = image_size or generator.image_size
    specs = [sample_spec(rng) for _ in range(n_shapes)]
    imgs = render_cond_batch(specs, rng, size)
    key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
    vols = generator.generate_sdf_batch(key, imgs, num_steps, guidance,
                                        resolution, chunk)
    cds, cds_shuf, empties = [], [], 0
    gts = [spec_surface_points(s, rng, n_gt) for s in specs]
    for i in range(n_shapes):
        verts, faces = marching_tetrahedra(np.asarray(vols[i]), 0.0,
                                           bounds=(-1.01, 1.01))
        if len(faces) == 0 or len(verts) < 16:
            empties += 1
            cds.append(empty_penalty)
            cds_shuf.append(empty_penalty)
            continue
        if len(verts) > 8192:
            verts = verts[rng.choice(len(verts), 8192, replace=False)]
        cds.append(chamfer_np(verts, gts[i]))
        cds_shuf.append(chamfer_np(verts, gts[(i + 1) % n_shapes]))
    return {"chamfer": float(np.mean(cds)),
            "chamfer_shuffled": float(np.mean(cds_shuf)),
            "empty_frac": empties / n_shapes}


# ===========================================================================
# Whole-pipeline driver
# ===========================================================================

def distill_shape(cfg: DistillConfig, n_shapes: int = 2048,
                  vae_steps: int = 3000, flow_steps: int = 5000,
                  batch: int = 32, lr: float = 1e-3, seed: int = 0,
                  seg: int = 25, log_every: int = 200,
                  n_surface: int = 1024, n_query: int = 1024):
    """Dataset → stage A → encode+normalize → stage B → folded generator."""
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    data = build_dataset(rng, n_shapes, cfg.image_size,
                         n_surface=n_surface, n_query=n_query)
    log.info("dataset: %d shapes in %.1fs", n_shapes, time.perf_counter() - t0)
    vae_params, enc, dec, vae_losses = train_shape_vae(
        cfg, data, vae_steps, batch=batch, lr=lr, seed=seed, seg=seg,
        log_every=log_every)
    lats = encode_latents(enc, vae_params["enc"], data["surf"])
    mu, sd = latent_moments(lats)
    lats_n = ((lats - mu) / sd).astype(np.float32)
    flow_params, cond, dit, flow_losses = train_flow(
        cfg, lats_n, data["imgs"], flow_steps, batch=batch, lr=lr,
        seed=seed + 1, seg=seg, log_every=log_every)
    dec_folded = fold_latent_norm(vae_params["dec"], mu, sd)
    gen = build_generator(cfg, flow_params["cond"], flow_params["dit"],
                          dec_folded)
    report = {"vae_loss_final": float(np.mean(vae_losses[-20:])),
              "flow_loss_final": float(np.mean(flow_losses[-20:]))}
    return gen, report
