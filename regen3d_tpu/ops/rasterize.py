"""Differentiable mesh rasterization on TPU (pure XLA; Pallas variant in
ops/pallas_rasterize.py).

Replaces the pytorch3d CUDA rasterizer + SoftSilhouetteShader/HardPhongShader
stack (reference: render_utils.py:77-119) that the pose optimizer calls every
step (diff_model.py:215-224).

TPU-first design — no per-pixel face lists, no K-buffer:

  * The reference's SoftSilhouetteShader aggregates the top-K=20 nearest
    faces per pixel: alpha = 1 − ∏ₖ (1 − sigmoid(−d²ₖ/σ)).  Because distant
    faces contribute probability ≈ 0, the product over *all* faces is the
    same quantity — and Σ_f log(1 − p_f) is a pure streaming reduction.  So
    silhouettes need NO sorting and NO irregular binning: faces stream
    through VMEM in fixed-size chunks (lax.scan) against the full pixel
    grid, which is exactly the memory/compute pattern TPUs like.
  * The chunk body is wrapped in jax.checkpoint: backward re-computes the
    (pixels × chunk) distance tile instead of storing it, keeping HBM flat.
  * Hard (z-buffer) rasterization for Phong/preview/texture-baking uses the
    same streaming pattern with a packed (depth, face-id) min reduction.

Geometry convention: faces are rasterized from *screen-space* vertices
(u, v, z) produced by ``Camera.view_to_screen`` — u right, v down, z is
view depth. Distances for the soft silhouette are measured in pytorch3d-
compatible NDC units (shorter image side spans [-1, 1]) so the reference's
sigma/gamma values (config.yaml:307-308, 5e-7) transfer unchanged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_BIG = 1e30


def _pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H*W, 2) pixel-center coordinates (u, v)."""
    vv = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(dtype) + 0.5
    uu = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(dtype) + 0.5
    return jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)


def _point_segment_sqdist(p, a, b):
    """Squared 2D distance point→segment; p (P,1,2), a/b (1,C,2) broadcast."""
    ab = b - a
    t = jnp.sum((p - a) * ab, -1) / jnp.maximum(jnp.sum(ab * ab, -1), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    d = p - proj
    return jnp.sum(d * d, -1)


def _face_coverage(pix, tri):
    """Signed sq-distance and inside mask for pixels × faces.

    pix: (P, 2).  tri: (C, 3, 2) screen-space 2D triangles.
    Returns (signed_sqdist (P, C): negative inside, bary (P, C, 3)).
    """
    p = pix[:, None, :]                       # (P, 1, 2)
    v0, v1, v2 = tri[None, :, 0], tri[None, :, 1], tri[None, :, 2]

    # edge functions (cross-product z): sign convention fixed by total area
    def edge(a, b):
        return (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - \
               (b[..., 1] - a[..., 1]) * (p[..., 0] - a[..., 0])

    e0 = edge(v0, v1)
    e1 = edge(v1, v2)
    e2 = edge(v2, v0)
    area = ((v1[..., 0] - v0[..., 0]) * (v2[..., 1] - v0[..., 1])
            - (v1[..., 1] - v0[..., 1]) * (v2[..., 0] - v0[..., 0]))  # (1, C)
    s = jnp.sign(area)
    s = jnp.where(s == 0, 1.0, s)
    inside = (e0 * s >= 0) & (e1 * s >= 0) & (e2 * s >= 0)

    d0 = _point_segment_sqdist(p, v0, v1)
    d1 = _point_segment_sqdist(p, v1, v2)
    d2 = _point_segment_sqdist(p, v2, v0)
    d_edge = jnp.minimum(d0, jnp.minimum(d1, d2))   # (P, C)
    signed = jnp.where(inside, -d_edge, d_edge)

    # screen-space barycentrics (for depth interpolation)
    denom = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    b0 = e1 / denom   # weight of v0 (opposite edge v1v2)
    b1 = e2 / denom
    b2 = e0 / denom
    bary = jnp.stack([b0, b1, b2], axis=-1)
    return signed, bary, inside


def soft_silhouette(
    verts_screen: jnp.ndarray,
    faces: jnp.ndarray,
    image_hw: Tuple[int, int],
    sigma: float = 5e-7,
    faces_mask: Optional[jnp.ndarray] = None,
    znear: float = 1e-3,
    chunk: int = 256,
) -> jnp.ndarray:
    """Differentiable soft silhouette, SoftRas/pytorch3d-compatible.

    Args:
      verts_screen: (V, 3) — (u, v, z) from ``Camera.view_to_screen``.
      faces: (F, 3) int32.
      image_hw: static (H, W).
      sigma: blending bandwidth in NDC² (reference sigma=5e-7).
      faces_mask: optional validity for padded meshes.
      znear: faces with any vertex closer than this are culled.
      chunk: faces per streamed tile.

    Returns alpha image (H, W) in [0, 1]; differentiable w.r.t. verts_screen.
    """
    h, w = image_hw
    ndc = 2.0 / min(h, w)  # pixels → pytorch3d NDC units
    pix = _pixel_grid(h, w) * ndc

    f = faces.shape[0]
    chunk = min(chunk, f)
    pad = (-f) % chunk
    tri3 = verts_screen[faces]  # (F, 3, 3)
    if pad:
        tri3 = jnp.concatenate(
            [tri3, jnp.full((pad, 3, 3), -10.0, tri3.dtype)], axis=0)
    fmask = jnp.ones(f, bool) if faces_mask is None else faces_mask
    if pad:
        fmask = jnp.concatenate([fmask, jnp.zeros(pad, bool)])
    num_chunks = tri3.shape[0] // chunk
    tri_c = tri3.reshape(num_chunks, chunk, 3, 3)
    msk_c = fmask.reshape(num_chunks, chunk)

    @jax.checkpoint
    def body(acc, inp):
        tri, mk = inp
        zs = tri[..., 2]                              # (C, 3)
        ok = mk & jnp.all(zs > znear, axis=-1)
        tri2 = tri[..., :2] * ndc                     # (C, 3, 2) in NDC
        signed, _, _ = _face_coverage(pix, tri2)      # (P, C)
        # log(1 − sigmoid(z)) = −softplus(z) with z = −signed/σ: one fused
        # transcendental per (pixel, face), no clamping needed.
        z = -signed / sigma
        contrib = -jax.nn.softplus(z)
        contrib = jnp.where(ok[None, :], contrib, 0.0)
        acc = acc + jnp.sum(contrib, axis=1)
        return acc, None

    acc0 = jnp.zeros(h * w, verts_screen.dtype)
    acc, _ = lax.scan(body, acc0, (tri_c, msk_c))
    alpha = 1.0 - jnp.exp(acc)
    return alpha.reshape(h, w)


def face_edge_coeffs(tri2: jnp.ndarray) -> jnp.ndarray:
    """Per-face edge-line coefficients for the MXU silhouette path.

    tri2: (F, 3, 2) screen/NDC triangles → (F, 3, 3) rows (a, b, c) per edge
    such that f(p) = a·px + b·py + c is the SIGNED distance of p to the edge
    line, positive on the triangle's interior side (orientation-normalized).
    """
    v0 = tri2
    v1 = jnp.roll(tri2, -1, axis=1)
    d = v1 - v0                                    # (F, 3, 2)
    # eps-INSIDE the sqrt: plain norm has a NaN gradient at zero-length
    # (degenerate) edges, and a max() clamp doesn't stop the chain rule
    length = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-20)
    # inward normal for CCW: rotate d by +90° = (-dy, dx); orientation fix
    n = jnp.stack([-d[..., 1], d[..., 0]], axis=-1) / length[..., None]
    c = -jnp.sum(n * v0, axis=-1)                  # (F, 3)
    area = ((tri2[:, 1, 0] - tri2[:, 0, 0]) * (tri2[:, 2, 1] - tri2[:, 0, 1])
            - (tri2[:, 1, 1] - tri2[:, 0, 1]) * (tri2[:, 2, 0] - tri2[:, 0, 0]))
    s = jnp.where(area >= 0, 1.0, -1.0)[:, None]
    return jnp.concatenate([n * s[..., None], (c * s)[..., None]], axis=-1)


def _edge_contrib(pix_h: jnp.ndarray, coeffs: jnp.ndarray,
                  valid: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Σ_f log(1−p_f) for one pixel set × face set, MXU formulation.

    pix_h: (P, 3) homogeneous NDC pixels. coeffs: (F, 3, 3). valid: (F,).
    The face's signed distance to its boundary is approximated by the
    min edge-line distance (exact in edge regions and the interior; a lower
    bound within vertex corner sectors — sub-pixel-scale halo difference vs
    the exact SoftRas distance at the sigmas in use).
    """
    # Contraction dim is only 3, so broadcast FMAs on the VPU beat a K=3
    # matmul (the MXU would pad K to 128). Keep each edge as its own dense
    # (P, F) plane — min across three planes is elementwise, with no
    # stride-3 lane shuffles.
    px = pix_h[:, 0:1]
    py = pix_h[:, 1:2]
    A = coeffs.transpose(1, 2, 0)               # (3 edges, 3 coeffs, F)
    e0 = px * A[0, 0][None] + (py * A[0, 1][None] + A[0, 2][None])
    e1 = px * A[1, 0][None] + (py * A[1, 1][None] + A[1, 2][None])
    e2 = px * A[2, 0][None] + (py * A[2, 1][None] + A[2, 2][None])
    dmin = jnp.minimum(e0, jnp.minimum(e1, e2))  # (P, F): >0 inside
    # SoftRas signed *squared* distance with sign: z = d·|d|/σ
    z = dmin * jnp.abs(dmin) / sigma
    contrib = -jax.nn.softplus(z)
    return jnp.sum(jnp.where(valid[None, :], contrib, 0.0), axis=1)


def soft_silhouette_edge(
    verts_screen: jnp.ndarray,
    faces: jnp.ndarray,
    image_hw: Tuple[int, int],
    sigma: float = 5e-7,
    faces_mask: Optional[jnp.ndarray] = None,
    znear: float = 1e-3,
    tile: int = 64,
    faces_per_tile: int = 128,
    tiles_per_step: int = 8,
    bins: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """MXU-native tile-binned soft silhouette.

    Same interface as :func:`soft_silhouette_binned` but the per-pair math
    is a single (pixels, 3)×(3, 3·faces) contraction on the systolic array
    plus ~8 VPU ops — the speed-of-light formulation for this op on TPU.
    Pass precomputed ``bins`` (from :func:`compute_silhouette_bins`) to hoist
    binning out of an optimization loop.
    """
    h, w = image_hw
    ndc = 2.0 / min(h, w)
    tri = verts_screen[faces]
    fmask = jnp.ones(faces.shape[0], bool) if faces_mask is None else faces_mask
    ok = fmask & jnp.all(tri[..., 2] > znear, axis=-1)
    tri2 = tri[..., :2] * ndc
    # drop zero-area (degenerate) faces: their edge distances are 0
    # everywhere, which would darken the whole tile
    area2 = ((tri2[:, 1, 0] - tri2[:, 0, 0]) * (tri2[:, 2, 1] - tri2[:, 0, 1])
             - (tri2[:, 1, 1] - tri2[:, 0, 1])
             * (tri2[:, 2, 0] - tri2[:, 0, 0]))
    ok = ok & (jnp.abs(area2) > 1e-14)
    coeffs = face_edge_coeffs(tri2)                # (F, 3, 3)

    if bins is None:
        bins = compute_silhouette_bins(verts_screen, faces, image_hw, sigma,
                                       faces_mask, znear, tile, faces_per_tile)
    sel_idx, sel_valid = bins
    k = sel_idx.shape[1]

    nty, ntx = h // tile, w // tile
    t_total = nty * ntx
    pad_t = (-t_total) % tiles_per_step
    if pad_t:
        sel_idx = jnp.concatenate([sel_idx, jnp.zeros((pad_t, k), sel_idx.dtype)])
        sel_valid = jnp.concatenate([sel_valid, jnp.zeros((pad_t, k), bool)])
    n_steps = sel_idx.shape[0] // tiles_per_step

    base = _pixel_grid(tile, tile)
    tids = jnp.arange(sel_idx.shape[0])
    tile_off = jnp.stack([(tids % ntx) * tile, (tids // ntx) * tile], -1)

    @jax.checkpoint
    def body(_, inp):
        idxs, valids, offs = inp
        co = coeffs[idxs]                           # (S, K, 3, 3)
        va = valids & ok[idxs]
        pix = (base[None] + offs[:, None, :].astype(base.dtype)) * ndc
        pix_h = jnp.concatenate([pix, jnp.ones_like(pix[..., :1])], axis=-1)
        acc = jax.vmap(functools.partial(_edge_contrib, sigma=sigma))(
            pix_h, co, va)
        return None, acc

    steps = (sel_idx.reshape(n_steps, tiles_per_step, k),
             sel_valid.reshape(n_steps, tiles_per_step, k),
             tile_off.reshape(n_steps, tiles_per_step, 2))
    _, accs = lax.scan(body, None, steps)
    acc = accs.reshape(-1, tile * tile)[:t_total]
    alpha = 1.0 - jnp.exp(acc)
    alpha = alpha.reshape(nty, ntx, tile, tile)
    return alpha.transpose(0, 2, 1, 3).reshape(h, w)


def compute_silhouette_bins(
    verts_screen: jnp.ndarray,
    faces: jnp.ndarray,
    image_hw: Tuple[int, int],
    sigma: float = 5e-7,
    faces_mask: Optional[jnp.ndarray] = None,
    znear: float = 1e-3,
    tile: int = 64,
    faces_per_tile: int = 128,
    margin_px: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K overlapping faces per image tile → (sel_idx (T,K), valid (T,K)).

    ``margin_px`` inflates face bboxes so bins stay valid while vertices
    move during an optimization segment (binning hoisted out of the loop).
    """
    h, w = image_hw
    ndc = 2.0 / min(h, w)
    f = faces.shape[0]
    k = min(faces_per_tile, f)
    tri = verts_screen[faces]
    fmask = jnp.ones(f, bool) if faces_mask is None else faces_mask
    ok = fmask & jnp.all(tri[..., 2] > znear, axis=-1)
    pad_px = jnp.sqrt(sigma * 20.0) / ndc + 1.0 + margin_px
    uv = tri[..., :2]
    lo = jnp.where(ok[:, None], jnp.min(uv, axis=1) - pad_px, 1e9)
    hi = jnp.where(ok[:, None], jnp.max(uv, axis=1) + pad_px, -1e9)
    nty, ntx = h // tile, w // tile
    ty = jnp.arange(nty) * tile
    tx = jnp.arange(ntx) * tile
    ov_x = (lo[None, :, 0] < (tx[:, None] + tile)) & (hi[None, :, 0] > tx[:, None])
    ov_y = (lo[None, :, 1] < (ty[:, None] + tile)) & (hi[None, :, 1] > ty[:, None])
    overlap = (ov_y[:, None, :] & ov_x[None, :, :]).reshape(nty * ntx, f)
    score, idx = lax.top_k(overlap.astype(jnp.float32), k)
    return idx, score > 0.5


def soft_silhouette_binned(
    verts_screen: jnp.ndarray,
    faces: jnp.ndarray,
    image_hw: Tuple[int, int],
    sigma: float = 5e-7,
    faces_mask: Optional[jnp.ndarray] = None,
    znear: float = 1e-3,
    tile: int = 64,
    faces_per_tile: int = 256,
    tiles_per_step: int = 8,
) -> jnp.ndarray:
    """Tile-binned soft silhouette — same semantics as :func:`soft_silhouette`,
    an order of magnitude less work at high resolution.

    The image is cut into ``tile``² pixel tiles; each tile gathers (top-K)
    only the faces whose padded screen bbox overlaps it (the pad covers the
    sigma falloff, so results match the dense version to float tolerance
    for ``faces_per_tile`` ≥ the true overlap count). Binning is recomputed
    inside the jit every call — vertices move every optimizer step — and is
    itself vectorized. Fully autodiff-compatible: gradients flow through the
    face gather back to vertices.

    This is the TPU answer to the CUDA rasterizer's per-pixel face lists
    (SURVEY §7.3 item 1): fixed-size bins, dense tiles, no dynamic shapes.
    """
    h, w = image_hw
    assert h % tile == 0 and w % tile == 0, "image must be tile-aligned"
    ndc = 2.0 / min(h, w)
    f = faces.shape[0]
    k = min(faces_per_tile, f)

    tri = verts_screen[faces]                       # (F, 3, 3)
    fmask = jnp.ones(f, bool) if faces_mask is None else faces_mask
    ok = fmask & jnp.all(tri[..., 2] > znear, axis=-1)

    # padded face bboxes in pixels; pad covers where sigmoid(-d²/σ) ≈ 0
    pad_px = jnp.sqrt(sigma * 20.0) / ndc + 1.0
    uv = tri[..., :2]
    lo = jnp.min(uv, axis=1) - pad_px               # (F, 2)
    hi = jnp.max(uv, axis=1) + pad_px
    lo = jnp.where(ok[:, None], lo, 1e9)
    hi = jnp.where(ok[:, None], hi, -1e9)

    nty, ntx = h // tile, w // tile
    ty = jnp.arange(nty) * tile
    tx = jnp.arange(ntx) * tile
    # overlap (T, F): tile [tx, tx+tile] × [ty, ty+tile] vs face bbox
    ov_x = (lo[None, :, 0] < (tx[:, None] + tile)) & (hi[None, :, 0] > tx[:, None])
    ov_y = (lo[None, :, 1] < (ty[:, None] + tile)) & (hi[None, :, 1] > ty[:, None])
    overlap = (ov_y[:, None, :] & ov_x[None, :, :]).reshape(nty * ntx, f)

    # top-K overlapping faces per tile (arbitrary K of them if more overlap)
    sel_score, sel_idx = lax.top_k(overlap.astype(jnp.float32), k)   # (T, K)
    sel_valid = sel_score > 0.5
    tri2_all = uv * ndc                                             # (F, 3, 2)

    t_total = nty * ntx
    pad_t = (-t_total) % tiles_per_step
    if pad_t:
        sel_idx = jnp.concatenate(
            [sel_idx, jnp.zeros((pad_t, k), sel_idx.dtype)])
        sel_valid = jnp.concatenate([sel_valid, jnp.zeros((pad_t, k), bool)])
    n_steps = sel_idx.shape[0] // tiles_per_step

    # per-tile local pixel grid in NDC offsets
    base = _pixel_grid(tile, tile)                                   # (tile², 2)
    tids = jnp.arange(sel_idx.shape[0])
    tile_off = jnp.stack([(tids % ntx) * tile, (tids // ntx) * tile], -1)

    @jax.checkpoint
    def body(_, inp):
        idxs, valids, offs = inp                  # (S, K), (S, K), (S, 2)
        tri_sel = tri2_all[idxs]                  # (S, K, 3, 2)
        pix = (base[None] + offs[:, None, :].astype(base.dtype)) * ndc  # (S, P, 2)

        def one(pix_t, tri_t, val_t):
            signed, _, _ = _face_coverage(pix_t, tri_t)
            contrib = -jax.nn.softplus(-signed / sigma)
            contrib = jnp.where(val_t[None, :], contrib, 0.0)
            return jnp.sum(contrib, axis=1)       # (P,)

        acc = jax.vmap(one)(pix, tri_sel, valids)  # (S, P)
        return None, acc

    steps = (sel_idx.reshape(n_steps, tiles_per_step, k),
             sel_valid.reshape(n_steps, tiles_per_step, k),
             tile_off.reshape(n_steps, tiles_per_step, 2))
    _, accs = lax.scan(body, None, steps)
    acc = accs.reshape(-1, tile * tile)[:t_total]
    alpha = 1.0 - jnp.exp(acc)
    # reassemble tiles → image
    alpha = alpha.reshape(nty, ntx, tile, tile)
    return alpha.transpose(0, 2, 1, 3).reshape(h, w)


class Fragments(NamedTuple):
    """Per-pixel rasterization output (hard z-buffer)."""

    face_idx: jnp.ndarray  # (H, W) int32, -1 = background
    bary: jnp.ndarray      # (H, W, 3) perspective-corrected barycentrics
    depth: jnp.ndarray     # (H, W) view-space z (+inf = background)


def rasterize_hard(
    verts_screen: jnp.ndarray,
    faces: jnp.ndarray,
    image_hw: Tuple[int, int],
    faces_mask: Optional[jnp.ndarray] = None,
    znear: float = 1e-3,
    chunk: int = 256,
) -> Fragments:
    """Non-differentiable z-buffer rasterization (Phong previews, texture
    baking, the software fallback renderer for phase 8)."""
    h, w = image_hw
    pix = _pixel_grid(h, w)

    f = faces.shape[0]
    chunk = min(chunk, f)
    pad = (-f) % chunk
    tri3 = verts_screen[faces]
    if pad:
        tri3 = jnp.concatenate([tri3, jnp.full((pad, 3, 3), -10.0, tri3.dtype)], axis=0)
    fmask = jnp.ones(f, bool) if faces_mask is None else faces_mask
    if pad:
        fmask = jnp.concatenate([fmask, jnp.zeros(pad, bool)])
    num_chunks = tri3.shape[0] // chunk
    tri_c = tri3.reshape(num_chunks, chunk, 3, 3)
    msk_c = fmask.reshape(num_chunks, chunk)

    def body(carry, inp):
        best_z, best_i = carry
        tri, mk, ci = inp
        zs = tri[..., 2]
        ok = mk & jnp.all(zs > znear, axis=-1)
        _, bary, inside = _face_coverage(pix, tri[..., :2])
        # perspective-correct depth: 1/z interpolates linearly in screen space
        inv_z = jnp.sum(bary / zs[None, :, :], axis=-1)      # (P, C)
        zpix = 1.0 / jnp.maximum(inv_z, 1e-12)
        covered = inside & ok[None, :]
        zpix = jnp.where(covered, zpix, _BIG)
        zmin = jnp.min(zpix, axis=1)
        imin = jnp.argmin(zpix, axis=1).astype(jnp.int32) + ci * chunk
        take = zmin < best_z
        return (jnp.where(take, zmin, best_z),
                jnp.where(take, imin, best_i)), None

    init = (jnp.full(h * w, _BIG, verts_screen.dtype),
            jnp.full(h * w, -1, jnp.int32))
    cidx = jnp.arange(num_chunks, dtype=jnp.int32)
    (z, fid), _ = lax.scan(body, init, (tri_c, msk_c, cidx))
    return _fragments_from_zbuffer(verts_screen, faces, z, fid, image_hw)


def _fragments_from_zbuffer(verts_screen, faces, z, fid, image_hw
                            ) -> Fragments:
    """Winning-face perspective-corrected barycentrics from a flat (H·W,)
    z/face-id buffer (shared tail of the dense and binned hard paths)."""
    h, w = image_hw
    pix = _pixel_grid(h, w)
    f = faces.shape[0]
    fid_safe = jnp.maximum(fid, 0)
    tri_win = verts_screen[faces[jnp.minimum(fid_safe, f - 1)]]  # (P, 3, 3)
    bary_screen = _aligned_bary(pix, tri_win[..., :2])
    zw = tri_win[..., 2]
    wgt = bary_screen / jnp.maximum(zw, 1e-12)
    persp = wgt / jnp.maximum(jnp.sum(wgt, -1, keepdims=True), 1e-12)
    bg = fid < 0
    return Fragments(
        face_idx=fid.reshape(h, w),
        bary=jnp.where(bg[:, None], 0.0, persp).reshape(h, w, 3),
        depth=jnp.where(bg, jnp.inf, z).reshape(h, w),
    )


def rasterize_hard_binned(
    verts_screen: jnp.ndarray,
    faces: jnp.ndarray,
    image_hw: Tuple[int, int],
    faces_mask: Optional[jnp.ndarray] = None,
    znear: float = 1e-3,
    tile: int = 64,
    faces_per_tile: int = 256,
    tiles_per_step: int = 8,
) -> Fragments:
    """Tile-binned hard z-buffer: identical output to :func:`rasterize_hard`
    PROVIDED ``faces_per_tile`` ≥ the true per-tile overlap count (use
    :func:`max_faces_per_tile` + :func:`rasterize_hard_auto` to guarantee
    it). Work drops from pixels×faces to pixels×K — the difference between
    minutes and sub-second for scene-sized meshes at render resolution."""
    h, w = image_hw
    assert h % tile == 0 and w % tile == 0, "image must be tile-aligned"
    f = faces.shape[0]
    k = min(faces_per_tile, f)
    tri = verts_screen[faces]                        # (F, 3, 3)
    fmask = jnp.ones(f, bool) if faces_mask is None else faces_mask
    ok = fmask & jnp.all(tri[..., 2] > znear, axis=-1)
    uv = tri[..., :2]
    lo = jnp.where(ok[:, None], jnp.min(uv, axis=1) - 1.0, 1e9)
    hi = jnp.where(ok[:, None], jnp.max(uv, axis=1) + 1.0, -1e9)
    nty, ntx = h // tile, w // tile
    ty = jnp.arange(nty) * tile
    tx = jnp.arange(ntx) * tile
    ov_x = (lo[None, :, 0] < (tx[:, None] + tile)) & (hi[None, :, 0] > tx[:, None])
    ov_y = (lo[None, :, 1] < (ty[:, None] + tile)) & (hi[None, :, 1] > ty[:, None])
    overlap = (ov_y[:, None, :] & ov_x[None, :, :]).reshape(nty * ntx, f)
    sel_score, sel_idx = lax.top_k(overlap.astype(jnp.float32), k)  # (T, K)
    sel_valid = sel_score > 0.5

    t_total = nty * ntx
    pad_t = (-t_total) % tiles_per_step
    if pad_t:
        sel_idx = jnp.concatenate(
            [sel_idx, jnp.zeros((pad_t, k), sel_idx.dtype)])
        sel_valid = jnp.concatenate([sel_valid, jnp.zeros((pad_t, k), bool)])
    n_steps = sel_idx.shape[0] // tiles_per_step

    base = _pixel_grid(tile, tile)                   # (tile², 2)
    tids = jnp.arange(sel_idx.shape[0])
    tile_off = jnp.stack([(tids % ntx) * tile, (tids // ntx) * tile], -1)

    def body(_, inp):
        idxs, valids, offs = inp                     # (S, K) (S, K) (S, 2)
        tri_sel = tri[idxs]                          # (S, K, 3, 3)
        pix = base[None] + offs[:, None, :].astype(base.dtype)  # (S, P, 2)

        def one(pix_t, tri_t, val_t, idx_t):
            zs = tri_t[..., 2]                       # (K, 3)
            okk = val_t & jnp.all(zs > znear, axis=-1)
            _, bary, inside = _face_coverage(pix_t, tri_t[..., :2])
            inv_z = jnp.sum(bary / zs[None], axis=-1)          # (P, K)
            zpix = 1.0 / jnp.maximum(inv_z, 1e-12)
            zpix = jnp.where(inside & okk[None], zpix, _BIG)
            zmin = jnp.min(zpix, axis=1)
            amin = jnp.argmin(zpix, axis=1)
            fid = jnp.where(zmin < _BIG * 0.5,
                            idx_t[amin].astype(jnp.int32), -1)
            return zmin, fid

        return None, jax.vmap(one)(pix, tri_sel, valids, idxs)

    steps = (sel_idx.reshape(n_steps, tiles_per_step, k),
             sel_valid.reshape(n_steps, tiles_per_step, k),
             tile_off.reshape(n_steps, tiles_per_step, 2))
    _, (zmins, fids) = lax.scan(body, None, steps)
    zmins = zmins.reshape(-1, tile * tile)[:t_total]
    fids = fids.reshape(-1, tile * tile)[:t_total]

    def detile(x):
        return (x.reshape(nty, ntx, tile, tile)
                .transpose(0, 2, 1, 3).reshape(h * w))

    return _fragments_from_zbuffer(verts_screen, faces,
                                   detile(zmins), detile(fids), image_hw)


def max_faces_per_tile(
    verts_screen: jnp.ndarray,
    faces: jnp.ndarray,
    image_hw: Tuple[int, int],
    faces_mask: Optional[jnp.ndarray] = None,
    znear: float = 1e-3,
    tile: int = 64,
) -> jnp.ndarray:
    """Exact per-tile overlap maximum (scalar) — the K that makes
    :func:`rasterize_hard_binned` lossless."""
    h, w = image_hw
    f = faces.shape[0]
    tri = verts_screen[faces]
    fmask = jnp.ones(f, bool) if faces_mask is None else faces_mask
    ok = fmask & jnp.all(tri[..., 2] > znear, axis=-1)
    uv = tri[..., :2]
    lo = jnp.where(ok[:, None], jnp.min(uv, axis=1) - 1.0, 1e9)
    hi = jnp.where(ok[:, None], jnp.max(uv, axis=1) + 1.0, -1e9)
    nty, ntx = h // tile, w // tile
    ty = jnp.arange(nty) * tile
    tx = jnp.arange(ntx) * tile
    ov_x = (lo[None, :, 0] < (tx[:, None] + tile)) & (hi[None, :, 0] > tx[:, None])
    ov_y = (lo[None, :, 1] < (ty[:, None] + tile)) & (hi[None, :, 1] > ty[:, None])
    counts = jnp.sum((ov_y[:, None, :] & ov_x[None, :, :]).astype(jnp.int32),
                     axis=-1)
    return jnp.max(counts)


_K_BUCKETS = (128, 256, 512, 1024, 2048)


def rasterize_hard_auto(
    verts_screen: jnp.ndarray,
    faces: jnp.ndarray,
    image_hw: Tuple[int, int],
    faces_mask: Optional[jnp.ndarray] = None,
    znear: float = 1e-3,
    chunk: int = 256,
    tile: int = 64,
) -> Fragments:
    """HOST-LEVEL dispatcher (not traceable): measures the true per-tile
    face overlap, picks the smallest lossless K bucket, and runs the binned
    rasterizer — falling back to the dense streaming path when the image
    isn't tile-aligned or the scene is too dense/small for binning to win."""
    h, w = image_hw
    f = faces.shape[0]
    if h % tile or w % tile or f <= 2 * _K_BUCKETS[0]:
        return _rasterize_hard_jit(verts_screen, faces, image_hw=image_hw,
                                   faces_mask=faces_mask, znear=znear,
                                   chunk=chunk)
    kmax = int(_max_faces_per_tile_jit(verts_screen, faces,
                                       image_hw=image_hw,
                                       faces_mask=faces_mask, tile=tile))
    k = next((b for b in _K_BUCKETS if b >= kmax), None)
    if k is None or k >= f:
        return _rasterize_hard_jit(verts_screen, faces, image_hw=image_hw,
                                   faces_mask=faces_mask, znear=znear,
                                   chunk=chunk)
    return _rasterize_hard_binned_jit(
        verts_screen, faces, image_hw=image_hw, faces_mask=faces_mask,
        znear=znear, tile=tile, faces_per_tile=k)


# module-level jitted aliases: a FRESH jax.jit wrapper per call would
# retrace + recompile every time (the tunnel makes that seconds per call)
_rasterize_hard_jit = jax.jit(
    rasterize_hard, static_argnames=("image_hw", "chunk"))
_rasterize_hard_binned_jit = jax.jit(
    rasterize_hard_binned,
    static_argnames=("image_hw", "tile", "faces_per_tile", "tiles_per_step"))
_max_faces_per_tile_jit = jax.jit(
    max_faces_per_tile, static_argnames=("image_hw", "tile"))


def _aligned_bary(pix: jnp.ndarray, tri2: jnp.ndarray) -> jnp.ndarray:
    """Screen barycentrics with pixel↔face axes aligned: pix (P,2), tri2 (P,3,2)."""
    v0, v1, v2 = tri2[:, 0], tri2[:, 1], tri2[:, 2]

    def edge(a, b):
        return (b[:, 0] - a[:, 0]) * (pix[:, 1] - a[:, 1]) - \
               (b[:, 1] - a[:, 1]) * (pix[:, 0] - a[:, 0])

    e0 = edge(v0, v1)
    e1 = edge(v1, v2)
    e2 = edge(v2, v0)
    area = (v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1]) - \
           (v1[:, 1] - v0[:, 1]) * (v2[:, 0] - v0[:, 0])
    denom = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    return jnp.stack([e1 / denom, e2 / denom, e0 / denom], axis=-1)


def interpolate_attributes(
    frag: Fragments,
    faces: jnp.ndarray,
    vertex_attrs: jnp.ndarray,
) -> jnp.ndarray:
    """Gather + barycentric-blend per-vertex attributes to pixels.

    vertex_attrs: (V, D) → (H, W, D), zeros on background.
    """
    h, w = frag.face_idx.shape
    fid = frag.face_idx.reshape(-1)
    safe = jnp.maximum(fid, 0)
    tri_attr = vertex_attrs[faces[safe]]            # (P, 3, D)
    out = jnp.einsum("pk,pkd->pd", frag.bary.reshape(-1, 3), tri_attr)
    out = jnp.where((fid >= 0)[:, None], out, 0.0)
    return out.reshape(h, w, -1)


def phong_shade(
    frag: Fragments,
    faces: jnp.ndarray,
    verts_world: jnp.ndarray,
    normals_world: jnp.ndarray,
    colors: jnp.ndarray,
    light_pos: jnp.ndarray,
    camera_pos: jnp.ndarray,
    ambient: float = 0.35,
    diffuse: float = 0.6,
    specular: float = 0.15,
    shininess: float = 32.0,
    background: float = 1.0,
) -> jnp.ndarray:
    """Per-pixel Phong shading of a rasterized mesh → (H, W, 3) in [0, 1].

    Equivalent of pytorch3d HardPhongShader + PointLights
    (reference: render_utils.py:108-119), used for optimization GIF frames.
    """
    pos = interpolate_attributes(frag, faces, verts_world)
    nrm = interpolate_attributes(frag, faces, normals_world)
    col = interpolate_attributes(frag, faces, colors)
    n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)
    l = light_pos - pos
    l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-8)
    v = camera_pos - pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    ndl = jnp.abs(jnp.sum(n * l, -1, keepdims=True))
    refl = 2 * jnp.sum(n * l, -1, keepdims=True) * n - l
    spec = jnp.maximum(jnp.sum(refl * v, -1, keepdims=True), 0.0) ** shininess
    shaded = col * (ambient + diffuse * ndl) + specular * spec
    bg = (frag.face_idx < 0)[..., None]
    return jnp.clip(jnp.where(bg, background, shaded), 0.0, 1.0)


def render_points_soft(
    points_screen: jnp.ndarray,
    image_hw: Tuple[int, int],
    radius_px: float = 3.0,
    colors: Optional[jnp.ndarray] = None,
    points_mask: Optional[jnp.ndarray] = None,
    chunk: int = 1024,
    znear: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Point-cloud splatting (pytorch3d PointsRasterizer analog —
    render_utils.py:122-140, radius 0.003 NDC ≈ 1.5 px @1024, used for
    debug renders). Z-ordered nearest-point coloring with soft alpha.

    Returns (rgb (H, W, 3), alpha (H, W)).
    """
    h, w = image_hw
    pix = _pixel_grid(h, w)
    n = points_screen.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    pts = points_screen
    if pad:
        pts = jnp.concatenate([pts, jnp.full((pad, 3), -1e6, pts.dtype)])
    pmask = jnp.ones(n, bool) if points_mask is None else points_mask
    if pad:
        pmask = jnp.concatenate([pmask, jnp.zeros(pad, bool)])
    cols = colors if colors is not None else jnp.ones((n, 3), pts.dtype) * 0.5
    if pad:
        cols = jnp.concatenate([cols, jnp.zeros((pad, 3), cols.dtype)])
    num_chunks = pts.shape[0] // chunk
    p_c = pts.reshape(num_chunks, chunk, 3)
    m_c = pmask.reshape(num_chunks, chunk)
    c_c = cols.reshape(num_chunks, chunk, 3)
    r2 = radius_px * radius_px

    def body(carry, inp):
        best_z, best_rgb, acc_log = carry
        pc, mk, cc = inp
        d2 = jnp.sum((pix[:, None, :] - pc[None, :, :2]) ** 2, -1)  # (P, C)
        hit = (d2 <= r2) & mk[None, :] & (pc[None, :, 2] > znear)
        z = jnp.where(hit, pc[None, :, 2], _BIG)
        zmin = jnp.min(z, axis=1)
        imin = jnp.argmin(z, axis=1)
        rgb = cc[imin]
        take = zmin < best_z
        # soft alpha: accumulate per-point coverage
        cover = jnp.where(hit, 1.0 - d2 / r2, 0.0)
        acc_log = acc_log + jnp.sum(jnp.log1p(-jnp.minimum(cover, 1 - 1e-6)), axis=1)
        return (jnp.where(take, zmin, best_z),
                jnp.where(take[:, None], rgb, best_rgb),
                acc_log), None

    init = (jnp.full(h * w, _BIG, pts.dtype),
            jnp.ones((h * w, 3), pts.dtype),
            jnp.zeros(h * w, pts.dtype))
    (z, rgb, acc), _ = lax.scan(body, init, (p_c, m_c, c_c))
    alpha = 1.0 - jnp.exp(acc)
    rgb = jnp.where((z < _BIG)[:, None], rgb, 1.0)
    return rgb.reshape(h, w, 3), alpha.reshape(h, w)
