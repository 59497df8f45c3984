"""Point ↔ triangle-mesh distances (pure JAX, fully vectorized).

Replaces pytorch3d's CUDA ``point_mesh_face_distance`` — the 3D loss term in
the pose optimizer (reference: diff_model.py:234, diff_model_planar.py:214)
and the yaw-grid-search scorer (pose_matching_planar.py:279-306).

TPU design: the closed-form point-to-triangle distance (region
classification via clamped barycentrics) is evaluated for (point, face)
tiles streamed with lax.scan — branch-free jnp.where everywhere, so the
whole thing vectorizes onto the VPU and differentiates cleanly.
"""

from __future__ import annotations

import functools

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_BIG = 1e30


def point_triangle_distance(
    p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray
) -> jnp.ndarray:
    """Squared distance from points to triangles, broadcasting elementwise.

    All inputs (..., 3); returns (...,). Branch-free closed form (Eberly's
    region method re-derived with clamps): project onto the plane, clamp the
    barycentric solution to the triangle, falling back to edge/vertex
    regions via nested `where`.
    """
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    # Region tests (Ericson, "Real-Time Collision Detection" style — standard
    # closed-form; each region yields a candidate closest point).
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-12
    # Edge AB
    v_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) < eps, eps, d1 - d3), 0.0, 1.0)
    p_ab = a + v_ab[..., None] * ab
    # Edge AC
    w_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) < eps, eps, d2 - d6), 0.0, 1.0)
    p_ac = a + w_ac[..., None] * ac
    # Edge BC
    num_bc = d4 - d3
    den_bc = (d4 - d3) + (d5 - d6)
    w_bc = jnp.clip(num_bc / jnp.where(jnp.abs(den_bc) < eps, eps, den_bc), 0.0, 1.0)
    p_bc = b + w_bc[..., None] * (c - b)
    # Interior
    denom = va + vb + vc
    denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
    v_in = vb / denom
    w_in = vc / denom
    p_in = a + v_in[..., None] * ab + w_in[..., None] * ac

    # Select region (priority: vertex A, vertex B, vertex C, edges, interior)
    in_vertex_a = (d1 <= 0) & (d2 <= 0)
    in_vertex_b = (d3 >= 0) & (d4 <= d3)
    in_vertex_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    closest = p_in
    closest = jnp.where(on_bc[..., None], p_bc, closest)
    closest = jnp.where(on_ac[..., None], p_ac, closest)
    closest = jnp.where(on_ab[..., None], p_ab, closest)
    closest = jnp.where(in_vertex_c[..., None], c, closest)
    closest = jnp.where(in_vertex_b[..., None], b, closest)
    closest = jnp.where(in_vertex_a[..., None], a, closest)

    diff = p - closest
    return jnp.sum(diff * diff, -1)


def points_to_mesh_distance(
    points: jnp.ndarray,
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    points_mask: Optional[jnp.ndarray] = None,
    faces_mask: Optional[jnp.ndarray] = None,
    chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min squared distance from each point to the mesh surface.

    Args:
      points: (P, 3). verts: (V, 3). faces: (F, 3) int.
      *_mask: validity masks for padded buffers.
      chunk: face-streaming tile (controls the (P, chunk) VMEM working set).

    Returns: (sqdist (P,), argmin face idx (P,)).
    """
    tri = verts[faces]  # (F, 3, 3)
    f = tri.shape[0]
    chunk = min(chunk, f)
    pad = (-f) % chunk
    if pad:
        tri = jnp.concatenate([tri, jnp.zeros((pad, 3, 3), tri.dtype)], axis=0)
        fm = jnp.ones(f, bool) if faces_mask is None else faces_mask
        faces_mask = jnp.concatenate([fm, jnp.zeros(pad, bool)], axis=0)
    num_chunks = tri.shape[0] // chunk
    tri_c = tri.reshape(num_chunks, chunk, 3, 3)
    mask_c = None if faces_mask is None else faces_mask.reshape(num_chunks, chunk)

    p_b = points[:, None, :]  # (P, 1, 3)

    @jax.checkpoint
    def body(carry, inp):
        best_d, best_i = carry
        if mask_c is None:
            t, ci = inp
            mk = None
        else:
            t, mk, ci = inp
        d = point_triangle_distance(p_b, t[None, :, 0], t[None, :, 1], t[None, :, 2])
        if mk is not None:
            d = jnp.where(mk[None, :], d, _BIG)
        dmin = jnp.min(d, axis=1)
        imin = jnp.argmin(d, axis=1).astype(jnp.int32) + ci * chunk
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d), jnp.where(take, imin, best_i)), None

    init = (jnp.full((points.shape[0],), _BIG, jnp.float32),
            jnp.zeros((points.shape[0],), jnp.int32))
    cidx = jnp.arange(num_chunks, dtype=jnp.int32)
    xs = (tri_c, cidx) if mask_c is None else (tri_c, mask_c, cidx)
    (d, i), _ = lax.scan(body, init, xs)
    if points_mask is not None:
        d = jnp.where(points_mask, d, 0.0)
    return d, i


def _face_to_point_min(tri, points, points_mask, faces_mask, chunk):
    """(min sqdist (F,), argmin point idx (F,)) — face→point term primals."""
    n_p = points.shape[0]
    pchunk = min(chunk, n_p)
    pad = (-n_p) % pchunk
    p = points
    if pad:
        p = jnp.concatenate([p, jnp.zeros((pad, 3), p.dtype)], axis=0)
        pm = jnp.ones(n_p, bool) if points_mask is None else points_mask
        pmask = jnp.concatenate([pm, jnp.zeros(pad, bool)], axis=0)
    else:
        pmask = points_mask
    num_chunks = p.shape[0] // pchunk
    p_c = p.reshape(num_chunks, pchunk, 3)
    pm_c = None if pmask is None else pmask.reshape(num_chunks, pchunk)

    def body(carry, inp):
        best_d, best_i = carry
        if pm_c is None:
            pc, ci = inp
            mk = None
        else:
            pc, mk, ci = inp
        d = point_triangle_distance(
            pc[None, :, :], tri[:, None, 0], tri[:, None, 1], tri[:, None, 2])
        if mk is not None:
            d = jnp.where(mk[None, :], d, _BIG)
        dmin = jnp.min(d, axis=1)
        imin = jnp.argmin(d, axis=1).astype(jnp.int32) + ci * pchunk
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d),
                jnp.where(take, imin, best_i)), None

    init = (jnp.full((tri.shape[0],), _BIG, jnp.float32),
            jnp.zeros((tri.shape[0],), jnp.int32))
    cidx = jnp.arange(num_chunks, dtype=jnp.int32)
    xs = (p_c, cidx) if pm_c is None else (p_c, pm_c, cidx)
    (d, i), _ = lax.scan(body, init, xs)
    return d, i


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def point_mesh_face_distance_fast(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    points: jnp.ndarray,
    points_mask: Optional[jnp.ndarray] = None,
    faces_mask: Optional[jnp.ndarray] = None,
    chunk: int = 512,
) -> jnp.ndarray:
    """Exact :func:`point_mesh_face_distance` with an argmin-pair backward.

    The O(P·F) forward runs WITHOUT autodiff residuals; the backward
    recomputes the distance gradient only on the matched (point, face)
    pairs — O(P+F) work — exactly like the chamfer custom VJP. Gradients
    equal the autodiff ones almost everywhere (argmin is locally constant).
    """
    loss, _res = _pmfd_fwd_impl(verts, faces, points, points_mask,
                                faces_mask, chunk)
    return loss


def _pmfd_fwd_impl(verts, faces, points, points_mask, faces_mask, chunk):
    d_pf, idx_pf = points_to_mesh_distance(points, verts, faces, points_mask,
                                           faces_mask, chunk)
    tri = verts[faces]
    d_fp, idx_fp = _face_to_point_min(tri, points, points_mask, faces_mask,
                                      chunk)
    n_pts = (points.shape[0] if points_mask is None
             else jnp.maximum(jnp.sum(points_mask), 1))
    if faces_mask is not None:
        d_fp = jnp.where(faces_mask, d_fp, 0.0)
        n_f = jnp.maximum(jnp.sum(faces_mask), 1)
    else:
        n_f = faces.shape[0]
    loss = jnp.sum(d_pf) / n_pts + jnp.sum(d_fp) / n_f
    return loss, (idx_pf, idx_fp, n_pts, n_f)


def _pmfd_vjp_fwd(verts, faces, points, points_mask, faces_mask, chunk):
    loss, (idx_pf, idx_fp, n_pts, n_f) = _pmfd_fwd_impl(
        verts, faces, points, points_mask, faces_mask, chunk)
    return loss, (verts, faces, points, points_mask, faces_mask,
                  idx_pf, idx_fp, n_pts, n_f)


def _pmfd_vjp_bwd(chunk, res, g):
    verts, faces, points, points_mask, faces_mask, idx_pf, idx_fp, \
        n_pts, n_f = res

    # point→face pairs: (P,) points vs their matched triangles
    tri_pf = verts[faces[idx_pf]]                       # (P, 3, 3)

    def pf_dist(p, t):
        return point_triangle_distance(p, t[:, 0], t[:, 1], t[:, 2])

    w_pf = (jnp.ones(points.shape[0], jnp.float32) if points_mask is None
            else points_mask.astype(jnp.float32)) * (g / n_pts)
    _, pf_vjp = jax.vjp(pf_dist, points, tri_pf)
    g_points, g_tri_pf = pf_vjp(w_pf)

    # face→point pairs: (F,) triangles vs their matched points
    tri = verts[faces]
    pts_fp = points[idx_fp]                             # (F, 3)

    def fp_dist(t, p):
        return point_triangle_distance(p, t[:, 0], t[:, 1], t[:, 2])

    w_fp = (jnp.ones(faces.shape[0], jnp.float32) if faces_mask is None
            else faces_mask.astype(jnp.float32)) * (g / n_f)
    _, fp_vjp = jax.vjp(fp_dist, tri, pts_fp)
    g_tri_fp, g_pts_fp = fp_vjp(w_fp)

    # scatter triangle grads back to vertices
    g_verts = jnp.zeros_like(verts)
    g_verts = g_verts.at[faces[idx_pf]].add(g_tri_pf)
    g_verts = g_verts.at[faces].add(g_tri_fp)
    g_points = g_points.at[idx_fp].add(g_pts_fp)
    return g_verts, None, g_points, None, None


point_mesh_face_distance_fast.defvjp(_pmfd_vjp_fwd, _pmfd_vjp_bwd)


def point_mesh_face_distance_topk(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    points: jnp.ndarray,
    points_mask: Optional[jnp.ndarray] = None,
    faces_mask: Optional[jnp.ndarray] = None,
    k: int = 16,
    chunk: int = 2048,
) -> jnp.ndarray:
    """Candidate-pruned point↔mesh loss: exact point-triangle distance on the
    k nearest faces (by centroid, MXU KNN) instead of all faces.

    On decimated fit meshes the nearest triangle is essentially always among
    the k=16 nearest centroids (equality with the exact loss is asserted in
    tests at 1e-6 on random meshes), at O(P·k) exact work instead of O(P·F)
    — the MXU does the O(P·F) part as a matmul. Same symmetric structure as
    :func:`point_mesh_face_distance`.
    """
    from regen3d_tpu.ops.knn import knn_points

    tri = verts[faces]                       # (F, 3, 3)
    centroids = jnp.mean(tri, axis=1)        # (F, 3)
    f = tri.shape[0]
    k = min(k, f)

    # --- point → face -----------------------------------------------------------
    _, idx = knn_points(points, centroids, k, y_mask=faces_mask, chunk=chunk)
    cand = tri[idx]                          # (P, k, 3, 3)
    d = point_triangle_distance(points[:, None, :], cand[:, :, 0],
                                cand[:, :, 1], cand[:, :, 2])   # (P, k)
    if faces_mask is not None:
        d = jnp.where(faces_mask[idx], d, _BIG)
    d_pf = jnp.min(d, axis=1)
    if points_mask is not None:
        d_pf = jnp.where(points_mask, d_pf, 0.0)
        term_pf = jnp.sum(d_pf) / jnp.maximum(jnp.sum(points_mask), 1)
    else:
        term_pf = jnp.mean(d_pf)

    # --- face → point -----------------------------------------------------------
    kp = min(k, points.shape[0])
    _, pidx = knn_points(centroids, points, kp, y_mask=points_mask, chunk=chunk)
    cand_p = points[pidx]                    # (F, kp, 3)
    d2 = point_triangle_distance(cand_p, tri[:, None, 0], tri[:, None, 1],
                                 tri[:, None, 2])               # (F, kp)
    if points_mask is not None:
        d2 = jnp.where(points_mask[pidx], d2, _BIG)
    d_fp = jnp.min(d2, axis=1)
    if faces_mask is not None:
        d_fp = jnp.where(faces_mask, d_fp, 0.0)
        term_fp = jnp.sum(d_fp) / jnp.maximum(jnp.sum(faces_mask), 1)
    else:
        term_fp = jnp.mean(d_fp)
    return term_pf + term_fp


def point_mesh_face_distance(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    points: jnp.ndarray,
    points_mask: Optional[jnp.ndarray] = None,
    faces_mask: Optional[jnp.ndarray] = None,
    chunk: int = 512,
) -> jnp.ndarray:
    """Symmetric point↔mesh loss matching pytorch3d's
    ``point_mesh_face_distance`` semantics: mean over points of min-face
    sq-distance + mean over faces of min-point sq-distance.

    Differentiable w.r.t. ``verts`` and ``points`` (the loss consumed every
    optimizer step — reference diff_model.py:234).
    """
    # point → face term
    d_pf, _ = points_to_mesh_distance(points, verts, faces, points_mask,
                                      faces_mask, chunk)
    if points_mask is None:
        term_pf = jnp.mean(d_pf)
    else:
        term_pf = jnp.sum(d_pf) / jnp.maximum(jnp.sum(points_mask), 1)

    # face → point term: for each face, min over points of point-tri dist.
    tri = verts[faces]  # (F, 3, 3)
    p = points
    n_p = p.shape[0]
    pchunk = min(chunk, n_p)
    pad = (-n_p) % pchunk
    if pad:
        p = jnp.concatenate([p, jnp.zeros((pad, 3), p.dtype)], axis=0)
        pm = jnp.ones(n_p, bool) if points_mask is None else points_mask
        pmask = jnp.concatenate([pm, jnp.zeros(pad, bool)], axis=0)
    else:
        pmask = points_mask
    num_chunks = p.shape[0] // pchunk
    p_c = p.reshape(num_chunks, pchunk, 3)
    pm_c = None if pmask is None else pmask.reshape(num_chunks, pchunk)

    @jax.checkpoint
    def body(best, inp):
        if pm_c is None:
            pc = inp
            mk = None
        else:
            pc, mk = inp
        d = point_triangle_distance(
            pc[None, :, :], tri[:, None, 0], tri[:, None, 1], tri[:, None, 2]
        )  # (F, pchunk)
        if mk is not None:
            d = jnp.where(mk[None, :], d, _BIG)
        return jnp.minimum(best, jnp.min(d, axis=1)), None

    init = jnp.full((tri.shape[0],), _BIG, jnp.float32)
    xs = p_c if pm_c is None else (p_c, pm_c)
    d_fp, _ = lax.scan(body, init, xs)
    if faces_mask is not None:
        d_fp = jnp.where(faces_mask, d_fp, 0.0)
        term_fp = jnp.sum(d_fp) / jnp.maximum(jnp.sum(faces_mask), 1)
    else:
        term_fp = jnp.mean(d_fp)
    return term_pf + term_fp
