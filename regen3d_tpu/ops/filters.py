"""Point-cloud filters + normal estimation (phase-5 pipeline ops).

Replaces: per-axis quantile trim and DBSCAN largest-cluster filters
(reference: pc_utils.py:79-153), Open3D normal estimation + consistent
orientation (extract_pc_object.py:188-225).

TPU design notes:
  * Filters return boolean KEEP MASKS, not compacted arrays — static shapes
    under jit; compaction happens host-side only at file export.
  * DBSCAN is reformulated as density-filtered connected components via
    iterative min-label propagation over the eps-graph — O(N²/chunk) MXU
    distance tiles per sweep, log-diameter sweeps, no host loop.
  * Normals: KNN → per-point 3x3 covariance eigendecomposition (batched
    eigh), oriented toward the camera (sufficient for Poisson meshing and
    matching the artifact contract).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from regen3d_tpu.ops.knn import _pairwise_sqdist, knn_points


def quantile_filter(
    points: jnp.ndarray,
    q: float = 0.02,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Keep points inside the [q, 1−q] quantile box per axis
    (reference: filter_points_by_quantile, pc_utils.py:79-108)."""
    if mask is None:
        lo = jnp.quantile(points, q, axis=0)
        hi = jnp.quantile(points, 1.0 - q, axis=0)
    else:
        # masked quantile: push invalid to NaN and use nanquantile
        p = jnp.where(mask[:, None], points, jnp.nan)
        lo = jnp.nanquantile(p, q, axis=0)
        hi = jnp.nanquantile(p, 1.0 - q, axis=0)
    keep = jnp.all((points >= lo) & (points <= hi), axis=-1)
    if mask is not None:
        keep = keep & mask
    return keep


def dbscan_largest_cluster(
    points: jnp.ndarray,
    eps: float = 0.1,
    min_points: int = 10,
    mask: Optional[jnp.ndarray] = None,
    num_sweeps: int = 32,
    chunk: int = 1024,
) -> jnp.ndarray:
    """Keep-mask of the largest DBSCAN cluster
    (reference: filter_dbscan, pc_utils.py:112-153, sklearn-backed).

    Reformulation: a point is *core* if ≥ min_points neighbours within eps.
    Labels start as point indices; each sweep assigns every point the min
    label among its in-eps core neighbours (plus itself if core). Converges
    to connected components of the core graph with border attachment in
    O(graph diameter) sweeps (capped at num_sweeps).
    """
    n = points.shape[0]
    valid = jnp.ones(n, bool) if mask is None else mask
    eps2 = eps * eps
    chunk = min(chunk, n)
    pad = (-n) % chunk
    pts = jnp.concatenate([points, jnp.full((pad, 3), 1e15, points.dtype)]) if pad else points
    vmask = jnp.concatenate([valid, jnp.zeros(pad, bool)]) if pad else valid
    m = pts.shape[0]
    num_chunks = m // chunk

    # degree count (streamed)
    def deg_body(carry, ci):
        yc = lax.dynamic_slice_in_dim(pts, ci * chunk, chunk)
        mc = lax.dynamic_slice_in_dim(vmask, ci * chunk, chunk)
        d = _pairwise_sqdist(points, yc)
        return carry + jnp.sum((d <= eps2) & mc[None, :], axis=1), None

    deg, _ = lax.scan(deg_body, jnp.zeros(n, jnp.int32), jnp.arange(num_chunks))
    core = (deg >= min_points) & valid

    core_pad = jnp.concatenate([core, jnp.zeros(pad, bool)]) if pad else core
    big_label = jnp.int32(2**30)

    def sweep(labels, _):
        lab_pad = jnp.concatenate([labels, jnp.full(pad, big_label, jnp.int32)]) if pad else labels

        def body(best, ci):
            yc = lax.dynamic_slice_in_dim(pts, ci * chunk, chunk)
            lc = lax.dynamic_slice_in_dim(lab_pad, ci * chunk, chunk)
            cc = lax.dynamic_slice_in_dim(core_pad, ci * chunk, chunk)
            d = _pairwise_sqdist(points, yc)
            neigh = (d <= eps2) & cc[None, :]
            cand = jnp.where(neigh, lc[None, :], big_label)
            return jnp.minimum(best, jnp.min(cand, axis=1)), None

        best, _ = lax.scan(body, jnp.full(n, big_label, jnp.int32),
                           jnp.arange(num_chunks))
        # core points adopt the min; border points attach but don't propagate
        new = jnp.minimum(labels, best)
        new = jnp.where(valid, new, big_label)
        return new, None

    init = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), big_label)
    labels, _ = lax.scan(sweep, init, None, length=num_sweeps)

    # biggest cluster by vote: count label occurrences via segment trick
    counts = jnp.zeros(n + 1, jnp.int32).at[jnp.clip(labels, 0, n)].add(
        jnp.where(valid & (labels < big_label), 1, 0))
    best_label = jnp.argmax(counts[:n])
    return valid & (labels == best_label)


def estimate_normals(
    points: jnp.ndarray,
    k: int = 30,
    viewpoint: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> jnp.ndarray:
    """Per-point normals from KNN-PCA, oriented toward ``viewpoint``
    (reference: Open3D estimate_normals + orientation,
    extract_pc_object.py:188-211)."""
    _, idx = knn_points(points, points, k, y_mask=mask, chunk=chunk)
    neigh = points[idx]                        # (N, K, 3)
    mu = jnp.mean(neigh, axis=1, keepdims=True)
    x = neigh - mu
    cov = jnp.einsum("nki,nkj->nij", x, x) / k  # (N, 3, 3)
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[..., 0]                     # smallest eigvec
    if viewpoint is not None:
        to_vp = viewpoint - points
        sign = jnp.sign(jnp.sum(normals * to_vp, axis=-1, keepdims=True))
        normals = normals * jnp.where(sign == 0, 1.0, sign)
    return normals


# whole-op jit (cached per shape): phases 5 and 7 call this per scene with
# 100k-point clouds — eager dispatch pays a tunnel round-trip per op
estimate_normals = jax.jit(estimate_normals,
                           static_argnames=("k", "chunk"))


def pca_align(
    src: jnp.ndarray,
    dst: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotation+translation aligning src's principal axes to dst's
    (reference: align_clouds_pca, scene_optim.py:29-64 /
    align_pointclouds_pca, minimal_demo_vggt_unproject.py:122-186).
    Sign-disambiguated so the rotation is proper. Returns (R, t) for
    ``src @ R + t``."""

    def axes_of(p):
        mu = jnp.mean(p, axis=0)
        x = p - mu
        cov = x.T @ x / p.shape[0]
        _, v = jnp.linalg.eigh(cov)
        return mu, v  # columns ascending

    mu_s, v_s = axes_of(src)
    mu_d, v_d = axes_of(dst)
    R = v_s @ v_d.T
    # ensure a proper rotation (det +1): flip the least-significant axis
    det = jnp.linalg.det(R)
    v_s_fixed = v_s.at[:, 0].multiply(jnp.where(det < 0, -1.0, 1.0))
    R = v_s_fixed @ v_d.T
    t = mu_d - mu_s @ R
    return R, t
