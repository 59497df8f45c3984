"""Nearest-neighbour / KNN / Chamfer ops, MXU-native.

Replaces the reference's in-repo CUDA chamfer kernel
(src/utils/chamfer_distance/chamfer_distance.cu — shared-memory tiled
brute force) and pytorch3d's ``knn_points`` / ``chamfer_distance``.

TPU design: instead of a hand-tiled gather kernel, squared distances are
computed with the matmul identity ‖x−y‖² = ‖x‖² + ‖y‖² − 2·x·yᵀ so the
O(N·M) work runs on the MXU as a (N,3)×(3,M) contraction, streamed over
target chunks with `lax.scan` so the (Nc, Mc) distance tile never leaves
VMEM. The backward pass is a custom VJP that recomputes against the saved
argmin indices (O(N) gather) instead of re-materializing the distance
matrix.

All functions take optional validity masks so padded (static-shape) clouds
work under jit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_BIG = 1e30


def _pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(N,3),(M,3) → (N,M) squared euclidean distances via MXU contraction."""
    # f32 accumulation; inputs are small-dim (3) so precision is fine.
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # (N, 1)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True).T        # (1, M)
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32)  # (N, M) on MXU
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def _chunked_nn(
    x: jnp.ndarray,
    y: jnp.ndarray,
    y_mask: Optional[jnp.ndarray],
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each x: (min sq-dist to valid y, argmin index). Streams y in chunks."""
    n = x.shape[0]
    m = y.shape[0]
    chunk = min(chunk, m)
    pad = (-m) % chunk
    if pad:
        y = jnp.concatenate([y, jnp.zeros((pad, 3), y.dtype)], axis=0)
        pad_mask = jnp.concatenate(
            [jnp.ones(m, bool) if y_mask is None else y_mask,
             jnp.zeros(pad, bool)], axis=0)
    else:
        pad_mask = y_mask if y_mask is not None else None
    num_chunks = y.shape[0] // chunk
    y_c = y.reshape(num_chunks, chunk, 3)
    mask_c = None if pad_mask is None else pad_mask.reshape(num_chunks, chunk)

    def body(carry, inp):
        best_d, best_i = carry
        if mask_c is None:
            yc, ci = inp
            mk = None
        else:
            yc, mk, ci = inp
        d = _pairwise_sqdist(x, yc)                       # (N, chunk)
        if mk is not None:
            d = jnp.where(mk[None, :], d, _BIG)
        dmin = jnp.min(d, axis=1)
        imin = jnp.argmin(d, axis=1).astype(jnp.int32) + ci * chunk
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d), jnp.where(take, imin, best_i)), None

    init = (jnp.full((n,), _BIG, jnp.float32), jnp.zeros((n,), jnp.int32))
    cidx = jnp.arange(num_chunks, dtype=jnp.int32)
    xs = (y_c, cidx) if mask_c is None else (y_c, mask_c, cidx)
    (best_d, best_i), _ = lax.scan(body, init, xs)
    return best_d, best_i


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def nn_distances(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
    y_mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Squared distance + index of the nearest valid y for every x.

    Args:
      x: (N, 3) query points.  y: (M, 3) target points.
      x_mask/y_mask: optional bool validity masks for padded clouds.
      chunk: y streaming chunk (VMEM tile height).

    Returns: (sqdist (N,), idx (N,) int32). Invalid x rows get sqdist 0.
    """
    d, i = _chunked_nn(x, y, y_mask, chunk)
    if x_mask is not None:
        d = jnp.where(x_mask, d, 0.0)
    return d, i


def _nn_fwd(x, y, x_mask, y_mask, chunk):
    d, i = nn_distances(x, y, x_mask, y_mask, chunk)
    return (d, i), (x, y, i, x_mask)


def _nn_bwd(chunk, res, g):
    x, y, idx, x_mask = res
    g_d = g[0]  # (N,) cotangent on squared distances; indices are int (no grad)
    y_near = y[idx]                       # (N, 3) gather of nearest targets
    diff = 2.0 * (x - y_near)             # d‖x−y*‖²/dx with y* fixed
    if x_mask is not None:
        diff = jnp.where(x_mask[:, None], diff, 0.0)
    gx = g_d[:, None] * diff
    # dL/dy: scatter-add −grad to the matched targets
    gy = jnp.zeros_like(y).at[idx].add(-gx)
    return gx, gy, None, None


nn_distances.defvjp(_nn_fwd, _nn_bwd)


def knn_points(
    x: jnp.ndarray,
    y: jnp.ndarray,
    k: int,
    y_mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K nearest valid targets for each query (pytorch3d ``knn_points`` analog,
    used by normal estimation and cloud matching).

    Returns (sqdists (N, K), idx (N, K)) sorted ascending. Streams y in
    chunks, maintaining a running top-K via merge + lax.top_k (static K).
    """
    n, m = x.shape[0], y.shape[0]
    chunk = min(chunk, m)
    pad = (-m) % chunk
    if pad:
        y = jnp.concatenate([y, jnp.zeros((pad, 3), y.dtype)], axis=0)
        ym = jnp.ones(m, bool) if y_mask is None else y_mask
        y_mask = jnp.concatenate([ym, jnp.zeros(pad, bool)], axis=0)
    num_chunks = y.shape[0] // chunk
    y_c = y.reshape(num_chunks, chunk, 3)
    mask_c = None if y_mask is None else y_mask.reshape(num_chunks, chunk)

    def body(carry, inp):
        best_d, best_i = carry  # (N, K) each
        if mask_c is None:
            yc, ci = inp
            mk = None
        else:
            yc, mk, ci = inp
        d = _pairwise_sqdist(x, yc)
        if mk is not None:
            d = jnp.where(mk[None, :], d, _BIG)
        ii = jnp.broadcast_to(jnp.arange(chunk, dtype=jnp.int32)[None, :],
                              d.shape) + ci * chunk
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, ii], axis=1)
        neg_top, pos = lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (jnp.full((n, k), _BIG, jnp.float32), jnp.zeros((n, k), jnp.int32))
    cidx = jnp.arange(num_chunks, dtype=jnp.int32)
    xs = (y_c, cidx) if mask_c is None else (y_c, mask_c, cidx)
    (d, i), _ = lax.scan(body, init, xs)
    return d, i


def chamfer_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
    y_mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bidirectional NN squared distances + indices.

    Same contract as the reference's ``ChamferDistance`` module
    (chamfer_distance.py:17-69): returns (dist_x→y, dist_y→x, idx_x, idx_y).
    Differentiable through the custom VJP of :func:`nn_distances`.
    """
    d_xy, i_xy = nn_distances(x, y, x_mask, y_mask, chunk)
    d_yx, i_yx = nn_distances(y, x, y_mask, x_mask, chunk)
    return d_xy, d_yx, i_xy, i_yx


def chamfer_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
    y_mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> jnp.ndarray:
    """Symmetric mean chamfer (the scalar used by losses/metrics)."""
    d_xy, d_yx, _, _ = chamfer_distance(x, y, x_mask, y_mask, chunk)
    nx = x.shape[0] if x_mask is None else jnp.maximum(jnp.sum(x_mask), 1)
    ny = y.shape[0] if y_mask is None else jnp.maximum(jnp.sum(y_mask), 1)
    return jnp.sum(d_xy) / nx + jnp.sum(d_yx) / ny
