"""Mesh surface sampling (pytorch3d ``sample_points_from_meshes`` analog).

Used for GLB→point-cloud conversion (reference: global_utils.py:739-744,
100k samples at scene_optim.py:213-235) and metric evaluation.

TPU design: area-weighted face selection via a single categorical draw over
log-areas (Gumbel trick inside jax.random.categorical) + uniform barycentric
coordinates — one fused program, no host-side multinomial.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def face_areas(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(V,3),(F,3)int → (F,) triangle areas."""
    tri = verts[faces]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    return 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)


def sample_points_from_meshes(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    num_samples: int,
    key: jax.Array,
    faces_mask: Optional[jnp.ndarray] = None,
    return_normals: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Uniform-over-surface samples from a triangle mesh.

    Args:
      verts: (V, 3). faces: (F, 3) int. num_samples: static int.
      faces_mask: optional bool (F,) for padded meshes.
      return_normals: also return per-sample face normals.

    Returns (points (num_samples, 3)[, normals (num_samples, 3)]).
    """
    areas = face_areas(verts, faces)
    if faces_mask is not None:
        areas = jnp.where(faces_mask, areas, 0.0)
    logits = jnp.log(jnp.maximum(areas, 1e-30))
    k_face, k_bary = jax.random.split(key)
    fidx = jax.random.categorical(k_face, logits, shape=(num_samples,))
    tri = verts[faces[fidx]]  # (S, 3, 3)

    # uniform barycentric via the sqrt trick
    u = jax.random.uniform(k_bary, (num_samples, 2))
    su = jnp.sqrt(u[:, 0])
    w0 = 1.0 - su
    w1 = su * (1.0 - u[:, 1])
    w2 = su * u[:, 1]
    pts = w0[:, None] * tri[:, 0] + w1[:, None] * tri[:, 1] + w2[:, None] * tri[:, 2]

    if not return_normals:
        return (pts,)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return pts, n
