"""SO(3) utilities in pure JAX — jit/vmap/grad-safe everywhere.

Replaces the reference's pytorch3d ``so3_exponential_map`` (used by the pose
models at src/scene_reconstruction/source/diff_model.py:7,158-191) and the
assorted Rodrigues/axis-angle helpers in pose_matching_planar.py.

Conventions: rotation matrices act on ROW vectors from the right
(``x_rot = x @ R``) to match the pytorch3d-style camera math used throughout
the pipeline, unless a function says otherwise. All functions are
batch-friendly via vmap; none contain data-dependent Python control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector: hat(v) @ x = v × x (column conv.)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(log_rot: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) or (..., 3) → rotation matrix (..., 3, 3).

    Rodrigues with a Taylor-stable small-angle branch so gradients are finite
    at the identity (the pose optimizer starts there).
    """
    theta2 = jnp.sum(log_rot * log_rot, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with stable small-angle limits
    sin_over = jnp.sin(theta) / theta
    one_minus_cos_over = (1.0 - jnp.cos(theta)) / (theta * theta)
    K = _hat(log_rot)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), K.shape)
    return (
        eye
        + sin_over[..., None, None] * K
        + one_minus_cos_over[..., None, None] * KK
    )


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) → axis-angle (..., 3).

    Returns the canonical representative (angle ≤ π). Numerically safe both
    near the identity (Taylor-stable scale) and near π, where the
    antisymmetric part vanishes and the axis is recovered from the diagonal
    instead (branch-free select).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    # antisymmetric part carries 2·sin(theta)·axis
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    scale = theta / jnp.maximum(2.0 * jnp.sin(theta), _EPS)
    v_std = w * scale[..., None]

    # Near π: |axis_i| from the diagonal (R_ii = cosθ + axis_i²(1−cosθ)),
    # signs from the (small but sign-reliable) antisymmetric part.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    denom = jnp.maximum(1.0 - cos_theta, _EPS)[..., None]
    axis_abs = jnp.sqrt(jnp.clip((diag - cos_theta[..., None]) / denom, 0.0, 1.0))
    sign = jnp.where(w >= 0, 1.0, -1.0)
    v_pi = theta[..., None] * axis_abs * sign

    near_pi = (theta > 3.0)[..., None]
    return jnp.where(near_pi, v_pi, v_std)


def rotation_about_axis(angle: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Elementary rotation matrix about 'x' | 'y' | 'z'. angle: scalar or (...)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    if axis == "x":
        rows = [[one, zero, zero], [zero, c, -s], [zero, s, c]]
    elif axis == "y":
        rows = [[c, zero, s], [zero, one, zero], [-s, zero, c]]
    elif axis == "z":
        rows = [[c, -s, zero], [s, c, zero], [zero, zero, one]]
    else:
        raise ValueError(f"axis must be x|y|z, got {axis}")
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def yaw_rotation(yaw: jnp.ndarray) -> jnp.ndarray:
    """Rotation about the world up axis (+Y, as in the pose fit's 5-DOF mode,
    reference: diff_model_planar.py:158-191)."""
    return rotation_about_axis(yaw, "y")


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz → rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) → unit quaternion (..., 4) wxyz.

    Branch-free Shepperd variant: compute all four candidate quaternions and
    select the numerically largest pivot with jnp.where (jit-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0) + _EPS)

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], -1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], -1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], -1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], -1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    best = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(qs, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def random_rotation(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform random rotation matrices via normalized quaternions."""
    q = jax.random.normal(key, shape + (4,))
    return quat_to_matrix(q)
