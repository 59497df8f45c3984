"""Pixel-space perspective camera (pure JAX, jit/vmap/grad safe).

Replaces pytorch3d ``PerspectiveCameras(in_ndc=False)`` as configured by the
reference at src/scene_reconstruction/source/utils_SR/cam_utils.py:28-87:
screen-space focal/principal point in pixels, row-vector view transform, and
the camera.npz contract {extrinsic, focal, image_size, camera_angle_x}
(reference: minimal_demo_vggt.py:189-204).

Frames:
  * view frame ("P3D"): +X left, +Y up, +Z forward. ``x_view = x_world @ R + T``.
  * screen: origin top-left, +u right, +v down, in pixels.

Projection (pytorch3d transform_points_screen semantics — the view frame is
+X left / +Y up so image coordinates carry the sign flip):
``u = cx − fx·x/z``, ``v = cy − fy·y/z``, depth ``z``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from regen3d_tpu.transforms.conventions import blender_to_p3d


class Camera(NamedTuple):
    """Single pinhole camera with screen-space intrinsics.

    All fields are arrays so a batch of cameras is just a vmapped Camera.
    """

    R: jnp.ndarray           # (3, 3) world→view rotation (row-vector conv.)
    T: jnp.ndarray           # (3,)  world→view translation
    focal: jnp.ndarray       # (2,) fx, fy in pixels
    principal: jnp.ndarray   # (2,) cx, cy in pixels
    image_size: Tuple[int, int]  # (H, W) static python ints (render target)
    znear: float = 0.1
    zfar: float = 50.0

    # --- transforms ----------------------------------------------------------
    def world_to_view(self, points: jnp.ndarray) -> jnp.ndarray:
        return points @ self.R + self.T

    def view_to_world(self, points: jnp.ndarray) -> jnp.ndarray:
        return (points - self.T) @ self.R.T

    @property
    def center(self) -> jnp.ndarray:
        """Camera center in world coordinates."""
        return -self.T @ self.R.T

    def project(self, points_world: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """World points (..., 3) → (screen_uv (..., 2), depth (...,)).

        P3D-sign pinhole: u = cx − fx·x/z, v = cy − fy·y/z. This matches
        pytorch3d's ``transform_points_screen`` for ``in_ndc=False`` cameras
        (the P3D view frame is +X left / +Y up, and the NDC→screen step
        carries an xy-flip into image coordinates), as configured by the
        reference at cam_utils.py:28-87. Verified by the reference-artifact
        fixture test (tests/test_reference_artifacts.py).
        """
        v = self.world_to_view(points_world)
        z = v[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        u = self.principal[0] - self.focal[0] * v[..., 0] / z_safe
        vv = self.principal[1] - self.focal[1] * v[..., 1] / z_safe
        return jnp.stack([u, vv], axis=-1), z

    def unproject(self, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """Screen pixels (..., 2) + view-space depth (...,) → world (..., 3)."""
        x = (self.principal[0] - uv[..., 0]) * depth / self.focal[0]
        y = (self.principal[1] - uv[..., 1]) * depth / self.focal[1]
        v = jnp.stack([x, y, depth], axis=-1)
        return self.view_to_world(v)

    def view_to_screen(self, points_view: jnp.ndarray) -> jnp.ndarray:
        """View-space (..., 3) → (u, v, z) screen coords with depth kept."""
        z = points_view[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        u = self.principal[0] - self.focal[0] * points_view[..., 0] / z_safe
        v = self.principal[1] - self.focal[1] * points_view[..., 1] / z_safe
        return jnp.stack([u, v, z], axis=-1)

    def pixel_rays_world(self, xx: jnp.ndarray, yy: jnp.ndarray
                         ) -> jnp.ndarray:
        """Unit world-space ray directions through pixels (xx, yy) — the
        inverse of the P3D-sign pinhole in :meth:`project` (z = +1 view
        plane, rotated to world). Used for environment-map backgrounds."""
        x = (self.principal[0] - xx) / self.focal[0]
        y = (self.principal[1] - yy) / self.focal[1]
        d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1) @ self.R.T
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                               1e-8)

    def rescaled(self, height: int, width: int) -> "Camera":
        """New camera for a different render resolution.

        Focal scales by the height ratio (vertical-FOV-preserving, matching
        cam_utils.py:56-70); the principal point recenters on the new image.
        """
        scale = height / self.image_size[0]
        return self._replace(
            focal=self.focal * scale,
            principal=jnp.asarray([width / 2.0, height / 2.0], dtype=jnp.float32),
            image_size=(height, width),
        )


def lookat_camera(
    eye,
    target,
    image_hw: Tuple[int, int],
    focal_px: float,
    up=(0.0, 1.0, 0.0),
    znear: float = 0.1,
    zfar: float = 100.0,
) -> Camera:
    """Camera at ``eye`` looking at ``target`` (view frame: +X left, +Y up,
    +Z forward). Used for the bird-eye second render camera
    (reference: create_scene_birdEye_cam, blender_rendering/run.py:397-432)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = target - eye
    f = f / jnp.maximum(jnp.linalg.norm(f), 1e-12)
    # build the OpenCV frame (x right, y down, z=f) then negate x/y to get
    # the P3D view frame (+X left, +Y up) that matches the projection signs
    x_cam = jnp.cross(f, up)
    x_norm = jnp.linalg.norm(x_cam)
    # degenerate (looking straight along up): pick another helper axis
    x_cam = jnp.where(x_norm > 1e-6, x_cam / jnp.maximum(x_norm, 1e-12),
                      jnp.asarray([1.0, 0.0, 0.0]))
    y_cam = jnp.cross(f, x_cam)
    R = jnp.stack([-x_cam, -y_cam, f], axis=-1)  # columns = view axes in world
    T = -eye @ R
    h, w = image_hw
    return Camera(
        R=R, T=T,
        focal=jnp.asarray([focal_px, focal_px], jnp.float32),
        principal=jnp.asarray([w / 2.0, h / 2.0], jnp.float32),
        image_size=(h, w), znear=znear, zfar=zfar)


def camera_from_npz(
    npz_path: str,
    render_hw: Tuple[int, int] | None = None,
    znear: float = 0.1,
    zfar: float = 50.0,
) -> Camera:
    """Load the camera.npz artifact (keys: extrinsic, focal, image_size,
    camera_angle_x — reference: minimal_demo_vggt.py:189-204) and build a
    :class:`Camera`, optionally rescaled to a render resolution.

    Mirrors the reference's ``calibrate_cameras`` (cam_utils.py:28-87):
    B2P conversion of the Blender-style extrinsic, focal scaled by the height
    ratio, principal point at the image center.
    """
    data = np.load(npz_path)
    ext = np.asarray(data["extrinsic"], dtype=np.float64)
    R, T = blender_to_p3d(ext)
    orig_w, orig_h = [int(x) for x in np.asarray(data["image_size"]).reshape(-1)[:2]]
    focal_px = float(data["focal"])
    if render_hw is None:
        render_hw = (orig_h, orig_w)
    H, W = render_hw
    scale = H / orig_h
    f = focal_px * scale
    return Camera(
        R=jnp.asarray(R, dtype=jnp.float32),
        T=jnp.asarray(T, dtype=jnp.float32),
        focal=jnp.asarray([f, f], dtype=jnp.float32),
        principal=jnp.asarray([W / 2.0, H / 2.0], dtype=jnp.float32),
        image_size=(H, W),
        znear=znear,
        zfar=zfar,
    )


def save_camera_npz(
    npz_path: str,
    extrinsic_blender: np.ndarray,
    focal_px: float,
    image_wh: Tuple[int, int],
) -> None:
    """Write the camera.npz artifact with the reference's exact keys/dtypes
    (minimal_demo_vggt.py:189-204)."""
    import os

    os.makedirs(os.path.dirname(os.path.abspath(npz_path)), exist_ok=True)
    width, height = image_wh
    camera_angle_x = float(2.0 * np.arctan(width / (2.0 * float(focal_px))))
    np.savez(
        npz_path,
        extrinsic=np.asarray(extrinsic_blender, dtype=np.float32),
        focal=np.float32(focal_px),
        image_size=np.array([width, height], dtype=np.int32),
        camera_angle_x=np.float32(camera_angle_x),
    )
