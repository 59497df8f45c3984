"""Geometry + kernel pack: the TPU-native replacements for the reference's
CUDA/C++ native layer (SURVEY §2.10).

Everything here is pure JAX (jit/vmap/grad-safe, static shapes) with Pallas
TPU kernels for the hot paths (chamfer NN, soft rasterization, flash
attention).
"""

from regen3d_tpu.ops.knn import (  # noqa: F401
    chamfer_distance,
    chamfer_loss,
    knn_points,
    nn_distances,
)
from regen3d_tpu.ops.point_mesh import (  # noqa: F401
    point_mesh_face_distance,
    point_mesh_face_distance_fast,
    point_mesh_face_distance_topk,
    point_triangle_distance,
    points_to_mesh_distance,
)
from regen3d_tpu.ops.sampling import sample_points_from_meshes  # noqa: F401
from regen3d_tpu.ops.icp import iterative_closest_point  # noqa: F401
from regen3d_tpu.ops.plane import fit_plane_svd, fit_plane_ransac  # noqa: F401
from regen3d_tpu.ops.obb import aabb, oriented_bounding_box_2d_up  # noqa: F401
from regen3d_tpu.ops.attention import flash_attention  # noqa: F401
from regen3d_tpu.ops.rasterize import (  # noqa: F401
    rasterize_hard,
    soft_silhouette,
    soft_silhouette_binned,
    soft_silhouette_edge,
)
from regen3d_tpu.ops.losses import (  # noqa: F401
    bbox_hinge_loss,
    dice_loss,
    focal_loss,
    silhouette_loss,
)
from regen3d_tpu.ops.poisson import poisson_reconstruct  # noqa: F401
from regen3d_tpu.ops.marching_cubes import marching_tetrahedra  # noqa: F401
from regen3d_tpu.ops.bundle_adjust import (  # noqa: F401
    joint_bundle_adjust,
    refine_camera_gn,
)
from regen3d_tpu.ops.tracks import predict_tracks, shi_tomasi_keypoints  # noqa: F401
