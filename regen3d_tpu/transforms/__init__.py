"""Rotation / rigid-transform / coordinate-convention library (pure JAX)."""

from regen3d_tpu.transforms.rotations import (  # noqa: F401
    so3_exp,
    so3_log,
    yaw_rotation,
    quat_to_matrix,
    matrix_to_quat,
    rotation_about_axis,
)
from regen3d_tpu.transforms.rigid import (  # noqa: F401
    Transform3d,
    kabsch,
    umeyama,
)
from regen3d_tpu.transforms.conventions import (  # noqa: F401
    blender_to_p3d,
    p3d_to_blender,
    R_FIX_CV2BLENDER,
    opencv_extrinsic_to_blender_world,
)
