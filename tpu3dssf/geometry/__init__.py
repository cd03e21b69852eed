from tpu3dssf.geometry.transforms import (
    quaternion_to_rotation_matrix,
    make_se3,
    invert_se3,
    lidar_to_camera_extrinsics,
)
from tpu3dssf.geometry.projection import (
    multi_camera_projector,
    scale_pixel_coords,
    pixel_to_patch_index,
)

__all__ = [
    "quaternion_to_rotation_matrix",
    "make_se3",
    "invert_se3",
    "lidar_to_camera_extrinsics",
    "multi_camera_projector",
    "scale_pixel_coords",
    "pixel_to_patch_index",
]
