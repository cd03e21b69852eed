from tpu3dssf.voxel.voxelize import (
    VoxelizeResult,
    voxelize,
    devoxelize_nearest,
    devoxelize_own_voxel,
    knn_intensity_transfer,
)

__all__ = [
    "VoxelizeResult",
    "voxelize",
    "devoxelize_nearest",
    "devoxelize_own_voxel",
    "knn_intensity_transfer",
]
