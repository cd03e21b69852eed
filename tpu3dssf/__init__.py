"""tpu3dssf — TPU-native multi-modal 3D semantic segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
CharlesChang012/3D-Semantic-Segmentation-Fusion (a PyTorch/CUDA pipeline that
fuses a PointTransformerV3 LiDAR encoder with frozen DINOv2/DINOv3 camera
features for nuScenes-lidarseg; see reference README.md:3-20).

Design principles (TPU-first, not a port):
  * static shapes everywhere — points/voxels live in fixed-capacity buffers
    with validity masks (replaces the reference's ragged padding,
    utils/dataloader.py:194-242);
  * everything on-device under one ``jax.jit`` — voxelization, KNN,
    serialization, attention, devoxelization (the reference round-trips to
    CPU for Open3D/sklearn per sample per step, utils/lidar.py:83-118);
  * Pallas kernels for the hot ops (serialized-window attention, tiled 1-NN)
    instead of the CUDA pointops/flash-attn dependencies;
  * scaling via ``jax.sharding.Mesh`` + XLA collectives, not NCCL.
"""

__version__ = "0.1.0"
