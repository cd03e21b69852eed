"""LiDAR-only segmentation: PTv3 + linear head, no camera branch.

Covers BASELINE.json config 2 ("PTv3 LiDAR-only segmentation on
nuScenes-mini — serialized attention + grid pooling, no camera branch").
The reference has no separate entry point for this, but
``image_encoder: none`` here routes to this model instead of wasting a
448-wide fusion MLP on zero image features.
"""

from __future__ import annotations


import flax.linen as nn
import jax

from tpu3dssf.models.fusion import PipelineConfig
from tpu3dssf.models.ptv3 import PointTransformerV3
from tpu3dssf.voxel import (devoxelize_nearest, devoxelize_own_voxel,
                            voxelize)


class LidarSegmentationModel(nn.Module):
    """points → voxelize → PTv3 → linear classifier → devoxelize.

    Same call signature as SegmentationPipeline (patch_tokens and camera
    calibration accepted and ignored) so the train/eval loops and CLIs
    work unchanged.
    """

    config: PipelineConfig

    @nn.compact
    def __call__(self, points, point_mask, patch_tokens=None,
                 cam_intrinsics=None, lidar2cam=None,
                 deterministic: bool = True):
        cfg = self.config

        vox = jax.vmap(
            lambda p, m: voxelize(
                p, m, cfg.voxel_size, cfg.voxel_capacity,
                intensity_mode=cfg.intensity_mode)
        )(points, point_mask)

        voxel_feats, voxel_mask = PointTransformerV3(
            cfg.ptv3, name="ptv3")(
            vox.voxel_raw, vox.voxel_coords, vox.voxel_mask,
            deterministic=deterministic)

        voxel_scores = nn.Dense(
            cfg.fusion.output_dim, dtype=cfg.fusion.dtype, name="head",
        )(voxel_feats)
        voxel_scores = voxel_scores * voxel_mask[..., None]

        if cfg.devoxelize_mode == "own":
            point_scores, _ = jax.vmap(devoxelize_own_voxel)(
                vox.point_voxel, vox.point_ok, voxel_scores)
        else:
            point_scores, _ = jax.vmap(
                lambda p, m, c, vm, v: devoxelize_nearest(p, m, c, vm, v)
            )(points[..., :3], point_mask, vox.voxel_raw[..., :3],
              vox.voxel_mask, voxel_scores)
        return point_scores
