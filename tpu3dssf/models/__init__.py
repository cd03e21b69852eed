from tpu3dssf.models.ptv3 import PointTransformerV3, PTv3Config
from tpu3dssf.models.vit import VisionTransformer, ViTConfig
from tpu3dssf.models.fusion import FeatureFusionModel, FusionConfig

__all__ = [
    "PointTransformerV3",
    "PTv3Config",
    "VisionTransformer",
    "ViTConfig",
    "FeatureFusionModel",
    "FusionConfig",
]
