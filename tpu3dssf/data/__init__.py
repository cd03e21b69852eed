from tpu3dssf.data.synthetic import SyntheticNuScenes
from tpu3dssf.data.nuscenes_index import NuScenesDataset, NUSCENES_CAM_VIEWS
from tpu3dssf.data.pipeline import HostDataPipeline, pack_sample

__all__ = [
    "SyntheticNuScenes",
    "NuScenesDataset",
    "NUSCENES_CAM_VIEWS",
    "HostDataPipeline",
    "pack_sample",
]
