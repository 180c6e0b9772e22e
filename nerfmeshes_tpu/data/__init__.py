from nerfmeshes_tpu.data.bundle import DataBundle
from nerfmeshes_tpu.data.datasets import (
    BlenderDataset,
    DatasetType,
    RayDataset,
    SyntheticDataset,
    build_dataset,
    convert_poses_to_rays,
)
from nerfmeshes_tpu.data.helpers import (
    batch_random_sampling,
    pose_spherical,
    read_depth_from_exr,
    synthesis_poses,
)

__all__ = [
    "DataBundle",
    "BlenderDataset",
    "DatasetType",
    "RayDataset",
    "SyntheticDataset",
    "build_dataset",
    "convert_poses_to_rays",
    "batch_random_sampling",
    "pose_spherical",
    "read_depth_from_exr",
    "synthesis_poses",
]
