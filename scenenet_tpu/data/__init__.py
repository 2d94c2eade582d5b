from scenenet_tpu.data.pcd import (
    DICT_NEW_LABELS,
    POWER_LINE_SUPPORT_TOWER,
    select_object,
    extract_towers,
    crop_tower_radius,
    crop_two_towers,
    crop_ground_samples,
    crop_tower_samples,
    crop_at_locations,
    normalize_xyz,
    xyz_centroid,
    downsampling,
    downsampling_relative_height,
)
from scenenet_tpu.data.transforms import (
    AddPad,
    Compose,
    PointPadding,
    ToFullDense,
    Voxelization,
)
from scenenet_tpu.data.ts40k import TS40K, build_data_samples
from scenenet_tpu.data.semantic_kitti import SemanticKITTI, SemanticKITTICrops, build_pole_radius_samples
from scenenet_tpu.data.loader import VoxelLoader, PointCloudLoader

__all__ = [
    "DICT_NEW_LABELS",
    "POWER_LINE_SUPPORT_TOWER",
    "select_object",
    "extract_towers",
    "crop_tower_radius",
    "crop_two_towers",
    "crop_ground_samples",
    "crop_tower_samples",
    "crop_at_locations",
    "normalize_xyz",
    "xyz_centroid",
    "downsampling",
    "downsampling_relative_height",
    "AddPad",
    "Compose",
    "Voxelization",
    "ToFullDense",
    "PointPadding",
    "TS40K",
    "build_data_samples",
    "SemanticKITTI",
    "SemanticKITTICrops",
    "build_pole_radius_samples",
    "VoxelLoader",
    "PointCloudLoader",
]
