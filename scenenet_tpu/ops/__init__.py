from scenenet_tpu.ops.voxel_np import (
    VoxelGridSpec,
    compute_grid_spec,
    voxel_indices_np,
    hist_on_voxel_np,
    reg_on_voxel_np,
    classes_on_voxel_np,
    normalize_per_column_np,
    prob_to_label_np,
    vxg_to_xyz_np,
)
from scenenet_tpu.ops.voxelize import (
    voxelize_hist,
    voxelize_reg,
    voxelize_fused,
    voxelize_from_indices,
    voxelize_batch,
    voxelize_batch_from_indices,
    voxel_indices,
    prob_to_label,
    vxg_to_xyz,
)
from scenenet_tpu.ops.conv3d import conv3d_same, geneo_conv
from scenenet_tpu.ops.dbscan import dbscan, extract_clusters
from scenenet_tpu.ops.pallas_conv import geneo_stencil_conv, scenenet_forward_pallas

__all__ = [
    "VoxelGridSpec",
    "compute_grid_spec",
    "voxel_indices_np",
    "hist_on_voxel_np",
    "reg_on_voxel_np",
    "classes_on_voxel_np",
    "normalize_per_column_np",
    "prob_to_label_np",
    "vxg_to_xyz_np",
    "voxelize_hist",
    "voxelize_reg",
    "voxelize_fused",
    "voxelize_from_indices",
    "voxelize_batch",
    "voxelize_batch_from_indices",
    "voxel_indices",
    "prob_to_label",
    "vxg_to_xyz",
    "conv3d_same",
    "geneo_conv",
    "dbscan",
    "extract_clusters",
    "geneo_stencil_conv",
    "scenenet_forward_pallas",
]
