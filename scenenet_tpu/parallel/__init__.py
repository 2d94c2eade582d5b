from scenenet_tpu.parallel.mesh import (
    make_hybrid_mesh,
    make_mesh,
    batch_sharding,
    ensure_replicated,
    replicated_sharding,
)
from scenenet_tpu.parallel.spatial import halo_conv3d, spatial_scenenet_forward
from scenenet_tpu.parallel.dp import (
    make_dp_inference_fn,
    make_sharded_train_step,
    shard_batch,
)
from scenenet_tpu.parallel.ep import (
    make_ensemble_eval_step,
    make_ensemble_inference_fn,
    make_ensemble_train_step,
)
from scenenet_tpu.parallel.gspmd import (
    channel_shardings,
    channel_specs,
    make_gspmd_eval_step,
    make_gspmd_train_step,
)
from scenenet_tpu.parallel.pp import (
    cnn_pipeline_params,
    cnn_unstack_params,
    make_pipeline_inference_fn,
    make_pipeline_train_step,
    make_stage_params,
    pipeline_apply,
)

__all__ = [
    "make_hybrid_mesh",
    "make_mesh",
    "batch_sharding",
    "ensure_replicated",
    "replicated_sharding",
    "halo_conv3d",
    "spatial_scenenet_forward",
    "make_dp_inference_fn",
    "make_sharded_train_step",
    "shard_batch",
    "make_ensemble_eval_step",
    "make_ensemble_inference_fn",
    "make_ensemble_train_step",
    "channel_shardings",
    "channel_specs",
    "make_gspmd_eval_step",
    "make_gspmd_train_step",
    "cnn_pipeline_params",
    "cnn_unstack_params",
    "make_pipeline_inference_fn",
    "make_pipeline_train_step",
    "make_stage_params",
    "pipeline_apply",
]
