from scenenet_tpu.train.metrics import (
    MetricState, compute_metrics, init_metric_state, merge_metric_states,
    metric_counts, update_metrics,
)
from scenenet_tpu.train.state import TrainState, create_train_state, resolve_optimizer
from scenenet_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, CheckpointManager
from scenenet_tpu.train.callbacks import EarlyStopping, BestMetricTracker
from scenenet_tpu.train.loop import Trainer, TrainConfig, make_device_voxelize_prep
from scenenet_tpu.train.tune import find_max_batch_size, lr_range_test

__all__ = [
    "MetricState",
    "init_metric_state",
    "update_metrics",
    "compute_metrics",
    "TrainState",
    "create_train_state",
    "resolve_optimizer",
    "save_checkpoint",
    "restore_checkpoint",
    "CheckpointManager",
    "EarlyStopping",
    "BestMetricTracker",
    "Trainer",
    "TrainConfig",
    "make_device_voxelize_prep",
    "find_max_batch_size",
    "lr_range_test",
]
