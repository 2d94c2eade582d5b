"""scenenet_tpu — a TPU-native (JAX/XLA/Pallas) framework for white-box 3D
point-cloud segmentation with GENEOs.

Re-implements, TPU-first, the full capability surface of the reference
SCENE-Net pipeline (see SURVEY.md): point-cloud voxelization, differentiable
geometric kernel synthesis (cylinder / arrow / negative-sphere GENEOs),
convex-combination observer networks, constraint losses, the optax training
runtime, TS40K / SemanticKITTI data pipelines, and mesh-parallel execution
(data parallel + spatially sharded halo-exchange convolution).

Layout
------
- ``ops``      — voxelization engine (host oracle + device kernels), 3D conv
- ``geneo``    — differentiable GENEO kernel synthesis (pure functions)
- ``models``   — SceneNet, quantile/classifier variants, CNN baseline, 3D U-Net
- ``losses``   — WeightedMSE, Tversky/Dice/Focal/IoU/quantile + GENEO penalties
- ``train``    — train state, jitted steps, metrics, checkpoints, callbacks
- ``data``     — TS40K + SemanticKITTI datasets, transforms, loaders, ETL
- ``parallel`` — device mesh, data-parallel and spatially-sharded execution
- ``utils``    — config system, seeding, profiling, visualization export
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences: ``scenenet_tpu.SceneNet`` etc. without
    importing jax at package import time."""
    lazy = {
        "SceneNet": ("scenenet_tpu.models", "SceneNet"),
        "QuantileSceneNet": ("scenenet_tpu.models", "QuantileSceneNet"),
        "Trainer": ("scenenet_tpu.train", "Trainer"),
        "TrainConfig": ("scenenet_tpu.train", "TrainConfig"),
        "resolve_criterion": ("scenenet_tpu.losses", "resolve_criterion"),
        "load_config": ("scenenet_tpu.utils.config", "load_config"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
