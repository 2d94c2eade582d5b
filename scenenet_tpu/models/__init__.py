from scenenet_tpu.models.scenenet import (
    GENEONet,
    SceneNet,
    SceneNetClassifier,
    QuantileSceneNet,
)
from scenenet_tpu.models.cnn_baseline import CnnBaseline, CnnBaseline2
from scenenet_tpu.models.unet3d import UNet3D

__all__ = [
    "GENEONet",
    "SceneNet",
    "SceneNetClassifier",
    "QuantileSceneNet",
    "CnnBaseline",
    "CnnBaseline2",
    "UNet3D",
]
