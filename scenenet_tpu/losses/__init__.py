from scenenet_tpu.losses.weighted_mse import WeightedMSE, hist_frequency_estimation
from scenenet_tpu.losses.segmentation import (
    TverskyLoss,
    FocalTverskyLoss,
    BinaryDiceLoss,
    BinaryDiceBCE,
    FocalLoss,
    IoULoss,
)
from scenenet_tpu.losses.geneo_loss import (
    GENEOLoss,
    GENEODiceLoss,
    GENEODiceBCE,
    GENEOTverskyLoss,
    cvx_loss,
    positive_regularizer,
)
from scenenet_tpu.losses.quantile import QuantileLoss, QuantileGENEOLoss
from scenenet_tpu.losses.registry import resolve_criterion, CRITERION_REGISTRY

__all__ = [
    "WeightedMSE",
    "hist_frequency_estimation",
    "TverskyLoss",
    "FocalTverskyLoss",
    "BinaryDiceLoss",
    "BinaryDiceBCE",
    "FocalLoss",
    "IoULoss",
    "GENEOLoss",
    "GENEODiceLoss",
    "GENEODiceBCE",
    "GENEOTverskyLoss",
    "cvx_loss",
    "positive_regularizer",
    "QuantileLoss",
    "QuantileGENEOLoss",
    "resolve_criterion",
    "CRITERION_REGISTRY",
]
