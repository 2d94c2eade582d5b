"""Criterion name → constructor registry.

Reference ``utils/scripts_utils.py:48-77`` (``resolve_criterion``). Every
constructor accepts the union of criterion kwargs from the experiment config
and ignores what it does not use, like the reference's ``**kwargs``.
"""

from __future__ import annotations

from typing import Callable, Dict

from scenenet_tpu.losses.geneo_loss import (
    GENEODiceBCE,
    GENEODiceLoss,
    GENEOLoss,
    GENEOTverskyLoss,
)
from scenenet_tpu.losses.quantile import QuantileGENEOLoss, QuantileLoss
from scenenet_tpu.losses.segmentation import (
    BinaryDiceBCE,
    BinaryDiceLoss,
    FocalTverskyLoss,
    TverskyLoss,
)
from scenenet_tpu.losses.weighted_mse import WeightedMSE


def _plain(cls):
    def make(**kw):
        accepted = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in kw.items() if k in accepted})

    return make


CRITERION_REGISTRY: Dict[str, Callable] = {
    "mse": WeightedMSE.create,
    "dice": _plain(BinaryDiceLoss),
    "dice_bce": BinaryDiceBCE.create,
    "tversky": _plain(TverskyLoss),
    "focal_tversky": _plain(FocalTverskyLoss),
    "geneo": GENEOLoss.create,
    "geneo_dice": GENEODiceLoss.create,
    "geneo_dice_bce": GENEODiceBCE.create,
    "geneo_tversky": GENEOTverskyLoss.create,
    "quantile": QuantileLoss.create,
    "quantile_geneo": QuantileGENEOLoss.create,
}


def resolve_criterion(name: str) -> Callable:
    name = name.lower()
    if name not in CRITERION_REGISTRY:
        raise NotImplementedError(f"Criterion {name!r} not implemented")
    return CRITERION_REGISTRY[name]
