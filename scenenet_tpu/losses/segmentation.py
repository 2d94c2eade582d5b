"""Overlap-based segmentation losses (Tversky / Dice / Focal / IoU).

Functional twins of the reference criteria:
- ``TverskyLoss`` / ``FocalTverskyLoss`` — ``core/criterions/tversky_loss.py:11-104``
- ``BinaryDiceLoss`` / ``BinaryDiceLoss_BCE`` — ``core/criterions/dice_loss.py:10-96``
- ``FocalLoss`` — ``core/criterions/focal_loss.py:8-43``
- ``IoULoss`` — ``core/criterions/iou_loss.py:7-24``
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

from scenenet_tpu.losses.weighted_mse import WeightedMSE

# torch.nn.BCELoss clamps each log term at -100
_BCE_CLAMP = 100.0


def binary_cross_entropy(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE with torch's log clamping (no reduction)."""
    logp = jnp.maximum(jnp.log(pred), -_BCE_CLAMP)
    log1mp = jnp.maximum(jnp.log(1.0 - pred), -_BCE_CLAMP)
    return -(target * logp + (1.0 - target) * log1mp)


def _tversky_index(pred, target, alpha, beta, smooth, axis_names: Tuple[str, ...] = ()):
    """Global Tversky index. Under sharding (``axis_names`` set, called
    inside shard_map) the TP/FP/FN sums are psum'd over the mesh axes so the
    index is computed on *global* counts — a mean of per-shard ratios would
    be a different (wrong) loss."""
    tp = jnp.sum(pred * target)
    fp = jnp.sum((1.0 - target) * pred)
    fn = jnp.sum(target * (1.0 - pred))
    if axis_names:
        tp, fp, fn = (lax.psum(v, axis_names) for v in (tp, fp, fn))
    return (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)


@dataclasses.dataclass(frozen=True)
class TverskyLoss:
    """1 − Tversky index; α penalizes FP, β penalizes FN."""

    tversky_alpha: float = 0.5
    tversky_beta: float = 1.0
    tversky_smooth: float = 1.0
    axis_names: Tuple[str, ...] = ()

    def __call__(self, pred, target, *_args, **_kw):
        return 1.0 - _tversky_index(
            pred, target, self.tversky_alpha, self.tversky_beta,
            self.tversky_smooth, self.axis_names
        )


@dataclasses.dataclass(frozen=True)
class FocalTverskyLoss:
    """(1 − Tversky)^γ — focal exponent focuses on hard examples."""

    tversky_alpha: float = 0.5
    tversky_beta: float = 1.0
    focal_gamma: float = 2.0
    tversky_smooth: float = 1.0
    axis_names: Tuple[str, ...] = ()

    def __call__(self, pred, target, *_args, **_kw):
        t = _tversky_index(
            pred, target, self.tversky_alpha, self.tversky_beta,
            self.tversky_smooth, self.axis_names
        )
        return (1.0 - t) ** self.focal_gamma


@dataclasses.dataclass(frozen=True)
class BinaryDiceLoss:
    """Per-sample Dice with p-power denominator, then mean/sum reduction.

    ``axis_names`` (set by make_distributed under mesh training) makes
    both reductions shard-exact: the per-sample dice never crosses the
    batch shard boundary, so ``mean`` needs a pmean (equal shards) and
    ``sum`` a psum — without the psum, the train step's loss pmean would
    scale a per-shard sum down by the shard count."""

    smooth: float = 1.0
    p: float = 2.0
    reduction: str = "mean"
    axis_names: Tuple[str, ...] = ()

    def __call__(self, pred, target, *_args, **_kw):
        b = pred.shape[0]
        pred = pred.reshape(b, -1)
        target = target.reshape(b, -1)
        num = jnp.sum(pred * target, axis=1) + self.smooth
        den = jnp.sum(pred**self.p + target**self.p, axis=1) + self.smooth
        loss = 1.0 - num / den
        if self.reduction == "mean":
            loss = jnp.mean(loss)
            return lax.pmean(loss, self.axis_names) if self.axis_names else loss
        if self.reduction == "sum":
            loss = jnp.sum(loss)
            return lax.psum(loss, self.axis_names) if self.axis_names else loss
        return loss


@dataclasses.dataclass(frozen=True)
class BinaryDiceBCE:
    """Histogram-weighted BCE + Dice (reference ``BinaryDiceLoss_BCE``).
    Sharding-exact under ``axis_names`` for both reductions (the nested
    ``w_mse`` globally normalizes the BCE weights; see BinaryDiceLoss for
    the dice term)."""

    w_mse: WeightedMSE
    reduction: str = "mean"
    axis_names: Tuple[str, ...] = ()

    @classmethod
    def create(cls, targets=None, weighting_scheme_path=None, weight_alpha=1.0,
               weight_epsilon=0.1, mse_weight=1.0, reduction="mean", **kw):
        kwargs = {} if weighting_scheme_path is None else {"weighting_scheme_path": weighting_scheme_path}
        return cls(
            w_mse=WeightedMSE.create(
                targets=targets, weight_alpha=weight_alpha,
                weight_epsilon=weight_epsilon, mse_weight=mse_weight, **kwargs
            ),
            reduction=reduction,
        )

    def __call__(self, pred, target, *_args, **_kw):
        weights = self.w_mse.weight_target(target)
        bce = binary_cross_entropy(pred, target)
        dice = BinaryDiceLoss(reduction=self.reduction,
                              axis_names=self.axis_names)(pred, target)
        if self.reduction == "mean":
            wbce = jnp.mean(weights * bce)
            if self.axis_names:
                wbce = lax.pmean(wbce, self.axis_names)
            return wbce + dice
        if self.reduction == "sum":
            wbce = jnp.sum(weights * bce)
            if self.axis_names:
                wbce = lax.psum(wbce, self.axis_names)
            return wbce + dice
        return weights * bce + dice


@dataclasses.dataclass(frozen=True)
class FocalLoss:
    """BCE-based focal loss (reference applies the focal factor to the
    *reduced* BCE, which we replicate)."""

    focal_alpha: float = 0.5
    focal_gamma: float = 2.0
    reduction: str = "mean"

    def __call__(self, pred, target, *_args, **_kw):
        bce = binary_cross_entropy(pred.reshape(-1), target.reshape(-1))
        if self.reduction == "mean":
            bce = jnp.mean(bce)
        elif self.reduction == "sum":
            bce = jnp.sum(bce)
        return self.focal_alpha * (1.0 - jnp.exp(-bce)) ** self.focal_gamma * bce


@dataclasses.dataclass(frozen=True)
class IoULoss:
    """1 − soft IoU. ``axis_names`` (set by make_distributed under mesh
    training) psums the global intersection/union so the sharded loss is
    the true global IoU, not a mean of per-shard IoUs."""

    smooth: float = 1.0
    axis_names: Tuple[str, ...] = ()

    def __call__(self, pred, target, *_args, **_kw):
        inter = jnp.sum(pred * target)
        union = jnp.sum(pred + target) - inter
        if self.axis_names:
            inter = lax.psum(inter, self.axis_names)
            union = lax.psum(union, self.axis_names)
        return 1.0 - (inter + self.smooth) / (union + self.smooth)
