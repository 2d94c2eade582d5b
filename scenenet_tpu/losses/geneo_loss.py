"""GENEO constraint losses: data term + convexity + non-negativity penalties.

Reference ``core/criterions/geneo_loss.py:25-166``. The convexity constraint
``Σλ = 1, λ ≥ 0`` is relaxed into a hinge penalty on negative coefficients,
with the derived last coefficient ``λ_last = 1 − Σ λ_i`` (reference
identifies the last coefficient by ``requires_grad=False``; here the caller
passes its name — the model knows it statically).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import jax.numpy as jnp

from scenenet_tpu.losses.segmentation import BinaryDiceBCE, BinaryDiceLoss, FocalTverskyLoss
from scenenet_tpu.losses.weighted_mse import WeightedMSE


def cvx_loss(cvx_coeffs: Mapping[str, jnp.ndarray], last_lambda: Optional[str],
             cvx_w: float = 1.0) -> jnp.ndarray:
    """Hinge penalty on negative convex coefficients (``geneo_loss.py:36-62``).

    ``cvx_w · (Σ_{i≠last} relu(−λ_i) + relu(−(1 − Σλ + λ_last)))``.
    """
    if not cvx_coeffs:
        return jnp.asarray(0.0)
    total = sum(cvx_coeffs.values())
    free = sum(
        jax.nn.relu(-lam) for name, lam in cvx_coeffs.items() if name != last_lambda
    )
    derived_last = 1.0 - total + cvx_coeffs[last_lambda]
    return cvx_w * (free + jax.nn.relu(-derived_last))


def positive_regularizer(params: Mapping[str, jnp.ndarray], cvx_w: float = 1.0) -> jnp.ndarray:
    """Hinge penalty on negative GENEO parameters (``geneo_loss.py:64-71``)."""
    if not params:
        return jnp.asarray(0.0)
    return cvx_w * sum(jax.nn.relu(-g) for g in params.values())


@dataclasses.dataclass(frozen=True)
class GENEOLoss:
    """WeightedMSE + convexity + non-negativity penalties (``geneo_loss.py:25-91``)."""

    w_mse: WeightedMSE
    convex_weight: float = 1.0

    @classmethod
    def create(cls, targets=None, weighting_scheme_path=None, weight_alpha=1.0,
               weight_epsilon=0.1, mse_weight=1.0, convex_weight=1.0, **kw):
        kwargs = {} if weighting_scheme_path is None else {"weighting_scheme_path": weighting_scheme_path}
        return cls(
            w_mse=WeightedMSE.create(
                targets=targets, weight_alpha=weight_alpha,
                weight_epsilon=weight_epsilon, mse_weight=mse_weight, **kwargs
            ),
            convex_weight=convex_weight,
        )

    def data_term(self, pred, gt):
        return self.w_mse(pred, gt)

    def penalties(self, cvx_coeffs, geneo_params, last_lambda):
        return cvx_loss(cvx_coeffs or {}, last_lambda, self.convex_weight) + \
            positive_regularizer(geneo_params or {}, self.convex_weight)

    def __call__(self, pred, gt, cvx_coeffs=None, geneo_params=None, last_lambda=None):
        return self.data_term(pred, gt) + self.penalties(cvx_coeffs, geneo_params, last_lambda)


@dataclasses.dataclass(frozen=True)
class GENEODiceLoss(GENEOLoss):
    """WMSE + Dice + penalties (``geneo_loss.py:131-143``)."""

    dice: BinaryDiceLoss = BinaryDiceLoss()

    def __call__(self, pred, gt, cvx_coeffs=None, geneo_params=None, last_lambda=None):
        return (
            self.w_mse(pred, gt)
            + self.dice(pred, gt)
            + self.penalties(cvx_coeffs, geneo_params, last_lambda)
        )


@dataclasses.dataclass(frozen=True)
class GENEODiceBCE(GENEOLoss):
    """mse_weight·DiceBCE + penalties (``geneo_loss.py:112-124``)."""

    dice_bce: Optional[BinaryDiceBCE] = None

    @classmethod
    def create(cls, targets=None, weighting_scheme_path=None, weight_alpha=1.0,
               weight_epsilon=0.1, mse_weight=1.0, convex_weight=1.0,
               reduction="mean", **kw):
        base = GENEOLoss.create(
            targets=targets, weighting_scheme_path=weighting_scheme_path,
            weight_alpha=weight_alpha, weight_epsilon=weight_epsilon,
            mse_weight=mse_weight, convex_weight=convex_weight,
        )
        dice_bce = BinaryDiceBCE.create(
            targets=targets, weighting_scheme_path=weighting_scheme_path,
            weight_alpha=weight_alpha, weight_epsilon=weight_epsilon,
            mse_weight=mse_weight, reduction=reduction,
        )
        return cls(w_mse=base.w_mse, convex_weight=convex_weight, dice_bce=dice_bce)

    def __call__(self, pred, gt, cvx_coeffs=None, geneo_params=None, last_lambda=None):
        return (
            self.w_mse.mse_weight * self.dice_bce(pred, gt)
            + self.penalties(cvx_coeffs, geneo_params, last_lambda)
        )


@dataclasses.dataclass(frozen=True)
class GENEOTverskyLoss(GENEOLoss):
    """WMSE + FocalTversky + penalties — the default training criterion
    (``geneo_loss.py:145-161``; ``defaults_config.yml`` criterion
    ``geneo_tversky``)."""

    tversky: FocalTverskyLoss = FocalTverskyLoss()

    @classmethod
    def create(cls, targets=None, weighting_scheme_path=None, weight_alpha=1.0,
               weight_epsilon=0.1, mse_weight=1.0, convex_weight=1.0,
               tversky_alpha=0.5, tversky_beta=1.0, focal_gamma=1.0,
               tversky_smooth=1.0, **kw):
        base = GENEOLoss.create(
            targets=targets, weighting_scheme_path=weighting_scheme_path,
            weight_alpha=weight_alpha, weight_epsilon=weight_epsilon,
            mse_weight=mse_weight, convex_weight=convex_weight,
        )
        return cls(
            w_mse=base.w_mse,
            convex_weight=convex_weight,
            tversky=FocalTverskyLoss(tversky_alpha, tversky_beta, focal_gamma, tversky_smooth),
        )

    def __call__(self, pred, gt, cvx_coeffs=None, geneo_params=None, last_lambda=None):
        return (
            self.w_mse(pred, gt)
            + self.tversky(pred, gt)
            + self.penalties(cvx_coeffs, geneo_params, last_lambda)
        )
