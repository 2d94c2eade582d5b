"""Pinball (quantile) losses for the quantile-ensemble SCENE-Net.

Reference ``core/criterions/quant_loss.py:21-142``. Prediction shape
(B, Q, ...) vs GT (B, ...) or (B, 1, ...); per-quantile pinball terms are
summed over Q, weighted by the WeightedMSE histogram scheme, then averaged.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from scenenet_tpu.losses.geneo_loss import cvx_loss, positive_regularizer
from scenenet_tpu.losses.weighted_mse import WeightedMSE


@dataclasses.dataclass(frozen=True)
class QuantileLoss:
    w_mse: WeightedMSE
    quantiles: Sequence[float] = (0.1, 0.5, 0.9)
    # set by parallel.dp.make_distributed under mesh training: the nested
    # w_mse then normalizes weights globally and the final mean is pmean'd
    # so the sharded loss equals the unsharded one (equal shard sizes)
    axis_names: Tuple[str, ...] = ()

    @classmethod
    def create(cls, targets=None, weighting_scheme_path=None,
               quantiles=(0.1, 0.5, 0.9), weight_alpha=1.0, weight_epsilon=0.1,
               mse_weight=1.0, **kw):
        kwargs = {} if weighting_scheme_path is None else {"weighting_scheme_path": weighting_scheme_path}
        return cls(
            w_mse=WeightedMSE.create(
                targets=targets, weight_alpha=weight_alpha,
                weight_epsilon=weight_epsilon, mse_weight=mse_weight, **kwargs
            ),
            quantiles=tuple(quantiles),
        )

    def quantile_loss(self, pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        """Sum over quantiles of max(q·d, (q−1)·d), d = gt − pred_q
        (reference ``quant_loss.py:83-100``)."""
        terms = []
        for i, q in enumerate(self.quantiles):
            d = gt - pred[:, i]
            terms.append(jnp.maximum(q * d, (q - 1.0) * d))
        return sum(terms)

    def __call__(self, pred, gt, *_args, **_kw):
        if gt.ndim == pred.ndim and gt.shape[1] == 1:
            gt = gt[:, 0]
        weights = self.w_mse.weight_target(gt)
        loss = jnp.mean(weights * self.quantile_loss(pred, gt))
        if self.axis_names:
            loss = jax.lax.pmean(loss, self.axis_names)
        return loss


@dataclasses.dataclass(frozen=True)
class QuantileGENEOLoss(QuantileLoss):
    """Quantile loss + GENEO penalties summed over the ensemble members
    (reference ``quant_loss.py:103-142``; penalties take *lists* of param
    dicts, one per member)."""

    convex_weight: float = 1.0

    @classmethod
    def create(cls, targets=None, weighting_scheme_path=None,
               quantiles=(0.1, 0.5, 0.9), weight_alpha=1.0, weight_epsilon=0.1,
               mse_weight=1.0, convex_weight=1.0, **kw):
        base = QuantileLoss.create(
            targets=targets, weighting_scheme_path=weighting_scheme_path,
            quantiles=quantiles, weight_alpha=weight_alpha,
            weight_epsilon=weight_epsilon, mse_weight=mse_weight,
        )
        return cls(w_mse=base.w_mse, quantiles=base.quantiles,
                   convex_weight=convex_weight)

    def __call__(self, pred, gt, cvx_coeffs=None, geneo_params=None, last_lambda=None):
        loss = QuantileLoss.__call__(self, pred, gt)
        if cvx_coeffs:
            loss = loss + sum(cvx_loss(c, last_lambda, self.convex_weight) for c in cvx_coeffs)
        if geneo_params:
            loss = loss + sum(positive_regularizer(g, self.convex_weight) for g in geneo_params)
        return loss
