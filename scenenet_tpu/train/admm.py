"""Augmented-Lagrangian (ADMM-style) constrained training.

The reference ships an ADMM experiment config (``admm_config.yml``:
``admm_rho`` + LBFGS) but no solver code (SURVEY.md §5.6). Here the
constrained problem is solved properly:

    min_θ L(θ)   s.t.  Σλ = 1 (exact, via the derived-last-λ
                        reparameterization),
                        λ_i ≥ 0,  θ_geneo ≥ 0.

Inequalities use the augmented-Lagrangian form with multipliers μ ≥ 0 and
penalty ρ (g = −x is the violation):

    L_A = L + Σ_c (ρ/2)·[ max(g_c + μ_c/ρ, 0)² − (μ_c/ρ)² ]

with dual ascent μ ← max(0, μ + ρ·g) after each primal epoch. Unlike the
reference's fixed hinge penalty (``cvx_w·relu(−·)``), the multipliers grow
until the constraints actually hold.

Note: each dual update bakes the new μ into a re-jitted primal step (one
recompile per outer epoch) — fine for the small SCENE-Net programs this is
meant for.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from scenenet_tpu.train.loop import TrainConfig, Trainer


@dataclasses.dataclass
class ADMMConfig(TrainConfig):
    admm_rho: float = 1.0


def _constraint_values(model, params) -> jnp.ndarray:
    """Stacked constraint arguments x_c (feasible when x_c ≥ 0): effective
    λs and every GENEO scalar."""
    lams = model.effective_lambdas(params)
    geneo = list(model.geneo_params_flat(params).values())
    return jnp.concatenate([lams.reshape(-1),
                            jnp.stack(geneo).reshape(-1)])


class _AugCriterion:
    """Data criterion + augmented-Lagrangian terms for fixed multipliers."""

    def __init__(self, data_criterion, mu: jnp.ndarray, rho: float):
        self.data_criterion = data_criterion
        self.mu = mu
        self.rho = rho

    def __call__(self, pred, gt, cvx_coeffs=None, geneo_params=None,
                 last_lambda=None):
        data = self.data_criterion(pred, gt, {}, {}, None)
        vals = []
        if cvx_coeffs:
            total = sum(cvx_coeffs.values())
            for name, lam in cvx_coeffs.items():
                vals.append(1.0 - total + lam if name == last_lambda else lam)
        if geneo_params:
            vals.extend(geneo_params.values())
        if not vals:
            return data
        g = -jnp.stack(vals).reshape(-1)
        mu = self.mu[: g.shape[0]]
        shifted = jnp.maximum(g + mu / self.rho, 0.0)
        aug = jnp.sum(0.5 * self.rho * (shifted**2 - (mu / self.rho) ** 2))
        return data + aug


class ADMMTrainer:
    """Outer dual loop around :class:`Trainer` primal epochs.

    ``criterion`` is a data-term criterion (e.g. WeightedMSE or
    FocalTversky); its own constraint penalties, if any, are bypassed.
    """

    def __init__(self, model, criterion, config: ADMMConfig, logger=None,
                 batch_prep=None):
        from scenenet_tpu.utils.logging import RunLogger

        self.model = model
        self.criterion = criterion
        self.config = config
        self.logger = logger or RunLogger(config.run_dir,
                                          use_wandb=config.use_wandb)
        self.batch_prep = batch_prep
        self.history = []
        self._inner: Optional[Trainer] = None

    def fit(self, params, train_loader, val_loader=None):
        mu = jnp.zeros(_constraint_values(self.model, params).shape[0])
        rho = self.config.admm_rho
        inner_cfg = dataclasses.replace(self.config, max_epochs=1,
                                        early_stop_metric=None)
        final, best = params, {}
        inner = None
        for epoch in range(max(self.config.max_epochs, 1)):
            crit = _AugCriterion(self.criterion, mu, rho)
            inner = Trainer(self.model, crit, inner_cfg, logger=self.logger,
                            batch_prep=self.batch_prep)
            final, best = inner.fit(final, train_loader, val_loader)
            g = -_constraint_values(self.model, final)
            mu = jnp.maximum(0.0, mu + rho * g)
            self.history.append({
                "epoch": epoch,
                "max_violation": float(jnp.maximum(g, 0.0).max()),
                "mu_norm": float(jnp.linalg.norm(mu)),
                **{k: v for k, v in best.items() if "loss" in k},
            })
        self.best = inner.best if inner else None
        self._inner = inner
        return final, best

    # delegate post-fit operations to the last primal trainer
    def evaluate(self, params, loader, prefix="test"):
        inner = self._inner or Trainer(self.model, self.criterion, self.config,
                                       logger=self.logger,
                                       batch_prep=self.batch_prep)
        return inner.evaluate(params, loader, prefix)

    def predict(self, params, loader):
        inner = self._inner or Trainer(self.model, self.criterion, self.config,
                                       logger=self.logger,
                                       batch_prep=self.batch_prep)
        return inner.predict(params, loader)

    def restore_best(self, metric, template):
        assert self._inner is not None, "fit first"
        return self._inner.restore_best(metric, template)
