"""Probability calibration: temperature scaling + Platt (logistic) scaling.

The reference declares calibration hooks that import a missing module
(``utils/observer_utils.py:336-357``); here they are implemented natively:
fit a scalar temperature (or a logistic a·x + b) on held-out predictions
by minimizing BCE with a few Newton/GD steps, all in JAX.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from scenenet_tpu.losses.segmentation import binary_cross_entropy


def _logits(probs: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    p = jnp.clip(probs, eps, 1 - eps)
    return jnp.log(p) - jnp.log1p(-p)


def fit_temperature(probs: jnp.ndarray, targets: jnp.ndarray,
                    steps: int = 200, lr: float = 0.1) -> float:
    """Scalar temperature T minimizing BCE of sigmoid(logit(p)/T)."""
    logits = _logits(probs.reshape(-1))
    y = targets.reshape(-1)

    def nll(log_t):
        p = jax.nn.sigmoid(logits / jnp.exp(log_t))
        return jnp.mean(binary_cross_entropy(p, y))

    grad = jax.grad(nll)
    log_t = jnp.asarray(0.0)
    for _ in range(steps):
        log_t = log_t - lr * grad(log_t)
    return float(jnp.exp(log_t))


def apply_temperature(probs: jnp.ndarray, temperature: float) -> jnp.ndarray:
    return jax.nn.sigmoid(_logits(probs) / temperature)


def fit_platt(probs: jnp.ndarray, targets: jnp.ndarray,
              steps: int = 300, lr: float = 0.1) -> Tuple[float, float]:
    """Logistic recalibration sigmoid(a·logit(p) + b)."""
    logits = _logits(probs.reshape(-1))
    y = targets.reshape(-1)

    def nll(ab):
        p = jax.nn.sigmoid(ab[0] * logits + ab[1])
        return jnp.mean(binary_cross_entropy(p, y))

    grad = jax.grad(nll)
    ab = jnp.asarray([1.0, 0.0])
    for _ in range(steps):
        ab = ab - lr * grad(ab)
    return float(ab[0]), float(ab[1])


def apply_platt(probs: jnp.ndarray, a: float, b: float) -> jnp.ndarray:
    return jax.nn.sigmoid(a * _logits(probs) + b)
