"""Segmentation metrics as device-resident confusion-count accumulators.

Replaces torchmetrics' ``MetricCollection([JaccardIndex, Precision, Recall,
F1Score, FBetaScore])`` at threshold τ (reference
``utils/scripts_utils.py:80-91``) with a pure pytree of four counts that is
updated *inside* the jitted train step (no host sync per batch) and reduced
to scalars once per epoch — update/compute/reset, like the reference's
per-step ``update`` + epoch-end ``compute``/``reset``
(``lit_model_wrappers.py:59-126``).

Semantics parity:
- Precision / Recall / F1 / Fβ are binary scores of the positive class at
  ``pred ≥ τ``; zero when the denominator is zero (torchmetrics behavior).
- JaccardIndex is the *macro* mean IoU over both classes (background IoU is
  typically ≈1, which is why the reference logs val_JaccardIndex ≈0.49 with
  near-zero F1 — see BASELINE.md).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

DEFAULT_TAU = 0.65
DEFAULT_BETA = 0.5


class MetricState(NamedTuple):
    """Confusion counts for the binary task (positive class = tower)."""

    tp: jnp.ndarray
    fp: jnp.ndarray
    fn: jnp.ndarray
    tn: jnp.ndarray


def init_metric_state() -> MetricState:
    z = jnp.zeros((), jnp.int32)
    return MetricState(tp=z, fp=z, fn=z, tn=z)


def update_metrics(
    state: MetricState,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    tau: float = DEFAULT_TAU,
) -> MetricState:
    """Accumulate confusion counts; safe to call inside jit.

    Shapes broadcast (e.g. quantile predictions (B, Q, ...) against a
    (B, 1, ...) target score every quantile's voxels)."""
    pred, target = jnp.broadcast_arrays(pred, target)
    p = (pred >= tau).reshape(-1)
    t = (target >= 0.5).reshape(-1)
    tp = jnp.sum(p & t).astype(jnp.int32)
    fp = jnp.sum(p & ~t).astype(jnp.int32)
    fn = jnp.sum(~p & t).astype(jnp.int32)
    tn = jnp.sum(~p & ~t).astype(jnp.int32)
    return MetricState(state.tp + tp, state.fp + fp, state.fn + fn, state.tn + tn)


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def compute_metrics(state: MetricState, beta: float = DEFAULT_BETA) -> Dict[str, jnp.ndarray]:
    """Reduce counts to the reference's five scores."""
    tp = state.tp.astype(jnp.float32)
    fp = state.fp.astype(jnp.float32)
    fn = state.fn.astype(jnp.float32)
    tn = state.tn.astype(jnp.float32)

    precision = _safe_div(tp, tp + fp)
    recall = _safe_div(tp, tp + fn)
    f1 = _safe_div(2 * precision * recall, precision + recall)
    b2 = beta * beta
    fbeta = _safe_div((1 + b2) * precision * recall, b2 * precision + recall)

    iou_pos = _safe_div(tp, tp + fp + fn)
    iou_neg = _safe_div(tn, tn + fp + fn)
    jaccard = (iou_pos + iou_neg) / 2.0  # macro over {background, tower}

    return {
        "JaccardIndex": jaccard,
        "Precision": precision,
        "Recall": recall,
        "F1Score": f1,
        "FBetaScore": fbeta,
    }


METRIC_NAMES = ("JaccardIndex", "Precision", "Recall", "F1Score", "FBetaScore")
