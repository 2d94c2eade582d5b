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

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp

DEFAULT_TAU = 0.65
DEFAULT_BETA = 0.5

# Counts accumulate as TWO-LIMB int32 pairs [hi, lo] with value
# hi·2²⁴ + lo: a single int32 wraps at 2.1e9, which a real epoch reaches —
# at 64³ the tn count grows ~2.6e5 per sample, so ~8k samples (the actual
# TS40K is ~9k crops; a quantile model triples every count) silently
# overflow and corrupt every metric downstream (early stopping, top-k
# checkpoints). TPU has no native 64-bit ints under the default config
# (jax_enable_x64 off downcasts them), hence limbs. Capacity 2⁵⁴ counts.
_LIMB_BITS = 24
_LIMB_MASK = (1 << _LIMB_BITS) - 1


class MetricState(NamedTuple):
    """Confusion counts for the binary task (positive class = tower).
    Each field is a (2,) int32 [hi, lo] limb pair (see module notes)."""

    tp: jnp.ndarray
    fp: jnp.ndarray
    fn: jnp.ndarray
    tn: jnp.ndarray


def init_metric_state() -> MetricState:
    z = jnp.zeros((2,), jnp.int32)
    return MetricState(tp=z, fp=z, fn=z, tn=z)


def _acc(limbs: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Add a per-batch int32 delta (< 2³¹) into an [hi, lo] pair, carrying
    so the invariant lo < 2²⁴ holds afterwards."""
    lo = limbs[1] + (delta & _LIMB_MASK)  # < 2²⁴ + 2²⁴: no overflow
    hi = limbs[0] + (delta >> _LIMB_BITS) + (lo >> _LIMB_BITS)
    return jnp.stack([hi, lo & _LIMB_MASK])


def _limb_value(limbs: jnp.ndarray) -> jnp.ndarray:
    return limbs[0].astype(jnp.float32) * float(1 << _LIMB_BITS) \
        + limbs[1].astype(jnp.float32)


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
    return MetricState(_acc(state.tp, tp), _acc(state.fp, fp),
                       _acc(state.fn, fn), _acc(state.tn, tn))


def merge_metric_states(a: MetricState, b: MetricState) -> MetricState:
    """Pairwise-add two states with carry (for accumulating psum'd
    cross-device deltas; a raw leaf add would let lo limbs grow past
    int32). Safe while the summed lo limbs stay below 2³¹ — i.e. up to
    ~2⁷ devices of renormalized states per merge."""

    def one(x, y):
        lo = x[1] + y[1]
        hi = x[0] + y[0] + (lo >> _LIMB_BITS)
        return jnp.stack([hi, lo & _LIMB_MASK])

    return MetricState(*(one(x, y) for x, y in zip(a, b)))


def metric_counts(state: MetricState) -> Tuple[int, int, int, int]:
    """Host-side exact (tp, fp, fn, tn) as Python ints."""
    import numpy as np

    out = []
    for limbs in state:
        arr = np.asarray(limbs)
        out.append(int(arr[0]) * (1 << _LIMB_BITS) + int(arr[1]))
    return tuple(out)


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def compute_metrics(state: MetricState, beta: float = DEFAULT_BETA) -> Dict[str, jnp.ndarray]:
    """Reduce counts to the reference's five scores."""
    tp = _limb_value(state.tp)
    fp = _limb_value(state.fp)
    fn = _limb_value(state.fn)
    tn = _limb_value(state.tn)

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
