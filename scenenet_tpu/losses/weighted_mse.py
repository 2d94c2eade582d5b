"""Density-weighted MSE — the base regression criterion.

Re-implements the reference ``core/criterions/w_mse.py:24-160`` as a pure
jit-able function of (pred, gt) with a static 10-bin weighting table.

Weighting scheme: ground-truth voxel values are looked up in a histogram of
target densities (``freqs`` over ``ranges``); rare target values get weight
close to 1, dense ones are down-weighted to ``max(1 − α·density, ε)``, and
weights are normalized to mean 1.

Parity quirks replicated exactly (see tests/test_losses.py):
- Bin lookup is *nearest range start* (``argmin |y − ranges|``,
  ``w_mse.py:123``), not the containing bin.
- The reference substitutes bin indices with frequencies **in-place,
  sequentially** (``w_mse.py:125-127``) — so if a frequency value collides
  with a still-unprocessed bin index, it is substituted again. The static
  unrolled ``where`` chain below reproduces that behavior bit-for-bit.
- The weighting table ships as a fixture (``hist_estimation.npz``,
  converted from the reference's ``hist_estimation.pickle``; path wired at
  ``scripts/constants.py:33``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_TABLE = os.path.join(os.path.dirname(__file__), "hist_estimation.npz")


def load_weighting_scheme(path: str = _DEFAULT_TABLE) -> Tuple[np.ndarray, np.ndarray]:
    data = np.load(path)
    return data["freqs"].astype(np.int64), data["ranges"].astype(np.float32)


def hist_frequency_estimation(y: np.ndarray, hist_len: int = 10) -> Tuple[np.ndarray, np.ndarray]:
    """Histogram frequency estimation over targets in [0, 1].

    Host-side twin of ``WeightedMSE.hist_frequency_estimation``
    (``w_mse.py:72-112``): counts fall in bin ``int(hist_len * y)`` (note a
    value of exactly 1.0 lands in an extra bin, as with torch.bincount).
    """
    ranges = np.linspace(0, 1, hist_len + 1)[:-1].astype(np.float32)
    idxs = (hist_len * np.asarray(y).reshape(-1)).astype(np.int64)
    freqs = np.bincount(idxs, minlength=hist_len)
    return freqs, ranges


@dataclasses.dataclass(frozen=True)
class WeightedMSE:
    """``mean(mse_weight · w(gt) · (gt − pred)²)`` with histogram weights.

    ``axis_names`` (when called inside shard_map over equal shards) makes
    the weight normalization and the final mean *global* via pmean.
    """

    freqs: Tuple[int, ...]
    ranges: Tuple[float, ...]
    weight_alpha: float = 1.0
    weight_epsilon: float = 0.1
    mse_weight: float = 1.0
    axis_names: Tuple[str, ...] = ()

    @classmethod
    def create(
        cls,
        targets: Optional[np.ndarray] = None,
        weighting_scheme_path: Optional[str] = _DEFAULT_TABLE,
        weight_alpha: float = 1.0,
        weight_epsilon: float = 0.1,
        mse_weight: float = 1.0,
        **_: object,
    ) -> "WeightedMSE":
        """Load the weighting table, or estimate it from ``targets``
        (reference ``w_mse.py:59-69``)."""
        if weighting_scheme_path is not None and os.path.exists(weighting_scheme_path):
            freqs, ranges = load_weighting_scheme(weighting_scheme_path)
        elif targets is not None:
            freqs, ranges = hist_frequency_estimation(np.asarray(targets).reshape(-1))
        else:
            raise ValueError("no weighting table nor targets provided")
        return cls(
            freqs=tuple(int(f) for f in freqs),
            ranges=tuple(float(r) for r in ranges),
            weight_alpha=weight_alpha,
            weight_epsilon=weight_epsilon,
            mse_weight=mse_weight,
        )

    # ---- weighting -------------------------------------------------------

    def dens_target(self, y: jnp.ndarray) -> jnp.ndarray:
        """Normalized density of each target value (``w_mse.py:114-132``)."""
        ranges = jnp.asarray(self.ranges, y.dtype)
        hist_idx = jnp.argmin(jnp.abs(y[..., None] - ranges), axis=-1).astype(jnp.int32)
        vals = hist_idx
        for idx, f in enumerate(self.freqs):
            # sequential in-place substitution, including the reference's
            # index/frequency collision behavior
            vals = jnp.where(vals == idx, jnp.int32(f), vals)
        fmin = min(self.freqs)
        fmax = max(self.freqs)
        return (vals - fmin) / jnp.asarray(fmax - fmin, y.dtype)

    def weight_target(self, y: jnp.ndarray) -> jnp.ndarray:
        """Per-target weights, normalized to mean 1 (``w_mse.py:134-145``)."""
        dens = self.dens_target(y)
        w = jnp.maximum(1.0 - self.weight_alpha * dens, self.weight_epsilon)
        mean_w = jnp.mean(w)
        if self.axis_names:
            mean_w = jax.lax.pmean(mean_w, self.axis_names)
        return w / mean_w

    # ---- loss ------------------------------------------------------------

    def __call__(self, pred: jnp.ndarray, gt: jnp.ndarray, *_args, **_kw) -> jnp.ndarray:
        pred, gt = jnp.broadcast_arrays(pred, gt)
        w = self.weight_target(gt)
        loss = jnp.mean(self.mse_weight * w * (gt - pred) ** 2)
        if self.axis_names:
            loss = jax.lax.pmean(loss, self.axis_names)
        return loss
