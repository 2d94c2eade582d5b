"""Preemption-safe training: SIGTERM latch + full-fidelity train snapshots.

The reference is fail-fast (SURVEY §5.3: crash-on-missing-checkpoint, no
signal handling) and epoch-granular at best — a mid-epoch preemption (the
*normal* event on a TPU fleet) loses the whole epoch. This module is the
TPU-first upgrade (VERDICT r2 #5):

- :class:`PreemptionGuard` latches SIGTERM (the cloud-TPU preemption
  notice) without interrupting the in-flight device dispatch; the train
  loops poll it at batch/chunk boundaries and flush a resumable snapshot.
- :func:`save_train_snapshot` / :func:`restore_train_snapshot` persist the
  FULL training state — params, optimizer state, step counter, metric
  confusion counts, the running loss sum, and every live PRNG key — plus
  an (epoch, cursor) position, so a resumed run continues *bit-identically*
  (tested by killing a real process mid-epoch, tests/test_resume.py).

Storage rides the flat-npz format of :mod:`scenenet_tpu.train.checkpoint`;
the cursor lives in the JSON sidecar.
"""

from __future__ import annotations

import json
import signal
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from scenenet_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from scenenet_tpu.train.metrics import MetricState, init_metric_state

SNAPSHOT_NAME = "preempt.npz"


_preemption_requested = False


def request_preemption() -> None:
    """Programmatic preemption notice: the running fit flushes a snapshot
    and returns at its next batch/chunk boundary, exactly as for SIGTERM.

    For preemption signals that do NOT arrive as SIGTERM — e.g. a thread
    watching the GCE metadata server's maintenance-event endpoint — and
    for deterministic tests. Cleared when the guarded fit exits."""
    global _preemption_requested
    _preemption_requested = True


class PreemptionGuard:
    """Context manager that latches termination signals during a fit.

    The handler only sets a flag — no I/O, no exceptions inside the
    handler — so an in-flight XLA dispatch completes normally and the
    training loop flushes at the next batch/chunk boundary (bounded by
    one chunk's wall time). Nesting-safe: previous handlers are restored
    on exit. ``signals`` defaults to SIGTERM only; SIGINT stays on the
    default KeyboardInterrupt so interactive ^C still aborts hard.
    ``triggered`` also honors :func:`request_preemption`.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self.signals = tuple(signals)
        self._latched = False
        self._previous: Dict[int, Any] = {}

    @property
    def triggered(self) -> bool:
        return self._latched or _preemption_requested

    def _handler(self, signum, frame):  # pragma: no cover - trivial
        self._latched = True

    def __enter__(self) -> "PreemptionGuard":
        self._latched = False
        for s in self.signals:
            try:
                self._previous[s] = signal.signal(s, self._handler)
            except ValueError:  # not the main thread: poll-only mode
                pass
        return self

    def __exit__(self, *exc) -> None:
        global _preemption_requested
        _preemption_requested = False
        for s, old in self._previous.items():
            signal.signal(s, old)
        self._previous.clear()
        return None


def save_train_snapshot(path: str, state: Any, mstate: MetricState,
                        loss_sum, keys: Dict[str, Any],
                        cursor: Dict[str, Any]) -> None:
    """Persist the complete mid-training state.

    ``keys`` maps name → PRNG key array (whatever keys the calling loop
    threads: outer/epoch/augmentation); ``cursor`` is JSON-serializable
    position info (epoch, next chunk/batch, loss count, ...).
    """
    tree = {
        "state": state,
        "mstate": tuple(mstate),
        "loss_sum": jnp.asarray(loss_sum),
        "keys": dict(keys),
    }
    save_checkpoint(path, tree, metadata={"cursor": cursor})


def restore_train_snapshot(
    path: str, state_template: Any, keys_template: Dict[str, Any],
) -> Tuple[Any, MetricState, jnp.ndarray, Dict[str, Any], Dict[str, Any]]:
    """Inverse of :func:`save_train_snapshot` (templates give structure +
    dtypes). Returns (state, mstate, loss_sum, keys, cursor)."""
    template = {
        "state": state_template,
        "mstate": tuple(init_metric_state()),
        "loss_sum": jnp.zeros(()),
        "keys": dict(keys_template),
    }
    tree = restore_checkpoint(path, template)
    with open(path.replace(".npz", "") + ".json") as f:
        cursor = json.load(f)["cursor"]
    return (tree["state"], MetricState(*tree["mstate"]), tree["loss_sum"],
            tree["keys"], cursor)


def load_train_snapshot_if_compatible(
    path: str, state_template: Any, keys_template: Dict[str, Any],
    kind: str,
) -> Optional[Tuple[Any, MetricState, jnp.ndarray, Dict[str, Any],
                    Dict[str, Any]]]:
    """Tolerant resume: :func:`restore_train_snapshot`, but returns ``None``
    (with a warning) instead of raising when the snapshot is unusable —
    corrupt/truncated file, a different params structure, or a cursor
    written by a different fit pipeline (``cursor['kind']`` is 'batch' for
    the per-batch loop, 'chunk' for the scan-epoch loops — e.g. when
    ``device_cache: auto`` resolves differently across launches). A fresh
    run is always preferable to a crash at resume time."""
    try:
        out = restore_train_snapshot(path, state_template, keys_template)
    except Exception as exc:  # corrupt zip / missing key / shape mismatch
        print(f"[preempt] snapshot {path} unusable ({type(exc).__name__}: "
              f"{exc}); starting fresh")
        return None
    cursor = out[-1]
    if cursor.get("kind", kind) != kind:
        print(f"[preempt] snapshot {path} was written by the "
              f"'{cursor['kind']}' fit pipeline, this run uses '{kind}'; "
              f"starting fresh")
        return None
    return out


def discard_snapshot(path: str) -> None:
    """Remove a consumed/obsolete snapshot (+ sidecar). Called at the end
    of a successful fit so a later launch of the same experiment starts
    fresh instead of silently resuming a stale position."""
    import os

    for p in (path, path.replace(".npz", "") + ".json"):
        if os.path.exists(p):
            os.remove(p)


def chunk_starts(n_batches: int, n_chunks: int):
    """Split ``n_batches`` into ``min(n_chunks, n_batches)`` contiguous
    chunks: list of (start_batch, length) with at most two distinct
    lengths (so at most two XLA compilations of the chunk body)."""
    k = max(1, min(n_chunks, n_batches))
    base, rem = divmod(n_batches, k)
    out = []
    start = 0
    for i in range(k):
        length = base + (1 if i < rem else 0)
        out.append((start, length))
        start += length
    return out
