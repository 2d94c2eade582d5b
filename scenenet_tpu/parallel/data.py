"""Multi-host sharded batch assembly.

On a multi-host pod each process loads only its shard of the global batch;
``jax.make_array_from_process_local_data`` assembles the logical global
array (SURVEY.md §5.8). On a single host this degrades to a plain
``device_put`` with the same sharding — so the data pipeline is written
once and works from 1 chip to a pod.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_batch_from_local(
    local_batch: Tuple[np.ndarray, ...],
    mesh: Mesh,
    batch_axis: str = "data",
    space_axis: Optional[str] = None,
):
    """Assemble per-process local (x, y, ...) arrays into global sharded
    arrays. ``local_batch`` leading dims are the *process-local* batch; the
    global batch is ``local_batch * process_count``."""
    out = []
    for arr in local_batch:
        spec = [batch_axis] + [None] * (np.ndim(arr) - 1)
        if space_axis is not None and np.ndim(arr) >= 5:
            spec[2] = space_axis  # (B, C, Z, X, Y) → shard Z
        sharding = NamedSharding(mesh, P(*spec))
        out.append(jax.make_array_from_process_local_data(sharding, np.asarray(arr)))
    return tuple(out)


def local_batch_size(global_batch_size: int) -> int:
    """Per-process slice of a global batch size."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible by "
                         f"{n} processes")
    return global_batch_size // n
