"""Device mesh construction + common shardings.

The scale-out axes for this workload (SURVEY.md §2.10, §5.7):
- ``data``  — batch data-parallelism (the reference's implicit DDP);
- ``space`` — spatial sharding of the voxel grid's Z axis with halo
  exchange for the SAME 3D conv (the stencil analog of context/sequence
  parallelism; rides ICI within a slice).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "space"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the ``data`` axis, ``space`` size 1. Pass e.g.
    ``shape=(2, 4)`` for 2-way DP × 4-way spatial on 8 devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, batch_axis: str = "data",
                   space_axis: Optional[str] = None) -> NamedSharding:
    """Sharding for (B, 1, Z, X, Y) voxel batches: B over data, optionally
    Z over space."""
    spec = P(batch_axis, None, space_axis, None, None)
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
