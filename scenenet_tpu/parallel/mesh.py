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

    On real TPU devices (and ``devices=None``) the mesh is laid out with
    ``jax.experimental.mesh_utils.create_device_mesh``, which maps the
    logical axes onto the physical ICI torus — so the ``space`` axis'
    halo ``ppermute`` neighbors (parallel/spatial.py) are adjacent ICI
    links instead of whatever order ``jax.devices()`` happens to return.
    Off-TPU (the virtual CPU test meshes) the layout is the plain
    deterministic reshape the tests pin; passing ``devices`` explicitly
    (e.g. the 2-process interleaved multihost tests) also keeps the
    caller's exact ordering.
    """
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    if (not explicit and len(devices) > 1
            and devices[0].platform == "tpu"):
        from jax.experimental import mesh_utils

        try:
            dev_array = mesh_utils.create_device_mesh(
                tuple(shape), devices=devices)
        except Exception:  # unusual topology/slice shape: fall back
            dev_array = np.asarray(devices).reshape(shape)
    else:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def make_hybrid_mesh(
    dcn_shape: Tuple[int, ...],
    ici_shape: Tuple[int, ...],
    axis_names: Sequence[str] = ("data", "space"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh for multi-slice TPU deployments: the leading (DCN) factors of
    each axis cross slice boundaries, the trailing (ICI) factors stay
    inside a slice.

    Collectives over an axis whose DCN factor is 1 ride ICI only. The
    standard deployment shape for this workload is DP across slices and
    spatial sharding within a slice::

        mesh = make_hybrid_mesh(dcn_shape=(n_slices, 1),
                                ici_shape=(dp_per_slice, space))

    — gradient ``psum`` then crosses DCN once per step (latency-tolerant),
    while the per-layer halo ``ppermute`` of the spatially-sharded conv
    never leaves the slice (SURVEY.md §5.8: "psum over ICI within a slice
    and DCN across slices").

    Uses ``mesh_utils.create_hybrid_device_mesh`` when the runtime exposes
    slice structure (real multi-slice TPU, or multi-process CPU where each
    process stands in for a slice). On a single-process CPU backend —
    the virtual test mesh — devices carry no slice structure, so slices
    are emulated by splitting the device list into ``prod(dcn_shape)``
    equal contiguous groups; axis semantics (sizes, which axis crosses
    "slices") are identical.
    """
    dcn_shape = tuple(dcn_shape)
    ici_shape = tuple(ici_shape)
    if len(dcn_shape) != len(ici_shape):
        raise ValueError(f"dcn_shape {dcn_shape} and ici_shape {ici_shape} "
                         "must have one factor per mesh axis")
    if len(dcn_shape) != len(axis_names):
        raise ValueError(f"{len(axis_names)} axis names for "
                         f"{len(dcn_shape)}-axis shapes")
    devices = list(devices if devices is not None else jax.devices())
    n_groups = int(np.prod(dcn_shape))
    total = int(np.prod(dcn_shape)) * int(np.prod(ici_shape))
    if total != len(devices):
        raise ValueError(f"hybrid mesh {dcn_shape}x{ici_shape} needs {total} "
                         f"devices, have {len(devices)}")

    from jax.experimental import mesh_utils

    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    has_slices = None not in slice_ids and len(slice_ids) > 1
    multi_process = jax.process_count() > 1
    if has_slices or multi_process:
        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices,
            process_is_granule=not has_slices)
    else:
        if len(devices) % n_groups:
            raise ValueError(f"{len(devices)} devices not divisible into "
                             f"{n_groups} emulated slices")
        per = len(devices) // n_groups
        groups = [devices[g * per:(g + 1) * per] for g in range(n_groups)]
        # same composition rule as create_hybrid_device_mesh: per-slice
        # ICI mesh, then the DCN factors stacked as the outer blocks
        ici_meshes = [np.asarray(g).reshape(ici_shape) for g in groups]
        granule_ids = np.arange(n_groups).reshape(dcn_shape)
        blocks = np.vectorize(lambda i: ici_meshes[i],
                              otypes=[object])(granule_ids)
        dev_array = np.block(blocks.tolist())
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, batch_axis: str = "data",
                   space_axis: Optional[str] = None) -> NamedSharding:
    """Sharding for (B, 1, Z, X, Y) voxel batches: B over data, optionally
    Z over space."""
    spec = P(batch_axis, None, space_axis, None, None)
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ensure_replicated(tree, mesh: Mesh):
    """Commit every array leaf of ``tree`` to the mesh-replicated sharding
    (no-op for leaves already committed there).

    Used on the CARRIED pytrees (TrainState, MetricState, loss
    accumulators) before a sharded step / cached-epoch dispatch: the
    program's replicated outputs come back committed to
    ``NamedSharding(mesh, P())``, while the very first call's inputs are
    uncommitted host values — two different jit cache keys, so without
    this every mesh fit compiled its train step TWICE (measured on a
    v5e: 14.2 s first call + 12.4 s silent recompile on the carried
    second call at 64³ b16; benchmarks/mesh_smoke_tpu.py). Placing the
    first carry here collapses both calls onto one key. Leaves already
    carried from a previous step short-circuit on the ``committed`` +
    sharding check, so the steady-state cost is one tree traversal.
    """
    rep = NamedSharding(mesh, P())

    def place(a):
        if isinstance(a, jax.Array) and a.committed and a.sharding == rep:
            return a
        return jax.device_put(a, rep)

    return jax.tree.map(place, tree)
