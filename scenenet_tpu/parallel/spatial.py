"""Spatially-sharded 3D convolution with halo exchange.

For voxel grids too large for one chip (128³+, BASELINE.json config 5) the
grid's Z axis is sharded over the mesh's ``space`` axis. A SAME-padded
stencil then needs ``(k_z−1)//2`` top / ``k_z//2`` bottom halo planes from
the neighboring shards — exchanged with ``lax.ppermute`` over ICI inside a
``shard_map`` region (the conv-stencil analog of ring/context-parallel
attention; SURVEY.md §5.7). Devices at the grid boundary receive zeros from
``ppermute`` (no source feeds them), which is exactly SAME zero padding.

These functions run *inside* shard_map (per-shard views); wrappers that
build the shard_map live in :mod:`scenenet_tpu.parallel.dp`.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
from jax import lax

from scenenet_tpu.ops.conv3d import _DIMENSION_NUMBERS


def halo_conv3d(
    x_local: jnp.ndarray,
    kernels: jnp.ndarray,
    axis_name: str = "space",
    backend: str = "xla",
    activation: bool = False,
    interpret: bool | None = None,
    scratch_dtype: str = "f32",
) -> jnp.ndarray:
    """SAME 3D conv on a Z-sharded (B, C, Z_local, X, Y) block.

    Exchanges halos with the ± neighbors along ``axis_name`` and runs the
    local conv with VALID z (halo already concatenated, boundary zeros from
    ppermute) and SAME x/y padding. Output keeps the local Z extent, so the
    concatenation of outputs over the axis equals the unsharded SAME conv.

    ``backend="pallas"`` routes the single-channel local conv through the
    fused Pallas stencil (HBM-streamed for 128³+ shards — the BASELINE
    config-5 shape; 3.3× the XLA conv single-chip), optionally fusing the
    relu∘tanh head (``activation=True``). ``interpret=True`` runs the
    Pallas kernel in interpret mode (CPU-mesh tests).
    """
    k_z, k_x, k_y = kernels.shape[2:]
    lo = (k_z - 1) // 2  # planes needed from the z-below neighbor
    hi = k_z // 2        # planes needed from the z-above neighbor
    n = lax.axis_size(axis_name)

    parts = []
    if lo > 0:
        # my top `lo` planes → next device's lower halo
        below = lax.ppermute(
            x_local[:, :, -lo:], axis_name,
            [(i, i + 1) for i in range(n - 1)],
        )
        parts.append(below)
    parts.append(x_local)
    if hi > 0:
        above = lax.ppermute(
            x_local[:, :, :hi], axis_name,
            [(i + 1, i) for i in range(n - 1)],
        )
        parts.append(above)
    x_ext = jnp.concatenate(parts, axis=2) if len(parts) > 1 else x_local

    if backend == "pallas" and kernels.shape[:2] == (1, 1):
        from scenenet_tpu.ops.pallas_conv import (
            geneo_stencil_conv, halo_stencil_conv,
        )

        if interpret is None:  # auto: interpret-mode off TPU (CPU-mesh tests)
            interpret = jax.default_backend() != "tpu"
        if scratch_dtype == "bf16":
            # inference-only route: forward stencil with a bf16 tap scratch
            # (bit-exact for {0,1} occupancy shards), no VJP machinery
            return geneo_stencil_conv(
                x_ext.astype(jnp.float32), kernels[0, 0].astype(jnp.float32),
                activation=activation, z_prepadded=True, interpret=interpret,
                scratch_dtype="bf16",
            )
        return halo_stencil_conv(
            x_ext.astype(jnp.float32), kernels[0, 0].astype(jnp.float32),
            activation, interpret,
        )

    pads = [
        (0, 0),  # z: VALID — halos supplied explicitly
        ((k_x - 1) // 2, k_x // 2),
        ((k_y - 1) // 2, k_y // 2),
    ]
    conv = lax.conv_general_dilated(
        x_ext,
        kernels.astype(x_ext.dtype),
        window_strides=(1, 1, 1),
        padding=pads,
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32,
    )
    return jax.nn.relu(jnp.tanh(conv)) if activation else conv


def spatial_scenenet_forward(
    model,
    params: Mapping,
    x_local: jnp.ndarray,
    axis_name: str = "space",
    interpret: bool | None = None,
    inference: bool = False,
) -> jnp.ndarray:
    """SceneNet forward on a Z-sharded input block (inside shard_map).

    Kernel synthesis and the convex combination are tiny and replicated;
    only the conv touches the sharded grid. The model's ``backend`` field
    selects the local conv (XLA vs fused Pallas stencil + activation).
    ``inference=True`` (pallas) uses the bf16-tap-scratch forward — see
    :meth:`scenenet_tpu.models.SceneNet.apply`.
    """
    kernels = model.synthesize_kernels(params).astype(x_local.dtype)
    lams = model.effective_lambdas(params).astype(x_local.dtype)
    combined = jnp.einsum("g,gzxy->zxy", lams, kernels)
    return halo_conv3d(
        x_local, combined[None, None], axis_name,
        backend=getattr(model, "backend", "xla"),
        activation=True, interpret=interpret,
        scratch_dtype="bf16" if inference else "f32",
    )
