"""Spatially-sharded 3D convolution with overlapped halo exchange.

For voxel grids too large for one chip (128³+, BASELINE.json config 5) the
grid's Z axis is sharded over the mesh's ``space`` axis. A SAME-padded
stencil then needs ``(k_z−1)//2`` top / ``k_z//2`` bottom halo planes from
the neighboring shards — exchanged with ``lax.ppermute`` over ICI inside a
``shard_map`` region (the conv-stencil analog of ring/context-parallel
attention; SURVEY.md §5.7). Devices at the grid boundary receive zeros from
``ppermute`` (no source feeds them), which is exactly SAME zero padding.

**Overlap** (VERDICT r2 #1): the serial formulation — permute → concat →
conv — forces the whole conv to wait on the wire. Here the output is split
by halo dependence instead:

- the *interior* output planes (all but the first ``lo`` and last ``hi``)
  read only local input planes, so their conv consumes ``x_local``
  directly and has NO data dependence on the permutes — XLA's async
  collectives (collective-permute-start/done) + latency-hiding scheduler
  can run the ICI transfer concurrently with this, the bulk of the FLOPs;
- the ``lo`` top / ``hi`` bottom *boundary* planes are two thin convs over
  [received halo ‖ 2·halo-deep local slab], issued after the permutes.

Same total conv FLOPs (VALID-z work scales with output planes: lo +
(Z_local−lo−hi) + hi = Z_local), identical results (tested exactly vs the
serial path and the unsharded conv on the 8-CPU mesh). MEASURED VERDICT
(benchmarks/shard_projection.py, RESULTS.md "Spatial sharding"): at
config-5 scale the ICI wire is ~1% of per-shard compute, while the
split's thin boundary convs carry ~1.6 ms fixed overhead each — so the
serial path is the default and overlap is an opt-in for the regime where
halo bytes are large enough (≳70 MB) that wire time rivals compute.

These functions run *inside* shard_map (per-shard views); wrappers that
build the shard_map live in :mod:`scenenet_tpu.parallel.dp`.
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import jax.numpy as jnp
from jax import lax

from scenenet_tpu.ops.conv3d import _DIMENSION_NUMBERS


def _valid_z_conv(
    x_ext: jnp.ndarray,
    kernels: jnp.ndarray,
    backend: str,
    activation: bool,
    interpret: Optional[bool],
    scratch_dtype: str,
) -> jnp.ndarray:
    """VALID-z / SAME-x/y conv of an (already z-extended) block — the
    per-piece primitive shared by the serial and overlapped paths."""
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

    k_x, k_y = kernels.shape[3:]
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


def halo_conv3d(
    x_local: jnp.ndarray,
    kernels: jnp.ndarray,
    axis_name: str = "space",
    backend: str = "xla",
    activation: bool = False,
    interpret: bool | None = None,
    scratch_dtype: str = "f32",
    overlap: bool = False,
) -> jnp.ndarray:
    """SAME 3D conv on a Z-sharded (B, C, Z_local, X, Y) block.

    Exchanges halos with the ± neighbors along ``axis_name`` and convolves
    with VALID z (boundary zeros come from ``ppermute``'s zero-fill) and
    SAME x/y padding. Output keeps the local Z extent, so the concatenation
    of outputs over the axis equals the unsharded SAME conv.

    ``overlap=True`` issues the interior conv — which needs no halo —
    before consuming the permute results, letting XLA overlap the ICI
    transfer with the bulk of the compute (module docstring), and falls
    back to the serial permute→concat→conv when the shard is too thin
    (Z_local ≤ k_z−1, where there is no interior). It is OFF by default
    on measurement, not principle: at BASELINE config-5 scale the wire
    time is ~1% of per-shard compute (1.05 MB halo ≈ 0.023 ms at 45 GB/s
    vs 1.7–4 ms convs) while the split's two thin boundary convs carry
    ~1.6 ms fixed overhead each (benchmarks/shard_projection.py; RESULTS
    "Spatial sharding: projected v5e-8 scaling") — overlap starts paying
    only when halo bytes reach ~70 MB (very large batch × xy extents).

    ``backend="pallas"`` routes the single-channel local conv through the
    fused Pallas stencil (HBM-streamed for 128³+ shards — the BASELINE
    config-5 shape; 3.3× the XLA conv single-chip), optionally fusing the
    relu∘tanh head (``activation=True``). ``interpret=True`` runs the
    Pallas kernel in interpret mode (CPU-mesh tests).
    """
    k_z = kernels.shape[2]
    lo = (k_z - 1) // 2  # planes needed from the z-below neighbor
    hi = k_z // 2        # planes needed from the z-above neighbor
    n = lax.axis_size(axis_name)
    z_local = x_local.shape[2]

    def recv_below():
        # my top `lo` planes → next device's lower halo
        return lax.ppermute(x_local[:, :, -lo:], axis_name,
                            [(i, i + 1) for i in range(n - 1)])

    def recv_above():
        return lax.ppermute(x_local[:, :, :hi], axis_name,
                            [(i + 1, i) for i in range(n - 1)])

    if lo + hi == 0:
        return _valid_z_conv(x_local, kernels, backend, activation,
                             interpret, scratch_dtype)

    if not overlap or z_local <= lo + hi:
        # serial reference path: permute → concat → one conv
        parts = []
        if lo > 0:
            parts.append(recv_below())
        parts.append(x_local)
        if hi > 0:
            parts.append(recv_above())
        x_ext = jnp.concatenate(parts, axis=2)
        return _valid_z_conv(x_ext, kernels, backend, activation,
                             interpret, scratch_dtype)

    below = recv_below() if lo > 0 else None
    above = recv_above() if hi > 0 else None
    # interior: depends ONLY on x_local — schedulable during the permutes
    interior = _valid_z_conv(x_local, kernels, backend, activation,
                             interpret, scratch_dtype)
    pieces = []
    if lo > 0:
        top_in = jnp.concatenate([below, x_local[:, :, :lo + hi]], axis=2)
        pieces.append(_valid_z_conv(top_in, kernels, backend, activation,
                                    interpret, scratch_dtype))
    pieces.append(interior)
    if hi > 0:
        bot_in = jnp.concatenate(
            [x_local[:, :, z_local - (lo + hi):], above], axis=2)
        pieces.append(_valid_z_conv(bot_in, kernels, backend, activation,
                                    interpret, scratch_dtype))
    return jnp.concatenate(pieces, axis=2)


def spatial_scenenet_forward(
    model,
    params: Mapping,
    x_local: jnp.ndarray,
    axis_name: str = "space",
    interpret: bool | None = None,
    inference: bool = False,
    overlap: bool = False,
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
    # elementwise, NOT an einsum: a TPU dot at default matmul precision
    # would bf16-round the synthesized kernels
    combined = jnp.sum(lams[:, None, None, None] * kernels, axis=0)
    return halo_conv3d(
        x_local, combined[None, None], axis_name,
        backend=getattr(model, "backend", "xla"),
        activation=True, interpret=interpret,
        scratch_dtype="bf16" if inference else "f32",
        overlap=overlap,
    )
