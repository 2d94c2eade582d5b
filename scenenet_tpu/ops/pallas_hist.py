"""Pallas TPU kernel: voxel histogram as fused one-hot matmuls on the MXU.

Same math as :func:`scenenet_tpu.ops.voxelize._mxu_bin_counts` — split the
flat bin id into (hi, lo) halves and accumulate
``counts[hi, lo] += OneHot(hi_chunk)ᵀ @ OneHot(lo_chunk)`` — but the
one-hot operands are built *inside* the kernel in VMEM right before each
``dot_general``, so they never round-trip through HBM. One grid step per
sample; the chunk loop is an in-kernel ``fori_loop`` accumulating into the
VMEM output block.

Block-shape note: Mosaic requires the last two block dims to be divisible
by (8, 128) or equal to the array dims, so the point ids are shaped
(B, n_chunks, CHUNK) with the whole (n_chunks, CHUNK) id plane resident
(~0.3 MB for 82k points).

Measured result (v5e, 32×82k pts → 64³): 13.1 ms/batch vs 10.5 ms for the
SAME algorithm written as a chunked XLA einsum
(:func:`scenenet_tpu.ops.voxelize._mxu_bin_counts`) — XLA pipelines this
matmul pattern well on its own, so the XLA formulation remains the
production default and this kernel is kept as a correct, tested reference
point for future tuning.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO = 512
CHUNK = 2048


def _hist_kernel(hi_ref, lo_ref, w_ref, o_ref, *, n_hi: int, channels: int,
                 n_chunks: int):
    o_ref[0] = jnp.zeros_like(o_ref[0])

    def body(c, _):
        hi = hi_ref[0, pl.ds(c, 1)][0]  # (CHUNK,)
        lo = lo_ref[0, pl.ds(c, 1)][0]
        a = (hi[:, None] == lax.broadcasted_iota(jnp.int32, (CHUNK, n_hi), 1))
        a = a.astype(jnp.bfloat16)
        if channels == 2:
            w = w_ref[0, pl.ds(c, 1)][0].astype(jnp.bfloat16)
            a = jnp.concatenate([a, a * w[:, None]], axis=1)
        b = (lo[:, None] == lax.broadcasted_iota(jnp.int32, (CHUNK, LO), 1))
        b = b.astype(jnp.bfloat16)
        o_ref[0] += lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return 0

    lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def pallas_bin_counts(
    flat: jnp.ndarray,
    mask: jnp.ndarray,
    size: int,
    weights: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(B, N) flat bin ids (+mask, optional per-point weights) →
    (B, size) counts [, (B, size) weighted counts]."""
    b, n = flat.shape
    n_hi = -(-size // LO)
    invalid = n_hi * LO
    flat = jnp.where(mask, flat, invalid)
    if n % CHUNK:
        pad = CHUNK - n % CHUNK
        flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=invalid)
        if weights is not None:
            weights = jnp.pad(weights, ((0, 0), (0, pad)))
        n += pad
    n_chunks = n // CHUNK
    hi = (flat // LO).astype(jnp.int32).reshape(b, n_chunks, CHUNK)
    lo = (flat % LO).astype(jnp.int32).reshape(b, n_chunks, CHUNK)
    channels = 2 if weights is not None else 1
    w = (weights.astype(jnp.float32) if weights is not None else
         jnp.zeros((b, n), jnp.float32)).reshape(b, n_chunks, CHUNK)

    id_spec = pl.BlockSpec((1, n_chunks, CHUNK), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, n_hi=n_hi, channels=channels,
                          n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((b, channels * n_hi, LO), jnp.float32),
        grid=(b,),
        in_specs=[id_spec, id_spec, id_spec],
        out_specs=pl.BlockSpec((1, channels * n_hi, LO), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(hi, lo, w)

    counts = out[:, :n_hi].reshape(b, n_hi * LO)[:, :size]
    if channels == 2:
        wsum = out[:, n_hi:].reshape(b, n_hi * LO)[:, :size]
        return counts, wsum
    return counts, None
