"""3D convolution wrappers (XLA ``conv_general_dilated``, TPU/MXU path).

Replaces the reference's cuDNN ``F.conv3d(x, kernels, padding='same')``
(reference ``core/models/SCENE_Net.py:325``,
``core/models/geneos/GENEO_kernel_torch.py:56``). SAME padding matches
torch's asymmetric rule for even kernels (low = (k-1)//2, high = k//2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_DIMENSION_NUMBERS = ("NCDHW", "OIDHW", "NCDHW")


def conv3d_same(
    x: jnp.ndarray,
    kernels: jnp.ndarray,
    preferred_dtype: Optional[jnp.dtype] = jnp.float32,
) -> jnp.ndarray:
    """SAME-padded 3D cross-correlation.

    Parameters
    ----------
    x : (B, C_in, Z, X, Y)
    kernels : (C_out, C_in, k_z, k_x, k_y)

    Returns (B, C_out, Z, X, Y).
    """
    pads = []
    for k in kernels.shape[2:]:
        total = k - 1
        pads.append((total // 2, total - total // 2))
    if preferred_dtype is not None and x.dtype != jnp.dtype(preferred_dtype):
        # mixed-precision (bf16) inputs: keep the IO dtype — upcasting the
        # output breaks the conv transpose under AD (cotangent dtype must
        # match the operands), and the MXU accumulates in f32 regardless
        preferred_dtype = None
    return lax.conv_general_dilated(
        x,
        kernels.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=pads,
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=preferred_dtype,
    )


def geneo_conv(x: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Grouped single-input-channel GENEO convolution.

    x : (B, 1, Z, X, Y); kernels : (G, k_z, k_x, k_y) → (B, G, Z, X, Y).
    """
    return conv3d_same(x, kernels[:, None])


def conv3d_same_tapdots(
    x: jnp.ndarray,
    kernels: jnp.ndarray,
    preferred_dtype: Optional[jnp.dtype] = jnp.float32,
) -> jnp.ndarray:
    """SAME 3D conv as XLA-level per-tap matmuls (im2col without the 27×
    materialization).

    Same contract as :func:`conv3d_same`: x (B, C_in, Z, X, Y), kernels
    (C_out, C_in, k_z, k_x, k_y) → (B, C_out, Z, X, Y).

    Formulation: pad once, then for each of the k_z·k_x·k_y taps contract
    the shifted input view against the tap's (C_out, C_in) weight slice
    with ``dot_general`` and accumulate — the conv becomes taps× batched
    (M=B·vol, K=C_in, N=C_out) matmuls through XLA's own matmul emitter
    instead of its conv lowering. VERDICT r2 #2: the measured 1.0 TFLOP/s
    floor applied to *Pallas* dot chains; this is the XLA-level variant,
    benchmarked against the conv lowering in benchmarks/im2col_xla.py with
    the verdict recorded in RESULTS.md ("XLA-level im2col").
    """
    kz, kx, ky = kernels.shape[2:]
    pads = [(0, 0), (0, 0)]
    for k in (kz, kx, ky):
        pads.append(((k - 1) // 2, k - 1 - (k - 1) // 2))
    xp = jnp.pad(x, pads)
    B, C, Z, X, Y = x.shape
    O = kernels.shape[0]
    if preferred_dtype is not None and x.dtype != jnp.dtype(preferred_dtype):
        preferred_dtype = None  # same mixed-precision rule as conv3d_same
    out = None
    for dz in range(kz):
        for dx in range(kx):
            for dy in range(ky):
                view = lax.slice(
                    xp, (0, 0, dz, dx, dy), (B, C, dz + Z, dx + X, dy + Y))
                w = kernels[:, :, dz, dx, dy].astype(x.dtype)  # (O, C)
                # contract C: (B,C,Z,X,Y) × (O,C) → (B,O,Z,X,Y)
                tap = lax.dot_general(
                    view, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=preferred_dtype)
                # dot_general emits (B,Z,X,Y,O); move O next to B
                tap = jnp.moveaxis(tap, -1, 1)
                out = tap if out is None else out + tap
    return out
