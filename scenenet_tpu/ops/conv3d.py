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
