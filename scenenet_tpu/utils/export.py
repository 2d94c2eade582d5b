"""Model export: StableHLO serialization (TPU-native twin of the
reference's ONNX export, ``scripts/main.py:259-264``).

``jax.export`` serializes the jitted forward to portable StableHLO that
any XLA-backed runtime (or ONNX via converters) can consume.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_forward(model: Any, params: Any, input_shape: Tuple[int, ...],
                   path: str) -> str:
    """Serialize ``model.apply(params, x)`` (params baked in) to ``path``.

    Returns the StableHLO MLIR text (also handy for inspection).
    """
    from jax import export as jexport

    def forward(x):
        return model.apply(params, x)

    x_spec = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    exported = jexport.export(jax.jit(forward))(x_spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return exported.mlir_module()


def load_exported(path: str):
    """Deserialize and return a callable running the exported module."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
