"""Black-box CNN baselines with SceneNet's I/O contract.

Reference ``core/models/CNNBaseline.py:19-109``: plain 3D convolutions with
a channel-sum + relu∘tanh head, exposing empty ``get_cvx_coefficients`` /
``get_geneo_params`` so GENEO losses accept them unchanged.

Implemented as flax.linen modules (channel-last internally for TPU-friendly
layouts) wrapped in the same functional protocol as :class:`SceneNet`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _CnnBaselineModule(nn.Module):
    conv_num: int = 3
    kernel_size: Tuple[int, int, int] = (9, 9, 9)
    two_layers: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # NCDHW → NDHWC
        h = jnp.moveaxis(x, 1, -1)
        h = nn.Conv(self.conv_num, self.kernel_size, padding="SAME")(h)
        if self.two_layers:
            h = nn.Conv(self.conv_num, self.kernel_size, padding="SAME")(h)
        pred = jnp.sum(h, axis=-1, keepdims=True)  # channel sum
        pred = jax.nn.relu(jnp.tanh(pred))
        return jnp.moveaxis(pred, -1, 1)


@dataclasses.dataclass(frozen=True)
class CnnBaseline:
    """Two stacked Conv3d baseline (reference ``CnnBaseline``)."""

    conv_num: int = 3
    kernel_size: Tuple[int, int, int] = (9, 9, 9)
    two_layers: bool = True

    @classmethod
    def create(cls, conv_num: int = 3, kernel_size=(9, 9, 9), seed: int = 0,
               two_layers: bool = True, input_shape=(1, 1, 64, 64, 64)):
        model = cls(conv_num=conv_num, kernel_size=tuple(kernel_size), two_layers=two_layers)
        module = model._module()
        params = module.init(jax.random.PRNGKey(seed), jnp.zeros(input_shape, jnp.float32))
        return model, params["params"]

    def _module(self) -> _CnnBaselineModule:
        return _CnnBaselineModule(self.conv_num, self.kernel_size, self.two_layers)

    def apply(self, params: Mapping, x: jnp.ndarray) -> jnp.ndarray:
        return self._module().apply({"params": params}, x)

    def __call__(self, params, x):
        return self.apply(params, x)

    # GENEO-loss API compatibility (reference CNNBaseline.py:35-44)
    def cvx_coefficients(self, params) -> Dict:
        return {}

    def geneo_params_flat(self, params) -> Dict:
        return {}

    def trainable_mask(self, params):
        return jax.tree.map(lambda _: True, params)


def CnnBaseline2(conv_num: int = 1, kernel_size=(3, 2, 2), seed: int = 0):
    """Single-conv variant (reference ``CnnBaseline2``, kernel (3,2,2))."""
    return CnnBaseline.create(conv_num=conv_num, kernel_size=kernel_size, seed=seed,
                              two_layers=False)
