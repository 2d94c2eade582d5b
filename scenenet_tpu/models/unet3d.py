"""3D U-Net comparison baseline (reference ``core/models/unet.py:17-135``).

Standard encoder/decoder with [Conv→BN→ReLU]×2 blocks, 2× maxpool
downscaling, nearest-neighbor upsampling with pad-and-concat skip
connections, 1×1×1 output conv and sigmoid head. Channel ladder
32→64→128→256→512 (halved at the bottleneck for non-transpose upsampling,
as in the reference).

flax.linen, channel-last internally; BatchNorm running statistics are
threaded functionally through the ``batch_stats`` collection.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvBlock(nn.Module):
    features: int
    mid_features: int | None = None
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32  # computation dtype (params stay f32)
    # cross-replica BatchNorm: set to the mesh's batch axis when training
    # data-parallel under shard_map — flax pmean's the batch mean/var over
    # the axis, so the normalization AND the stored running statistics use
    # the GLOBAL batch (sync-BN), matching the single-device computation
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.mid_features or self.features
        k = (self.kernel,) * 3
        bn_kw = dict(dtype=self.dtype, axis_name=self.bn_axis_name)
        x = nn.Conv(mid, k, padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, **bn_kw)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, k, padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, **bn_kw)(x)
        return nn.relu(x)


def _maxpool3d(x):
    return nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))


def _upsample_nearest(x):
    b, d, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


def _pad_to(x, target):
    pads = [(0, 0)]
    for ax in range(1, 4):
        diff = target.shape[ax] - x.shape[ax]
        pads.append((diff // 2, diff - diff // 2))
    pads.append((0, 0))
    return jnp.pad(x, pads)


class _UNetModule(nn.Module):
    """``stage`` selects a sub-graph for pipeline parallelism
    (``parallel/pp.py:make_unet_pipeline_inference_fn``): "encode" runs
    the down path and returns the skip tuple (x1..x5); "decode" takes
    that tuple and runs the up path + head; "all" is the plain forward.
    Blocks carry EXPLICIT names so the param tree is identical whichever
    sub-graph instantiates them (flax auto-numbering would collide)."""

    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, stage: str = "all"):
        dt = self.dtype
        ax = self.bn_axis_name

        def block(feats, name, mid=None):
            return _ConvBlock(feats, mid_features=mid, dtype=dt,
                              bn_axis_name=ax, name=name)

        if stage in ("all", "encode"):
            h = jnp.moveaxis(x, 1, -1).astype(dt)  # NCDHW → NDHWC
            x1 = block(32, "down0")(h, train)
            x2 = block(64, "down1")(_maxpool3d(x1), train)
            x3 = block(128, "down2")(_maxpool3d(x2), train)
            x4 = block(256, "down3")(_maxpool3d(x3), train)
            x5 = block(256, "down4")(_maxpool3d(x4), train)  # 512/2 bottleneck
            if stage == "encode":
                return (x1, x2, x3, x4, x5)
        else:
            assert stage == "decode", stage
            x1, x2, x3, x4, x5 = x

        def up(a, skip, feats, name):
            a = _upsample_nearest(a)
            a = _pad_to(a, skip)
            a = jnp.concatenate([skip, a], axis=-1)
            return block(feats, name, mid=a.shape[-1] // 2)(a, train)

        u = up(x5, x4, 128, "up0")
        u = up(u, x3, 64, "up1")
        u = up(u, x2, 32, "up2")
        u = up(u, x1, 32, "up3")
        out = nn.Conv(self.n_classes, (1, 1, 1), dtype=dt, name="out")(u)
        # sigmoid head + output in f32 for loss/metric accumulation
        return jnp.moveaxis(nn.sigmoid(out.astype(jnp.float32)), -1, 1)


@dataclasses.dataclass(frozen=True)
class UNet3D:
    n_classes: int = 1
    # stateful protocol: the Trainer threads batch_stats through TrainState
    is_stateful: bool = True
    # computation dtype: bf16 halves conv HBM traffic / doubles MXU rate;
    # params + batch_stats + sigmoid output stay f32 (mixed precision)
    dtype: jnp.dtype = jnp.float32
    # cross-replica (sync) BatchNorm axis for mesh DP training — set via
    # with_bn_sync(); only valid inside shard_map over that axis
    bn_axis_name: str | None = None

    @classmethod
    def create(cls, n_classes: int = 1, seed: int = 0,
               input_shape=(1, 1, 64, 64, 64), dtype=jnp.float32):
        model = cls(n_classes=n_classes, dtype=dtype)
        variables = _UNetModule(n_classes, dtype=dtype).init(
            jax.random.PRNGKey(seed), jnp.zeros(input_shape, jnp.float32), train=False
        )
        return model, dict(variables)

    def with_bn_sync(self, axis_name: str) -> "UNet3D":
        """A view whose BatchNorms pmean batch statistics over the named
        mesh axis (sync-BN): under data-parallel shard_map the normalization
        and running stats use the GLOBAL batch, so mesh training matches
        the single-device fit exactly. Apply methods of this view must run
        inside shard_map with the axis bound."""
        return dataclasses.replace(self, bn_axis_name=axis_name)

    def split_variables(self, variables: Mapping):
        """(trainable params, model_state) for the stateful trainer."""
        state = {k: v for k, v in variables.items() if k != "params"}
        return variables["params"], state

    def _module(self) -> _UNetModule:
        return _UNetModule(self.n_classes, dtype=self.dtype,
                           bn_axis_name=self.bn_axis_name)

    def apply_train(self, params, model_state, x: jnp.ndarray):
        pred, updates = self._module().apply(
            {"params": params, **model_state}, x, train=True,
            mutable=list(model_state.keys()),
        )
        return pred, dict(updates)

    def apply_eval(self, params, model_state, x: jnp.ndarray):
        return self._module().apply(
            {"params": params, **model_state}, x, train=False)

    def apply(self, variables: Mapping, x: jnp.ndarray, train: bool = False):
        """Returns pred (and new batch_stats when train=True)."""
        if train:
            pred, updates = self._module().apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return pred, updates
        return self._module().apply(variables, x, train=False)

    def __call__(self, variables, x):
        return self.apply(variables, x)

    def cvx_coefficients(self, variables):
        return {}

    def geneo_params_flat(self, variables):
        return {}

    def trainable_mask(self, variables):
        return jax.tree.map(lambda _: True, variables)
