"""Flat-shift multi-channel conv3d kernel (interpret mode): exactness vs
the XLA conv across channel regimes, non-cubic volumes and both layouts.
Perf status (documented in benchmarks/RESULTS.md): within ~1.15x of the
XLA conv3d on the UNet shapes in three formulations — kept as a tested
experiment, NOT wired into the models."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from scenenet_tpu.ops.pallas_conv_mc import conv3d_mc_same


def _ref(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32)


class TestConv3dMC:
    @pytest.mark.parametrize("cin,cout,shape", [
        (4, 8, (6, 6, 6)),        # tiny channels (heavy zero padding)
        (32, 32, (12, 12, 12)),   # shallow UNet regime
        (160, 128, (8, 8, 8)),    # deep regime (no channel padding)
        (16, 24, (5, 9, 7)),      # non-cubic + odd extents
    ])
    def test_matches_xla(self, cin, cout, shape):
        rng = np.random.default_rng(sum(shape) + cin)
        x = jnp.asarray(rng.random((2, cin, *shape)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((cout, cin, 3, 3, 3)).astype(np.float32) * 0.1)
        out = conv3d_mc_same(x, w, interpret=True, n_tile=256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w)),
                                   atol=2e-5, rtol=1e-5)

    def test_channels_last_layout(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 10, 10, 10, 24)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((16, 24, 3, 3, 3)).astype(np.float32) * 0.1)
        out = conv3d_mc_same(x, w, interpret=True, n_tile=256,
                             channels_last=True)
        ref = _ref(jnp.moveaxis(x, -1, 1), w)
        np.testing.assert_allclose(np.asarray(jnp.moveaxis(out, -1, 1)),
                                   np.asarray(ref), atol=2e-5, rtol=1e-5)
