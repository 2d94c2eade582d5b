"""Pallas MXU histogram kernel (interpret mode): exact counts vs numpy."""

import numpy as np

import jax.numpy as jnp

from scenenet_tpu.ops.pallas_hist import pallas_bin_counts


class TestPallasHist:
    def test_counts_and_weighted(self):
        rng = np.random.default_rng(0)
        b, n, v = 2, 5000, 16**3
        flat = rng.integers(0, v, (b, n)).astype(np.int32)
        mask = np.ones((b, n), bool)
        mask[1, 4500:] = False
        w = rng.integers(0, 2, (b, n)).astype(np.float32)

        counts, wsum = pallas_bin_counts(jnp.asarray(flat), jnp.asarray(mask),
                                         v, jnp.asarray(w), interpret=True)
        ref = np.zeros((b, v))
        refw = np.zeros((b, v))
        for i in range(b):
            np.add.at(ref[i], flat[i][mask[i]], 1.0)
            np.add.at(refw[i], flat[i][mask[i]], w[i][mask[i]])
        np.testing.assert_allclose(np.asarray(counts), ref)
        np.testing.assert_allclose(np.asarray(wsum), refw)

    def test_single_channel_and_ragged_bins(self):
        rng = np.random.default_rng(1)
        b, n, v = 1, 3000, 10 * 10 * 10  # not a multiple of 512
        flat = rng.integers(0, v, (b, n)).astype(np.int32)
        mask = np.ones((b, n), bool)
        counts, none = pallas_bin_counts(jnp.asarray(flat), jnp.asarray(mask),
                                         v, None, interpret=True)
        assert none is None
        ref = np.zeros((b, v))
        np.add.at(ref[0], flat[0], 1.0)
        np.testing.assert_allclose(np.asarray(counts), ref)
