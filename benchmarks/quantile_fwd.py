"""Quantile ensemble forward: inference-path A/B at the recorded shape.

Round 2 recorded the 3-member ensemble at 16.4 ms/batch-32 (64³) through
the Pallas training forward — `QuantileSceneNet.apply` had no `inference`
passthrough, so the bf16 tap-scratch and banded-y MXU forwards were
unreachable for the ensemble. This A/Bs all three member forwards under
the same vmap. Honest fori_loop timing (see bench.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import sys
import time

import numpy as np

BATCH = 32
GRID = (64, 64, 64)
ITERS = 16


def main():
    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from scenenet_tpu.models import QuantileSceneNet

    net, params = QuantileSceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                          backend="pallas")
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((BATCH, 1, *GRID)) > 0.98)
                    .astype(np.float32))

    base = np.asarray(net.apply(params, x))
    for mode in (False, True, "mxu"):
        @jax.jit
        def loop(params, x, mode=mode):
            def body(i, acc):
                out = net.apply(params, x + i * 0.0, inference=mode)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        # exactness vs the training forward first
        got = np.asarray(net.apply(params, x, inference=mode))
        max_d = float(np.abs(got - base).max())
        float(loop(params, x))  # compile + warm
        t0 = time.perf_counter()
        float(loop(params, x))
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"tag": f"quantile_fwd_{mode}",
                          "ms": round(dt * 1e3, 2),
                          "grids_per_s": round(BATCH / dt, 0),
                          "max_delta_vs_f32": max_d}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
