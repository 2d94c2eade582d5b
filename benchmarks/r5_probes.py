"""Round-5 perf probes, run on the quiet chip.

1. int4 MXU dot rate at the histogram kernel's exact shape — IF s4×s4→s32
   runs 2× s8 through this toolchain, the voxelization stage's dot part
   (~71% of 75 ms at batch 512) halves. One-hot operands are {0,1}, so
   int4 is exact (accumulation stays int32).
2. MXU conv slab sweep (max_bz ∈ {16, 32, 64}): fewer, taller dots per
   sample amortize MXU issue overhead; the old VPU-stencil lesson said
   bz>16 loses pipeline overlap — re-measure for the packed-split MXU
   formulation at the headline shape (conv stage only, batch 512).

One JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

ITERS = 8


def _cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_compilation"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def int4_dot_rates():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def measure(tag, m, k, n, dtype, reps, iters=32):
        a8 = rng.integers(0, 2, (m, k)).astype(np.int8)
        b8 = rng.integers(0, 2, (k, n)).astype(np.int8)
        try:
            a = jnp.asarray(a8).astype(dtype)
            b = jnp.asarray(b8).astype(dtype)
            dims = (((1,), (0,)), ((), ()))
            w = min(n, k)

            @jax.jit
            def loop(a, b):
                def body(i, ai):
                    for _ in range(reps):
                        o = lax.dot_general(ai, b, dims,
                                            preferred_element_type=jnp.int32)
                        patch = ai[:, :w] ^ (o[:, :w] & 1).astype(dtype)
                        ai = lax.dynamic_update_slice(ai, patch, (0, 0))
                    return ai
                out = lax.fori_loop(0, iters, body, a)
                return out[0, 0].astype(jnp.int32)

            int(loop(a, b))
            t0 = time.perf_counter()
            int(loop(a, b))
            dt = (time.perf_counter() - t0) / iters
            tops = m * k * n * reps * 2 / dt / 1e12
            print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3),
                              "tops": round(tops, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"tag": tag,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    measure("hist_shape_s8", 512, 4096, 512, jnp.int8, 256)
    measure("hist_shape_s4", 512, 4096, 512, jnp.int4, 256)
    measure("square2048_s4", 2048, 2048, 2048, jnp.int4, 64)


def conv_slab_sweep():
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.ops.pallas_conv import geneo_stencil_conv_mxu
    from scenenet_tpu.ops import prob_to_label

    rng = np.random.default_rng(0)
    g = (rng.random((512, 1, 64, 64, 64)) > 0.9).astype(np.float32)
    k = (rng.standard_normal((9, 5, 5)) * 0.1).astype(np.float32)
    gd = jax.device_put(jnp.asarray(g))
    kd = jax.device_put(jnp.asarray(k))

    ref = None
    for bz in (16, 32, 64):
        @jax.jit
        def loop(g, k):
            def body(i, acc):
                out = prob_to_label(geneo_stencil_conv_mxu(
                    g + i * 0.0, k, activation=True, split=True, max_bz=bz),
                    0.65)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        try:
            out1 = geneo_stencil_conv_mxu(gd, kd, activation=True,
                                          split=True, max_bz=bz)
            if ref is None:
                ref = out1
                delta = 0.0
            else:
                delta = float(jnp.abs(out1 - ref).max())
            float(loop(gd, kd))
            t0 = time.perf_counter()
            total = float(loop(gd, kd))
            dt = (time.perf_counter() - t0) / ITERS
            assert np.isfinite(total)
            print(json.dumps({"tag": f"conv_mxu_bz{bz}",
                              "ms": round(dt * 1e3, 2),
                              "grids_per_s": round(512 / dt),
                              "max_delta_vs_bz16": delta}), flush=True)
        except Exception as e:
            print(json.dumps({"tag": f"conv_mxu_bz{bz}",
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    _cache()
    int4_dot_rates()
    conv_slab_sweep()
