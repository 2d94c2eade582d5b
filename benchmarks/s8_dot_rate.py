"""Measure the practical s8×s8→s32 MXU dot rate on this chip.

Context (`benchmarks/hist_decompose.py`): the fused histogram's time is
71% MXU dots (16.56 of 23.22 ms at batch 128), not one-hot builds as the
round-3 roofline section inferred. The dots implied ~166 TOPS vs the
394 TOPS *nominal* v5e s8 peak — but nominal s8 assumes the int8 MAC
path is actually 2× bf16 through this toolchain. This measures the
achievable ceiling directly with plain XLA `dot_general` chains:

  - square s8 dots at 2048/4096 (the best case XLA can tile)
  - the histogram kernel's exact shape (512, 4096) @ (4096, 512)
  - the same shapes in bf16 for the 2×-or-not comparison

Honest fori_loop timing: each dot's output is folded back into the next
dot's lhs, so the chain is serially dependent — nothing can be CSE'd,
hoisted, or dropped. One JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ITERS = 32


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(tag, m, k, n, dtype, reps):
    """reps dots of (m,k)@(k,n) per iteration; returns TOPS."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    if dtype == "s8":
        a = jnp.asarray(rng.integers(-2, 3, (m, k)).astype(np.int8))
        b = jnp.asarray(rng.integers(-2, 3, (k, n)).astype(np.int8))
        acc = jnp.int32
    else:
        a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        acc = jnp.float32

    dims = (((1,), (0,)), ((), ()))
    w = min(n, k)

    def feed_back(ai, o):
        # fold the output into the lhs' first w columns: every dot
        # depends on the previous one, so nothing can be CSE'd, hoisted,
        # or dropped. The fold itself is (m, w) elementwise — negligible
        # against the m·k·n MACs.
        if dtype == "s8":
            patch = ai[:, :w] ^ (o[:, :w] & 1).astype(jnp.int8)
        else:
            patch = ai[:, :w] + (o[:, :w] * 1e-24).astype(jnp.bfloat16)
        return lax.dynamic_update_slice(ai, patch, (0, 0))

    @jax.jit
    def loop(a, b):
        def body(i, ai):
            for _ in range(reps):
                o = lax.dot_general(ai, b, dims, preferred_element_type=acc)
                ai = feed_back(ai, o)
            return ai
        out = lax.fori_loop(0, ITERS, body, a)
        return out[0, 0].astype(jnp.float32)

    float(loop(a, b))  # compile + warm
    t0 = time.perf_counter()
    float(loop(a, b))
    dt = (time.perf_counter() - t0) / ITERS
    macs = m * k * n * reps
    tops = macs * 2 / dt / 1e12
    print(json.dumps({"tag": tag, "m": m, "k": k, "n": n, "dtype": dtype,
                      "ms": round(dt * 1e3, 3), "tops": round(tops, 1)}),
          flush=True)
    return tops


def main():
    _enable_compile_cache()

    # square peaks (reps chosen for ~10 ms/iter)
    measure("square2048", 2048, 2048, 2048, "s8", 64)
    measure("square2048_bf16", 2048, 2048, 2048, "bf16", 64)
    measure("square4096", 4096, 4096, 4096, "s8", 8)
    measure("square4096_bf16", 4096, 4096, 4096, "bf16", 8)
    # the histogram kernel's dot shape
    measure("hist_shape", 512, 4096, 512, "s8", 256)
    measure("hist_shape_bf16", 512, 4096, 512, "bf16", 256)
    # taller accumulate shape (128³ sorted-slab regime: 256 rows)
    measure("slab_shape", 256, 2048, 512, "s8", 512)


if __name__ == "__main__":
    sys.exit(main())
