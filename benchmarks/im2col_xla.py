"""XLA-level im2col (per-tap dot_general) vs XLA conv lowering — VERDICT r2 #2.

The r2 finding: XLA's conv3d lowering runs the UNet3D layer shapes at
2.5–7.7 TFLOP/s, and every *Pallas* dot formulation bottomed out at the
f32 accumulating-dot chain (~1 TFLOP/s). The one untried formulation was
an XLA-LEVEL im2col — shifted slices + ``lax.dot_general`` so XLA's own
matmul emitter runs — implemented as
:func:`scenenet_tpu.ops.conv3d.conv3d_same_tapdots`.

Measures fwd (and fwd+bwd for the headline shape) at the same k=3³
layer shapes as the r2 "XLA conv3d layer profile" table, batch 4, f32,
honest fori_loop timing. One JSON line per measurement.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os
import sys
import time

import numpy as np

SHAPES = [  # (C_in, C_out, vol) — UNet3D / CnnBaseline layer shapes
    (64, 64, 32),
    (128, 128, 16),
    (256, 256, 8),
    (32, 32, 64),
]


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=int, default=None,
                    help="index into SHAPES (one shape per process)")
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+bwd (sum-of-output loss)")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.ops.conv3d import conv3d_same, conv3d_same_tapdots

    shapes = SHAPES if args.only is None else [SHAPES[args.only]]
    rng = np.random.default_rng(0)
    for cin, cout, vol in shapes:
        x = rng.standard_normal((args.batch, cin, vol, vol, vol)).astype(np.float32)
        w = (rng.standard_normal((cout, cin, 3, 3, 3)) * 0.1).astype(np.float32)
        xd, wd = jax.device_put(jnp.asarray(x)), jax.device_put(jnp.asarray(w))
        flops = 2 * args.batch * cout * cin * 27 * vol ** 3

        for name, fn in (("conv", conv3d_same), ("tapdots", conv3d_same_tapdots)):
            @jax.jit
            def loop(x, w, fn=fn):
                def body(i, acc):
                    return acc + jnp.sum(fn(x + i * 1e-7, w))
                return jax.lax.fori_loop(0, args.iters, body, 0.0)

            float(loop(xd, wd))
            t0 = time.perf_counter()
            total = float(loop(xd, wd))
            dt = (time.perf_counter() - t0) / args.iters
            assert np.isfinite(total)
            print(json.dumps({
                "tag": f"{name}_{cin}x{cout}@{vol}", "ms": round(dt * 1e3, 3),
                "tflops": round(flops / dt / 1e12, 2)}), flush=True)

            if args.grad:
                @jax.jit
                def gloop(x, w, fn=fn):
                    def body(i, acc):
                        g = jax.grad(
                            lambda w: jnp.sum(fn(x + i * 1e-7, w)))(w)
                        return acc + jnp.sum(g)
                    return jax.lax.fori_loop(0, args.iters, body, 0.0)

                float(gloop(xd, wd))
                t0 = time.perf_counter()
                total = float(gloop(xd, wd))
                dt = (time.perf_counter() - t0) / args.iters
                assert np.isfinite(total)
                print(json.dumps({
                    "tag": f"{name}_grad_{cin}x{cout}@{vol}",
                    "ms": round(dt * 1e3, 3),
                    "tflops_fwd_equiv": round(3 * flops / dt / 1e12, 2)}),
                    flush=True)


if __name__ == "__main__":
    sys.exit(main())
