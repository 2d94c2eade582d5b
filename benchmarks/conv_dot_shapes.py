"""Dot-rate survey at the banded-stencil conv's candidate shapes (round 4).

The shipped banded-y MXU stencil issues, per (dx, dz) tap pair, a
(z·xx, kp=128) @ (kp, yy=64) bf16 dot (`ops/pallas_conv.py:
_stencil_mxu_kernel`). Two suspected inefficiencies:

  1. K pads 68 → 128 (the 128-lane-alignment miscompile bound): 1.88×
     issued-MAC waste.
  2. N = 64 = half the MXU's 128 output lanes.

Folding the z-taps into the contraction ("zy-im2col": lhs columns =
(dz, y-window), K_useful = 9·68 = 612 → pad 640) would cut the waste to
1.05× — IF deep-K dots at N=64 sustain rate. This measures the rate at
each candidate shape (serially-dependent fori_loop chains, nothing
hoistable) so the formulation choice is driven by data, not guesses:

  - the shipped shape (4096, 128) @ (128, 64)
  - N=128 twin (does N=64 halve throughput?)
  - zy-im2col (4096, 640) @ (640, 64|128)
  - full zxy-im2col (4096, 3072) @ (3072, 64)
  - s8 twins of the winners (is int8 2× through this path?)

Usage: python benchmarks/conv_dot_shapes.py
"""

from __future__ import annotations

import importlib.util
import os
import sys


def main():
    spec = importlib.util.spec_from_file_location(
        "s8_dot_rate",
        os.path.join(os.path.dirname(__file__), "s8_dot_rate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._enable_compile_cache()

    # reps scaled for roughly comparable per-iter work
    for dt in ("bf16", "s8"):
        mod.measure(f"shipped_{dt}", 4096, 128, 64, dt, 512)
        mod.measure(f"shipped_n128_{dt}", 4096, 128, 128, dt, 512)
        mod.measure(f"zy_im2col_{dt}", 4096, 640, 64, dt, 128)
        mod.measure(f"zy_im2col_n128_{dt}", 4096, 640, 128, dt, 128)
        mod.measure(f"zxy_im2col_{dt}", 4096, 3072, 64, dt, 32)
        mod.measure(f"zxy_im2col_n128_{dt}", 4096, 3072, 128, dt, 32)


if __name__ == "__main__":
    sys.exit(main())
