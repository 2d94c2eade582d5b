"""Decompose the fused MXU histogram's 3.2×-of-floor gap (headline stage).

The roofline section infers the plateau is the in-kernel one-hot build
cost — inferred indirectly (LO=1024 and pipelining experiments). This
measures it directly with three kernel variants at the headline shape
(single-channel occupancy, 64³, batch 128):

  full     — the production kernel (bounds + binning + build + dots)
  nobuild  — identical loop/dots, but both one-hot operands replaced by
             a static int8 VMEM scratch filled once (same dot shapes,
             same accumulation; no per-chunk compare/cast build)
  nodots   — identical build, but the dot replaced by a cheap slice-add
             consume (keeps the builds live; no MXU contraction)

full − nobuild ≈ the compare+cast build cost; full − nodots ≈ the MXU
dot cost; residual = binning/bounds/loop overhead. One JSON line per
measurement (honest fori_loop timing).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import os
import sys
import time

import numpy as np

BATCH = 128
N_POINTS = 81920
GRID = (64, 64, 64)
ITERS = 8


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_variant(mode: str):
    """Build a (points, mask) → (B, size) counts fn with the chosen
    kernel variant. Mirrors pallas_hist._points_hist_kernel (channels=1,
    int8 dtype) with the build/dot stage swapped per `mode`."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from scenenet_tpu.ops.pallas_hist import LO, _live_chunk_count

    n_x, n_y, n_z = GRID
    size = n_x * n_y * n_z
    n_hi = -(-size // LO)
    chunk = 4096

    def kernel(pts_ref, m_ref, const_a, const_b, o_ref, flat_ref):
        o_ref[0] = jnp.zeros_like(o_ref[0])
        lo_shift = LO.bit_length() - 1
        m = m_ref[0] != 0
        n_live = _live_chunk_count(m_ref[0])
        big = jnp.float32(3.4e38)
        axes_lo, axes_hi = [], []
        for a in range(3):
            p = pts_ref[0, a]
            axes_lo.append(jnp.min(jnp.where(m, p, big)))
            axes_hi.append(jnp.max(jnp.where(m, p, -big)))
        rngs = [h - l for l, h in zip(axes_lo, axes_hi)]
        rmax = jnp.maximum(rngs[0], jnp.maximum(rngs[1], rngs[2]))
        lo = [l - (rmax - r) * 0.5 for l, r in zip(axes_lo, rngs)]
        hi = [h + (rmax - r) * 0.5 for h, r in zip(axes_hi, rngs)]
        shape_f = (jnp.float32(n_x), jnp.float32(n_y), jnp.float32(n_z))
        inv_step = [s / jnp.maximum(h - l, jnp.float32(1e-30))
                    for l, h, s in zip(lo, hi, shape_f)]
        invalid = n_hi * LO

        def bin_axis(a, n):
            p = pts_ref[0, a]
            rel = (p - lo[a]) * inv_step[a]
            idx = jnp.ceil(rel - jnp.float32(1e-4)).astype(jnp.int32) - 1
            return jnp.clip(idx, 0, n - 1)

        ix, iy, iz = bin_axis(0, n_x), bin_axis(1, n_y), bin_axis(2, n_z)
        flat_ref[...] = jnp.where(m, (iz * n_x + ix) * n_y + iy, invalid)
        dims = (((1,), (0,)), ((), ()))

        def body(c, _):
            ids = flat_ref[pl.ds(c, 1)]
            hi_c = ids >> lo_shift
            lo_c = ids & (LO - 1)
            if mode == "nobuild":
                # lhs slides by (c&1)*8 rows: per-chunk operand dependence,
                # so the dot cannot be hoisted out of the loop (8-aligned
                # sublane offset — Mosaic requires multiples of 8)
                at = const_a[pl.ds((c & 1) * 8, n_hi)]
                b = const_b[...]
                o_ref[0] += lax.dot_general(
                    at, b, dims, preferred_element_type=jnp.int32)
                return 0
            mask_hi = hi_c == lax.broadcasted_iota(jnp.int32, (n_hi, chunk), 0)
            at = mask_hi.astype(jnp.int8)
            b = (lo_c[0][:, None] ==
                 lax.broadcasted_iota(jnp.int32, (chunk, LO), 1))
            b = b.astype(jnp.int8)
            if mode == "nodots":
                # consume both builds with cheap elementwise adds (keeps
                # them live; (n_hi, LO) adds ≪ the 1.07G-MAC dot)
                o_ref[0] += at[:, :LO].astype(jnp.int32)
                o_ref[0] += b[:n_hi].astype(jnp.int32)
                return 0
            o_ref[0] += lax.dot_general(
                at, b, dims, preferred_element_type=jnp.int32)
            return 0

        lax.fori_loop(0, n_live, body, 0)

    @jax.jit
    def run(points, mask):
        b, n, _ = points.shape
        n_chunks = n // chunk
        pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2)
        pts_t = pts_t.reshape(b, 3, n_chunks, chunk)
        m = mask.astype(jnp.int32).reshape(b, n_chunks, chunk)
        rng = np.random.default_rng(0)
        ca = jnp.asarray((rng.random((n_hi + 8, chunk)) > 0.99)
                         .astype(np.int8))
        cb = jnp.asarray((rng.random((chunk, LO)) > 0.99).astype(np.int8))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n_hi, LO), jnp.int32),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 3, n_chunks, chunk), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_chunks, chunk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_hi, LO), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_chunks, chunk), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(pts_t, m, ca, cb)
        return out.reshape(b, n_hi * LO)

    return run


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 30, (BATCH, N_POINTS, 3))
                      .astype(np.float32))
    mask = jnp.ones((BATCH, N_POINTS), bool)

    # exactness gate for the "full" mirror vs the production kernel
    from scenenet_tpu.ops.pallas_hist import pallas_points_bin_counts
    ref = pallas_points_bin_counts(pts[:2], mask[:2], None, GRID,
                                   channels=1, chunk=4096)[0]
    got = make_variant("full")(pts[:2], mask[:2])
    assert np.array_equal(np.asarray(ref), np.asarray(got)), \
        "full mirror drifted from the production kernel"
    print(json.dumps({"tag": "mirror_exact", "ok": True}), flush=True)

    results = {}
    for mode in ("full", "nobuild", "nodots"):
        fn = make_variant(mode)

        @jax.jit
        def loop(p, m, fn=fn):
            def body(i, acc):
                out = fn(p + i * 1e-7, m)
                return acc + jnp.sum(out[:, ::257])
            return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

        float(loop(pts, mask))  # compile + warm
        t0 = time.perf_counter()
        float(loop(pts, mask))
        dt = (time.perf_counter() - t0) / ITERS
        results[mode] = dt * 1e3
        print(json.dumps({"tag": mode, "ms": round(dt * 1e3, 2)}),
              flush=True)

    build = results["full"] - results["nobuild"]
    dots = results["full"] - results["nodots"]
    other = results["full"] - build - dots
    print(json.dumps({
        "tag": "decomposition",
        "build_ms": round(build, 2),
        "dots_ms": round(dots, 2),
        "binning_loop_other_ms": round(other, 2),
        "build_pct": round(100 * build / results["full"], 1),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
