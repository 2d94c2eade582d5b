"""Histogram one-hot/dot overlap experiment (round-3 roofline lever).

The headline roofline (RESULTS.md) puts the fused occupancy voxelization
at 3.2× its s8-MXU floor and names the in-kernel one-hot build cost as
the plateau: each chunk's (n_hi, chunk) + (chunk, LO) one-hots are built
on the VPU *between* the MXU dots, serializing ~3 µs of vector compares
against ~2.7 µs of matmul per chunk. Variants measured here at the exact
headline shape (64³, channels=1, real TS40K clouds):

- v0_current: production `pallas_points_bin_counts` (baseline)
- v1_pipe: double-buffered scratches — build chunk c+1's one-hots while
  dotting chunk c's, giving the VLIW scheduler independent VPU/MXU work
  in every loop body
- v2_chunk8k: baseline at chunk=8192 (the 2-channel sweep said ±2%;
  confirm for channels=1)
- v3_pipe2k: pipelined at chunk=2048 (finer-grained overlap)

One JSON line per measurement. Accept/reject recorded in RESULTS.md.
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
MAX_POINTS = 81920
GRID = (64, 64, 64)
ITERS = 16


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _pipe_kernel(pts_ref, m_ref, o_ref, flat_ref, a_scr, b_scr, *,
                 grid_shape, n_hi, chunk):
    """channels=1 fused points→hist with double-buffered one-hot builds."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    LO = 512
    n_x, n_y, n_z = grid_shape
    acc_dtype = o_ref.dtype
    o_ref[0] = jnp.zeros_like(o_ref[0])
    lo_shift = 9

    m = m_ref[0] != 0
    rows = lax.broadcasted_iota(jnp.int32, m_ref[0].shape, 0) + 1
    n_live = jnp.max(m_ref[0] * rows)
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

    ix = bin_axis(0, n_x)
    iy = bin_axis(1, n_y)
    iz = bin_axis(2, n_z)
    flat_ref[...] = jnp.where(m, (iz * n_x + ix) * n_y + iy, invalid)

    def build(c, slot):
        ids = flat_ref[pl.ds(c, 1)]
        hi_c = ids >> lo_shift
        lo_c = ids & (LO - 1)
        a_scr[slot] = (hi_c == lax.broadcasted_iota(
            jnp.int32, (n_hi, chunk), 0)).astype(jnp.int8)
        b_scr[slot] = (lo_c[0][:, None] == lax.broadcasted_iota(
            jnp.int32, (chunk, LO), 1)).astype(jnp.int8)

    build(0, 0)

    def body(c, _):
        p = lax.rem(c, 2)
        # next chunk's one-hots (clamped re-build of the last chunk when
        # c+1 == n_live — harmless, its dot never runs) are independent
        # of this chunk's dot: VPU and MXU work the scheduler can overlap
        build(jnp.minimum(c + 1, n_live - 1), 1 - p)
        dims = (((1,), (0,)), ((), ()))

        def dot(slot):
            o_ref[0] += lax.dot_general(a_scr[slot], b_scr[slot], dims,
                                        preferred_element_type=acc_dtype)

        lax.cond(p == 0, lambda: dot(0), lambda: dot(1))
        return 0

    lax.fori_loop(0, n_live, body, 0)


def make_pipe(chunk):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LO = 512

    @functools.partial(jax.jit, static_argnames=())
    def run(points, mask):
        b, n, _ = points.shape
        n_x, n_y, n_z = GRID
        size = n_x * n_y * n_z
        n_hi = -(-size // LO)
        if n % chunk:
            pad = chunk - n % chunk
            points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
            n += pad
        n_chunks = n // chunk
        pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2).reshape(
            b, 3, n_chunks, chunk)
        m = mask.astype(jnp.int32).reshape(b, n_chunks, chunk)
        pts_spec = pl.BlockSpec((1, 3, n_chunks, chunk),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        id_spec = pl.BlockSpec((1, n_chunks, chunk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_pipe_kernel, grid_shape=GRID, n_hi=n_hi,
                              chunk=chunk),
            out_shape=jax.ShapeDtypeStruct((b, n_hi, LO), jnp.int32),
            grid=(b,),
            in_specs=[pts_spec, id_spec],
            out_specs=pl.BlockSpec((1, n_hi, LO), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_chunks, chunk), jnp.int32),
                pltpu.VMEM((2, n_hi, chunk), jnp.int8),
                pltpu.VMEM((2, chunk, LO), jnp.int8),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(pts_t, m)
        return out.reshape(b, n_hi * LO)[:, :size]

    return run


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.ops.pallas_hist import pallas_points_bin_counts

    files = sorted(os.listdir("/root/reference/data-sample"))
    clouds = [np.load(os.path.join("/root/reference/data-sample", f))
              for f in files if f.endswith(".npy")]
    pts = np.zeros((BATCH, MAX_POINTS, 3), np.float32)
    mask = np.zeros((BATCH, MAX_POINTS), bool)
    for b in range(BATCH):
        xyz = clouds[b % len(clouds)][:, :3]
        n = min(len(xyz), MAX_POINTS)
        pts[b, :n] = (xyz[:n] - xyz[:n].min(0)).astype(np.float32)
        mask[b, :n] = True

    ptsd = jax.device_put(jnp.asarray(pts))
    md = jax.device_put(jnp.asarray(mask))

    def timed(tag, fn):
        @jax.jit
        def loop(p, m):
            def body(i, acc):
                out = fn(p + i * 1e-7, m)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        float(loop(ptsd, md))
        t0 = time.perf_counter()
        total = float(loop(ptsd, md))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(total)
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3),
                          "total": float(total)}), flush=True)
        return dt

    base = lambda p, m: pallas_points_bin_counts(p, m, None, GRID,
                                                 channels=1)[0]
    # correctness first: pipelined == production on the real chip
    ref = np.asarray(base(ptsd, md))
    for tag, chunk in [("v1_pipe", 4096), ("v3_pipe2k", 2048)]:
        got = np.asarray(make_pipe(chunk)(ptsd, md))
        ok = bool((got == ref).all())
        print(json.dumps({"tag": f"{tag}_exact", "ok": ok}), flush=True)
        if not ok:
            print(json.dumps({"tag": f"{tag}_maxdiff",
                              "v": float(np.abs(got - ref).max())}),
                  flush=True)

    timed("v0_current", base)
    timed("v2_chunk8k", lambda p, m: pallas_points_bin_counts(
        p, m, None, GRID, channels=1, chunk=8192)[0])
    timed("v1_pipe", make_pipe(4096))
    timed("v3_pipe2k", make_pipe(2048))


if __name__ == "__main__":
    sys.exit(main())
