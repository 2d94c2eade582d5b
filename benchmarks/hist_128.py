"""128³ histogram: flat one-hot kernel vs hierarchical sorted two-level.

VERDICT r2 #4: the 128³ train step is histogram-MXU-bound — the flat
kernel's one-hot spans all n_hi=4096 rows, so its matmul work is
points × bins. The sorted two-level kernel
(:func:`scenenet_tpu.ops.pallas_hist.pallas_sorted_bin_counts`) sorts ids
and windows each slab's one-hot to n_hi/K rows over only that slab's
chunk run. This script measures both (plus the sort alone) at the
BASELINE config-5 shape and sweeps (n_slabs, chunk). JSON line per
measurement.
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


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.ops.pallas_hist import (
        pallas_points_bin_counts, pallas_sorted_bin_counts,
    )
    from scenenet_tpu.ops.voxelize import (
        _flat_zxy_idx, grid_bounds, voxel_indices,
    )

    B, N, G = args.batch, args.points, args.grid
    gs = (G, G, G)
    size = G ** 3
    rng = np.random.default_rng(0)
    # terrain-like z-skew: most points near the ground plane (the
    # realistic worst case for z-slab balance)
    pts = np.empty((B, N, 3), np.float32)
    pts[..., 0] = rng.uniform(0, 30, (B, N))
    pts[..., 1] = rng.uniform(0, 30, (B, N))
    pts[..., 2] = rng.gamma(2.0, 2.0, (B, N)).clip(0, 30)
    mask = np.ones((B, N), bool)
    tower = rng.random((B, N)) < 0.05
    ptsd = jax.device_put(jnp.asarray(pts))
    md = jax.device_put(jnp.asarray(mask))
    td = jax.device_put(jnp.asarray(tower))

    def flat_ids(p, m):
        def per(p1, m1):
            lo, hi = grid_bounds(p1, m1)
            return _flat_zxy_idx(voxel_indices(p1, lo, hi, gs), gs)
        return jax.vmap(per)(p, m)

    def timed(tag, fn):
        @jax.jit
        def loop(p, m, t):
            def body(i, acc):
                out = fn(p + i * 1e-7, m, t)
                return acc + jnp.sum(out[0])
            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        float(loop(ptsd, md, td))
        t0 = time.perf_counter()
        total = float(loop(ptsd, md, td))
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(total)
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3)}), flush=True)
        return dt

    timed("ids_only", lambda p, m, t: (flat_ids(p, m),))
    # pre-r3-packing prefix: ids + payload pair sort (kept for the A/B)
    timed("ids_sort_pair", lambda p, m, t: jax.lax.sort(
        (flat_ids(p, m), t.astype(jnp.int32)), dimension=1, num_keys=1))
    # the shipped prefix: indicator packed into the key's low bit —
    # single-array sort (pallas_sorted_bin_counts does exactly this)
    timed("ids_sort_packed", lambda p, m, t: jax.lax.sort(
        (flat_ids(p, m) << 1) | t.astype(jnp.int32), dimension=1))
    timed("flat_mxu", lambda p, m, t: pallas_points_bin_counts(
        p, m, jnp.logical_and(t, m), gs))
    combos = [(16, 4096)] if not args.sweep else [
        (8, 4096), (16, 2048), (16, 4096), (16, 8192), (32, 4096), (32, 2048)]
    for n_slabs, chunk in combos:
        timed(f"sorted_k{n_slabs}_c{chunk}",
              lambda p, m, t, k=n_slabs, c=chunk: pallas_sorted_bin_counts(
                  flat_ids(p, m), m, jnp.logical_and(t, m).astype(jnp.int32),
                  size, n_slabs=k, chunk=c))


if __name__ == "__main__":
    sys.exit(main())
