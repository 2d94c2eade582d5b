"""64³ occupancy histogram at headline scale: flat kernel vs sorted path.

The round-3 roofline decomposition (RESULTS.md "Headline roofline") left
one named lever on the headline's voxelization stage: algorithmic MAC
reduction — the flat one-hot kernel spends all n_hi=512 hi-rows per
point at 64³, while the hierarchical sorted kernel
(:func:`scenenet_tpu.ops.pallas_hist.pallas_sorted_bin_counts`) windows
each slab to n_hi/K rows. The routing predicate
(`ops/voxelize._use_sorted_hist`) categorically excludes n_hi ≤ 512
based on the KITTI (64,64,256)×32k measurement, but the headline shape
(batch 512 × ~82k points, single-channel occupancy) was never measured.
This script decides it: flat vs (ids, ids+sort, sorted K-sweep) at the
exact bench.py stage shape. JSON line per measurement.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--points", type=int, default=81920)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from scenenet_tpu.ops.pallas_hist import (
        pallas_points_bin_counts, pallas_sorted_bin_counts,
    )
    from scenenet_tpu.ops.voxelize import batch_flat_ids

    B, N, G = args.batch, args.points, args.grid
    gs = (G, G, G)
    size = G ** 3
    rng = np.random.default_rng(0)
    # headline-like clouds: xy uniform, z gamma-skewed, ~83% live points
    pts = np.empty((B, N, 3), np.float32)
    pts[..., 0] = rng.uniform(0, 30, (B, N))
    pts[..., 1] = rng.uniform(0, 30, (B, N))
    pts[..., 2] = rng.gamma(2.0, 2.0, (B, N)).clip(0, 30)
    n_live = rng.integers(int(0.6 * N), N, B)
    mask = np.arange(N)[None, :] < n_live[:, None]
    ptsd = jax.device_put(jnp.asarray(pts))
    md = jax.device_put(jnp.asarray(mask))

    def timed(tag, fn):
        @jax.jit
        def loop(p, m):
            def body(i, acc):
                out = fn(p + i * 1e-7, m)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        float(loop(ptsd, md))
        t0 = time.perf_counter()
        total = float(loop(ptsd, md))
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(total)
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3)}), flush=True)
        return dt

    # correctness gate at the full shape before timing anything
    ref = np.asarray(pallas_points_bin_counts(
        ptsd[:2], md[:2], None, gs, channels=1)[0])
    got = np.asarray(pallas_sorted_bin_counts(
        batch_flat_ids(ptsd[:2], md[:2], gs), md[:2], None, size,
        channels=1)[0])
    assert (ref == got).all(), "sorted != flat at 64^3"

    timed("flat_fused", lambda p, m: pallas_points_bin_counts(
        p, m, None, gs, channels=1)[0])
    timed("ids_only", lambda p, m: batch_flat_ids(p, m, gs))
    timed("ids_sort", lambda p, m: jax.lax.sort(
        jnp.where(m, batch_flat_ids(p, m, gs), size), dimension=1))
    for n_slabs in (4, 8, 16):
        for chunk in (2048, 4096):
            timed(f"sorted_k{n_slabs}_c{chunk}",
                  lambda p, m, k=n_slabs, c=chunk: pallas_sorted_bin_counts(
                      batch_flat_ids(p, m, gs), m, None, size,
                      n_slabs=k, chunk=c, channels=1)[0])


if __name__ == "__main__":
    sys.exit(main())
