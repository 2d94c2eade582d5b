"""256³ end-to-end single-chip inference demo.

The reference tops out at 64³ (its recorded runs; 128³ OOMs its GPU —
SURVEY §6). Round 2 dropped a 256³ attempt because the XLA conv3d
compile through the tunnel never completed (>10 min). This demo runs the
full pipeline at 256³ on ONE v5e chip with the round-3 pieces:

- voxelization: `_tpu_occupancy_counts` routes 256³ (n_hi=32768, where
  the flat kernel's VMEM accumulator block alone would be 64 MB) through
  the hierarchical sorted histogram with auto slab count (128 slabs of
  256 hi-rows);
- conv: the HBM-streamed Pallas stencil (z-slab DMA windows), which
  never shows XLA's conv lowering the 256³ shape.

Input: the TS40K reference fixtures tiled 6×6 in x/y (~2.1 M points, one
cloud) → (256,256,256) occupancy → SceneNet forward → τ=0.65 mask.
Prints one JSON line per measurement (honest fori_loop timing).
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

GRID = (256, 256, 256)
ITERS = 4
TILE = 6
MAX_POINTS = 2_200_000


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_cloud():
    files = sorted(os.listdir("/root/reference/data-sample"))
    clouds = [np.load(os.path.join("/root/reference/data-sample", f))
              for f in files if f.endswith(".npy")]
    parts = []
    i = 0
    for tx in range(TILE):
        for ty in range(TILE):
            xyz = clouds[i % len(clouds)][:, :3].astype(np.float32)
            xyz = xyz - xyz.min(0)
            ext = xyz.max(0)
            xyz[:, 0] += tx * ext[0] * 1.05
            xyz[:, 1] += ty * ext[1] * 1.05
            parts.append(xyz)
            i += 1
    cloud = np.concatenate(parts)[:MAX_POINTS]
    return cloud


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.ops.voxelize import (prob_to_label,
                                           voxelize_batch_occupancy)

    cloud = build_cloud()
    n = len(cloud)
    pad = -n % 2048
    pts = np.zeros((1, n + pad, 3), np.float32)
    pts[0, :n] = cloud
    mask = np.zeros((1, n + pad), bool)
    mask[0, :n] = True
    print(json.dumps({"tag": "input", "points": n,
                      "grid": list(GRID)}), flush=True)

    net, params = SceneNet.create({"cy": 1, "cone": 1, "neg": 1},
                                  kernel_size=(9, 5, 5), seed=0,
                                  backend="pallas")
    ptsd = jax.device_put(jnp.asarray(pts))
    md = jax.device_put(jnp.asarray(mask))

    def timed(tag, fn, *args, scale=1):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                out = fn(i, *a)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        t0 = time.perf_counter()
        float(loop(*args))
        print(json.dumps({"tag": f"{tag}_compile_s",
                          "v": round(time.perf_counter() - t0, 1)}),
              flush=True)
        t0 = time.perf_counter()
        total = float(loop(*args))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(total)
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2),
                          "per_s": round(scale / dt, 1)}), flush=True)
        return dt

    # stage 1: 256³ occupancy voxelization (sorted hierarchical route)
    t_vox = timed("voxelize_256", lambda i, p, m: voxelize_batch_occupancy(
        p + i * 1e-7, m, GRID), ptsd, md, scale=1)

    grids = voxelize_batch_occupancy(ptsd, md, GRID)[:, None]
    occ = int(jnp.sum(grids))
    print(json.dumps({"tag": "occupied_voxels", "v": occ,
                      "fill_pct": round(100 * occ / grids.size, 2)}),
          flush=True)
    grids = jax.device_put(grids)

    # stage 2: SceneNet forward (HBM-streamed Pallas stencil) + τ mask
    t_fwd = timed("forward_256", lambda i, g: prob_to_label(
        net.apply(params, g + i * 0.0, inference=True), 0.65),
        grids, scale=1)

    # end to end
    t_all = timed("pipeline_256", lambda i, p, m: prob_to_label(
        net.apply(params, voxelize_batch_occupancy(
            p + i * 1e-7, m, GRID)[:, None], inference=True), 0.65),
        ptsd, md, scale=1)
    print(json.dumps({"tag": "summary", "vox_ms": round(t_vox * 1e3, 1),
                      "fwd_ms": round(t_fwd * 1e3, 1),
                      "pipeline_ms": round(t_all * 1e3, 1),
                      "points_per_s_m": round(n / t_all / 1e6, 1)}),
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
