"""Per-stage split + roofline for the headline bench (VERDICT r2 #8).

Reproduces bench.py's batch-512 pipeline (padded raw points → fused
occupancy voxelization → SceneNet pallas forward (bf16 taps) → τ mask)
and times each stage in isolation with the honest fori_loop recipe, then
prints the nominal resource floor per stage:

- voxelization: the one-hot MXU histogram costs n_hi·LO = 262,144 int8
  MACs per (live-chunked) point — floor = MACs / 394 TOPS (v5e int8);
- conv stencil: HBM-bound — ~1.5× input reads (overlapping z-slab
  windows) + 1× output write at ~819 GB/s (v5e);
- threshold: fused into the conv epilogue (free).

One JSON line per measurement; the summary line carries the achieved
fractions. Feeds RESULTS.md "Headline roofline".
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

BATCH = 512
MAX_POINTS = 81920
GRID = (64, 64, 64)
ITERS = 8
S8_TOPS = 394e12        # v5e MXU int8
HBM_BPS = 819e9         # v5e HBM bandwidth


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.ops import prob_to_label
    from scenenet_tpu.ops.voxelize import voxelize_batch_occupancy

    files = sorted(os.listdir("/root/reference/data-sample"))
    clouds = [np.load(os.path.join("/root/reference/data-sample", f))
              for f in files if f.endswith(".npy")]
    pts = np.zeros((BATCH, MAX_POINTS, 3), np.float32)
    mask = np.zeros((BATCH, MAX_POINTS), bool)
    n_live_pts = 0
    for b in range(BATCH):
        xyz = clouds[b % len(clouds)][:, :3]
        n = min(len(xyz), MAX_POINTS)
        pts[b, :n] = (xyz[:n] - xyz[:n].min(0)).astype(np.float32)
        mask[b, :n] = True
        n_live_pts += n

    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                  backend="pallas")
    ptsd = jax.device_put(jnp.asarray(pts))
    md = jax.device_put(jnp.asarray(mask))
    grids0 = voxelize_batch_occupancy(ptsd, md, GRID)[:, None]
    grids0 = jax.device_put(jnp.asarray(np.asarray(grids0)))

    def timed(tag, fn, *args):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                out = fn(i, *a)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        float(loop(*args))
        t0 = time.perf_counter()
        total = float(loop(*args))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(total)
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2),
                          "grids_per_s": round(BATCH / dt)}), flush=True)
        return dt

    t_vox = timed("voxelize_occupancy",
                  lambda i, p, m: voxelize_batch_occupancy(p + i * 1e-7, m, GRID),
                  ptsd, md)
    t_fwd = timed("conv_forward_mask",
                  lambda i, g: prob_to_label(
                      net.apply(params, g + i * 0.0, inference=True), 0.65),
                  grids0)
    # the current headline conv (round 3+): banded-y MXU stencil, split
    # hi+lo residual pair ("mxu") and the single-bf16 mask-only contract
    # ("mxu_fast")
    t_mxu = timed("conv_forward_mask_mxu",
                  lambda i, g: prob_to_label(
                      net.apply(params, g + i * 0.0, inference="mxu"), 0.65),
                  grids0)
    t_mxu_fast = timed("conv_forward_mask_mxu_fast",
                       lambda i, g: prob_to_label(
                           net.apply(params, g + i * 0.0,
                                     inference="mxu_fast"), 0.65),
                       grids0)
    t_all = timed("full_pipeline_mxu",
                  lambda i, p, m: prob_to_label(
                      net.apply(params,
                                voxelize_batch_occupancy(p + i * 1e-7, m, GRID)[:, None],
                                inference="mxu"), 0.65),
                  ptsd, md)

    # nominal floors
    chunk = 4096
    # live-chunk skip: chunks up to the last live one per sample
    live_chunks = sum(int(np.ceil(mask[b].sum() / chunk)) for b in range(BATCH))
    size = GRID[0] * GRID[1] * GRID[2]
    macs = live_chunks * chunk * size  # one channel (occupancy)
    # TOPS counts mul+add as 2 ops → nominal MAC rate is S8_TOPS/2
    # (the r3 write-up's corrected unit; dividing MACs by the TOPS figure
    # halves the floor)
    vox_floor = macs / (S8_TOPS / 2)
    vol_bytes = BATCH * size * 4
    conv_floor = (1.5 * vol_bytes + vol_bytes) / HBM_BPS
    # banded-y MXU conv ISSUED MACs (kp=128-padded K, N=yy): per sample,
    # k_x · k_z dots of (z·xx, 128) @ (128, yy) per split level
    k_z, k_x, k_y = 9, 5, 5
    z = xx = yy = GRID[0]
    kp = 128
    mxu_macs_level = BATCH * k_x * k_z * (z * xx) * kp * yy
    bf16_macs_s = S8_TOPS / 2 / 2  # 197 TF/s bf16 = 98.5 T MACs/s
    mxu_floor_split = 2 * mxu_macs_level / bf16_macs_s  # hi + lo dots
    mxu_floor_single = mxu_macs_level / bf16_macs_s
    print(json.dumps({
        "tag": "roofline",
        "vox_floor_ms": round(vox_floor * 1e3, 2),
        "vox_achieved_x_floor": round(t_vox / vox_floor, 2),
        "conv_floor_ms": round(conv_floor * 1e3, 2),
        "conv_achieved_x_floor": round(t_fwd / conv_floor, 2),
        "mxu_issued_floor_ms": round(mxu_floor_split * 1e3, 2),
        "mxu_achieved_x_issued_floor": round(t_mxu / mxu_floor_split, 2),
        "mxu_fast_issued_floor_ms": round(mxu_floor_single * 1e3, 2),
        "mxu_fast_achieved_x_issued_floor": round(
            t_mxu_fast / mxu_floor_single, 2),
        "stage_sum_ms": round((t_vox + t_mxu) * 1e3, 2),
        "pipeline_ms": round(t_all * 1e3, 2),
        "live_points_m": round(n_live_pts / 1e6, 2),
        "hist_macs_t": round(macs / 1e12, 2),
        "mxu_issued_macs_t": round(2 * mxu_macs_level / 1e12, 2),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
