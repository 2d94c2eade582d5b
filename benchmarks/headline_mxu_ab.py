"""A/B the headline pipeline's conv backend: bf16-tap stencil vs banded-y
MXU stencil (round 3).

Same batch-512 pipeline as bench.py (padded raw points → fused occupancy
voxelization → SceneNet forward → τ=0.65 mask) with the forward routed
through (a) `inference=True` (bf16-tap-scratch VPU stencil — the r2
production path), (b) `inference="mxu"` split-bf16 (near-f32 — genuinely,
post the residual-zeroing fix), and (c) `inference="mxu_fast"`
(single-bf16 band: fastest; ~4e-3 probability delta, still tighter than
the XLA conv lowering's own 9.5e-3 rounding).

Before timing, the τ-masks of (b)/(c) are checked against (a) over the
full 512×64³ batch (the headline's output contract is the mask, not the
probabilities). One JSON line per measurement.
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
    for b in range(BATCH):
        xyz = clouds[b % len(clouds)][:, :3]
        n = min(len(xyz), MAX_POINTS)
        pts[b, :n] = (xyz[:n] - xyz[:n].min(0)).astype(np.float32)
        mask[b, :n] = True

    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                  backend="pallas")
    ptsd = jax.device_put(jnp.asarray(pts))
    md = jax.device_put(jnp.asarray(mask))

    def pipeline(p, m, mode):
        grids = voxelize_batch_occupancy(p, m, GRID)[:, None]
        pred = net.apply(params, grids, inference=mode)
        return prob_to_label(pred, 0.65)

    # exactness: τ-mask parity vs the bf16-tap production path
    def masks(mode):
        return jax.jit(lambda p, m: pipeline(p, m, mode))(ptsd, md)

    ref = np.asarray(masks(True))
    for tag, mode in [("mxu_split", "mxu"), ("mxu_single", "mxu_fast")]:
        out = np.asarray(masks(mode))
        flips = int((ref != out).sum())
        print(json.dumps({"tag": f"{tag}_mask_parity", "flips": flips,
                          "total_vox": int(ref.size)}), flush=True)

    def timed(tag, mode):
        @jax.jit
        def loop(p, m):
            def body(i, acc):
                out = pipeline(p + i * 1e-7, m, mode)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        float(loop(ptsd, md))
        t0 = time.perf_counter()
        total = float(loop(ptsd, md))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(total)
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2),
                          "grids_per_s": round(BATCH / dt)}), flush=True)
        return dt

    timed("pipeline_bf16tap", True)
    timed("pipeline_mxu_split", "mxu")
    timed("pipeline_mxu_single", "mxu_fast")


if __name__ == "__main__":
    sys.exit(main())
