"""BASELINE.json config 2: end-to-end TS40K inference to POINT-level labels,
batched over the reference data-sample fixtures.

raw points → on-device voxelization (MXU) → SceneNet conv (Pallas) →
τ-threshold → voxel→point gather → per-point tower labels, one jit.
Reports point-level confusion vs the ground-truth classes as well.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os
import time

import numpy as np

FIXTURES = "/root/reference/data-sample"


def main(grid=(64, 64, 64), max_points=81920, tau=0.65, iters=8,
         inference=True):
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.ops.voxelize import (
        gather_point_values, grid_bounds, voxel_indices, _flat_zxy_idx,
        voxelize_batch_occupancy,
    )

    files = sorted(f for f in os.listdir(FIXTURES) if f.endswith(".npy"))
    clouds = [np.load(os.path.join(FIXTURES, f)) for f in files]
    b = len(clouds)
    pts = np.zeros((b, max_points, 3), np.float32)
    mask = np.zeros((b, max_points), bool)
    gt = np.zeros((b, max_points), np.float32)
    for i, c in enumerate(clouds):
        n = min(len(c), max_points)
        pts[i, :n] = (c[:n, :3] - c[:n, :3].min(0)).astype(np.float32)
        mask[i, :n] = True
        gt[i, :n] = (c[:n, 3] == 15)

    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0, backend="pallas")

    @jax.jit
    def pipeline(params, pts, mask):
        # occupancy == (hist > 0) exactly, minus the normalization the
        # threshold would discard anyway
        x = voxelize_batch_occupancy(pts, mask, grid).astype(jnp.float32)[:, None]
        pred = net.apply(params, x, inference=inference)[:, 0]

        def per_sample_flat(p, m):
            lo, hi = grid_bounds(p, m)
            return _flat_zxy_idx(voxel_indices(p, lo, hi, grid), grid)

        flat = jax.vmap(per_sample_flat)(pts, mask)
        point_probs = gather_point_values(pred, flat, mask)
        return (point_probs >= tau).astype(jnp.float32)

    pts_d, mask_d = jnp.asarray(pts), jnp.asarray(mask)
    labels = np.asarray(pipeline(params, pts_d, mask_d))

    @jax.jit
    def loop(params, pts, mask):
        def body(i, acc):
            return acc + jnp.sum(pipeline(params, pts + i * 1e-7, mask))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(loop(params, pts_d, mask_d))
    t0 = time.perf_counter()
    float(loop(params, pts_d, mask_d))
    dt = time.perf_counter() - t0
    n_pts = int(mask.sum())
    print(f"point-level inference [{inference}]: {b * iters / dt:.0f} clouds/s "
          f"({n_pts * iters / dt / 1e6:.1f} M points/s)")

    tp = float(((labels == 1) & (gt == 1) & mask).sum())
    fp = float(((labels == 1) & (gt == 0) & mask).sum())
    fn = float(((labels == 0) & (gt == 1) & mask).sum())
    print(f"untrained-model point confusion on fixtures: "
          f"TP={tp:.0f} FP={fp:.0f} FN={fn:.0f} "
          f"(labels are meaningful only after training)")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--inference", default="bf16", choices=["bf16", "mxu"],
                    help="conv forward: bf16 tap-scratch VPU stencil, or "
                         "the banded-y MXU stencil")
    args = ap.parse_args()
    main(inference=True if args.inference == "bf16" else "mxu")
