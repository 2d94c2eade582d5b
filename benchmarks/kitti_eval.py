"""BASELINE.json config 4: SemanticKITTI segmentation eval — multi-scene
batched voxelization + SceneNet forward + on-device metrics.

Generates synthetic KITTI-format sequences (velodyne .bin + packed .label
files with dense pole clusters, same construction as
tests/test_semantic_kitti.py), runs the pole ETL → crops dataset →
batched device pipeline, and reports scenes/s and crops/s on the chip.

Usage: python benchmarks/kitti_eval.py [--scenes 40 --points 120000
       --batch 16 --root /tmp/kitti_bench]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np


def generate(root: str, n_scenes: int, points: int) -> None:
    from scenenet_tpu.data.semantic_kitti import POLE_LABEL

    rng = np.random.default_rng(0)
    vel = os.path.join(root, "sequences", "00", "velodyne")
    lab = os.path.join(root, "sequences", "00", "labels")
    if os.path.isdir(vel) and len(os.listdir(vel)) >= n_scenes:
        print(f"[gen] reusing {len(os.listdir(vel))} scans in {vel}")
        return
    os.makedirs(vel, exist_ok=True)
    os.makedirs(lab, exist_ok=True)
    for i in range(n_scenes):
        n = int(rng.integers(int(points * 0.8), int(points * 1.2)))
        xyz = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
        xyz[:, 2] = rng.uniform(-2, 4, n)
        labels = rng.choice([40, 70, 80], size=n, p=[0.6, 0.3, 0.1]).astype(np.uint32)
        # a few dense pole clusters per scene
        for _ in range(3):
            cx, cy = rng.uniform(-30, 30, 2)
            pole = np.column_stack([
                rng.normal(cx, 0.2, 120), rng.normal(cy, 0.2, 120),
                rng.uniform(0, 7, 120),
            ]).astype(np.float32)
            xyz = np.concatenate([xyz, pole])
            labels = np.concatenate([labels, np.full(120, POLE_LABEL, np.uint32)])
        packed = labels | (np.uint32(3) << 16)  # instance bits, masked by reader
        scan = np.concatenate([xyz, np.zeros((len(xyz), 1), np.float32)], 1)
        scan.astype(np.float32).tofile(os.path.join(vel, f"{i:06d}.bin"))
        packed.tofile(os.path.join(lab, f"{i:06d}.label"))
    print(f"[gen] wrote {n_scenes} scans")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=40)
    ap.add_argument("--points", type=int, default=120000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-points", type=int, default=32768)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--vxg", type=str, default=None,
                    help="full (x,y,z) grid, e.g. '64,64,256' — the "
                         "reference's KITTI voxel config "
                         "(semKITTI.py:453: vxg (64,64,256))")
    ap.add_argument("--root", default="/tmp/kitti_bench")
    ap.add_argument("--inference", default="bf16", choices=["bf16", "mxu"],
                    help="conv forward: bf16 tap-scratch VPU stencil, or "
                         "the banded-y MXU stencil")
    args = ap.parse_args()
    inference = True if args.inference == "bf16" else "mxu"

    generate(args.root, args.scenes, args.points)

    from scenenet_tpu.data.loader import PointCloudLoader
    from scenenet_tpu.data.semantic_kitti import (
        POLE_LABEL, SemanticKITTICrops, build_pole_radius_samples,
    )
    from scenenet_tpu.data.transforms import PointPadding

    grid = (tuple(int(v) for v in args.vxg.split(","))
            if args.vxg else (args.grid,) * 3)
    crops_dir = os.path.join(args.root, "crops")
    t0 = time.perf_counter()
    n_crops = build_pole_radius_samples(args.root, crops_dir)
    print(f"[etl] {n_crops} pole-radius crops from {args.scenes} scenes "
          f"in {time.perf_counter() - t0:.1f}s (host DBSCAN + cropping)")

    ds = SemanticKITTICrops(
        crops_dir, split="samples",
        transform=PointPadding(max_points=args.max_points,
                               vxg_size=grid,
                               compute_indices=False))

    import jax
    import jax.numpy as jnp

    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.ops.voxelize import voxelize_batch
    from scenenet_tpu.train.metrics import compute_metrics, init_metric_state, update_metrics

    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                  backend="pallas")

    @jax.jit
    def eval_batch(params, mstate, pts, labels, mask):
        hist, reg = voxelize_batch(pts, labels, mask, (POLE_LABEL,), grid)
        x = (hist > 0).astype(jnp.float32)[:, None]
        y = (reg > 0).astype(jnp.float32)[:, None]
        pred = net.apply(params, x, inference=inference)
        return update_metrics(mstate, pred, y, 0.65)

    loader = PointCloudLoader(ds, batch_size=args.batch, num_workers=4,
                              drop_last=True)
    first = next(iter(loader))
    pts, labels, mask = (jnp.asarray(b) for b in first[:3])
    mstate = init_metric_state()
    m = {k: float(v) for k, v in
         compute_metrics(eval_batch(params, mstate, pts, labels, mask), 0.5).items()}

    # honest on-device timing (the tunnel's dispatch/sync otherwise
    # dominates a 2-batch dataset): ITERS eval passes in one fori_loop
    ITERS = 20

    @jax.jit
    def loop(params, pts, labels, mask):
        def body(i, ms):
            return eval_batch(params, ms, pts + i * 1e-6, labels, mask)
        return jax.lax.fori_loop(0, ITERS, body, init_metric_state())

    jax.block_until_ready(loop(params, pts, labels, mask))
    t0 = time.perf_counter()
    jax.block_until_ready(jax.tree.leaves(loop(params, pts, labels, mask))[0]
                          .block_until_ready())
    # force a scalar fetch (block_until_ready can return early on tunnels)
    _ = float(jax.tree.leaves(loop(params, pts, labels, mask))[0])
    dt = (time.perf_counter() - t0) / 2
    per_batch = dt / ITERS
    rate = args.batch / per_batch
    print(f"[eval {args.inference}] {per_batch*1e3:.1f} ms / {args.batch}-crop batch = "
          f"{rate:.0f} crops/s on-device; untrained-model JaccardIndex "
          f"{m['JaccardIndex']:.3f} on {len(ds)} ETL crops")


if __name__ == "__main__":
    main()
