"""Headline benchmark: 64³ voxel grids/sec/chip, end-to-end TS40K inference.

Pipeline under test (one jitted program, batched): padded raw point clouds →
fused on-device voxelization (density grid) → binarize → SceneNet forward
(3 GENEO observers, kernel (9,5,5)) → τ=0.65 thresholded mask.

``vs_baseline`` is the measured speedup over the reference-style CPU path:
pandas-groupby voxelization (as in reference ``utils/voxelization.py:164``)
plus a float64 torch ``conv3d`` forward with on-the-fly kernel synthesis
(as in reference ``core/models/SCENE_Net.py:322-339``), single process.

Prints ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

GRID = (64, 64, 64)
BATCH = 512
ITERS = 8
MAX_POINTS = 81920
FIXTURES = "/root/reference/data-sample"


def _load_clouds():
    if os.path.isdir(FIXTURES):
        files = sorted(f for f in os.listdir(FIXTURES) if f.endswith(".npy"))
        clouds = [np.load(os.path.join(FIXTURES, f)) for f in files]
        if clouds:
            return clouds
    rng = np.random.default_rng(0)
    out = []
    for _ in range(8):
        n = int(rng.integers(40_000, 70_000))
        xyz = rng.uniform(0, 30, (n, 3))
        labels = rng.choice([1, 2, 15], size=n, p=[0.6, 0.3, 0.1])
        out.append(np.concatenate([xyz, labels[:, None]], axis=1))
    return out


def _cpu_reference_throughput(clouds, n_samples=3) -> float:
    """Reference-style CPU pipeline: pandas groupby voxelize + torch conv."""
    import pandas as pd
    import torch
    import torch.nn.functional as F

    from scenenet_tpu.ops.voxel_np import compute_grid_spec, voxel_indices_np

    def torch_forward(x):
        # kernel synthesis from scalars (double) + conv3d, as the reference
        # does every forward (SCENE_Net.py:324-325)
        ks = (9, 5, 5)
        d2 = ((torch.arange(5, dtype=torch.float64) - 2)[:, None] ** 2
              + (torch.arange(5, dtype=torch.float64)[None, :] - 2) ** 2)
        planes = []
        for g in range(3):
            r = 1.0 + g
            p = torch.exp(d2**2 * (-1 / (2 * (r + 1e-8) ** 2)))
            p = p - p.sum() / 25
            planes.append(p[None].repeat(9, 1, 1))
        kernels = torch.stack(planes)[:, None]
        conv = F.conv3d(x, kernels, padding="same")
        return torch.relu(torch.tanh(conv.sum(1, keepdim=True)))

    def one_pass(cloud):
        xyz = cloud[:, :3]
        spec = compute_grid_spec(xyz, GRID)
        idx = voxel_indices_np(xyz, spec)
        # pandas groupby count, like reference hist_on_voxel
        df = pd.DataFrame({"z": idx[:, 2], "x": idx[:, 0], "y": idx[:, 1],
                           "points": np.ones(len(idx))})
        groups = df.groupby(["z", "x", "y"]).count()
        data = np.zeros((GRID[2], GRID[0], GRID[1]))
        data[tuple(np.array(groups.index.tolist()).T)] = groups["points"].to_numpy()
        x = torch.from_numpy((data > 0).astype(np.float64))[None, None]
        torch_forward(x)

    # best-of-3 (fastest CPU pass → most conservative speedup ratio); also
    # floor at the best idle-machine measurement we have recorded (3.2
    # grids/s) so a loaded host can never inflate the ratio
    best = 0.0
    for _ in range(3):
        start = time.perf_counter()
        for cloud in clouds[:n_samples]:
            one_pass(cloud)
        best = max(best, n_samples / (time.perf_counter() - start))
    return max(best, 3.2)


def _tpu_throughput(clouds) -> float:
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.ops.voxelize import voxelize_batch_occupancy

    net, params = SceneNet.create({"cy": 1, "cone": 1, "neg": 1},
                                  kernel_size=(9, 5, 5), seed=0,
                                  backend="pallas")

    # build a padded (B, N, 3) batch by cycling the fixtures
    pts = np.zeros((BATCH, MAX_POINTS, 3), np.float32)
    mask = np.zeros((BATCH, MAX_POINTS), bool)
    for b in range(BATCH):
        cloud = clouds[b % len(clouds)]
        xyz = cloud[:, :3]
        n = min(len(xyz), MAX_POINTS)
        pts[b, :n] = (xyz[:n] - xyz[:n].min(0)).astype(np.float32)
        mask[b, :n] = True

    def pipeline(params, pts, mask):
        # fused Pallas points→occupancy kernel (bounds + binning + int8
        # MXU histogram in VMEM; exactly (voxelize_batch_hist > 0))
        grids = voxelize_batch_occupancy(pts, mask, GRID)[:, None]
        # inference="mxu": banded-y MXU stencil with the round-5 hi|lo
        # lane-packed split (one N=128 dot per tap; 0 τ-mask flips vs
        # the f32 stencil over 134M voxels — headline_mxu_ab.py).
        # tau=0.65 fuses prob_to_label into the kernel epilogue (the
        # mask IS the headline contract), saving a full-volume HBM pass;
        # exactness re-checked in tests/test_pallas_conv.py.
        return net.apply(params, grids, inference="mxu", tau=0.65)

    # Honest timing through the remote-execution tunnel (where
    # block_until_ready can return before execution): run ITERS pipeline
    # passes inside one on-device fori_loop — each iteration's input is
    # perturbed by the loop counter so XLA cannot hoist/CSE the body —
    # and fetch a single scalar, which forces completion.
    @jax.jit
    def bench_loop(params, pts, mask):
        def body(i, acc):
            out = pipeline(params, pts + i * 1e-7, mask)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    pts_d = jax.device_put(jnp.asarray(pts))
    mask_d = jax.device_put(jnp.asarray(mask))
    float(bench_loop(params, pts_d, mask_d))  # compile + warm up

    start = time.perf_counter()
    total = float(bench_loop(params, pts_d, mask_d))
    elapsed = time.perf_counter() - start
    assert np.isfinite(total)
    return BATCH * ITERS / elapsed


def _enable_compile_cache():
    """Persistent XLA compile cache — first-run compiles over the remote
    tunnel take minutes; repeats should be instant."""
    try:
        import jax

        cache_dir = os.path.expanduser("~/.cache/jax_compilation")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:
        print(f"[bench] compile cache disabled: {exc}", file=sys.stderr)


def main():
    _enable_compile_cache()
    clouds = _load_clouds()
    cpu = _cpu_reference_throughput(clouds)
    print(f"[bench] CPU reference: {cpu:.2f} grids/s", file=sys.stderr)
    tpu = _tpu_throughput(clouds)
    print(f"[bench] TPU pipeline: {tpu:.2f} grids/s", file=sys.stderr)
    print(json.dumps({
        "metric": "64^3 voxel grids/sec/chip (TS40K inference)",
        "value": round(tpu, 2),
        "unit": "grids/s",
        "vs_baseline": round(tpu / cpu, 2),
    }))


if __name__ == "__main__":
    main()
