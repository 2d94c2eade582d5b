"""128³ cached-epoch receipt on the real chip (VERDICT r3 #8 / r4 #6).

Replaces the 12.9 ms-step extrapolation with a measurement: build a
240-crop uint8 DeviceGridCache at 128³ (on-device voxelization paid
once), run `fit_grid_cached` epochs (batch 4, D4 augmentation — the
production cached path), and report sustained samples/s per epoch, the
HBM budget, and the `device_cache: auto` decision log for this shape.

Usage: python benchmarks/epoch_128.py [--n 240 --batch 4 --epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_compilation"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from scenenet_tpu.losses import resolve_criterion
    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.train import TrainConfig, Trainer
    from scenenet_tpu.train.loop import make_device_voxelize_prep

    G = (128, 128, 128)
    n, npts = args.n, args.points

    # ---- device_cache: auto decision log for this shape --------------------
    from scenenet_tpu.cli.train import _resolve_device_cache_auto
    from scenenet_tpu.utils.config import ExperimentConfig

    cfg_auto = ExperimentConfig(voxel_grid_size=(128, 128, 128),
                                device_voxelization=True,
                                device_cache="auto", model="scenenet")
    decision = _resolve_device_cache_auto(cfg_auto, n)
    print(json.dumps({"tag": "device_cache_auto", "n_samples": n,
                      "decision": str(decision)}), flush=True)

    # ---- build the uint8 grid cache (voxelization paid once) ---------------
    rng = np.random.default_rng(0)
    prep = make_device_voxelize_prep(G, (15,), use_indices=False)
    xs = np.empty((n, 1, *G[::-1][:1], 128, 128), np.uint8).reshape(
        n, 1, 128, 128, 128)
    ys = np.empty_like(xs)
    t0 = time.perf_counter()
    bs = 8
    for s in range(0, n, bs):
        b = min(bs, n - s)
        pts = rng.uniform(0, 30, (b, npts, 3)).astype(np.float32)
        labels = rng.choice([1, 2, 15], (b, npts), p=[0.5, 0.45, 0.05]
                            ).astype(np.int32)
        mask = np.ones((b, npts), bool)
        x, y = prep(jnp.asarray(pts), jnp.asarray(labels), jnp.asarray(mask))
        xs[s:s + b] = np.asarray(x, np.uint8)
        ys[s:s + b] = np.asarray(y > 0, np.uint8)
    build_s = time.perf_counter() - t0
    print(json.dumps({"tag": "cache_build",
                      "s": round(build_s, 1),
                      "samples_per_s": round(n / build_s, 1)}), flush=True)

    class _Grids:
        def __init__(self, x, y):
            self.x = jax.device_put(jnp.asarray(x, jnp.uint8))
            self.y = jax.device_put(jnp.asarray(y, jnp.uint8))

        def __len__(self):
            return int(self.x.shape[0])

    cache = _Grids(xs, ys)
    cache_bytes = xs.nbytes + ys.nbytes
    print(json.dumps({"tag": "hbm_budget",
                      "cache_mb": round(cache_bytes / 1e6, 1),
                      "per_sample_mb": round(cache_bytes / n / 1e6, 2),
                      "v5e_hbm_gb": 16}), flush=True)

    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                  backend="pallas")
    crit = resolve_criterion("geneo_tversky")(
        weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
        tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4)
    tmp = "/tmp/epoch128_run"
    cfg = TrainConfig(max_epochs=args.epochs, optimizer="adam",
                      learning_rate=1e-3, early_stop_metric=None,
                      checkpoint_dir=os.path.join(tmp, "ckpt"),
                      run_dir=os.path.join(tmp, "run"))
    trainer = Trainer(net, crit, cfg)
    t0 = time.perf_counter()
    final, best = trainer.fit_grid_cached(params, cache,
                                          batch_size=args.batch,
                                          augment=True,
                                          key=jax.random.PRNGKey(0))
    wall = time.perf_counter() - t0

    # per-epoch times from the run log (first epoch carries the compile)
    times = []
    with open(os.path.join(tmp, "run", "metrics.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if "epoch_time_s" in d:
                times.append(d["epoch_time_s"])
    steady = times[1:] or times
    sps = n / float(np.mean(steady))
    print(json.dumps({
        "tag": "epoch128",
        "n": n, "batch": args.batch, "epochs": args.epochs,
        "epoch_time_s": [round(t, 2) for t in times],
        "steady_samples_per_s": round(sps, 1),
        "ms_per_step": round(float(np.mean(steady)) / (n // args.batch)
                             * 1e3, 2),
        "wall_s": round(wall, 1),
        "train_loss": round(float(best.get("train_loss", float("nan"))), 4),
        "v5e8_projection_samples_per_s": round(sps * 8 * 0.97, 1),
        "projection_basis": "pure-DP cached epochs replicate the cache and "
                            "pmean grads once per step; 0.97 = the measured "
                            "DP overhead bound from the 2-process receipts "
                            "(RESULTS.md 'Sharded programs')",
    }), flush=True)


if __name__ == "__main__":
    main()
