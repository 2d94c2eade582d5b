"""TS40K-scale input-pipeline rehearsal (VERDICT r1 #8).

Generates ~2k synthetic TS40K-like crops on disk (the reference's fit
split is a few thousand ``sample_N.npy`` crops), then runs ONE FULL EPOCH
through the real path: ``TS40K`` dataset → ``PointPadding`` →
``PointCloudLoader`` (thread prefetch) → on-device voxelization →
Pallas train step — and reports sustained samples/s plus a loader-only
rate that shows whether the host pipeline can feed the chip.

Environment note: this axon box exposes ONE host core and a tunneled
chip, so absolute end-to-end numbers here are bounded by host prep
(measured ~425 samples/s/core with ``compute_indices=False``) and tunnel
transfer, not by the framework. The loader-only rate scales linearly with
cores (thread-pool prefetch) — a real v5e host (≥8 cores) feeds the
12.7 ms step (1260 samples/s) with ~3 cores.

Usage: python benchmarks/epoch_rehearsal.py [--n 2000 --points 60000
       --batch 16 --workers 8 --root /tmp/ts40k_rehearsal]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np


def generate(root: str, n: int, points: int) -> None:
    fit = os.path.join(root, "fit")
    os.makedirs(fit, exist_ok=True)
    existing = [f for f in os.listdir(fit) if f.endswith(".npy")]
    if len(existing) >= n:
        print(f"[gen] reusing {len(existing)} crops in {fit}")
        return
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(len(existing), n):
        m = int(rng.integers(int(points * 0.6), int(points * 1.4)))
        xyz = rng.uniform([5.4e5, 4.6e6, 150.0],
                          [5.4e5 + 30, 4.6e6 + 30, 220.0], (m, 3))
        labels = rng.choice([1, 2, 3, 5, 15, 16], size=m,
                            p=[0.2, 0.4, 0.2, 0.1, 0.05, 0.05])
        crop = np.concatenate([xyz, labels[:, None]], 1).astype(np.float32)
        np.save(os.path.join(fit, f"sample_{i}.npy"), crop)
    print(f"[gen] wrote {n} crops in {time.perf_counter() - t0:.1f}s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--points", type=int, default=60000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--max-points", type=int, default=65536)
    ap.add_argument("--root", default="/tmp/ts40k_rehearsal")
    ap.add_argument("--loader-only", action="store_true")
    ap.add_argument("--device-cache", action="store_true",
                    help="load the dataset to HBM once, then train epochs "
                         "with ZERO host transfer (on-device shuffle + "
                         "z-rotation/flip augmentation)")
    ap.add_argument("--scan-epoch", action="store_true",
                    help="device cache + the whole epoch as ONE lax.scan "
                         "dispatch (Trainer.fit_cached)")
    ap.add_argument("--grid-cache", action="store_true",
                    help="voxelized grids resident in HBM: voxelization "
                         "paid once, scan epochs of pure conv/loss work "
                         "with grid-space D4 augmentation "
                         "(Trainer.fit_grid_cached)")
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()
    if args.scan_epoch or args.grid_cache:
        args.device_cache = True

    generate(args.root, args.n, args.points)

    from scenenet_tpu.data.loader import PointCloudLoader
    from scenenet_tpu.data.transforms import PointPadding
    from scenenet_tpu.data.ts40k import TS40K

    ds = TS40K(args.root, split="fit",
               transform=PointPadding(max_points=args.max_points,
                                      compute_indices=False))
    loader = PointCloudLoader(ds, batch_size=args.batch, shuffle=True,
                              num_workers=args.workers, drop_last=True)

    if not args.device_cache:
        # loader-only epoch: host pipeline ceiling (disk → pad → collate)
        t0 = time.perf_counter()
        n_samples = 0
        for batch in loader:
            n_samples += batch[0].shape[0]
        dt = time.perf_counter() - t0
        print(f"[loader-only] {n_samples} samples in {dt:.1f}s = "
              f"{n_samples / dt:.0f} samples/s (host, {args.workers} threads)")

        from scenenet_tpu import native

        if native.available():
            from scenenet_tpu.data.loader import NativePointCloudLoader

            nloader = NativePointCloudLoader(
                ds, batch_size=args.batch, shuffle=True,
                max_points=args.max_points, threads=args.workers,
                drop_last=True)
            t0 = time.perf_counter()
            n_samples = 0
            for batch in nloader:
                n_samples += batch[0].shape[0]
            dt = time.perf_counter() - t0
            print(f"[native loader] {n_samples} samples in {dt:.1f}s = "
                  f"{n_samples / dt:.0f} samples/s (C++ threads)")
        if args.loader_only:
            return

    import jax

    from scenenet_tpu.losses import resolve_criterion
    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.train import make_device_voxelize_prep
    from scenenet_tpu.train.loop import TrainConfig, Trainer

    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                  backend="pallas")
    crit = resolve_criterion("geneo_tversky")(
        weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
        tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4)
    prep = make_device_voxelize_prep((64, 64, 64), (15,), use_indices=False)
    n_epochs = args.epochs if args.device_cache else 1
    cfg = TrainConfig(max_epochs=n_epochs, optimizer="adam", learning_rate=1e-3,
                      early_stop_metric=None, log_gradients=False,
                      checkpoint_dir=os.path.join(args.root, "ckpt"),
                      run_dir=os.path.join(args.root, "run"))
    trainer = Trainer(net, crit, cfg, batch_prep=prep)
    n_samples = (len(ds) // args.batch) * args.batch

    if args.device_cache:
        from scenenet_tpu.data.device_cache import CacheLoader, DevicePointCache

        t0 = time.perf_counter()
        cache = DevicePointCache(ds)
        print(f"[cache] {len(cache)} samples resident in HBM "
              f"({time.perf_counter() - t0:.1f}s one-time load)")

        if args.scan_epoch or args.grid_cache:
            import json

            tag2 = "grids" if args.grid_cache else "scan"
            run_dir = os.path.join(args.root, f"run_{tag2}")
            cfg2 = TrainConfig(max_epochs=args.epochs, optimizer="adam",
                               learning_rate=1e-3, early_stop_metric=None,
                               log_gradients=False,
                               checkpoint_dir=os.path.join(args.root,
                                                           f"ckpt_{tag2}"),
                               run_dir=run_dir)
            trainer2 = Trainer(net, crit, cfg2, batch_prep=prep)
            if args.grid_cache:
                from scenenet_tpu.data.device_cache import DeviceGridCache

                t0 = time.perf_counter()
                gcache = DeviceGridCache(cache, prep)
                jax.block_until_ready(gcache.x)
                print(f"[grid cache] {len(gcache)} (x, y) grid pairs "
                      f"resident ({time.perf_counter() - t0:.1f}s one-time "
                      f"voxelization)")
                del cache
                _, best = trainer2.fit_grid_cached(
                    params, gcache, batch_size=args.batch, augment=True,
                    key=jax.random.PRNGKey(0))
            else:
                _, best = trainer2.fit_cached(
                    params, cache, batch_size=args.batch, augment=True,
                    key=jax.random.PRNGKey(0))
            with open(os.path.join(run_dir, "metrics.jsonl")) as f:
                for line in f:
                    row = json.loads(line)
                    if "epoch_time_s" in row:
                        e, dt = row["step"], row["epoch_time_s"]
                        tag = " (compile)" if e == 0 else ""
                        print(f"[scan epoch {e}] {n_samples / dt:.0f} "
                              f"samples/s ({dt:.1f}s){tag}")
            print(f"loss {best['train_loss']:.4f}")
            return

        cloader = CacheLoader(cache, args.batch, key=jax.random.PRNGKey(0),
                              shuffle=True, augment=True)
        epoch_times = []

        class _Timing:
            def __iter__(self):
                epoch_times.append(time.perf_counter())
                return iter(cloader)

        _, best = trainer.fit(params, _Timing())
        epoch_times.append(time.perf_counter())
        per_epoch = [b - a for a, b in zip(epoch_times, epoch_times[1:])]
        for e, dt in enumerate(per_epoch):
            tag = " (compile + load)" if e == 0 else ""
            print(f"[device-cache epoch {e}] {n_samples / dt:.0f} samples/s"
                  f" ({dt:.1f}s){tag}")
        print(f"loss {best['train_loss']:.4f}")
        return

    t0 = time.perf_counter()
    _, best = trainer.fit(params, loader)
    dt = time.perf_counter() - t0
    print(f"[full epoch] {n_samples} samples in {dt:.1f}s = "
          f"{n_samples / dt:.0f} samples/s end-to-end "
          f"(loss {best['train_loss']:.4f}); includes first-step compile")


if __name__ == "__main__":
    main()
