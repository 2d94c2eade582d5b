"""BASELINE.json config 5: scaled multi-GENEO SCENE-Net, 128³ grids,
data-parallel + spatially-sharded inference over a device mesh.

On real multi-chip hardware this runs DP×spatial over ICI; here it can be
exercised on the virtual CPU mesh (JAX_PLATFORMS=cpu,
--xla_force_host_platform_device_count=8) for correctness/compile, or on
one TPU chip (mesh 1×1) for single-chip 128³ timing.

Usage: python benchmarks/spatial_128.py [--data N --space M --batch B]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=int, default=1)
    parser.add_argument("--space", type=int, default=1)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--grid", type=int, default=128)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--backend", choices=("xla", "pallas"), default="pallas",
                        help="local conv: XLA conv vs fused Pallas stencil "
                             "(HBM-streamed at 128³; VERDICT r1 #2)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.parallel import make_dp_inference_fn, make_mesh

    n_dev = args.data * args.space
    devices = jax.devices()
    if len(devices) < n_dev:
        devices = jax.devices("cpu")
    mesh = make_mesh((args.data, args.space), devices=devices[:n_dev])

    # wider observer bank (config 5)
    net, params = SceneNet.create({"cy": 3, "cone": 3, "neg": 2},
                                  kernel_size=(9, 7, 7), seed=0,
                                  backend=args.backend)
    run = make_dp_inference_fn(net, mesh,
                               space_axis="space" if args.space > 1 else None)

    rng = np.random.default_rng(0)
    g = args.grid
    x = (rng.random((args.batch, 1, g, g, g)) > 0.97).astype(np.float32)

    out = run(params, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    total = 0.0
    for _ in range(args.iters):
        total += float(jnp.sum(run(params, x)))  # force completion
    dt = time.perf_counter() - t0
    thru = args.batch * args.iters / dt
    print(f"mesh=({args.data}x{args.space}) grid={g}^3 batch={args.batch}: "
          f"{thru:.2f} grids/s ({dt/args.iters*1e3:.1f} ms/batch, checksum {total:.1f})")


if __name__ == "__main__":
    main()
