"""BASELINE.json config 5: scaled multi-GENEO SCENE-Net, 128³ grids,
data-parallel + spatially-sharded inference over a device mesh.

On real multi-chip hardware this runs DP×spatial over ICI; here it can be
exercised on the virtual CPU mesh (JAX_PLATFORMS=cpu,
--xla_force_host_platform_device_count=8) for correctness/compile, or on
one TPU chip (mesh 1×1) for single-chip 128³ timing.

Usage: python benchmarks/spatial_128.py [--data N --space M --batch B]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
                               space_axis="space" if args.space > 1 else None,
                               inference=True)  # occupancy input: bf16 taps bit-exact

    rng = np.random.default_rng(0)
    g = args.grid
    x = (rng.random((args.batch, 1, g, g, g)) > 0.97).astype(np.float32)

    # honest on-device timing: ship the input ONCE, run iters inside one
    # fori_loop (per-call device_put of a 128³ batch through a remote
    # tunnel is transfer-bound and measures the link, not the chip), and
    # fetch a single scalar to force completion (block_until_ready can
    # return early through the tunnel)
    x_d = jax.device_put(jnp.asarray(x), run.in_sharding)

    @jax.jit
    def loop(params, xd):
        def body(i, acc):
            return acc + jnp.sum(run.forward(params, xd + i * 1e-7))
        return jax.lax.fori_loop(0, args.iters, body, 0.0)

    float(loop(params, x_d))  # compile + warm
    t0 = time.perf_counter()
    total = float(loop(params, x_d))
    dt = time.perf_counter() - t0
    thru = args.batch * args.iters / dt
    print(f"mesh=({args.data}x{args.space}) grid={g}^3 batch={args.batch}: "
          f"{thru:.2f} grids/s ({dt/args.iters*1e3:.1f} ms/batch, checksum {total:.1f})")


if __name__ == "__main__":
    main()
