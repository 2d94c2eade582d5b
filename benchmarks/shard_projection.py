"""Per-shard real-chip timings + ICI model → projected v5e-8 scaling.

VERDICT r2 #1b: multi-chip hardware is not available here (one v5e chip
through a tunnel), so BASELINE config 5 (128³ on a v5e-8) is argued the
honest way: measure on the real chip the EXACT local tensor shapes each
of the 8 chips would run under z-sharding — the serial extended-shard
conv, the overlapped interior conv, and the thin boundary convs — and
combine them with an analytic halo-bytes / ICI-bandwidth model.

Shapes for 128³ z-sharded n ways with the (9,k,k) GENEO bank (lo=hi=4):

- serial:   (B,1,128/n+8,128,128) → 128/n output planes (permute→concat→conv)
- interior: (B,1,128/n,128,128)   → 128/n−8 planes (no halo dependence)
- boundary: (B,1,12,128,128)      → 4 planes (×2: top + bottom)

Timing uses the honest on-device fori_loop + scalar-fetch recipe (through
the tunnel ``block_until_ready`` can return early; see bench.py). Prints
one JSON line per measurement so partial runs still yield data.

Results land in benchmarks/RESULTS.md ("Spatial sharding: projected
v5e-8 scaling").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--shards", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="assumed one-way ICI bandwidth per link, GB/s "
                         "(v5e: 4 links × 400 Gbps ⇒ ~50 GB/s/link; 45 "
                         "is the conservative setting used in RESULTS.md)")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.geneo.kernels import cylinder_v2, random_geneo_params
    from scenenet_tpu.ops.pallas_conv import geneo_stencil_conv

    B = args.batch
    rng = np.random.default_rng(0)
    kernel = np.asarray(
        cylinder_v2({k: jnp.asarray(v, jnp.float32) for k, v in
                     random_geneo_params("cylinder_v2", rng, (9, 7, 7)).items()},
                    (9, 7, 7)), np.float32)
    k_z = kernel.shape[0]
    halo = k_z - 1  # lo + hi = 8

    def timed(tag, z_in, z_prepadded=True):
        """Fused stencil conv (activation head fused, as the model runs it)
        on (B,1,z_in,128,128); VALID z when z_prepadded."""
        x = (rng.random((B, 1, z_in, 128, 128)) > 0.97).astype(np.float32)
        kd = jax.device_put(jnp.asarray(kernel))
        xd = jax.device_put(jnp.asarray(x))

        @jax.jit
        def loop(x, k):
            def body(i, acc):
                out = geneo_stencil_conv(x + i * 1e-7, k, activation=True,
                                         z_prepadded=z_prepadded)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        float(loop(xd, kd))  # compile + warm
        t0 = time.perf_counter()
        total = float(loop(xd, kd))
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(total)
        print(json.dumps({"tag": tag, "z_in": z_in, "batch": B,
                          "ms": round(dt * 1e3, 3)}), flush=True)
        return dt

    # unsharded single-chip reference (SAME conv, full 128³)
    t_full = timed("full_128", 128, z_prepadded=False)

    bw = args.ici_gbps * 1e9
    halo_bytes = B * 1 * (halo // 2) * 128 * 128 * 4  # one direction, f32
    t_wire = halo_bytes / bw

    for n in args.shards:
        z_local = 128 // n
        t_serial = timed(f"serial_shard_n{n}", z_local + halo)
        t_interior = timed(f"interior_n{n}", z_local)
        t_boundary = timed(f"boundary_n{n}", halo + halo // 2)

        serial_step = t_wire + t_serial
        overlap_step = max(t_interior, t_wire) + 2 * t_boundary
        print(json.dumps({
            "tag": f"projection_n{n}", "batch": B,
            "halo_mb_one_way": round(halo_bytes / 1e6, 3),
            "ici_gbps": args.ici_gbps,
            "wire_ms": round(t_wire * 1e3, 4),
            "serial_step_ms": round(serial_step * 1e3, 3),
            "overlap_step_ms": round(overlap_step * 1e3, 3),
            "single_chip_ms": round(t_full * 1e3, 3),
            "speedup_serial": round(t_full / serial_step, 2),
            "speedup_overlap": round(t_full / overlap_step, 2),
            "efficiency_overlap_pct": round(100 * t_full / overlap_step / n, 1),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
