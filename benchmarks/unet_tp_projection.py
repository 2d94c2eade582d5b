"""Channel-TP (GSPMD) projection for the UNet baseline: real-chip
per-shard conv timings + an ICI all-gather model → projected m-way table.

Multi-chip hardware is not reachable here (one v5e through a tunnel), so
the channel tensor parallelism leg (parallel/gspmd.py, ``mesh_channel``)
gets the same honest treatment as the spatial-sharding projection
(benchmarks/shard_projection.py): measure on the real chip the EXACT
per-device conv shapes m-way C_out sharding produces (full C_in,
C_out/m — Megatron column-parallel), and combine them with an analytic
collective model. Under GSPMD layer-to-layer dataflow each sharded conv's
output is all-gathered over the model axis before the next layer consumes
its full C_in: bytes/step = Σ_layers act_bytes × (m−1)/m, at the
conservative serial-ICI bound (no compute/collective overlap).

Timing: honest on-device fori_loop + scalar fetch (block_until_ready can
return early through the tunnel). One JSON line per measurement so
partial runs still yield data. Results land in RESULTS.md ("Channel
tensor parallelism: projected scaling").
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# UNet3D ladder at 64³ input (models/unet3d.py): (spatial, C_in, C_out)
# per 3³ conv, encoder + bottleneck + decoder (mid = concat//2) + head.
LAYERS = [
    ("enc1a", 64, 1, 32), ("enc1b", 64, 32, 32),
    ("enc2a", 32, 32, 64), ("enc2b", 32, 64, 64),
    ("enc3a", 16, 64, 128), ("enc3b", 16, 128, 128),
    ("enc4a", 8, 128, 256), ("enc4b", 8, 256, 256),
    ("bot-a", 4, 256, 256), ("bot-b", 4, 256, 256),
    ("dec1a", 8, 512, 256), ("dec1b", 8, 256, 128),
    ("dec2a", 16, 256, 128), ("dec2b", 16, 128, 64),
    ("dec3a", 32, 128, 64), ("dec3b", 32, 64, 32),
    ("dec4a", 64, 64, 32), ("dec4b", 64, 32, 32),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--shards", type=int, nargs="*", default=[1, 2, 4])
    ap.add_argument("--ici-gbps", type=float, default=45.0)
    ap.add_argument("--top", type=int, default=6,
                    help="measure only the N most FLOP-heavy layers; the "
                         "rest scale analytically by MACs (measured layers "
                         "cover the bulk of the step)")
    args = ap.parse_args()
    # m=1 is the projection's baseline AND the replicated-tail fill for
    # unshardable layers — always measure it, whatever --shards says
    args.shards = sorted(set(args.shards) | {1})

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = args.batch
    rng = np.random.default_rng(0)

    def macs(s, cin, cout):
        return B * s**3 * 27 * cin * cout

    ranked = sorted(LAYERS, key=lambda t: -macs(t[1], t[2], t[3]))
    measured_set = {t[0] for t in ranked[: args.top]}

    def time_conv(s, cin, cout):
        """fwd+bwd 3³ SAME conv (NDHWC, f32) at (B, s³, cin)→cout, ms."""
        x = jnp.asarray(rng.standard_normal((B, s, s, s, cin)),
                        jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.01,
                        jnp.float32)

        def fwd(k, x):
            return lax.conv_general_dilated(
                x, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        def loss(k, x):
            return jnp.sum(fwd(k, x) ** 2)

        g = jax.value_and_grad(loss)

        @jax.jit
        def loop(k, x):
            def body(i, acc):
                v, gk = g(k + acc * 1e-12, x)
                return acc + v + jnp.sum(gk[0, 0, 0, 0])

            return lax.fori_loop(0, args.iters, body, 0.0)

        float(loop(k, x))  # compile + warm
        t0 = time.perf_counter()
        float(loop(k, x))
        return (time.perf_counter() - t0) / args.iters * 1e3

    # ---- measure the per-shard conv shapes -------------------------------
    # rows[layer][m] = measured (or MAC-scaled) fwd+bwd ms at C_out/m
    rows: dict = {}
    for name, s, cin, cout in LAYERS:
        rows[name] = {}
        for m in args.shards:
            if cout % m or cout // m < 8:
                rows[name][m] = None
                continue
            if name in measured_set:
                ms = time_conv(s, cin, cout // m)
                print(json.dumps({"layer": name, "m": m, "spatial": s,
                                  "cin": cin, "cout": cout // m,
                                  "ms": round(ms, 3)}), flush=True)
                rows[name][m] = ms
            else:
                rows[name][m] = None  # fill by MAC scaling below

    # MAC-rate from the measured layers at each m → analytic fill for the
    # small tail layers (they are <15% of total MACs)
    for m in args.shards:
        pairs = [(macs(s, cin, cout) / m, rows[n][m])
                 for n, s, cin, cout in LAYERS
                 if n in measured_set and rows[n][m] is not None]
        if not pairs:  # m shards nothing measurable (e.g. very wide m):
            continue   # every layer falls to the replicated-tail branch
        rate = sum(p[0] for p in pairs) / max(sum(p[1] for p in pairs), 1e-9)
        for n, s, cin, cout in LAYERS:
            if rows[n][m] is None and cout % m == 0 and cout // m >= 8:
                rows[n][m] = macs(s, cin, cout) / m / rate

    # ---- collective model -------------------------------------------------
    # all-gather of each sharded conv's output activation over the model
    # axis before the next full-C_in consumer: (m-1)/m of act bytes cross
    # ICI (f32 here; bf16 halves it). Backward adds the mirrored
    # reduce-scatter of the activation cotangent — ×2 total.
    for m in args.shards:
        if m == 1:
            total = sum(rows[n][1] for n, *_ in [(n, s, c, o) for n, s, c, o
                        in LAYERS])
            print(json.dumps({"projected": 1, "conv_ms": round(total, 2),
                              "collective_ms": 0.0,
                              "step_ms": round(total, 2)}), flush=True)
            base = total
            continue
        conv_ms, skipped = 0.0, 0.0
        ag_bytes = 0
        for n, s, cin, cout in LAYERS:
            if rows[n][m] is None:
                # unshardable layer runs replicated at full width
                conv_ms += rows[n][1]
                skipped += rows[n][1]
            else:
                conv_ms += rows[n][m]
                ag_bytes += B * s**3 * cout * 4 * (m - 1) / m * 2
        coll_ms = ag_bytes / (args.ici_gbps * 1e9) * 1e3
        print(json.dumps({
            "projected": m, "conv_ms": round(conv_ms, 2),
            "replicated_tail_ms": round(skipped, 2),
            "allgather_MB": round(ag_bytes / 1e6, 1),
            "collective_ms": round(coll_ms, 2),
            "step_ms": round(conv_ms + coll_ms, 2),
            "speedup_vs_1": round(base / (conv_ms + coll_ms), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
