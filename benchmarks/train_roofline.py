"""Train-step roofline (VERDICT r3 #2 / r4 #4): stage-split the 64³
batch-16 SceneNet train step against measured/nominal floors, the way
``headline_ablation.py`` does for inference.

Stages (each timed in isolation with the honest fori_loop method, then
the full fused step):

  prep     on-device two-channel voxelization (points → x occupancy,
           y tower-fraction grid) — MXU s8 one-hot dots, 2 channels
  fwd      SceneNet forward (backend-selectable: VPU f32 stencil /
           banded-y MXU split)
  dk       Pallas kernel-gradient (the only conv backward the step
           needs: x is data, dx is dead code)
  loss     geneo_tversky criterion + cvx/geneo penalties (elementwise +
           reductions over B·V)
  opt      adam update on the 13-scalar param tree (+ metrics update)

Floors: prep = 2-channel hist MACs @ 197 T MACs/s nominal s8; fwd = the
formulation's issued MACs (VPU: 2·225·B·V FLOPs @ ~7.7 TF/s; MXU: the
packed-split issued MACs @ 98.5 T MACs/s bf16); loss ≈ HBM streaming of
the B·V f32 tensors it reduces (~6 passes) @ 819 GB/s.

One JSON line per measurement + a summary. Feeds RESULTS.md
"Train-step roofline".

Usage: python benchmarks/train_roofline.py [--backend pallas|pallas_mxu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

S8_MACS = 197e12
BF16_MACS = 98.5e12
VPU_FLOPS = 7.7e12
HBM_BPS = 819e9


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "pallas_mxu"])
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_compilation"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from scenenet_tpu.losses import resolve_criterion
    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.ops.pallas_conv import stencil_dk
    from scenenet_tpu.train import make_device_voxelize_prep
    from scenenet_tpu.train.metrics import init_metric_state, update_metrics
    from scenenet_tpu.train.state import create_train_state

    B, N, G = args.batch, args.points, args.grid
    grid = (G, G, G)
    V = G ** 3
    ks = (9, 5, 5)
    net, params = SceneNet.create(kernel_size=ks, seed=0,
                                  backend=args.backend)
    crit = resolve_criterion("geneo_tversky")(
        weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
        tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4)
    state, tx = create_train_state(params, "adam", 1e-3,
                                   net.trainable_mask(params))
    prep = make_device_voxelize_prep(grid, (15,), use_indices=False)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 30, (B, N, 3)).astype(np.float32))
    labels = jnp.asarray(rng.choice([1, 2, 15], (B, N)).astype(np.int32))
    mask = jnp.ones((B, N), bool)
    x0, y0 = prep(pts, labels, mask)
    x0 = jax.device_put(jnp.asarray(np.asarray(x0)))
    y0 = jax.device_put(jnp.asarray(np.asarray(y0)))
    g0 = jax.device_put(jnp.asarray(
        rng.standard_normal((B, 1, G, G, G)).astype(np.float32) * 0.1))

    def timed(tag, fn, *arrs, iters=None):
        it = iters or args.iters

        @jax.jit
        def loop(*a):
            def body(i, acc):
                out = fn(i, *a)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, it, body, 0.0)

        float(loop(*arrs))
        t0 = time.perf_counter()
        total = float(loop(*arrs))
        dt = (time.perf_counter() - t0) / it
        assert np.isfinite(total)
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3)}), flush=True)
        return dt

    # ---- stages in isolation ------------------------------------------------
    t_prep = timed("prep_voxelize_2ch",
                   lambda i, p, l, m: prep(p + i * 1e-7, l, m)[1], pts,
                   labels, mask)
    t_fwd = timed("forward",
                  lambda i, x: net.apply(params, x + i * 0.0), x0)

    t_dk = timed("dk_stencil",
                 lambda i, x, g: stencil_dk(x + i * 0.0, g, ks), x0, g0)
    t_loss = timed("loss_penalties",
                   lambda i, pred, y: crit(
                       pred + i * 0.0, y, net.cvx_coefficients(params),
                       net.geneo_params_flat(params), net.last_lambda),
                   g0, y0)

    def opt_step(i, x):
        grads = jax.tree.map(lambda p: p * 0 + x[0, 0, 0, 0, 0] + i * 0.0,
                             params)
        updates, _ = tx.update(grads, state.opt_state, state.params)
        new = optax.apply_updates(state.params, updates)
        ms = update_metrics(init_metric_state(), x, x)
        return new["lambdas"]["lambda_cy_0"] + ms.tp[1].astype(jnp.float32)

    t_opt = timed("opt_metrics", opt_step, x0)

    # ---- the full fused step ------------------------------------------------
    def step(state, mstate, pts, labels, mask):
        x, y = prep(pts, labels, mask)

        def loss_fn(p):
            pred = net.apply(p, x)
            return crit(pred, y, net.cvx_coefficients(p),
                        net.geneo_params_flat(p), net.last_lambda), pred

        (loss, pred), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        mstate = update_metrics(mstate, pred, y)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt_state), mstate, loss

    @jax.jit
    def full_loop(state, pts, labels, mask):
        mstate = init_metric_state()

        def body(i, carry):
            st, ms, acc = carry
            st, ms, loss = step(st, ms, pts + i * 1e-7, labels, mask)
            return st, ms, acc + loss
        return jax.lax.fori_loop(0, args.iters, body, (state, mstate, 0.0))

    float(full_loop(state, pts, labels, mask)[2])
    t0 = time.perf_counter()
    out = full_loop(state, pts, labels, mask)
    assert np.isfinite(float(out[2]))
    t_full = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"tag": "full_step", "ms": round(t_full * 1e3, 3),
                      "samples_per_s": round(B / t_full)}), flush=True)

    # ---- floors -------------------------------------------------------------
    chunk = 4096
    hist_macs = 2 * B * (N // chunk) * chunk * V     # two channels
    prep_floor = hist_macs / S8_MACS
    k_z, k_x, k_y = ks
    taps = k_z * k_x * k_y
    if args.backend == "pallas_mxu":
        slabs = -(-G // 64)
        fwd_macs = B * 4 * k_x * k_z * (16 * G) * 128 * 2 * G  # packed split
        fwd_floor = fwd_macs / BF16_MACS
    else:
        fwd_floor = (2 * taps * B * V) / VPU_FLOPS
    # dk: x-batched plane-dot matmuls — per (dx,dy) tap and z-slab:
    # (x, T, bz) batch-x dot contracting y (x·T·bz·y MACs) + the masked
    # (T, k_z) contraction (negligible)
    bz = 16
    T = bz + k_z - 1
    dk_macs = (k_x * k_y) * (G // bz) * B * G * T * bz * G
    dk_floor = dk_macs / BF16_MACS  # f32 dots issue at ≤ bf16 rate
    loss_bytes = 6 * B * V * 4      # ~6 streaming passes over pred/y
    loss_floor = loss_bytes / HBM_BPS
    summary = {
        "tag": "roofline",
        "backend": args.backend,
        "prep_floor_ms": round(prep_floor * 1e3, 2),
        "prep_x_floor": round(t_prep / prep_floor, 2),
        "fwd_floor_ms": round(fwd_floor * 1e3, 3),
        "fwd_x_floor": round(t_fwd / fwd_floor, 2),
        "dk_floor_ms": round(dk_floor * 1e3, 3),
        "dk_x_floor": round(t_dk / dk_floor, 2),
        "loss_floor_ms": round(loss_floor * 1e3, 3),
        "loss_x_floor": round(t_loss / loss_floor, 2),
        "stage_sum_ms": round((t_prep + t_fwd + t_dk + t_loss + t_opt) * 1e3,
                              2),
        "full_step_ms": round(t_full * 1e3, 2),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
