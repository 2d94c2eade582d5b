"""BASELINE.json config 3: SCENE-Net training-step throughput.

Full jitted train step — on-device voxelization (MXU histogram) from raw
padded points, SceneNet forward, geneo_tversky loss with constraint
penalties, grads, optax update, on-device metrics — timed with the
on-device fori_loop method (see bench.py docs).

Reference baseline: ≈1.60 s/it at batch 4 incl. CPU voxelization
(BASELINE.md) → 2.5 samples/s.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main(batch=16, n_points=65536, grid=(64, 64, 64), iters=8,
         backend="pallas"):
    import jax
    import jax.numpy as jnp
    import optax

    from scenenet_tpu.losses import resolve_criterion
    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.train import make_device_voxelize_prep
    from scenenet_tpu.train.metrics import init_metric_state, update_metrics
    from scenenet_tpu.train.state import create_train_state

    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                  backend=backend)
    crit = resolve_criterion("geneo_tversky")(
        weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
        tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4)
    state, tx = create_train_state(params, "adam", 1e-3, net.trainable_mask(params))
    prep = make_device_voxelize_prep(grid, (15,), use_indices=False)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 30, (batch, n_points, 3)).astype(np.float32))
    labels = jnp.asarray(rng.choice([1, 2, 15], (batch, n_points)).astype(np.int32))
    mask = jnp.ones((batch, n_points), bool)

    def step(state, mstate, pts, labels, mask):
        x, y = prep(pts, labels, mask)

        def loss_fn(p):
            pred = net.apply(p, x)
            return crit(pred, y, net.cvx_coefficients(p),
                        net.geneo_params_flat(p), net.last_lambda), pred

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        mstate = update_metrics(mstate, pred, y)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt_state), mstate, loss

    @jax.jit
    def loop(state, pts, labels, mask):
        mstate = init_metric_state()

        def body(i, carry):
            st, ms, acc = carry
            st, ms, loss = step(st, ms, pts + i * 1e-7, labels, mask)
            return st, ms, acc + loss

        return jax.lax.fori_loop(0, iters, body, (state, mstate, 0.0))

    out = loop(state, pts, labels, mask)
    float(out[2])  # compile + warm
    t0 = time.perf_counter()
    out = loop(state, pts, labels, mask)
    total_loss = float(out[2])
    dt = time.perf_counter() - t0
    sps = batch * iters / dt
    print(f"train step [{backend}]: {dt/iters*1e3:.1f} ms/step (batch {batch}) → "
          f"{sps:.0f} samples/s  [reference ≈2.5 samples/s]  loss_sum={total_loss:.3f}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--backend", default="pallas",
                    choices=["xla", "pallas", "pallas_mxu"])
    a = ap.parse_args()
    main(batch=a.batch, n_points=a.points, grid=(a.grid,) * 3, iters=a.iters,
         backend=a.backend)
