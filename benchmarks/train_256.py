"""256³ single-chip TRAINING step — the memory-play receipt.

RESULTS.md's spatial-sharding section concludes sharding big grids over
chips is a memory-capacity play, not a throughput play. This benchmark
pins the other half of that argument: how big a grid ONE v5e already
trains without any sharding. The full train step at 256³ — raw 2.1 M
labeled points → fused sorted-hierarchical voxelization (16.8 M bins)
→ SceneNet forward (HBM-streamed Pallas stencil) → geneo_tversky loss →
kernel-gradient backward (HBM-streamed dk slabs) → sgd update + metric
counts — on one chip. The reference OOMs a 24 GB GPU at 128³
(SURVEY §6); round 2's 256³ attempt could not even compile the XLA conv.

Input: the TS40K reference fixtures tiled 6×6 in x/y WITH their labels
(same construction as demo_256.py, which measured the inference path).

Run on the TPU host:  python -m benchmarks.train_256
Timing is tunnel-honest (dependency-chained TrainStates + loss fetch).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import time

import numpy as np

GRID = (256, 256, 256)
ITERS = 4
TILE = 6
MAX_POINTS = 2_097_152  # 2 M, multiple of 2048


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_cloud():
    """Tile the labeled reference fixture crops into one large scene."""
    root = "/root/reference/data-sample"
    files = [f for f in sorted(os.listdir(root)) if f.endswith(".npy")]
    clouds = [np.load(os.path.join(root, f)) for f in files]
    parts = []
    i = 0
    for tx in range(TILE):
        for ty in range(TILE):
            c = clouds[i % len(clouds)].astype(np.float32)
            xyz, lab = c[:, :3].copy(), c[:, 3]
            xyz -= xyz.min(0)
            ext = xyz.max(0)
            xyz[:, 0] += tx * ext[0] * 1.05
            xyz[:, 1] += ty * ext[1] * 1.05
            parts.append(np.concatenate([xyz, lab[:, None]], 1))
            i += 1
    cloud = np.concatenate(parts)[:MAX_POINTS]
    return cloud


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.losses import resolve_criterion
    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.train import make_device_voxelize_prep
    from scenenet_tpu.train.metrics import (
        compute_metrics,
        init_metric_state,
        update_metrics,
    )
    from scenenet_tpu.train.state import create_train_state

    cloud = build_cloud()
    n = len(cloud)
    pad = -n % 2048
    pts = np.zeros((1, n + pad, 3), np.float32)
    pts[0, :n] = cloud[:, :3]
    labels = np.zeros((1, n + pad), np.int32)
    labels[0, :n] = cloud[:, 3].astype(np.int32)
    mask = np.zeros((1, n + pad), bool)
    mask[0, :n] = True
    print(json.dumps({"tag": "input", "points": n, "grid": list(GRID),
                      "towers": int((labels == 15).sum())}), flush=True)

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                  backend=backend)
    crit = resolve_criterion("geneo_tversky")(
        weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
        tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4)
    prep = make_device_voxelize_prep(GRID, keep_labels=(15,))
    state, tx = create_train_state(params, "sgd", 1e-2,
                                   net.trainable_mask(params))
    last = net.last_lambda

    import optax

    @jax.jit
    def step(state, mstate, pts, labels, mask):
        x, y = prep(pts, labels, mask)

        def loss_fn(p):
            pred = net.apply(p, x)
            return crit(pred, y, net.cvx_coefficients(p),
                        net.geneo_params_flat(p), last), pred

        (loss, pred), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        mstate = update_metrics(mstate, pred, y, 0.65)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt_state), mstate, loss

    dev_in = tuple(jnp.asarray(a) for a in (pts, labels, mask))
    t0 = time.perf_counter()
    s, m, loss = step(state, init_metric_state(), *dev_in)
    l0 = float(loss)
    print(json.dumps({"tag": "compile",
                      "compile_plus_first_step_s":
                          round(time.perf_counter() - t0, 1),
                      "loss": l0}), flush=True)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, m, loss = step(s, m, *dev_in)
    lN = float(loss)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    mets = {k: round(float(v), 4) for k, v in compute_metrics(m).items()}
    # (device.memory_stats() reports nothing through the axon tunnel, so
    # no HBM peak here; the step fitting at all is the capacity receipt)
    print(json.dumps({
        "tag": "train_256", "ms_per_step": round(ms, 1),
        "steps_per_s": round(1e3 / ms, 2),
        "Mpoints_per_s": round(n / ms / 1e3, 1),
        "loss_first": l0, "loss_last": lN,
        "loss_decreased": lN < l0, "metrics": mets}), flush=True)


if __name__ == "__main__":
    main()
