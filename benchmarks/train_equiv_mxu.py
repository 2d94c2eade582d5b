"""Training-equivalence receipt: backend="pallas_mxu" vs "pallas".

The banded-y MXU training forward (`fused_geneo_conv_mxu`) is near-f32
(max|Δ| 2.6e-5, post the residual-zeroing fix) with an exact-f32
backward. This trains the BASELINE.md reproduction protocol (12 reference
fixtures, 9 fit / 3 test, geneo_tversky, adam lr 1e-2, 40 epochs) from
identical seed-0 params with both backends and reports the per-epoch
loss divergence plus final metrics — the receipt that the MXU forward
trains to the same model, not just the same one-step numbers. One JSON
line per result.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import sys

import numpy as np

FIXTURES = "/root/reference/data-sample"
EPOCHS = 40
BATCH = 3


def main():
    cache = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from scenenet_tpu.data import Compose, ToFullDense, Voxelization
    from scenenet_tpu.losses import resolve_criterion
    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.train import TrainConfig, Trainer
    from scenenet_tpu.train.metrics import (
        compute_metrics, init_metric_state, update_metrics)

    transform = Compose([Voxelization([15], vxg_size=(64, 64, 64)),
                         ToFullDense((True, True))])
    files = sorted(f for f in os.listdir(FIXTURES) if f.endswith(".npy"))
    grids = [transform((c[:, :3], c[:, 3]))
             for c in (np.load(os.path.join(FIXTURES, f)) for f in files)]
    fit, test = grids[:9], grids[9:]
    batches = [
        (np.stack([x for x, _ in fit[i:i + BATCH]]),
         np.stack([y for _, y in fit[i:i + BATCH]]))
        for i in range(0, len(fit), BATCH)
    ]

    results = {}
    for backend in ("pallas", "pallas_mxu"):
        import shutil

        root = f"/tmp/equiv_{backend}"
        shutil.rmtree(root, ignore_errors=True)  # RunLogger appends
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                      backend=backend)
        crit = resolve_criterion("geneo_tversky")(
            weight_alpha=1, weight_epsilon=0.1, mse_weight=1,
            convex_weight=5, tversky_alpha=2, tversky_beta=1,
            tversky_smooth=1e-6, focal_gamma=4)
        cfg = TrainConfig(max_epochs=EPOCHS, optimizer="adam",
                          learning_rate=1e-2,
                          checkpoint_dir=f"{root}/ckpt",
                          run_dir=f"{root}/run",
                          early_stop_metric=None, log_gradients=False)
        trainer = Trainer(net, crit, cfg)
        final, _ = trainer.fit(params, batches)
        with open(f"{root}/run/metrics.jsonl") as fh:
            losses = [float(json.loads(l)["train_loss"]) for l in fh
                      if "train_loss" in l]
        def split_metrics(split):
            ms = init_metric_state()
            for x, y in split:
                pred = net.apply(final, jnp.asarray(x)[None])
                ms = update_metrics(ms, pred, jnp.asarray(y)[None], 0.65)
            return {k: round(float(v), 4)
                    for k, v in compute_metrics(ms, 0.5).items()}

        m = split_metrics(fit)
        results[backend] = {"losses": losses, "metrics": m}
        print(json.dumps({"tag": backend, "final_loss":
                          losses[-1] if losses else None,
                          "fit_metrics": m,
                          "test_metrics": split_metrics(test)}), flush=True)

    la, lb = results["pallas"]["losses"], results["pallas_mxu"]["losses"]
    if la and lb and len(la) == len(lb):
        d = max(abs(a - b) for a, b in zip(la, lb))
        print(json.dumps({"tag": "equivalence",
                          "epochs": len(la),
                          "max_epoch_loss_delta": round(d, 6)}), flush=True)
    ma = results["pallas"]["metrics"]
    mb = results["pallas_mxu"]["metrics"]
    dm = {k: round(abs(ma[k] - mb[k]), 4) for k in ma if k in mb}
    print(json.dumps({"tag": "metric_deltas", "d": dm}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
