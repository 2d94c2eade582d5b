"""Statistically credible white-box vs black-box table (VERDICT r3 #3).

Upgrades the round-3 single-split comparison (benchmarks/RESULTS.md
"White-box vs black-box") to a leave-3-out k-fold over the 12 bundled
reference crops with seed variance and per-model learning-rate selection:

- folds: crops sorted by filename; fold i holds out crops [3i, 3i+3) as
  TEST, the cyclically-next 3 as VAL, the remaining 6 as TRAIN (2 batches
  of 3 — the round-3 batch size).
- checkpoint selection on val_FBetaScore (the reference's
  ``trainer.test(ckpt_path="best")`` semantics, main.py:255-268, but
  monitored on VAL — the fix for the degenerate UNet row, which selected
  on train fit and restored a memorized/collapsed net).
- lr: per-model small sweep on fold 0 / seed 0, chosen by best-val
  FBeta (the ``auto_lr_find`` intent at table scale), then fixed for
  all folds × seeds.
- 4 folds × 3 seeds per model; reports mean ± std of test F1/FBeta.

Protocol otherwise mirrors round 3: 40 epochs, adam, geneo_tversky with
the defaults.yaml hyperparameters (empty penalty sets for the black
boxes — the reference loss-API contract, CNNBaseline.py:35-44), host
Voxelization([15]) + ToFullDense, tau=0.65, no augmentation, f32.

Writes one JSON line per run and a summary to kfold_results.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = "/root/reference/data-sample"
EPOCHS = int(os.environ.get("KFOLD_EPOCHS", "40"))
BATCH = 3
SEEDS = tuple(int(s) for s in
              os.environ.get("KFOLD_SEEDS", "0,1,2").split(","))
LRS = tuple(float(s) for s in
            os.environ.get("KFOLD_LRS", "1e-2,3e-3,1e-3,1e-4").split(","))
OUT_JSON = os.path.join(os.path.dirname(__file__), "kfold_results.json")


def _definite(obj):
    """Recursively replace non-finite floats with None: ``json.dump``'s
    default ``allow_nan=True`` emits bare ``NaN`` tokens that are invalid
    strict JSON (jq/JSON.parse choke — ADVICE r4)."""
    if isinstance(obj, dict):
        return {k: _definite(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_definite(v) for v in obj]
    if isinstance(obj, float) and not np.isfinite(obj):
        return None
    return obj


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def load_grids():
    from scenenet_tpu.data import Compose, ToFullDense, Voxelization

    tf = Compose([
        Voxelization([15], vox_size=None, vxg_size=(64, 64, 64)),
        ToFullDense((True, True)),
    ])
    files = sorted(f for f in os.listdir(DATA_DIR) if f.endswith(".npy"))
    xs, ys = [], []
    for f in files:
        arr = np.load(os.path.join(DATA_DIR, f))
        x, y = tf((arr[:, 0:3], arr[:, 3]))
        xs.append(x.astype(np.float32))
        ys.append(y.astype(np.float32))
    return files, np.stack(xs), np.stack(ys)


def make_model(name: str, seed: int):
    if name == "scenenet":
        from scenenet_tpu.models import SceneNet

        return SceneNet.create(kernel_size=(9, 5, 5), seed=seed,
                               backend="pallas")
    if name == "cnn":
        from scenenet_tpu.models import CnnBaseline

        return CnnBaseline.create(conv_num=3, kernel_size=(9, 5, 5),
                                  seed=seed, input_shape=(1, 1, 64, 64, 64))
    if name == "unet":
        from scenenet_tpu.models import UNet3D

        return UNet3D.create(seed=seed, input_shape=(1, 1, 64, 64, 64))
    raise ValueError(name)


def make_criterion():
    from scenenet_tpu.losses import resolve_criterion

    return resolve_criterion("geneo_tversky")(
        weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
        tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4,
    )


def batches_of(xs, ys, idx, batch=BATCH):
    out = []
    for s in range(0, len(idx) - len(idx) % batch, batch):
        sel = idx[s:s + batch]
        out.append((xs[sel], ys[sel]))
    return out


def run_one(model_name, lr, fold, seed, xs, ys, log):
    """One fit: returns (best_val_fbeta, test metrics at best-val ckpt)."""
    import jax

    from scenenet_tpu.train import TrainConfig, Trainer

    n = len(xs)
    test_idx = np.arange(3 * fold, 3 * fold + 3)
    val_idx = np.arange(3 * fold + 3, 3 * fold + 6) % n
    train_idx = np.array(sorted(set(range(n)) - set(test_idx) - set(val_idx)))
    rng = np.random.default_rng(seed)
    train_idx = rng.permutation(train_idx)

    train_b = batches_of(xs, ys, train_idx)
    val_b = batches_of(xs, ys, val_idx)
    test_b = batches_of(xs, ys, test_idx)

    tmp = tempfile.mkdtemp(prefix=f"kfold_{model_name}_")
    try:
        net, params = make_model(model_name, seed)
        cfg = TrainConfig(
            max_epochs=EPOCHS, optimizer="adam", learning_rate=lr,
            tau=0.65, early_stop_metric="val_FBetaScore",
            early_stop_patience=12,
            checkpoint_dir=os.path.join(tmp, "ckpt"),
            run_dir=os.path.join(tmp, "run"), checkpoint_top_k=1,
            # batch-3 multi-channel conv3d gradients SIGABRT this XLA's
            # space-to-batch pass (loop.py:73) — same flags as cli/train
            compiler_options={
                "xla_tpu_run_space_to_batch": "false",
                "xla_tpu_run_space_to_batch_after_spmd": "false",
                "xla_tpu_run_space_to_batch_on_new_platforms": "false",
            } if model_name in ("cnn", "unet") else None,
        )
        trainer = Trainer(net, make_criterion(), cfg)
        import time

        t0 = time.time()
        print(f"[kfold] start {model_name} lr={lr} fold={fold} seed={seed}",
              flush=True)
        stateful = bool(getattr(net, "is_stateful", False))
        if stateful:
            # UNet (BatchNorm running stats): per-batch streaming loop
            final_params, best = trainer.fit(params, train_b,
                                             val_loader=val_b)
        else:
            # stateless: whole epochs as one on-device scan dispatch —
            # same learning dynamics (tested vs fit in test_train.py),
            # ~20× fewer tunnel round trips
            class _Grids:
                def __init__(self, x, y):
                    import jax.numpy as jnp

                    self.x = jax.device_put(jnp.asarray(x, jnp.uint8))
                    self.y = jax.device_put(jnp.asarray(y, jnp.uint8))

                def __len__(self):
                    return int(self.x.shape[0])

            tr_x = np.concatenate([b[0] for b in train_b])
            tr_y = np.concatenate([b[1] for b in train_b])
            final_params, best = trainer.fit_grid_cached(
                params, _Grids(tr_x, tr_y), batch_size=BATCH,
                augment=False, key=jax.random.PRNGKey(seed),
                val_loader=val_b)
        print(f"[kfold] fit done in {time.time() - t0:.1f}s", flush=True)
        # Root cause of r4's fold-0 "NaN best_val_fbeta / restore failed"
        # row: the round-end SIGTERM preempted the fit mid-first-epoch, so
        # fit() returned an EMPTY best dict (every best_* NaN) and no
        # checkpoint existed. Flag such runs so the summary can exclude
        # them instead of averaging a half-trained net in silently.
        preempted = bool(getattr(trainer, "preempted", False))
        best_val = float(best.get("val_FBetaScore", float("nan")))
        used = "best:val_FBetaScore"
        try:
            sel = trainer.restore_best("val_FBetaScore", final_params)
        except Exception as e:  # stateful restore edge — fall back, honestly
            sel = final_params
            used = f"final (restore failed: {type(e).__name__}: {e})"
        scores = trainer.evaluate(sel, test_b, prefix="test")
        scores = {k: float(v) for k, v in scores.items()}
        rec = dict(model=model_name, lr=lr, fold=fold, seed=seed,
                   best_val_fbeta=best_val, ckpt=used, preempted=preempted,
                   best_train_f1=float(best.get("train_F1Score", float("nan"))),
                   best_train_fbeta=float(best.get("train_FBetaScore", float("nan"))),
                   **scores)
        log(rec)
        return rec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    _enable_compile_cache()
    files, xs, ys = load_grids()
    print(f"[kfold] {len(files)} crops voxelized; "
          f"pos rate {ys.mean():.4f}", flush=True)
    results = []

    def log(rec):
        results.append(rec)
        print(json.dumps(rec), flush=True)

    models = sys.argv[1].split(",") if len(sys.argv) > 1 else \
        ["scenenet", "cnn", "unet"]
    summary = {}
    for m in models:
        # lr probe: fold 0, seed 0
        probe = [run_one(m, lr, fold=0, seed=0, xs=xs, ys=ys, log=log)
                 for lr in LRS]
        ok = [p for p in probe if np.isfinite(p["best_val_fbeta"])]
        best_lr = max(ok, key=lambda p: p["best_val_fbeta"])["lr"] if ok \
            else 1e-3
        print(f"[kfold] {m}: lr -> {best_lr}", flush=True)
        rows = []
        for fold in range(4):
            for seed in SEEDS:
                if fold == 0 and seed == 0:
                    # reuse the probe run at the chosen lr (guard: best_lr
                    # may be the 1e-3 fallback and absent from KFOLD_LRS)
                    reuse = [p for p in probe if p["lr"] == best_lr]
                    if reuse:
                        rows.append(reuse[0])
                        continue
                rows.append(run_one(m, best_lr, fold, seed, xs, ys, log=log))
        n_preempted = sum(1 for r in rows if r.get("preempted"))
        rows = [r for r in rows if not r.get("preempted")]
        f1 = np.array([r["test_F1Score"] for r in rows])
        fb = np.array([r["test_FBetaScore"] for r in rows])
        prec = np.array([r["test_Precision"] for r in rows])
        rec_ = np.array([r["test_Recall"] for r in rows])
        summary[m] = dict(
            lr=best_lr, n_runs=len(rows),
            test_f1_mean=float(f1.mean()), test_f1_std=float(f1.std()),
            test_fbeta_mean=float(fb.mean()), test_fbeta_std=float(fb.std()),
            test_precision_mean=float(prec.mean()),
            test_recall_mean=float(rec_.mean()),
            # degenerate = all-negative collapse (P=R=0), all-positive
            # collapse (R≈1 at near-zero P), or any test F1 < 0.01
            collapsed_runs=int(np.sum(
                ((prec == 0) & (rec_ == 0))
                | ((rec_ > 0.99) & (prec < 0.01))
                | (f1 < 0.01))),
            restore_failed_runs=int(sum(
                1 for r in rows if not str(r["ckpt"]).startswith("best"))),
            preempted_runs_excluded=int(n_preempted),
            lr_selection=("global, chosen on fold-0 val (crops 3-5, which "
                          "are fold-1's test crops — a mild cross-fold "
                          "leak, noted per ADVICE r4)"),
        )
        print("[kfold] summary " + json.dumps({m: summary[m]}), flush=True)
        with open(OUT_JSON, "w") as fh:
            json.dump(_definite(dict(summary=summary, runs=results)), fh,
                      indent=1)
            fh.write("\n")
    print("[kfold] DONE " + json.dumps(_definite(summary)), flush=True)


if __name__ == "__main__":
    main()
