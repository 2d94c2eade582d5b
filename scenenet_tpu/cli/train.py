"""Train + test entry point.

Twin of the reference ``scripts/main.py``: builds criterion → model → data
→ trainer from a YAML config, fits with per-metric checkpointing and early
stopping, then tests with the best checkpoint. Sweep mode
(``--sweep sweep.yaml --sweep-runs N``) random-searches the spec and
reports the best run by ``val_FBetaScore`` (reference ``sweep_config.yml``).

Usage:
    python -m scenenet_tpu.cli.train --config experiments/defaults.yaml \
        [--set key=value ...] [--sweep sweep.yaml --sweep-runs 8]
"""

from __future__ import annotations

import argparse
import ast
import os
from typing import Dict, Optional

from scenenet_tpu.data import TS40K, Compose, ToFullDense, Voxelization
from scenenet_tpu.data.loader import Subset, VoxelLoader, random_split
from scenenet_tpu.data.semantic_kitti import SemanticKITTICrops
from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import CnnBaseline, SceneNet, UNet3D
from scenenet_tpu.train import TrainConfig, Trainer
from scenenet_tpu.train.checkpoint import restore_checkpoint
from scenenet_tpu.utils.config import ExperimentConfig, load_config, sample_sweep
from scenenet_tpu.utils.seeding import fix_randomness


def build_criterion(cfg: ExperimentConfig):
    kw = cfg.criterion_params()
    if cfg.criterion.startswith("quantile"):
        # the pinball loss must target the SAME quantiles the ensemble's
        # members were built for — criterion_params() is criterion-generic
        # and would otherwise leave the create() default (0.1, 0.5, 0.9)
        # silently mis-indexing a custom ensemble's members
        kw["quantiles"] = tuple(getattr(cfg, "quantiles", (0.1, 0.5, 0.9)))
    return resolve_criterion(cfg.criterion)(**kw)


def build_model(cfg: ExperimentConfig, seed: Optional[int] = None):
    seed = cfg.seed if seed is None else seed
    if cfg.model == "scenenet":
        backend = getattr(cfg, "model_backend", "auto")
        if backend == "auto":
            import jax

            # pallas kernels are Mosaic-TPU only: auto means TPU->pallas,
            # ANYTHING else (cpu, gpu) -> xla (config.py documents this)
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        return SceneNet.create(cfg.geneo_num(), cfg.kernel_size, seed=seed,
                               smart=getattr(cfg, "geneo_init", "random") == "smart",
                               backend=backend)
    if cfg.model == "quantile":
        from scenenet_tpu.models import QuantileSceneNet

        backend = getattr(cfg, "model_backend", "auto")
        if backend == "auto":
            import jax

            # pallas kernels are Mosaic-TPU only: auto means TPU->pallas,
            # ANYTHING else (cpu, gpu) -> xla (config.py documents this)
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        return QuantileSceneNet.create(
            cfg.geneo_num(), cfg.kernel_size, seed=seed,
            quantiles=tuple(getattr(cfg, "quantiles", (0.1, 0.5, 0.9))),
            backend=backend)
    if cfg.model == "cnn":
        return CnnBaseline.create(conv_num=3, kernel_size=cfg.kernel_size, seed=seed,
                                  input_shape=(1, 1, *cfg.grid_zxy()))
    if cfg.model == "unet":
        import jax.numpy as jnp

        # precision: bf16 → bf16 compute dtype inside the flax module (the
        # Trainer-level cast alone is undone by the f32 BatchNorm stats)
        dtype = jnp.bfloat16 if getattr(cfg, "precision", "f32") == "bf16" else jnp.float32
        return UNet3D.create(seed=seed, input_shape=(1, 1, *cfg.grid_zxy()),
                             dtype=dtype)
    raise NotImplementedError(f"model {cfg.model!r}")


def build_datasets(cfg: ExperimentConfig):
    if cfg.device_voxelization:
        # TPU path: loaders emit fixed-size padded point batches and the
        # voxelization runs inside the jitted train step (batch_prep)
        from scenenet_tpu.data import PointPadding

        transform = PointPadding(max_points=cfg.max_points,
                                 vxg_size=cfg.voxel_grid_size,
                                 vox_size=cfg.voxel_size)
    else:
        transform = Compose([
            Voxelization(list(cfg.keep_labels), vox_size=cfg.voxel_size,
                         vxg_size=cfg.voxel_grid_size),
            ToFullDense((True, True)),
        ])
    if cfg.dataset == "ts40k":
        fit = TS40K(cfg.data_path, split="fit", transform=transform)
        test = TS40K(cfg.data_path, split="test", transform=transform)
    elif cfg.dataset == "semantic_kitti":
        fit = SemanticKITTICrops(cfg.data_path, split="train", transform=transform)
        test = SemanticKITTICrops(cfg.data_path, split="test", transform=transform)
    else:
        raise NotImplementedError(f"dataset {cfg.dataset!r}")
    train_idx, val_idx = random_split(len(fit), cfg.val_split, seed=cfg.seed)
    return Subset(fit, train_idx), Subset(fit, val_idx), test


def _enable_compile_cache():
    try:
        import jax

        cache_dir = os.path.expanduser("~/.cache/jax_compilation")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _resolve_device_cache_auto(cfg: ExperimentConfig, n_samples: int):
    """Pick the fastest applicable training pipeline (VERDICT r2 #7).

    Measured on the v5e (benchmarks/RESULTS.md): grid-cache epochs
    ~2,500 samples/s > point-cache ~1,716 > streaming loader ~260. The
    grid cache requires a per-sample-deterministic transform — true for
    the device-voxelize prep; batch-time grid-space D4 augmentation still
    applies — but it freezes voxelization, so with ``augment: true``
    (arbitrary-angle point-space rotations) the point cache is preferred
    to keep the richer augmentation. Either cache must fit an HBM budget;
    otherwise fall back to the streaming loader. The decision is logged.
    """
    if not cfg.device_voxelization:
        print("[device_cache auto] -> false (needs device_voxelization)")
        return False
    if cfg.model == "unet":
        # stateful model (BatchNorm running stats): the scan-cached fits
        # are stateless-only — stream via the per-batch loop
        print("[device_cache auto] -> false (stateful model)")
        return False
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        hbm = stats.get("bytes_limit", 16 << 30)
    except Exception:
        hbm = 16 << 30
    budget = int(0.35 * hbm)  # leave room for conv workspace + model + eval
    import math

    grid_voxels = math.prod(cfg.voxel_grid_size)
    sizes = {
        # uint8 {0,1} grids ×2 (x, y) — the CLI prep is always binarized
        "grids": n_samples * 2 * grid_voxels,
        # f32 xyz + i32 labels + bool mask per padded point row
        "points": n_samples * cfg.max_points * 17,
    }
    order = ("points", "grids") if cfg.augment else ("grids", "points")
    for cand in order:
        if sizes[cand] <= budget:
            print(f"[device_cache auto] -> {cand!r} "
                  f"(cache {sizes[cand] / 1e9:.2f} GB ≤ budget "
                  f"{budget / 1e9:.2f} GB; augment={cfg.augment})")
            return cand
    print(f"[device_cache auto] -> false (smallest cache "
          f"{min(sizes.values()) / 1e9:.2f} GB > budget {budget / 1e9:.2f} GB)")
    return False


def run(cfg: ExperimentConfig) -> Dict[str, float]:
    fix_randomness(cfg.seed)
    _enable_compile_cache()
    run_dir = os.path.join(cfg.output_dir, cfg.project)
    ckpt_dir = cfg.checkpoint_dir or os.path.join(run_dir, "checkpoints")

    criterion = build_criterion(cfg)

    # mesh training (the reference's `gpus: -1` DDP intent as config):
    # data/dcn_data shard the batch, space Z-shards the grid with halo-
    # exchange conv — all through the exactness-tested sharded step.
    # Resolved FIRST so the shape-dependent tuners below (autotune,
    # auto_scale) see the per-shard shapes the step will actually run.
    mesh = None
    md, msp = int(cfg.mesh_data), int(cfg.mesh_space)
    mdcn = int(getattr(cfg, "mesh_dcn_data", 1))
    mens = int(getattr(cfg, "mesh_ensemble", 1))
    mchan = int(getattr(cfg, "mesh_channel", 1))
    if md * msp * mdcn * mens * mchan > 1:
        import jax

        from scenenet_tpu.parallel import make_hybrid_mesh, make_mesh

        n_dev = len(jax.devices())
        if md * msp * mdcn * mens * mchan != n_dev:
            raise ValueError(f"mesh {mdcn}(dcn)×{md}(data)×{msp}(space)"
                             f"×{mens}(ensemble)×{mchan}(channel) = "
                             f"{md * msp * mdcn * mens * mchan} devices, "
                             f"but {n_dev} are visible")
        if sum(ax > 1 for ax in (msp, mens, mchan)) > 1:
            raise ValueError("mesh_space / mesh_ensemble / mesh_channel "
                             "are mutually exclusive (one non-data axis)")
        if mchan > 1:
            if cfg.model not in ("unet", "cnn"):
                raise ValueError(
                    "channel tensor parallelism (mesh_channel > 1) shards "
                    "the black-box conv stacks via GSPMD "
                    f"(model=unet/cnn; got model={cfg.model!r})")
            if mdcn > 1:
                raise ValueError("mesh_channel composes with mesh_data "
                                 "only (no DCN axis)")
        if msp > 1 and cfg.model != "scenenet":
            raise ValueError("spatial sharding (mesh_space > 1) is "
                             "implemented for the scenenet model "
                             f"(got model={cfg.model!r})")
        if mens > 1:
            if cfg.model != "quantile":
                raise ValueError("ensemble parallelism (mesh_ensemble > 1) "
                                 "shards the quantile ensemble's members "
                                 f"(got model={cfg.model!r})")
            n_members = len(getattr(cfg, "quantiles", (0.1, 0.5, 0.9)))
            if n_members % mens:
                raise ValueError(f"{n_members} quantiles do not divide by "
                                 f"mesh_ensemble ({mens})")
        # the stateful unet trains DP (sync-BN shard_map) or DP×channel-TP
        # (GSPMD) under a mesh; the other non-DP axes are rejected above —
        # mesh_space by the scenenet-only guard, mesh_ensemble by the
        # quantile-only guard, mesh_channel by the unet/cnn-only guard
        if getattr(cfg, "constrained", "penalty") == "admm" and \
                mens * mchan > 1:
            raise ValueError("constrained=admm shards over data/space only "
                             "(no ensemble/channel axis)")
        if cfg.batch_size % (md * mdcn):
            raise ValueError(f"batch_size {cfg.batch_size} must divide by "
                             f"the data shards ({md * mdcn})")
        if cfg.voxel_grid_size[2] % msp:
            raise ValueError(f"grid Z extent {cfg.voxel_grid_size[2]} must "
                             f"divide by mesh_space ({msp})")
        # the non-data axis: EP members / GSPMD channel TP (both named
        # 'model' — the Trainer routes by model family) or the spatial Z
        # shards
        inner = (("model", mens * mchan) if mens * mchan > 1
                 else ("space", msp))
        axis_names = ("data", inner[0])
        mesh = (make_hybrid_mesh((mdcn, 1), (md, inner[1]),
                                 axis_names=axis_names) if mdcn > 1
                else make_mesh((md, inner[1]), axis_names=axis_names))
        print(f"[mesh] training over {dict(mesh.shape)}"
              + (f" ({mdcn}-way DP across slices)" if mdcn > 1 else ""))

    if getattr(cfg, "model_backend", "auto") == "autotune":
        # measured backend choice at THIS run's exact per-device shapes
        # (the static regime table in RESULTS.md, made live); see
        # tune.autotune_backend
        import jax

        if cfg.model not in ("scenenet", "quantile"):
            raise ValueError("model_backend=autotune supports the scenenet "
                             f"family (got model={cfg.model!r})")
        if jax.default_backend() != "tpu":
            print("[autotune] non-TPU backend; using model_backend=auto")
            cfg.model_backend = "auto"
        else:
            from scenenet_tpu.models import SceneNet
            from scenenet_tpu.train.tune import autotune_backend

            # under a mesh the backend runs on PER-SHARD extents — time
            # those, not the global shape (which may not even fit a chip)
            gz, gx, gy = cfg.grid_zxy()
            shard_batch = cfg.batch_size // (md * mdcn)
            shard_grid = (gz // msp, gx, gy)
            winner, times = autotune_backend(
                lambda b: SceneNet.create(cfg.geneo_num(), cfg.kernel_size,
                                          seed=cfg.seed, backend=b),
                criterion, shard_batch, shard_grid,
                optimizer=cfg.optimizer,
                cache_key_extra=f"ks={cfg.kernel_size},"
                                f"geneo={cfg.geneo_num()}")
            print(f"[autotune] backend -> {winner} at per-shard "
                  f"(batch {shard_batch}, grid {shard_grid})  ("
                  + ", ".join(f"{k}: {v:.2f} ms" for k, v in times.items())
                  + ")")
            cfg.model_backend = winner
    model, params = build_model(cfg)
    if cfg.resume_from_checkpoint:
        ckpt_path = os.path.join(ckpt_dir, cfg.resume_checkpoint_name + ".npz")
        if not os.path.exists(ckpt_path):
            raise FileNotFoundError(f"Checkpoint {ckpt_path} does not exist.")
        params = restore_checkpoint(ckpt_path, params)

    train_ds, val_ds, test_ds = build_datasets(cfg)
    # drop the ragged final batch: on TPU every distinct batch shape is a
    # separate XLA compile (the first-epoch compile storm otherwise)
    from scenenet_tpu import native as _native

    native_loader = cfg.device_voxelization and _native.available()

    def make_loaders(batch_size):
        if native_loader:
            # C++ batch prep (npy read + center + pad in real threads):
            # 2.2x the Python path per core, scales past the GIL. It does
            # NOT compute host-exact bin indices, so the prep below must
            # bin on device (use_indices=False).
            from scenenet_tpu.data.loader import NativePointCloudLoader

            train = NativePointCloudLoader(
                train_ds, batch_size, shuffle=True, seed=cfg.seed,
                max_points=cfg.max_points, threads=cfg.num_workers,
                drop_last=len(train_ds) >= batch_size)
        else:
            train = VoxelLoader(train_ds, batch_size, shuffle=True,
                                num_workers=cfg.num_workers, seed=cfg.seed,
                                drop_last=len(train_ds) >= batch_size)
        val = VoxelLoader(val_ds, batch_size, num_workers=cfg.num_workers)
        test = VoxelLoader(test_ds, batch_size, num_workers=cfg.num_workers)
        return train, val, test

    train_loader, val_loader, test_loader = make_loaders(cfg.batch_size)

    tcfg = TrainConfig(
        max_epochs=cfg.max_epochs,
        optimizer=cfg.optimizer,
        learning_rate=cfg.learning_rate,
        tau=cfg.tau,
        accumulate_grad_batches=cfg.accumulate_grad_batches,
        early_stop_metric=cfg.early_stop_metric,
        early_stop_patience=cfg.early_stop_patience,
        checkpoint_dir=ckpt_dir,
        checkpoint_top_k=cfg.checkpoint_top_k,
        run_dir=run_dir,
        use_wandb=cfg.use_wandb,
        precision=cfg.precision,
        epoch_chunks=cfg.epoch_chunks,
        checkpoint_every_n_steps=cfg.checkpoint_every_n_steps,
        compiler_options=cfg.compiler_options,
    )
    # preemption recovery (VERDICT r2 #5): a SIGTERM'd run leaves a
    # full-fidelity snapshot; a fresh launch of the same experiment picks
    # it up automatically and continues bit-identically (scan paths)
    preempt_snap = None
    if cfg.resume_preempted:
        from scenenet_tpu.train.preempt import SNAPSHOT_NAME

        candidate = os.path.join(ckpt_dir, SNAPSHOT_NAME)
        if os.path.exists(candidate):
            preempt_snap = candidate
            print(f"[preempt] resuming from snapshot {candidate}")
    batch_prep = None
    if cfg.device_voxelization:
        from scenenet_tpu.train import make_device_voxelize_prep

        batch_prep = make_device_voxelize_prep(cfg.voxel_grid_size,
                                               tuple(cfg.keep_labels),
                                               use_indices=not native_loader)

    if mesh is not None and len(train_ds) < cfg.batch_size:
        # make_loaders would fall back to drop_last=False and emit one
        # ragged batch that violates the data-shard divisibility at step
        # time — fail at config time instead
        raise ValueError(f"mesh training needs at least one full batch: "
                         f"{len(train_ds)} training samples < batch_size "
                         f"{cfg.batch_size}")

    device_cache = cfg.device_cache
    if mesh is not None and device_cache and (msp > 1 or mchan > 1):
        # both cached-epoch fits scale over a pure-DP mesh (replicated
        # cache + shard_map'd compute); spatial sharding and GSPMD
        # channel TP stream batches via fit()
        if device_cache != "auto":
            print("[mesh] device_cache disabled (cached epochs are "
                  "pure-DP; spatial/channel sharding streams batches)")
        device_cache = False
    if device_cache == "auto":
        device_cache = _resolve_device_cache_auto(cfg, len(train_ds))

    if getattr(cfg, "auto_scale_batch_size", False) and mesh is not None:
        # the single-device probe below would measure 1/N of the mesh's
        # real capacity (or spuriously OOM where the sharded step fits)
        print("[auto_scale_batch_size] skipped: probe is single-device; "
              "size the global batch as shards × per-shard capacity")
    elif getattr(cfg, "auto_scale_batch_size", False) and \
            cfg.device_voxelization and cfg.model in ("scenenet", "quantile"):
        # power-of-two probe of the largest batch that compiles + runs a
        # real grads step (the reference's auto_scale_batch_size intent;
        # its trainer.tune() is commented out, main.py:238-239)
        import jax
        import jax.numpy as jnp

        from scenenet_tpu.train.tune import find_max_batch_size

        def _probe(b):
            pts = jnp.zeros((b, cfg.max_points, 3), jnp.float32)
            labels = jnp.zeros((b, cfg.max_points), jnp.int32)
            m = jnp.ones((b, cfg.max_points), bool)

            def loss_fn(p):
                x, y = batch_prep(pts, labels, m)
                pred = model.apply(p, x)
                return criterion(pred, y, model.cvx_coefficients(p),
                                 model.geneo_params_flat(p),
                                 model.last_lambda)

            jax.block_until_ready(jax.grad(loss_fn)(params))

        found = find_max_batch_size(_probe, start=cfg.batch_size)
        if found != cfg.batch_size:
            print(f"[auto_scale_batch_size] batch_size {cfg.batch_size} → "
                  f"{found}")
            cfg.batch_size = found
            train_loader, val_loader, test_loader = make_loaders(found)

    if getattr(cfg, "fast_dev_run", False):
        # Lightning's fast_dev_run: 1 epoch over 1 batch per split — an
        # integration smoke (reference declares it, main.py:229 commented)
        class _OneBatch:
            def __init__(self, loader):
                self.loader = loader

            def __iter__(self):
                it = iter(self.loader)
                try:
                    yield next(it)
                except StopIteration:
                    return

            def __len__(self):
                return min(1, len(self.loader))

        tcfg.max_epochs = 1
        tcfg.early_stop_metric = None
        train_loader = _OneBatch(train_loader)
        val_loader = _OneBatch(val_loader)
        test_loader = _OneBatch(test_loader)

    if getattr(cfg, "auto_lr_find", False) and cfg.model in ("scenenet",
                                                            "quantile"):
        # the LR range test the reference's auto_lr_find intended
        # (trainer.tune() is commented out there, main.py:238-239)
        from scenenet_tpu.train.tune import lr_range_test

        probe_batches = []
        for batch in train_loader:
            probe_batches.append(batch)
            if len(probe_batches) >= 8:
                break
        if probe_batches:
            try:
                suggested, _ = lr_range_test(
                    model, criterion, params, probe_batches,
                    optimizer=cfg.optimizer, batch_prep=batch_prep)
            except NotImplementedError as e:
                # the tuner is an optional convenience: an optimizer it
                # doesn't know (e.g. lbfgs) must not abort the run
                # (ADVICE r2) — keep the configured learning rate
                print(f"[auto_lr_find] skipped ({e}); keeping "
                      f"learning_rate={tcfg.learning_rate}")
            else:
                print(f"[auto_lr_find] suggested learning_rate="
                      f"{suggested:.3e} (was {tcfg.learning_rate})")
                tcfg.learning_rate = suggested

    if getattr(cfg, "constrained", "penalty") == "admm":
        from scenenet_tpu.train.admm import ADMMConfig, ADMMTrainer

        acfg = ADMMConfig(**{**tcfg.__dict__, "admm_rho": cfg.admm_rho})
        trainer = ADMMTrainer(model, criterion, acfg, batch_prep=batch_prep,
                              mesh=mesh)
        final_params, best = trainer.fit(params, train_loader,
                                         val_loader if len(val_ds) else None)
    elif device_cache and cfg.device_voxelization and \
            not getattr(cfg, "fast_dev_run", False):
        # HBM-resident dataset + one-lax.scan-dispatch epochs (see
        # benchmarks/RESULTS.md "Device-resident epoch training"):
        # "points" revoxelizes per batch (arbitrary-angle rotation aug),
        # "grids" pays voxelization once (grid-space D4 aug)
        import jax

        from scenenet_tpu.data.device_cache import (
            DeviceGridCache, DevicePointCache,
        )

        trainer = Trainer(model, criterion, tcfg, batch_prep=batch_prep,
                          mesh=mesh)
        cache = DevicePointCache(train_ds)
        if device_cache == "grids":
            gcache = DeviceGridCache(cache, batch_prep)
            del cache  # free the resident points
            final_params, best = trainer.fit_grid_cached(
                params, gcache, batch_size=cfg.batch_size,
                augment=cfg.augment, key=jax.random.PRNGKey(cfg.seed),
                val_loader=val_loader if len(val_ds) else None,
                resume_from=preempt_snap)
        else:
            final_params, best = trainer.fit_cached(
                params, cache, batch_size=cfg.batch_size,
                augment=cfg.augment, key=jax.random.PRNGKey(cfg.seed),
                val_loader=val_loader if len(val_ds) else None,
                resume_from=preempt_snap)
    else:
        trainer = Trainer(model, criterion, tcfg, batch_prep=batch_prep,
                          mesh=mesh)
        final_params, best = trainer.fit(params, train_loader,
                                         val_loader if len(val_ds) else None,
                                         resume_from=preempt_snap)

    print(f"{'=' * 20} best scores {'=' * 20}")
    for k, v in sorted(best.items()):
        print(f"  {k}: {v:.4f}")

    # test with the BEST checkpoint, like the reference's trainer.test
    # (main.py:255-268); fall back to the final params when no checkpoint
    # qualified (e.g. zero epochs)
    test_params = final_params
    if cfg.test_checkpoint == "best":
        metric = cfg.early_stop_metric or "train_FBetaScore"
        try:
            test_params = trainer.restore_best(metric, final_params)
            print(f"[test] using best '{metric}' checkpoint")
        except (FileNotFoundError, AttributeError, KeyError) as e:
            print(f"[test] best checkpoint unavailable ({e}); using final params")
    test_scores = trainer.evaluate(test_params, test_loader, prefix="test")
    for k, v in sorted(test_scores.items()):
        print(f"  {k}: {v:.4f}")

    if getattr(cfg, "export_stablehlo", False):
        # serialized-model export (the reference's save_onnx twin)
        from scenenet_tpu.utils.export import export_forward

        path = os.path.join(ckpt_dir, f"{cfg.project}.stablehlo")
        export_forward(model, final_params,
                       (1, 1, *cfg.grid_zxy()), path)
        print(f"exported StableHLO to {path}")
    if getattr(cfg, "export_onnx", False):
        # ONNX-format export (reference main.py:259-264) — SceneNet only
        # (the baked combined-kernel Conv graph); see docs/ONNX.md
        from scenenet_tpu.utils.onnx_export import export_scenenet_onnx

        if hasattr(model, "synthesize_kernels") and hasattr(
                model, "effective_lambdas"):
            path = os.path.join(ckpt_dir, f"{cfg.project}.onnx")
            export_scenenet_onnx(model, final_params, cfg.grid_zxy(), path)
            print(f"exported ONNX to {path}")
        else:
            print(f"[export] ONNX export supports SceneNet-family models "
                  f"only; skipping for {type(model).__name__}")
    return {**best, **test_scores}


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train SCENE-Net (TPU)")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--set", action="extend", nargs="*", default=[],
                        help="config overrides key=value (repeatable: "
                             "--set a=1 b=2 or --set a=1 --set b=2)")
    parser.add_argument("--sweep", type=str, default=None,
                        help="wandb-style sweep spec (random search)")
    parser.add_argument("--sweep-runs", type=int, default=4)
    args = parser.parse_args(argv)

    overrides = {}
    for kv in args.set:
        key, val = kv.split("=", 1)
        try:
            overrides[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            overrides[key] = val

    if args.sweep:
        best_score, best_cfg = -1.0, None
        for i, draw in enumerate(sample_sweep(args.sweep, args.sweep_runs)):
            cfg = load_config(args.config, {**draw, **overrides})
            cfg.project = f"{cfg.project}_sweep{i}"
            scores = run(cfg)
            score = scores.get("val_FBetaScore", scores.get("train_FBetaScore", 0.0))
            print(f"[sweep {i}] val_FBetaScore={score:.4f} draw={draw}")
            if score > best_score:
                best_score, best_cfg = score, draw
        print(f"[sweep] best val_FBetaScore={best_score:.4f} with {best_cfg}")
    else:
        run(load_config(args.config, overrides))


if __name__ == "__main__":
    main()
