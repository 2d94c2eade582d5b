"""Typed experiment configuration (YAML) + random-search sweeps.

Replaces the reference's wandb.config authority (SURVEY.md §5.6): a single
dataclass covers the full key surface of
``experiments/scenenet_ts40k/defaults_config.yml``; YAML files may be flat
(``key: value``) or wandb-style (``key: {value: ...}``). Tuples may be
written as YAML lists or as the reference's stringified tuples
(``"(9, 5, 5)"`` — parsed with ``ast.literal_eval``, reference
``main.py:127,136-137``).

Sweeps: :func:`sample_sweep` draws configs from a wandb-style sweep spec
(``method: random``, ``parameters: {key: {values: [...]}}}`` or
``{min:, max:}`` — reference ``sweep_config.yml``).
"""

from __future__ import annotations

import ast
import dataclasses
import random
from typing import Any, Dict, List, Optional, Tuple

import yaml


@dataclasses.dataclass
class ExperimentConfig:
    # experiment
    project: str = "scenenet_ts40k"
    output_dir: str = "experiments/outputs"
    seed: int = 0

    # dataset
    dataset: str = "ts40k"
    data_path: str = ""
    batch_size: int = 4
    voxel_grid_size: Tuple[int, int, int] = (64, 64, 64)
    voxel_size: Optional[Tuple[float, float, float]] = None
    num_workers: int = 8
    val_split: float = 0.1
    # fit/test folder fraction at ETL time (cli.build_samples --test-split;
    # the trained splits are the physical fit/ test/ folders)
    test_split: float = 0.3
    keep_labels: Tuple[int, ...] = (15,)
    device_voxelization: bool = True   # TPU path; False = host-oracle path
    max_points: int = 65536
    # HBM-resident dataset + one-scan-dispatch epochs. True/"points" keeps
    # raw points resident and revoxelizes per batch (Trainer.fit_cached,
    # arbitrary-angle z-rotation augmentation); "grids" keeps the voxelized
    # grids resident — voxelization paid once, epochs are pure
    # conv/loss/optimizer work with grid-space D4 augmentation
    # (Trainer.fit_grid_cached). Requires device_voxelization and a
    # dataset that fits device memory.
    device_cache: Any = "auto"  # "auto" | False | True | "points" | "grids"
    augment: bool = False  # on-device augmentation (device_cache paths);
    # default False = reference parity (its pipeline does not augment)

    # model
    model: str = "scenenet"  # "scenenet" | "quantile" | "cnn" | "unet"
    quantiles: Tuple[float, ...] = (0.1, 0.5, 0.9)  # model: quantile

    # trainer dev/tune switches — the reference declares all three and
    # wires none (fast_dev_run / trainer.tune() commented out,
    # reference main.py:229,238-239); here they are implemented
    fast_dev_run: bool = False      # 1 epoch × 1 batch integration smoke
    auto_lr_find: bool = False      # LR range test → learning_rate
    auto_scale_batch_size: bool = False  # power-of-two OOM probe
    # "auto" → pallas on TPU, xla elsewhere. The fused Pallas stencil is
    # 4.1× the XLA conv for the full train step (see benchmarks/RESULTS.md)
    # "auto" | "xla" | "pallas" | "pallas_mxu" | "autotune" — autotune
    # MEASURES one train step per pallas candidate at the run's exact
    # (batch, grid) shape on the live chip and picks the fastest (cached
    # per shape/device; train.tune.autotune_backend). auto = static rule
    # (TPU→pallas, else xla).
    model_backend: str = "auto"
    cylinder_geneo: int = 1
    arrow_geneo: int = 1
    neg_sphere_geneo: int = 1
    kernel_size: Tuple[int, int, int] = (9, 5, 5)
    geneo_init: str = "random"  # "random" | "smart" (reference geneo_smart_config)

    # training
    optimizer: str = "adam"
    learning_rate: float = 1e-3
    # constrained-training mode: "penalty" (reference hinge penalties inside
    # the GENEO losses) or "admm" (augmented-Lagrangian solver; reference
    # admm_config.yml ships the config but no solver)
    constrained: str = "penalty"
    admm_rho: float = 1.0
    max_epochs: int = 20
    early_stop_metric: Optional[str] = "train_FBetaScore"
    early_stop_patience: int = 25
    accumulate_grad_batches: int = 1
    tau: float = 0.65
    # per-jit XLA compiler overrides for the train/eval + cached-epoch
    # steps (dict). Measured use: disabling this toolchain's crashing
    # space-to-batch pass for small-batch multi-channel conv3d training —
    # set all of xla_tpu_run_space_to_batch{,_after_spmd,_on_new_platforms}
    # to "false" (RESULTS.md "White-box vs black-box")
    compiler_options: Optional[Dict[str, Any]] = None
    # "f32" | "bf16" — mixed-precision forward (the reference's
    # defaults_config.yml declares `precision: 16` but never wires it;
    # here it is real: bf16 params/activations, f32 masters + loss)
    precision: str = "f32"

    # criterion
    criterion: str = "geneo_tversky"
    weighting_scheme_path: Optional[str] = None  # None → bundled fixture
    weight_alpha: float = 1.0
    weight_epsilon: float = 0.1
    mse_weight: float = 1.0
    convex_weight: float = 5.0
    tversky_alpha: float = 2.0
    tversky_beta: float = 1.0
    tversky_smooth: float = 1e-6
    focal_gamma: float = 4.0

    # checkpoints / resume
    checkpoint_dir: str = ""
    checkpoint_top_k: int = 2
    resume_from_checkpoint: bool = False
    resume_checkpoint_name: str = "last"
    # evaluate with the best checkpoint (reference trainer.test semantics,
    # main.py:255-268) or the final params
    test_checkpoint: str = "best"  # "best" | "last"
    # preemption safety (VERDICT r2 #5): K dispatches per cached epoch
    # (≤1/K of an epoch lost to SIGTERM), optional periodic full snapshots,
    # and automatic pickup of a preemption snapshot on relaunch
    epoch_chunks: int = 1
    checkpoint_every_n_steps: int = 0
    resume_preempted: bool = True

    # parallel: mesh training (scenenet, per-batch fit path). data ×
    # space × dcn_data must equal the device count; batch_size must divide
    # by data × dcn_data and the grid Z extent by space. dcn_data > 1
    # places that DP factor ACROSS slices (make_hybrid_mesh) so the halo
    # exchange never leaves a slice.
    mesh_data: int = 1
    mesh_space: int = 1
    mesh_dcn_data: int = 1
    # ensemble parallelism (model=quantile): shard the ensemble's members
    # over a 'model' mesh axis — each device convolves only
    # len(quantiles)/mesh_ensemble members (parallel/ep.py). Composes with
    # mesh_data/mesh_dcn_data; mutually exclusive with mesh_space.
    mesh_ensemble: int = 1
    # channel tensor parallelism (model=unet/cnn): shard the conv stacks'
    # channel dims over a 'model' mesh axis via GSPMD sharding annotations
    # (parallel/gspmd.py) — XLA places the collectives. Composes with
    # mesh_data; mutually exclusive with mesh_space/mesh_ensemble.
    mesh_channel: int = 1

    # logging / export
    use_wandb: bool = False
    export_stablehlo: bool = False

    def criterion_params(self) -> Dict[str, Any]:
        return {
            "weighting_scheme_path": self.weighting_scheme_path,
            "weight_alpha": self.weight_alpha,
            "weight_epsilon": self.weight_epsilon,
            "mse_weight": self.mse_weight,
            "convex_weight": self.convex_weight,
            "tversky_alpha": self.tversky_alpha,
            "tversky_beta": self.tversky_beta,
            "tversky_smooth": self.tversky_smooth,
            "focal_gamma": self.focal_gamma,
        }

    def grid_zxy(self) -> Tuple[int, int, int]:
        """Grid tensor extents in TENSOR order (n_z, n_x, n_y).
        ``voxel_grid_size`` is in the reference's config order
        (n_x, n_y, n_z); the voxel tensors are (B, 1, Z, X, Y)
        (ops/voxelize.py:156) — NOT the plain reverse, which would swap
        X and Y for non-square grids."""
        g = self.voxel_grid_size
        return (g[2], g[0], g[1])

    def geneo_num(self) -> Dict[str, int]:
        return {
            "cy": self.cylinder_geneo,
            "cone": self.arrow_geneo,
            "neg": self.neg_sphere_geneo,
        }


_TUPLE_FIELDS = {"voxel_grid_size", "voxel_size", "kernel_size",
                 "keep_labels", "quantiles"}


def _coerce(name: str, value: Any) -> Any:
    if name in _TUPLE_FIELDS:
        if value is None or (isinstance(value, str)
                             and value.lower() in ("none", "null")):
            return None
        if isinstance(value, str):
            value = ast.literal_eval(value)
        if isinstance(value, (int, float)):
            # scalar spellings are natural YAML ("keep_labels: 15",
            # "voxel_size: 0.5"): broadcast to the field's arity instead
            # of crashing in tuple(<int>)
            if name in ("keep_labels", "quantiles"):
                return (value,)
            return (value,) * 3
        return tuple(value)
    if isinstance(value, str) and value.lower() in ("none", "null"):
        # YAML-style null / python None spellings from --set overrides
        return None
    return value


def load_config(path: Optional[str] = None, overrides: Optional[Dict] = None) -> ExperimentConfig:
    raw: Dict[str, Any] = {}
    if path:
        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        for key, val in doc.items():
            if isinstance(val, dict) and set(val) == {"value"}:
                val = val["value"]  # wandb defaults format
            raw[key] = val
    if overrides:
        raw.update(overrides)
    fields = {f.name for f in dataclasses.fields(ExperimentConfig)}
    known = {k: _coerce(k, v) for k, v in raw.items() if k in fields}
    unknown = set(raw) - fields
    if unknown:
        print(f"[config] ignoring unknown keys: {sorted(unknown)}")
    return ExperimentConfig(**known)


def sample_sweep(sweep_path: str, n: int, seed: int = 0) -> List[Dict[str, Any]]:
    """Draw ``n`` override dicts from a wandb-style random sweep spec."""
    with open(sweep_path) as f:
        spec = yaml.safe_load(f)
    params = spec.get("parameters", {})
    rng = random.Random(seed)
    draws = []
    for _ in range(n):
        cfg = {}
        for key, dist in params.items():
            if "values" in dist:
                cfg[key] = rng.choice(dist["values"])
            elif "min" in dist and "max" in dist:
                lo, hi = dist["min"], dist["max"]
                if isinstance(lo, int) and isinstance(hi, int):
                    cfg[key] = rng.randint(lo, hi)
                else:
                    cfg[key] = rng.uniform(lo, hi)
            elif "value" in dist:
                cfg[key] = dist["value"]
        draws.append(cfg)
    return draws
