"""CLI + config system: end-to-end train/test run on a tiny synthetic
TS40K-style dataset, config parsing, sweep sampling, visualize export."""

import json
import os

import numpy as np
import pytest

from scenenet_tpu.utils.config import ExperimentConfig, load_config, sample_sweep


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ts40k")
    rng = np.random.default_rng(0)
    for split, n in [("fit", 6), ("test", 2)]:
        (root / split).mkdir()
        for i in range(n):
            m = int(rng.integers(2000, 4000))
            xyz = rng.uniform([0, 0, 0], [30, 30, 60], (m, 3))
            labels = rng.choice([1, 2, 15], size=m, p=[0.5, 0.35, 0.15])
            np.save(root / split / f"sample_{i}.npy",
                    np.concatenate([xyz, labels[:, None]], axis=1))
    return str(root)


class TestConfig:
    def test_defaults_yaml_parses(self):
        cfg = load_config("experiments/defaults.yaml")
        assert cfg.kernel_size == (9, 5, 5)
        assert cfg.voxel_size is None
        assert cfg.criterion == "geneo_tversky"
        assert cfg.tversky_smooth == pytest.approx(1e-6)

    def test_wandb_value_format(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text("batch_size:\n  value: 7\nkernel_size:\n  value: (3, 3, 3)\n")
        cfg = load_config(str(p))
        assert cfg.batch_size == 7 and cfg.kernel_size == (3, 3, 3)

    def test_overrides_win(self):
        cfg = load_config("experiments/defaults.yaml", {"batch_size": 2})
        assert cfg.batch_size == 2

    def test_sweep_sampling(self):
        draws = sample_sweep("experiments/sweep.yaml", 5, seed=1)
        assert len(draws) == 5
        for d in draws:
            assert d["optimizer"] in ("adam", "sgd", "rmsprop")
            assert 1.0 <= d["convex_weight"] <= 10.0


class TestTrainCLI:
    def test_end_to_end_train_and_test(self, tiny_dataset, tmp_path):
        from scenenet_tpu.cli.train import run

        cfg = ExperimentConfig(
            data_path=tiny_dataset,
            output_dir=str(tmp_path),
            batch_size=2,
            voxel_grid_size=(16, 16, 16),
            kernel_size=(9, 5, 5),
            max_epochs=2,
            num_workers=2,
            early_stop_metric=None,
            val_split=0.34,
        )
        scores = run(cfg)
        assert np.isfinite(scores["train_loss"])
        assert "test_F1Score" in scores
        ckpt_dir = os.path.join(str(tmp_path), "scenenet_ts40k", "checkpoints")
        assert os.path.exists(os.path.join(ckpt_dir, "last.npz"))

    def test_visualize_cli(self, tiny_dataset, tmp_path):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.cli import visualize

        cfg_yaml = tmp_path / "cfg.yaml"
        cfg_yaml.write_text(
            f"data_path: {tiny_dataset}\n"
            f"output_dir: {tmp_path}\n"
            "batch_size: 2\nvoxel_grid_size: (16, 16, 16)\n"
            "max_epochs: 1\nnum_workers: 1\nearly_stop_metric: None\n"
            "val_split: 0.34\n"
        )
        run(load_config(str(cfg_yaml)))
        ckpt = os.path.join(str(tmp_path), "scenenet_ts40k", "checkpoints", "last.npz")
        out = str(tmp_path / "viz")
        visualize.main(["--config", str(cfg_yaml), "--checkpoint", ckpt,
                        "--out", out, "--n", "1"])
        assert os.path.exists(os.path.join(out, "sample0_pred.ply"))
        with open(os.path.join(out, "summary.json")) as f:
            summary = json.load(f)
        assert summary[0]["gt_voxels"] > 0


class TestDeviceCacheCLI:
    def test_device_cache_mode(self, tmp_path, small_cloud):
        """device_cache: true routes through fit_cached (HBM-resident
        dataset, one-scan-dispatch epochs) and still evaluates on the
        host-path test loader."""
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        for split in ("fit", "test"):
            (root / split).mkdir(parents=True)
            for i in range(4):
                np.save(root / split / f"s{i}.npy", small_cloud)
        cfg = ExperimentConfig(
            data_path=str(root), output_dir=str(tmp_path / "out"),
            batch_size=2, voxel_grid_size=(12, 12, 12), max_epochs=2,
            num_workers=1, early_stop_metric=None, val_split=0.0,
            device_voxelization=True, device_cache=True, augment=True,
            max_points=4096,
        )
        scores = run(cfg)
        assert np.isfinite(scores["train_loss"])
        assert np.isfinite(scores["test_loss"])

    def test_device_cache_grids_mode(self, tmp_path, small_cloud):
        """device_cache: "grids" routes through fit_grid_cached (voxelized
        grids resident, D4 augmentation)."""
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        for split in ("fit", "test"):
            (root / split).mkdir(parents=True)
            for i in range(4):
                np.save(root / split / f"s{i}.npy", small_cloud)
        cfg = ExperimentConfig(
            data_path=str(root), output_dir=str(tmp_path / "out"),
            batch_size=2, voxel_grid_size=(12, 12, 12), max_epochs=2,
            num_workers=1, early_stop_metric=None, val_split=0.0,
            device_voxelization=True, device_cache="grids", augment=True,
            max_points=4096,
        )
        scores = run(cfg)
        assert np.isfinite(scores["train_loss"])
        assert np.isfinite(scores["test_loss"])


class TestSetOverrides:
    def test_repeated_set_flags_all_apply(self):
        """Regression: nargs='*' alone drops earlier --set occurrences —
        both styles must work."""
        import argparse

        from scenenet_tpu.cli import train as cli

        parser = argparse.ArgumentParser()
        parser.add_argument("--set", action="extend", nargs="*", default=[])
        ns = parser.parse_args(["--set", "a=1", "--set", "b=2", "--set", "c=3", "d=4"])
        assert ns.set == ["a=1", "b=2", "c=3", "d=4"]


class TestDeviceCacheAuto:
    """VERDICT r2 #7: device_cache 'auto' picks the measured-best
    applicable pipeline and logs the decision."""

    def test_decisions(self, capsys):
        from scenenet_tpu.cli.train import _resolve_device_cache_auto
        from scenenet_tpu.utils.config import ExperimentConfig

        # stock config (no augmentation) → grid cache (fastest measured)
        assert _resolve_device_cache_auto(
            ExperimentConfig(data_path="x"), 2000) == "grids"
        # point-space augmentation requested → point cache (keeps
        # arbitrary-angle rotations)
        assert _resolve_device_cache_auto(
            ExperimentConfig(data_path="x", augment=True), 2000) == "points"
        # nothing fits the HBM budget → streaming loader
        assert _resolve_device_cache_auto(
            ExperimentConfig(data_path="x", voxel_grid_size=(256, 256, 256)),
            500_000) is False
        # host-voxelization path → no device cache
        assert _resolve_device_cache_auto(
            ExperimentConfig(data_path="x", device_voxelization=False),
            100) is False
        # stateful model (UNet BatchNorm) → scan-cached fits unsupported
        assert _resolve_device_cache_auto(
            ExperimentConfig(data_path="x", model="unet"), 100) is False
        out = capsys.readouterr().out
        assert "[device_cache auto]" in out

    def test_stock_default_is_auto(self):
        from scenenet_tpu.utils.config import load_config

        cfg = load_config("experiments/defaults.yaml")
        assert cfg.device_cache == "auto"
        assert cfg.augment is False  # reference parity: no augmentation


class TestNullCoercion:
    def test_null_strings_become_none(self, tmp_path):
        from scenenet_tpu.utils.config import load_config

        cfg = load_config(None, {"early_stop_metric": "null", "data_path": "x"})
        assert cfg.early_stop_metric is None
        cfg = load_config(None, {"early_stop_metric": "None", "data_path": "x"})
        assert cfg.early_stop_metric is None
        cfg = load_config(None, {"voxel_size": "null", "data_path": "x"})
        assert cfg.voxel_size is None


class TestGridOrder:
    def test_grid_zxy_non_square(self):
        """voxel_grid_size is (n_x, n_y, n_z) config order; tensors are
        (B, 1, Z, X, Y). A plain [::-1] would swap X and Y."""
        cfg = ExperimentConfig(voxel_grid_size=(32, 64, 256))
        assert cfg.grid_zxy() == (256, 32, 64)


class TestQuantilesCoercion:
    def test_stringified_tuple_parses(self):
        """The reference-style stringified spelling must reach the model
        AND criterion as floats — before this was a _TUPLE_FIELDS entry,
        "(0.1, 0.3)" silently became a 10-member tuple of characters."""
        cfg = load_config(None, {"data_path": "x",
                                 "quantiles": "(0.1, 0.3, 0.5, 0.9)"})
        assert cfg.quantiles == (0.1, 0.3, 0.5, 0.9)

    def test_yaml_list_and_scalar(self):
        cfg = load_config(None, {"data_path": "x", "quantiles": [0.25, 0.75]})
        assert cfg.quantiles == (0.25, 0.75)
        cfg = load_config(None, {"data_path": "x", "quantiles": 0.5})
        assert cfg.quantiles == (0.5,)
