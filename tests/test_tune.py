"""LR range test + batch-size probing + CLI dev switches (the reference
declares auto_lr_find / auto_scale_batch_size / fast_dev_run and wires
none — reference main.py:229,238-239; here they are implemented)."""

import numpy as np
import pytest

import jax.numpy as jnp

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import SceneNet
from scenenet_tpu.train.tune import find_max_batch_size, lr_range_test


def _toy(batch=2, grid=12, n=3, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        x = (rng.random((batch, 1, grid, grid, grid)) > 0.9).astype(np.float32)
        y = (rng.random((batch, 1, grid, grid, grid)) > 0.97).astype(np.float32)
        out.append((x, y))
    return out


class TestLrRangeTest:
    def test_suggests_in_range_and_builds_history(self):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        crit = resolve_criterion("focal_tversky")(
            tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6,
            focal_gamma=4)
        lr, hist = lr_range_test(net, crit, params, _toy(), min_lr=1e-4,
                                 max_lr=0.5, steps=12)
        assert 1e-4 <= lr <= 0.5
        assert len(hist) >= 3
        lrs = [h[0] for h in hist]
        assert lrs == sorted(lrs)  # geometric ramp
        # original params untouched (test trains a throwaway copy)
        assert all(np.isfinite(h[1]) for h in hist)

    def test_unknown_optimizer_raises(self):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        with pytest.raises(NotImplementedError):
            lr_range_test(net, lambda *a: jnp.zeros(()), params, _toy(),
                          optimizer="lbfgs")


class TestFindMaxBatchSize:
    def test_doubles_until_failure(self):
        calls = []

        def probe(b):
            calls.append(b)
            if b > 16:
                raise MemoryError("RESOURCE_EXHAUSTED (simulated)")

        assert find_max_batch_size(probe, start=2) == 16
        assert calls == [2, 4, 8, 16, 32]

    def test_start_failure_raises(self):
        def probe(b):
            raise MemoryError

        with pytest.raises(RuntimeError):
            find_max_batch_size(probe, start=4)


class TestCliDevSwitches:
    def _cfg(self, tmp_path, small_cloud, **kw):
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        for split in ("fit", "test"):
            (root / split).mkdir(parents=True)
            for i in range(4):
                np.save(root / split / f"s{i}.npy", small_cloud)
        base = dict(
            data_path=str(root), output_dir=str(tmp_path / "out"),
            batch_size=2, voxel_grid_size=(12, 12, 12), max_epochs=5,
            num_workers=1, early_stop_metric=None, val_split=0.0,
            device_voxelization=True, max_points=4096)
        base.update(kw)
        return ExperimentConfig(**base)

    def test_fast_dev_run(self, tmp_path, small_cloud):
        from scenenet_tpu.cli.train import run

        cfg = self._cfg(tmp_path, small_cloud, fast_dev_run=True)
        scores = run(cfg)
        assert np.isfinite(scores["test_loss"])

    def test_auto_lr_find_updates_lr(self, tmp_path, small_cloud, capsys):
        from scenenet_tpu.cli.train import run

        cfg = self._cfg(tmp_path, small_cloud, auto_lr_find=True,
                        max_epochs=1)
        scores = run(cfg)
        assert np.isfinite(scores["test_loss"])
        assert "[auto_lr_find] suggested learning_rate" in capsys.readouterr().out
