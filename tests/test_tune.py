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


class TestAutotuneBackend:
    def _crit(self):
        return resolve_criterion("focal_tversky")(
            tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6,
            focal_gamma=4)

    def test_measures_picks_and_caches(self, tmp_path, monkeypatch):
        from scenenet_tpu.train import tune as tune_mod

        calls = []

        def fake_measure(model, criterion, params, x, y, optimizer="sgd",
                         iters=6):
            calls.append(model.backend)
            return {"xla": 5.0, "pallas": 2.0}[model.backend]

        monkeypatch.setattr(tune_mod, "measure_train_step_ms", fake_measure)
        cache = str(tmp_path / "autotune.json")
        make = lambda b: SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                         backend=b)
        winner, times = tune_mod.autotune_backend(
            make, self._crit(), 2, (12, 12, 12),
            candidates=("xla", "pallas"), cache_path=cache)
        assert winner == "pallas" and times["xla"] == 5.0
        assert calls == ["xla", "pallas"]

        # cache hit: no re-measurement
        winner2, times2 = tune_mod.autotune_backend(
            make, self._crit(), 2, (12, 12, 12),
            candidates=("xla", "pallas"), cache_path=cache)
        assert (winner2, times2) == (winner, times) and len(calls) == 2

        # different shape = different key = fresh measurement
        tune_mod.autotune_backend(
            make, self._crit(), 4, (12, 12, 12),
            candidates=("xla", "pallas"), cache_path=cache)
        assert len(calls) == 4

        # refresh forces re-measurement of a cached key
        tune_mod.autotune_backend(
            make, self._crit(), 2, (12, 12, 12),
            candidates=("xla", "pallas"), cache_path=cache, refresh=True)
        assert len(calls) == 6

    def test_real_measurement_runs(self, tmp_path):
        """Unmocked path: one real timed train step per candidate on the
        test backend (tiny shapes; xla only — pallas interpret timing is
        meaningless on CPU)."""
        from scenenet_tpu.train.tune import autotune_backend

        make = lambda b: SceneNet.create(kernel_size=(3, 3, 3), seed=0,
                                         backend=b)
        winner, times = autotune_backend(
            make, self._crit(), 2, (8, 8, 8), candidates=("xla",),
            iters=2, cache_path=str(tmp_path / "c.json"))
        assert winner == "xla" and times["xla"] > 0

    def test_cli_rejects_non_scenenet(self, tmp_path):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        with pytest.raises(ValueError, match="autotune"):
            run(ExperimentConfig(data_path=str(tmp_path), model="cnn",
                                 model_backend="autotune",
                                 output_dir=str(tmp_path)))

    def test_cli_autotune_fallback_off_tpu(self, tmp_path, small_cloud,
                                           capsys):
        """On a non-TPU backend the autotune knob degrades to the static
        'auto' rule instead of timing meaningless interpret-mode kernels."""
        from scenenet_tpu.cli.train import run

        helper = TestCliDevSwitches()
        cfg = helper._cfg(tmp_path, small_cloud, fast_dev_run=True,
                          model_backend="autotune")
        scores = run(cfg)
        assert np.isfinite(scores["test_loss"])
        assert "[autotune] non-TPU backend" in capsys.readouterr().out


class TestAutotuneRobustness:
    def _crit(self):
        return resolve_criterion("focal_tversky")(
            tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6,
            focal_gamma=4)

    def test_oom_candidate_is_skipped(self, tmp_path, monkeypatch):
        from scenenet_tpu.train import tune as tune_mod

        def fake(model, criterion, params, x, y, optimizer="sgd", iters=6):
            if model.backend == "pallas_mxu":
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory "
                                   "allocating 1TB")
            return 3.0

        monkeypatch.setattr(tune_mod, "measure_train_step_ms", fake)
        make = lambda b: SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                         backend=b)
        winner, times = tune_mod.autotune_backend(
            make, self._crit(), 2, (12, 12, 12),
            candidates=("pallas", "pallas_mxu"),
            cache_path=str(tmp_path / "c.json"))
        assert winner == "pallas"
        assert times["pallas_mxu"] == float("inf")

    def test_all_candidates_oom_raises(self, tmp_path, monkeypatch):
        from scenenet_tpu.train import tune as tune_mod

        def fake(*a, **k):
            raise MemoryError

        monkeypatch.setattr(tune_mod, "measure_train_step_ms", fake)
        make = lambda b: SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                         backend=b)
        with pytest.raises(RuntimeError, match="OOM"):
            tune_mod.autotune_backend(
                make, self._crit(), 2, (12, 12, 12), candidates=("xla",),
                cache_path=str(tmp_path / "c.json"))

    def test_non_oom_error_propagates(self, tmp_path, monkeypatch):
        from scenenet_tpu.train import tune as tune_mod

        def fake(*a, **k):
            raise TypeError("shape bug")

        monkeypatch.setattr(tune_mod, "measure_train_step_ms", fake)
        make = lambda b: SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                         backend=b)
        with pytest.raises(TypeError):
            tune_mod.autotune_backend(
                make, self._crit(), 2, (12, 12, 12), candidates=("xla",),
                cache_path=str(tmp_path / "c.json"))

    def test_lbfgs_measurement_runs(self):
        """Linesearch optimizers supply value/grad/value_fn to tx.update
        like the real train step does."""
        from scenenet_tpu.train.tune import measure_train_step_ms

        net, params = SceneNet.create(kernel_size=(3, 3, 3), seed=0,
                                      backend="xla")
        rng = np.random.default_rng(0)
        x = jnp.asarray((rng.random((2, 1, 8, 8, 8)) > 0.9)
                        .astype(np.float32))
        y = jnp.asarray((rng.random((2, 1, 8, 8, 8)) > 0.97)
                        .astype(np.float32))
        ms = measure_train_step_ms(net, self._crit(), params, x, y,
                                   optimizer="lbfgs", iters=2)
        assert ms > 0
