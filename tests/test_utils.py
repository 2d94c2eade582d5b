"""Aux subsystems: viz export, proposals, calibration, export, plots,
profiling, quantile training integration."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp


class TestViz:
    def test_density_colors(self):
        from scenenet_tpu.utils.viz import voxelgrid_to_points

        grid = np.zeros((4, 4, 4))
        grid[0, 1, 2] = 1.0    # red
        grid[1, 2, 3] = -1.0   # blue
        pts = voxelgrid_to_points(grid, "density")
        assert pts.shape == (2, 6)
        red = pts[(pts[:, 0] == 1)][0]
        np.testing.assert_allclose(red[3:], [1, 0, 0])

    def test_ranges_drops_white(self):
        from scenenet_tpu.utils.viz import voxelgrid_to_points

        grid = np.zeros((4, 4, 4))
        grid[0, 0, 0] = 0.05   # below first range → dropped
        grid[1, 1, 1] = 0.95
        pts = voxelgrid_to_points(grid, "ranges")
        assert len(pts) == 1

    def test_pred_vs_gt_composite(self):
        from scenenet_tpu.utils.viz import pred_vs_gt_points

        pred = np.zeros((4, 4, 4)); gt = np.zeros((4, 4, 4))
        pred[0, 0, 0] = 1; gt[0, 0, 0] = 1   # TP → 1.0
        pred[1, 1, 1] = 1                    # FP → 0.8
        gt[2, 2, 2] = 1                      # FN → 0.2
        pts = pred_vs_gt_points(pred, gt)
        assert len(pts) == 3

    def test_write_ply_roundtrip_header(self, tmp_path):
        from scenenet_tpu.utils.viz import voxelgrid_to_points, write_ply

        grid = np.random.default_rng(0).random((4, 4, 4))
        pts = voxelgrid_to_points(grid, "density")
        path = str(tmp_path / "out.ply")
        write_ply(path, pts)
        head = open(path).read().splitlines()
        assert head[0] == "ply" and f"element vertex {len(pts)}" in head[2]


class TestProposals:
    def _tower_grid(self, at=(8, 8), height=12, size=16):
        grid = np.zeros((size, size, size))
        grid[2:2 + height, at[0], at[1]] = 1.0
        return grid

    def test_single_tower_proposal(self):
        from scenenet_tpu.utils.proposals import get_tower_proposals

        grid = self._tower_grid()
        props = get_tower_proposals(grid, density_grid=grid, min_dist=2.0,
                                    min_points=5, tau=0.5)
        assert props.shape == (1, 2)
        np.testing.assert_allclose(props[0], [8, 8], atol=0.5)

    def test_empty_grid(self):
        from scenenet_tpu.utils.proposals import get_tower_proposals

        props = get_tower_proposals(np.zeros((16, 16, 16)), tau=0.5)
        assert props.shape == (0, 2)

    def test_wall_filtered(self):
        from scenenet_tpu.utils.proposals import extract_towers_from_grid, filter_towers

        grid = np.zeros((16, 16, 16))
        grid[2:4, 4:14, 8] = 1.0  # flat, wide → wall
        towers, centroids = extract_towers_from_grid(grid, eps=2.0, min_points=5)
        assert len(towers) == 1
        kept, _ = filter_towers(towers, centroids, np.array([8.0, 8.0]),
                                threshold=1.75)
        assert len(kept) == 0

    def test_euc_dists(self):
        from scenenet_tpu.utils.proposals import compute_euc_dists

        gt = self._tower_grid(at=(8, 8))
        pred = self._tower_grid(at=(9, 8))
        dists = compute_euc_dists(pred, gt, min_dist=2.0, min_points=5, tau=0.5)
        assert len(dists) == 1
        g, p, d = dists[0]
        assert d == pytest.approx(1.0, abs=0.3)


class TestCalibration:
    def test_temperature_improves_overconfident(self):
        from scenenet_tpu.losses.segmentation import binary_cross_entropy
        from scenenet_tpu.utils.calibration import apply_temperature, fit_temperature

        rng = np.random.default_rng(0)
        # true probabilities, labels drawn from them, predictions pushed
        # toward the extremes (overconfident)
        p_true = np.clip(rng.random(4000), 0.05, 0.95).astype(np.float32)
        y = (rng.random(4000) < p_true).astype(np.float32)
        overconf = np.where(p_true > 0.5, p_true ** 0.25,
                            1 - (1 - p_true) ** 0.25).astype(np.float32)
        overconf = np.clip(overconf, 0.01, 0.99)
        t = fit_temperature(jnp.asarray(overconf), jnp.asarray(y))
        calibrated = apply_temperature(jnp.asarray(overconf), t)
        bce_before = float(jnp.mean(binary_cross_entropy(jnp.asarray(overconf), jnp.asarray(y))))
        bce_after = float(jnp.mean(binary_cross_entropy(calibrated, jnp.asarray(y))))
        assert t > 1.0  # overconfidence → temperature above 1
        assert bce_after < bce_before

    def test_platt(self):
        from scenenet_tpu.utils.calibration import apply_platt, fit_platt

        rng = np.random.default_rng(1)
        y = (rng.random(2000) > 0.5).astype(np.float32)
        p = np.clip(0.5 + (y - 0.5) * 0.2 + rng.normal(0, 0.05, 2000), 0.01, 0.99)
        a, b = fit_platt(jnp.asarray(p.astype(np.float32)), jnp.asarray(y))
        out = apply_platt(jnp.asarray(p.astype(np.float32)), a, b)
        assert np.isfinite(np.asarray(out)).all()


class TestExport:
    def test_stablehlo_roundtrip(self, tmp_path):
        from scenenet_tpu.models import SceneNet
        from scenenet_tpu.utils.export import export_forward, load_exported

        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        path = str(tmp_path / "scenenet.stablehlo")
        mlir = export_forward(net, params, (1, 1, 16, 16, 16), path)
        assert "stablehlo" in mlir or "module" in mlir
        fn = load_exported(path)
        x = jnp.zeros((1, 1, 16, 16, 16), jnp.float32)
        ref = net.apply(params, x)
        out = fn(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestPlots:
    def test_series_from_jsonl(self, tmp_path):
        from scenenet_tpu.utils.plots import load_series, plot_lambda_trajectories

        run = tmp_path
        with open(run / "params.jsonl", "w") as f:
            for i in range(3):
                f.write(json.dumps({"step": i, "lambda_cy_0": 0.1 * i,
                                    "cy_0.radius": 1.0 + i}) + "\n")
        series = load_series(str(run / "params.jsonl"))
        assert series["lambda_cy_0"] == [0.0, 0.1, 0.2]
        lams = plot_lambda_trajectories(str(run), out_png=str(run / "l.png"))
        assert "lambda_cy_0" in lams


class TestProfiling:
    def test_step_timer(self):
        from scenenet_tpu.utils.profiling import StepTimer

        t = StepTimer(window=3)
        for _ in range(5):
            t.start()
            t.stop()
        stats = t.stats()
        assert len(t.times) == 3 and stats["mean_s"] >= 0


class TestQuantileTraining:
    def test_quantile_fit_smoke(self, tmp_path):
        from scenenet_tpu.losses import QuantileGENEOLoss, WeightedMSE
        from scenenet_tpu.models import QuantileSceneNet
        from scenenet_tpu.train import TrainConfig, Trainer

        model, params = QuantileSceneNet.create(kernel_size=(9, 5, 5), seed=0)
        crit = QuantileGENEOLoss(w_mse=WeightedMSE.create(), convex_weight=1.0)
        cfg = TrainConfig(max_epochs=1, checkpoint_dir=str(tmp_path / "c"),
                          run_dir=str(tmp_path / "r"), early_stop_metric=None,
                          log_gradients=False)
        trainer = Trainer(model, crit, cfg)
        rng = np.random.default_rng(0)
        x = (rng.random((2, 1, 12, 12, 12)) > 0.9).astype(np.float32)
        y = (rng.random((2, 1, 12, 12, 12)) > 0.97).astype(np.float32)
        final, best = trainer.fit(params, [(x, y)])
        assert np.isfinite(best["train_loss"])
