"""End-to-end learnability regression: SCENE-Net must learn to segment
synthetic towers from scratch through the full pipeline (voxelize →
GENEO conv → constrained loss → optax) in a few CPU epochs."""

import numpy as np
import pytest

import jax.numpy as jnp

from scenenet_tpu.data import Compose, ToFullDense, Voxelization
from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import SceneNet
from scenenet_tpu.train import TrainConfig, Trainer
from scenenet_tpu.train.metrics import compute_metrics, init_metric_state, update_metrics


def _tower_scene(rng, n_ground=3000, n_tower=450):
    """Flat ground + one dense vertical tower, TS40K-crop-like."""
    ground = np.column_stack([
        rng.uniform(0, 30, n_ground), rng.uniform(0, 30, n_ground),
        rng.normal(0.5, 0.3, n_ground),
    ])
    cx, cy = rng.uniform(8, 22, 2)
    tower = np.column_stack([
        rng.normal(cx, 0.4, n_tower), rng.normal(cy, 0.4, n_tower),
        rng.uniform(0, 25, n_tower),
    ])
    xyz = np.concatenate([ground, tower])
    labels = np.concatenate([np.full(n_ground, 2.0), np.full(n_tower, 15.0)])
    return xyz, labels


class TestLearnability:
    def test_scenenet_learns_towers(self, tmp_path):
        rng = np.random.default_rng(0)
        transform = Compose([Voxelization([15], vxg_size=(24, 24, 24)),
                             ToFullDense((True, True))])
        batches = []
        for _ in range(6):
            xs, ys = [], []
            for _ in range(2):
                x, y = transform(_tower_scene(rng))
                xs.append(x)
                ys.append(y)
            batches.append((np.stack(xs), np.stack(ys)))

        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=1)
        crit = resolve_criterion("geneo_tversky")(
            weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
            tversky_alpha=1.0, tversky_beta=1.0, tversky_smooth=1e-6,
            focal_gamma=1.0,
        )
        cfg = TrainConfig(max_epochs=25, optimizer="adam", learning_rate=2e-2,
                          checkpoint_dir=str(tmp_path / "c"),
                          run_dir=str(tmp_path / "r"),
                          early_stop_metric=None, log_gradients=False)
        trainer = Trainer(net, crit, cfg)
        final, best = trainer.fit(params, batches)

        # fresh scenes: the trained model must beat the untrained one clearly
        eval_batches = []
        for _ in range(3):
            x, y = transform(_tower_scene(rng))
            eval_batches.append((x[None], y[None]))

        def f1_of(p):
            state = init_metric_state()
            for x, y in eval_batches:
                pred = net.apply(p, jnp.asarray(x))
                state = update_metrics(state, pred, jnp.asarray(y), 0.5)
            return float(compute_metrics(state)["F1Score"])

        f1_before = f1_of(params)
        f1_after = f1_of(final)
        assert best["train_loss"] < 1.0
        assert f1_after > 0.25, f"trained F1 too low: {f1_after}"
        assert f1_after > f1_before + 0.1, (f1_before, f1_after)

        # convexity held through training
        lams = np.asarray(net.effective_lambdas(final))
        assert np.isclose(lams.sum(), 1.0, atol=1e-5)
