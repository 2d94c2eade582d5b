"""On-device training pipeline: PointCloudLoader + fused device
voxelization inside the jitted train step, equivalent to the host path."""

import numpy as np
import pytest

import jax.numpy as jnp

from scenenet_tpu.data import Compose, PointPadding, ToFullDense, Voxelization
from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import SceneNet
from scenenet_tpu.train import TrainConfig, Trainer, make_device_voxelize_prep


class _Cloud:
    def __init__(self, clouds, transform):
        self.clouds = clouds
        self.transform = transform

    def __len__(self):
        return len(self.clouds)

    def __getitem__(self, i):
        c = self.clouds[i]
        return self.transform((c[:, :3], c[:, 3]))


@pytest.fixture()
def clouds(small_cloud):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(4):
        n = int(rng.integers(2000, 3000))
        xyz = rng.uniform([0, 0, 0], [30, 30, 60], (n, 3))
        labels = rng.choice([1, 2, 15], size=n, p=[0.5, 0.35, 0.15])
        out.append(np.concatenate([xyz, labels[:, None]], axis=1))
    return out


class TestDevicePipeline:
    def test_prep_matches_host_transform(self, clouds):
        grid = (16, 16, 16)
        prep = make_device_voxelize_prep(grid, (15,), use_indices=True)
        pad = PointPadding(max_points=4096, vxg_size=grid)
        host_t = Compose([Voxelization([15], vxg_size=grid), ToFullDense((True, True))])

        pts, labs, mask, idx = (np.stack(a) for a in zip(*[pad((c[:, :3], c[:, 3])) for c in clouds]))
        x_dev, y_dev = prep(jnp.asarray(pts), jnp.asarray(labs),
                            jnp.asarray(mask), jnp.asarray(idx))
        for b, c in enumerate(clouds):
            x_host, y_host = host_t((c[:, :3], c[:, 3]))
            np.testing.assert_allclose(np.asarray(x_dev[b, 0]), x_host[0], atol=1e-6)
            np.testing.assert_allclose(np.asarray(y_dev[b, 0]), y_host[0], atol=1e-6)

    def test_fit_through_device_voxelization(self, clouds, tmp_path):
        from scenenet_tpu.data.loader import PointCloudLoader

        grid = (16, 16, 16)
        ds = _Cloud(clouds, PointPadding(max_points=4096, vxg_size=grid))
        loader = PointCloudLoader(ds, batch_size=2, num_workers=2)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        crit = resolve_criterion("geneo_tversky")(
            weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
            tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4)
        cfg = TrainConfig(max_epochs=2, checkpoint_dir=str(tmp_path / "c"),
                          run_dir=str(tmp_path / "r"), early_stop_metric=None,
                          log_gradients=False)
        trainer = Trainer(net, crit, cfg,
                          batch_prep=make_device_voxelize_prep(grid, (15,)))
        final, best = trainer.fit(params, loader, val_loader=loader)
        assert np.isfinite(best["train_loss"])
        assert "val_F1Score" in best
        preds = list(trainer.predict(final, loader))
        assert preds[0].shape == (2, 1, 16, 16, 16)
