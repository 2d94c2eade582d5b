"""Checkpoint resume + point-cloud logging + legacy compat details."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import SceneNet
from scenenet_tpu.train import TrainConfig, Trainer
from scenenet_tpu.train.checkpoint import restore_checkpoint


def _batches(n=2, seed=0):
    rng = np.random.default_rng(seed)
    return [
        ((rng.random((2, 1, 12, 12, 12)) > 0.9).astype(np.float32),
         (rng.random((2, 1, 12, 12, 12)) > 0.97).astype(np.float32))
        for _ in range(n)
    ]


class TestResume:
    def test_cli_resume_roundtrip(self, tmp_path, small_cloud):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        for split in ("fit", "test"):
            (root / split).mkdir(parents=True)
            for i in range(4):
                np.save(root / split / f"s{i}.npy", small_cloud)
        base = dict(
            data_path=str(root), output_dir=str(tmp_path / "out"),
            batch_size=2, voxel_grid_size=(12, 12, 12), max_epochs=1,
            num_workers=1, early_stop_metric=None, val_split=0.3,
            device_voxelization=False,
        )
        run(ExperimentConfig(**base))
        ckpt_dir = os.path.join(str(tmp_path / "out"), "scenenet_ts40k", "checkpoints")
        assert os.path.exists(os.path.join(ckpt_dir, "last.npz"))
        # resume from the produced checkpoint
        scores = run(ExperimentConfig(**base, resume_from_checkpoint=True,
                                      resume_checkpoint_name="last"))
        assert np.isfinite(scores["train_loss"])

    def test_cli_resume_missing_raises(self, tmp_path, small_cloud):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        for split in ("fit", "test"):
            (root / split).mkdir(parents=True)
            np.save(root / split / "s0.npy", small_cloud)
        cfg = ExperimentConfig(
            data_path=str(root), output_dir=str(tmp_path / "out"),
            resume_from_checkpoint=True, resume_checkpoint_name="nope",
            device_voxelization=False,
        )
        # fail-fast on missing checkpoint, like the reference (main.py:107)
        with pytest.raises(FileNotFoundError):
            run(cfg)


class TestPointCloudLogging:
    def test_plys_exported_on_schedule(self, tmp_path):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        crit = resolve_criterion("mse")()
        cfg = TrainConfig(max_epochs=2, checkpoint_dir=str(tmp_path / "c"),
                          run_dir=str(tmp_path / "r"), early_stop_metric=None,
                          log_gradients=False, log_pointclouds_every=1)
        trainer = Trainer(net, crit, cfg)
        trainer.fit(params, _batches(), val_loader=_batches(1))
        pc_dir = tmp_path / "r" / "pointclouds"
        names = sorted(os.listdir(pc_dir))
        assert "epoch0_pred.ply" in names and "epoch1_input.ply" in names


class TestLegacyCompat:
    def test_legacy_gnet_pt_phi_migration(self, tmp_path):
        import torch

        from scenenet_tpu.compat import load_legacy_state_dict

        sd = {
            "geneos.cy_0.geneo_params.radius": torch.tensor(1.5),
            "phis_dict.phi_cy_0": torch.tensor(0.3),
        }
        blob = {"models": {"best_loss": {"model_state_dict": sd}},
                "model_props": {"geneos_used": {"cy": 1}}}
        path = str(tmp_path / "gnet.pt")
        torch.save(blob, path)
        out = load_legacy_state_dict(path, model_tag="loss")
        assert "lambdas_dict.lambda_cy_0" in out  # phi → lambda migration
        assert float(out["geneos.cy_0.geneo_params.radius"]) == 1.5
