"""Reference-checkpoint import: load the bundled Lightning run's trained
weights into the JAX SceneNet and run them end-to-end on a fixture."""

import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

CKPT_GLOB = "/root/reference/experiments/scenenet_ts40k/wandb/run-*/files/checkpoints/*.ckpt"

pytestmark = pytest.mark.skipif(
    not glob.glob(CKPT_GLOB), reason="reference checkpoints not available"
)


@pytest.fixture(scope="module")
def ckpt_path():
    paths = sorted(glob.glob(CKPT_GLOB))
    return [p for p in paths if "FBetaScore.ckpt" in p][0]


class TestLightningImport:
    def test_load_raw(self, ckpt_path):
        from scenenet_tpu.compat import load_lightning_checkpoint

        ck = load_lightning_checkpoint(ckpt_path)
        assert "model.geneos.cy_0.geneo_params.radius" in ck["state_dict"]
        assert ck["hyper_parameters"]["kernel_size"] == (9, 5, 5)

    def test_import_params(self, ckpt_path):
        from scenenet_tpu.compat import import_scenenet_params

        model, params = import_scenenet_params(ckpt_path)
        assert model.kernel_size == (9, 5, 5)
        lams = np.asarray(model.effective_lambdas(params))
        # the reference stores coefficients synced to sum 1
        assert np.isclose(lams.sum(), 1.0, atol=1e-5)
        assert params["geneo"]["cone_0"]["apex"] == 0.0  # trained run value

    def test_imported_model_forward(self, ckpt_path, sample_clouds):
        from scenenet_tpu.compat import import_scenenet_params
        from scenenet_tpu.ops.voxel_np import (
            compute_grid_spec, hist_on_voxel_np, reg_on_voxel_np,
        )

        model, params = import_scenenet_params(ckpt_path)
        cloud = sample_clouds[0]
        spec = compute_grid_spec(cloud[:, :3], (64, 64, 64))
        hist = hist_on_voxel_np(cloud[:, :3], spec=spec)
        x = jnp.asarray((hist > 0)[None, None].astype(np.float32))
        pred = np.asarray(model.apply(params, x))
        assert np.isfinite(pred).all()
        assert pred.min() >= 0 and pred.max() <= 1
        # a trained model should fire on some voxels of a real tower crop
        assert (pred > 0).sum() > 0

    def test_scan_model_zoo(self, ckpt_path):
        from scenenet_tpu.compat import scan_model_zoo

        report = scan_model_zoo(os.path.dirname(ckpt_path))
        kinds = {e["kind"] for e in report}
        assert "lightning" in kinds
        assert len(report) >= 20  # the run ships 24 checkpoints
