"""Mesh (DP) training of the stateful UNet3D baseline with cross-replica
sync-BatchNorm: flax BatchNorm pmeans batch statistics over the data axis
inside shard_map, so the normalization AND the stored running statistics
use the GLOBAL batch — the sharded fit must match the single-device fit.
(This closes the 'stateless models only' mesh guard for the black-box
baseline family.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import UNet3D
from scenenet_tpu.parallel import make_mesh
from scenenet_tpu.train import Trainer, TrainConfig


@pytest.fixture(scope="module")
def devices8():
    assert len(jax.devices()) == 8
    return jax.devices()


def _criterion():
    return resolve_criterion("dice_bce")()


def _batches(n=2, b=8, g=16, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        x = (rng.random((b, 1, g, g, g)) > 0.9).astype(np.float32)
        y = (rng.random((b, 1, g, g, g)) > 0.97).astype(np.float32)
        out.append((x, y))
    return out


def _cfg(tmp_path, tag, **kw):
    base = dict(
        max_epochs=2, optimizer="sgd", learning_rate=1e-2,
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        run_dir=str(tmp_path / f"run_{tag}"),
        early_stop_metric=None, log_gradients=False)
    base.update(kw)
    return TrainConfig(**base)


def _assert_tree_close(a, b, rtol=5e-4, atol=1e-5):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


class TestUNetMeshFit:
    def test_fit_matches_single_device(self, devices8, tmp_path):
        batches = _batches()
        outs = []
        for tag, mesh in (("ref", None),
                          ("dp", make_mesh((8, 1), devices=devices8))):
            model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
            t = Trainer(model, _criterion(), _cfg(tmp_path, tag), mesh=mesh)
            final, best = t.fit(variables, batches, val_loader=batches[:1])
            outs.append((final, best))
        (ref_v, ref_best), (dp_v, dp_best) = outs
        # final variables include params AND the BN running statistics —
        # sync-BN means the mesh run's stats come from the same global
        # batches as the single-device run's. Tolerance: f32 reduction-
        # order noise amplified through 10 conv blocks × 4 SGD steps
        # (UNSYNCED per-shard BN — 1-sample statistics here — would differ
        # by orders of magnitude; the tight single-step pin is below)
        _assert_tree_close(dp_v, ref_v, rtol=5e-3, atol=5e-5)
        for k in ref_best:
            if k.endswith("_s"):
                continue
            # thresholded confusion metrics count voxels near tau=0.65 of
            # a near-0.5 untrained sigmoid — ~1e-4 pred noise flips a few
            # counts; losses are means and stay tight
            rel = 1e-3 if k.endswith("loss") else 5e-2
            assert dp_best[k] == pytest.approx(ref_best[k], rel=rel), k

    def test_single_step_stats_match_tightly(self, devices8):
        """One sync-BN training forward under shard_map vs single device:
        pred and the updated batch_stats must match to float rounding —
        the un-amplified pin of the sync-BN semantics."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        params, ms = model.split_variables(variables)
        (x, _), = _batches(n=1, b=8)

        ref_pred, ref_ms = jax.jit(model.apply_train)(params, ms, x)

        mesh = make_mesh((8, 1), devices=devices8)
        sync = model.with_bn_sync("data")
        bspec = P("data", None, None, None, None)
        got_pred, got_ms = jax.jit(shard_map(
            lambda p, m, x: sync.apply_train(p, m, x),
            mesh=mesh, in_specs=(P(), P(), bspec),
            out_specs=(bspec, P()), check_vma=False))(params, ms, x)
        # tolerance: BN's rsqrt(var) amplifies f32 reduction-order noise
        # through 10 blocks (~1e-4 rel); the DISCRIMINATOR is the unsynced
        # run below, which uses 1-sample per-shard statistics and must be
        # orders of magnitude further away
        np.testing.assert_allclose(np.asarray(got_pred),
                                   np.asarray(ref_pred),
                                   rtol=5e-4, atol=1e-4)
        _assert_tree_close(got_ms, ref_ms, rtol=5e-4, atol=1e-5)

        raw_pred, _ = jax.jit(shard_map(
            lambda p, m, x: model.apply_train(p, m, x),  # NO bn sync
            mesh=mesh, in_specs=(P(), P(), bspec),
            out_specs=(bspec, P()), check_vma=False))(params, ms, x)
        sync_err = float(jnp.max(jnp.abs(got_pred - ref_pred)))
        raw_err = float(jnp.max(jnp.abs(raw_pred - ref_pred)))
        assert raw_err > 100 * max(sync_err, 1e-7), (sync_err, raw_err)

    def test_eval_ragged_tail(self, devices8, tmp_path):
        """Stateful sharded eval: running stats, batch-replicated tail."""
        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        (x, y), = _batches(n=1, b=5)  # 5 % 8 != 0 → replicated variant
        params, ms = model.split_variables(variables)

        ref_pred = jax.jit(model.apply_eval)(params, ms, x)
        from scenenet_tpu.parallel.dp import make_sharded_eval_step
        from scenenet_tpu.train.metrics import init_metric_state

        mesh = make_mesh((8, 1), devices=devices8)
        step = make_sharded_eval_step(model, _criterion(), mesh)
        mstate, loss, pred = step(params, ms, init_metric_state(), x, y)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(ref_pred),
                                   rtol=1e-5, atol=1e-6)
        assert np.isfinite(float(loss))

    def test_guards(self, devices8, tmp_path):
        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        smesh = make_mesh((2, 4), devices=devices8)
        t = Trainer(model, _criterion(), _cfg(tmp_path, "sp"), mesh=smesh)
        with pytest.raises(ValueError, match="spatial sharding"):
            t.fit(variables, _batches(n=1))

        class _Stateful:
            is_stateful = True

        from scenenet_tpu.parallel.dp import make_local_train_step

        dmesh = make_mesh((8, 1), devices=devices8)
        with pytest.raises(ValueError, match="with_bn_sync"):
            make_local_train_step(_Stateful(), _criterion(), None, dmesh)

    def test_cli_unet_mesh_end_to_end(self, devices8, tmp_path):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        rng = np.random.default_rng(13)
        for split, n in [("fit", 16), ("test", 4)]:
            (root / split).mkdir(parents=True)
            for i in range(n):
                xyz = rng.uniform([0, 0, 0], [30, 30, 60], (1200, 3))
                labels = rng.choice([1, 2, 15], size=1200,
                                    p=[0.5, 0.35, 0.15])
                np.save(root / split / f"s{i}.npy",
                        np.concatenate([xyz, labels[:, None]], axis=1))
        cfg = ExperimentConfig(
            data_path=str(root), output_dir=str(tmp_path / "out"),
            batch_size=8, voxel_grid_size=(16, 16, 16), max_epochs=1,
            num_workers=2, early_stop_metric=None, val_split=0.25,
            model="unet", criterion="dice_bce", mesh_data=8)
        metrics = run(cfg)
        assert np.isfinite(metrics["test_loss"])
