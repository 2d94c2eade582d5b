"""Ensemble parallelism (EP): the quantile ensemble's member axis as a
mesh axis (parallel/ep.py). Exactness is pinned against the plain
single-logical-device forward/step on identical data and params."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import QuantileSceneNet
from scenenet_tpu.parallel import (
    make_ensemble_eval_step,
    make_ensemble_inference_fn,
    make_ensemble_train_step,
    make_mesh,
)
from scenenet_tpu.train.metrics import init_metric_state
from scenenet_tpu.train.state import create_train_state

QUANTILES = (0.1, 0.3, 0.5, 0.9)


@pytest.fixture(scope="module")
def devices8():
    assert len(jax.devices()) == 8
    return jax.devices()


def _model(quantiles=QUANTILES):
    return QuantileSceneNet.create(
        {"cy": 1, "cone": 1, "neg": 1}, kernel_size=(9, 5, 5),
        quantiles=quantiles, seed=3)


def _criterion(kind="quantile_geneo", quantiles=QUANTILES):
    kw = dict(quantiles=quantiles, weight_alpha=1.0, weight_epsilon=0.1,
              mse_weight=1.0)
    if kind == "quantile_geneo":
        kw["convex_weight"] = 5.0
    return resolve_criterion(kind)(**kw)


def _batch(b=8, z=16, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.random((b, 1, z, 12, 12)) > 0.9).astype(np.float32)
    y = (rng.random((b, 1, z, 12, 12)) > 0.97).astype(np.float32)
    return x, y


def _single_device_step(model, criterion, tx, tau=0.65):
    """The Trainer's per-batch step semantics (train/loop.py:_build_steps),
    restated minimally for equality checks."""
    from scenenet_tpu.train.metrics import update_metrics

    @jax.jit
    def step(state, mstate, x, y):
        def loss_fn(params):
            pred = model.apply(params, x)
            cvx = model.cvx_coefficients(params)
            geneo = model.geneo_params_flat(params)
            return criterion(pred, y, cvx, geneo, model.last_lambda), pred

        (loss, pred), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        mstate = update_metrics(mstate, pred, y, tau)
        return new_state, mstate, loss, grads

    return step


def _assert_tree_close(a, b, rtol=2e-4, atol=1e-6):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=rtol, atol=atol)


class TestEnsembleInference:
    @pytest.mark.parametrize("shape", [(2, 4), (4, 2), (1, 4)])
    def test_matches_single_device(self, devices8, shape):
        model, params = _model()
        x, _ = _batch(b=8)
        ref = jax.jit(model.apply)(params, x)
        n = shape[0] * shape[1]
        mesh = make_mesh(shape, axis_names=("data", "model"),
                         devices=devices8[:n])
        run = make_ensemble_inference_fn(model, mesh)
        out = run(params, x)
        assert out.shape == (8, len(QUANTILES)) + x.shape[2:]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_indivisible_members_raise(self, devices8):
        model, _ = _model(quantiles=(0.1, 0.5, 0.9))
        mesh = make_mesh((4, 2), axis_names=("data", "model"),
                         devices=devices8)
        with pytest.raises(ValueError, match="do not divide"):
            make_ensemble_inference_fn(model, mesh)

    def test_non_ensemble_model_raises(self, devices8):
        from scenenet_tpu.models import SceneNet

        net, _ = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        mesh = make_mesh((4, 2), axis_names=("data", "model"),
                         devices=devices8)
        with pytest.raises(ValueError, match="member-stacked"):
            make_ensemble_inference_fn(net, mesh)


class TestEnsembleTrainStep:
    @pytest.mark.parametrize("kind", ["quantile", "quantile_geneo"])
    @pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
    def test_matches_single_device(self, devices8, shape, kind):
        model, params = _model()
        criterion = _criterion(kind)
        mask = model.trainable_mask(params)

        ref_state, ref_tx = create_train_state(params, "sgd", 1e-2, mask)
        ref_step = _single_device_step(model, criterion, ref_tx)

        mesh = make_mesh(shape, axis_names=("data", "model"),
                         devices=devices8)
        ep_state, ep_tx = create_train_state(params, "sgd", 1e-2, mask)
        ep_step = make_ensemble_train_step(model, criterion, ep_tx, mesh,
                                           with_grads=True)

        ref_m, ep_m = init_metric_state(), init_metric_state()
        for i in range(3):
            x, y = _batch(seed=i)
            ref_state, ref_m, ref_loss, ref_g = ref_step(ref_state, ref_m, x, y)
            ep_state, ep_m, ep_loss, ep_g = ep_step(ep_state, ep_m, x, y)
            np.testing.assert_allclose(float(ep_loss), float(ref_loss),
                                       rtol=2e-4)
            _assert_tree_close(ep_g, ref_g)
        _assert_tree_close(ep_state.params, ref_state.params)
        for a, b in zip(ep_m, ref_m):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_criterion_mismatch_raises(self, devices8):
        model, params = _model()
        mesh = make_mesh((4, 2), axis_names=("data", "model"),
                         devices=devices8)
        _, tx = create_train_state(params, "sgd", 1e-2,
                                   model.trainable_mask(params))
        with pytest.raises(ValueError, match="quantile criterion"):
            make_ensemble_train_step(
                model, resolve_criterion("mse")(), tx, mesh)
        with pytest.raises(ValueError, match="quantiles"):
            make_ensemble_train_step(
                model, _criterion(quantiles=(0.1, 0.2, 0.5, 0.9)), tx, mesh)

    def test_batch_prep_runs_shard_local(self, devices8):
        """Raw point batches: device voxelization inside the shard body."""
        from scenenet_tpu.train import make_device_voxelize_prep

        model, params = _model()
        criterion = _criterion()
        prep = make_device_voxelize_prep(grid_shape=(16, 12, 12),
                                         use_indices=False)
        rng = np.random.default_rng(5)
        pts = rng.uniform([0, 0, 0], [30, 30, 60], (8, 900, 3)).astype(np.float32)
        labels = rng.choice([1, 2, 15], size=(8, 900)).astype(np.int32)
        msk = np.ones((8, 900), bool)

        mask = model.trainable_mask(params)
        ref_state, ref_tx = create_train_state(params, "sgd", 1e-2, mask)
        ref_step = _single_device_step(model, criterion, ref_tx)
        xg, yg = jax.jit(prep)(pts, labels, msk)
        ref_state, ref_m, ref_loss, _ = ref_step(
            ref_state, init_metric_state(), xg, yg)

        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        ep_state, ep_tx = create_train_state(params, "sgd", 1e-2, mask)
        ep_step = make_ensemble_train_step(model, criterion, ep_tx, mesh,
                                           batch_prep=prep)
        ep_state, ep_m, ep_loss = ep_step(ep_state, init_metric_state(),
                                          pts, labels, msk)
        np.testing.assert_allclose(float(ep_loss), float(ref_loss), rtol=1e-5)
        _assert_tree_close(ep_state.params, ref_state.params)
        for a, b in zip(ep_m, ref_m):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEnsembleEvalStep:
    @pytest.mark.parametrize("b", [8, 5])  # 5: ragged tail → replicated
    def test_matches_single_device(self, devices8, b):
        from scenenet_tpu.train.metrics import update_metrics

        model, params = _model()
        criterion = _criterion()
        x, y = _batch(b=b)

        @jax.jit
        def ref_eval(params, mstate, x, y):
            pred = model.apply(params, x)
            loss = criterion(pred, y, model.cvx_coefficients(params),
                             model.geneo_params_flat(params),
                             model.last_lambda)
            return update_metrics(mstate, pred, y, 0.65), loss, pred

        ref_m, ref_loss, ref_pred = ref_eval(params, init_metric_state(), x, y)

        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        eval_step = make_ensemble_eval_step(model, criterion, mesh)
        ep_m, ep_loss, ep_pred = eval_step(params, None,
                                           init_metric_state(), x, y)
        np.testing.assert_allclose(float(ep_loss), float(ref_loss), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ep_pred), np.asarray(ref_pred),
                                   rtol=1e-5, atol=1e-6)
        for a, b_ in zip(ep_m, ref_m):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


class _GridBox:
    def __init__(self, n, g, seed):
        rng = np.random.default_rng(seed)
        self.x = jnp.asarray((rng.random((n, 1, g, g, g)) > 0.9), jnp.uint8)
        self.y = jnp.asarray((rng.random((n, 1, g, g, g)) > 0.97), jnp.uint8)

    def __len__(self):
        return int(self.x.shape[0])


def _cfg(tmp_path, tag, **kw):
    from scenenet_tpu.train import TrainConfig

    base = dict(
        max_epochs=2, optimizer="sgd", learning_rate=1e-2,
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        run_dir=str(tmp_path / f"run_{tag}"),
        early_stop_metric=None)
    base.update(kw)
    return TrainConfig(**base)


class TestTrainerEnsembleMesh:
    """Trainer(mesh=(data, model)) routes fit / evaluate / the cached
    epochs through the EP step — equality vs the single-device Trainer."""

    def test_fit_matches_single_device(self, devices8, tmp_path):
        from scenenet_tpu.train import Trainer

        batches = [
            _batch(seed=i) for i in range(3)
        ]
        outs = []
        for tag, mesh in (
                ("ref", None),
                ("ep", make_mesh((2, 4), axis_names=("data", "model"),
                                 devices=devices8))):
            model, params = _model()
            t = Trainer(model, _criterion(), _cfg(tmp_path, tag), mesh=mesh)
            final, best = t.fit(params, batches, val_loader=batches[:1])
            outs.append((final, best))
        (ref_p, ref_best), (ep_p, ep_best) = outs
        _assert_tree_close(ep_p, ref_p)
        for k in ref_best:
            if k.endswith("_s"):  # wall-clock keys (epoch_time_s)
                continue
            assert ep_best[k] == pytest.approx(ref_best[k], rel=3e-4), k

    @pytest.mark.parametrize("augment", [False, True])
    def test_fit_grid_cached_matches_single_device(self, devices8, tmp_path,
                                                   augment):
        from scenenet_tpu.train import Trainer

        outs = []
        for tag, mesh in (
                ("cref", None),
                ("cep", make_mesh((2, 4), axis_names=("data", "model"),
                                  devices=devices8))):
            grids = _GridBox(32, 12, 0)
            model, params = _model()
            t = Trainer(model, _criterion(), _cfg(tmp_path, tag + str(augment)),
                        mesh=mesh)
            final, best = t.fit_grid_cached(
                params, grids, batch_size=8, augment=augment,
                key=jax.random.PRNGKey(7))
            assert np.isfinite(best["train_loss"])
            outs.append((final, best))
        (ref_p, ref_best), (ep_p, ep_best) = outs
        _assert_tree_close(ep_p, ref_p)
        assert ep_best["train_loss"] == pytest.approx(
            ref_best["train_loss"], rel=3e-4)

    def test_space_and_model_axes_conflict(self, devices8, tmp_path):
        from scenenet_tpu.train import Trainer

        model, params = _model()
        mesh = make_mesh((2, 2, 2), axis_names=("data", "space", "model"),
                         devices=devices8)
        t = Trainer(model, _criterion(), _cfg(tmp_path, "conflict"),
                    mesh=mesh)
        with pytest.raises(ValueError, match="cannot combine"):
            t.fit(params, [_batch()])


class TestCliEnsembleMesh:
    def test_cli_ep_end_to_end(self, devices8, tmp_path):
        """model=quantile + mesh_data×mesh_ensemble from the CLI: device
        voxelization, EP cached epochs, sharded eval — a full run."""
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        rng = np.random.default_rng(13)
        for split, n in [("fit", 20), ("test", 4)]:
            (root / split).mkdir(parents=True)
            for i in range(n):
                xyz = rng.uniform([0, 0, 0], [30, 30, 60], (1500, 3))
                labels = rng.choice([1, 2, 15], size=1500,
                                    p=[0.5, 0.35, 0.15])
                np.save(root / split / f"s{i}.npy",
                        np.concatenate([xyz, labels[:, None]], axis=1))
        cfg = ExperimentConfig(
            data_path=str(root), output_dir=str(tmp_path / "out"),
            batch_size=8, voxel_grid_size=(12, 12, 16), max_epochs=2,
            num_workers=2, early_stop_metric=None, val_split=0.2,
            model="quantile", criterion="quantile_geneo",
            quantiles=(0.1, 0.3, 0.5, 0.9),
            mesh_data=2, mesh_ensemble=4)
        metrics = run(cfg)
        assert np.isfinite(metrics["test_loss"])

    def test_cli_ep_guards(self, tmp_path):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        base = dict(data_path=str(tmp_path), output_dir=str(tmp_path / "o"))
        with pytest.raises(ValueError, match="quantile ensemble"):
            run(ExperimentConfig(model="scenenet", mesh_data=2,
                                 mesh_ensemble=4, **base))
        with pytest.raises(ValueError, match="do not divide"):
            run(ExperimentConfig(model="quantile", mesh_data=2,
                                 mesh_ensemble=4, quantiles=(0.1, 0.5, 0.9),
                                 **base))
        with pytest.raises(ValueError, match="mutually exclusive"):
            run(ExperimentConfig(model="quantile", mesh_space=2,
                                 mesh_ensemble=4, quantiles=(0.1, 0.5, 0.9, 0.95),
                                 **base))

    def test_build_criterion_forwards_quantiles(self):
        """cfg.quantiles must reach the pinball loss (a silent-mismatch
        bug fixed alongside EP: criterion_params() is criterion-generic)."""
        from scenenet_tpu.cli.train import build_criterion
        from scenenet_tpu.utils.config import ExperimentConfig

        cfg = ExperimentConfig(model="quantile", criterion="quantile_geneo",
                               quantiles=(0.05, 0.25, 0.5, 0.75, 0.95))
        crit = build_criterion(cfg)
        assert crit.quantiles == (0.05, 0.25, 0.5, 0.75, 0.95)


class TestDegenerateEnsembleMesh:
    """A ('data', 'model') mesh with model-axis size 1 must train as pure
    DP (the dp path used to KeyError on the missing 'space' axis)."""

    def test_fit_routes_to_dp(self, devices8, tmp_path):
        from scenenet_tpu.train import Trainer

        batches = [_batch(seed=i) for i in range(2)]
        outs = []
        for tag, mesh in (
                ("dref", None),
                ("ddp", make_mesh((8, 1), axis_names=("data", "model"),
                                  devices=devices8))):
            model, params = _model()
            t = Trainer(model, _criterion(), _cfg(tmp_path, tag), mesh=mesh)
            final, _ = t.fit(params, batches)
            outs.append(final)
        _assert_tree_close(outs[1], outs[0])

    @pytest.mark.parametrize("b", [8, 5])  # 5: ragged tail, NO sharded axes
    def test_eval_ragged_tail_no_space_axis(self, devices8, b):
        from scenenet_tpu.parallel.dp import make_sharded_eval_step
        from scenenet_tpu.train.metrics import update_metrics

        model, params = _model()
        criterion = _criterion()
        x, y = _batch(b=b)

        @jax.jit
        def ref_eval(params, mstate, x, y):
            pred = model.apply(params, x)
            loss = criterion(pred, y, model.cvx_coefficients(params),
                             model.geneo_params_flat(params),
                             model.last_lambda)
            return update_metrics(mstate, pred, y, 0.65), loss, pred

        ref_m, ref_loss, _ = ref_eval(params, init_metric_state(), x, y)
        mesh = make_mesh((8, 1), axis_names=("data", "model"),
                         devices=devices8)
        eval_step = make_sharded_eval_step(model, criterion, mesh)
        got_m, got_loss, _ = eval_step(params, None, init_metric_state(), x, y)
        np.testing.assert_allclose(float(got_loss), float(ref_loss),
                                   rtol=2e-4)
        for a, b_ in zip(got_m, ref_m):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_missing_model_axis_raises(self, devices8):
        model, _ = _model()
        mesh = make_mesh((8, 1), devices=devices8)  # ('data', 'space')
        with pytest.raises(ValueError, match="no 'model' axis"):
            make_ensemble_inference_fn(model, mesh)


class TestEnsembleLinesearch:
    def test_lbfgs_ep_fit_matches_single_device(self, devices8, tmp_path):
        """Linesearch under EP: the identity-pmean value_fn keeps every
        shard's zoom while_loop in lockstep AND assembles the exact
        member-psum'd gradient (parallel/ep.py)."""
        from scenenet_tpu.train import Trainer

        batches = [_batch(seed=i) for i in range(2)]
        outs = []
        for tag, mesh in (
                ("lref", None),
                ("lep", make_mesh((2, 4), axis_names=("data", "model"),
                                  devices=devices8))):
            model, params = _model()
            cfg = _cfg(tmp_path, tag, optimizer="lbfgs", learning_rate=1e-1)
            t = Trainer(model, _criterion(), cfg, mesh=mesh)
            final, best = t.fit(params, batches)
            assert np.isfinite(best["train_loss"])
            outs.append((final, best))
        (ref_p, ref_best), (ep_p, ep_best) = outs
        _assert_tree_close(ep_p, ref_p, rtol=5e-3, atol=1e-5)
        assert ep_best["train_loss"] == pytest.approx(
            ref_best["train_loss"], rel=1e-3)

    def test_lbfgs_grid_cached_mesh_matches(self, devices8, tmp_path):
        """Linesearch inside the cached-epoch scan body under a DP×EP
        mesh (the needs_value_fn plumbing of _make_cached_sharded_update)."""
        from scenenet_tpu.train import Trainer

        outs = []
        for tag, mesh in (
                ("cl_ref", None),
                ("cl_ep", make_mesh((2, 4), axis_names=("data", "model"),
                                    devices=devices8))):
            grids = _GridBox(16, 12, 0)
            model, params = _model()
            cfg = _cfg(tmp_path, tag, optimizer="lbfgs", learning_rate=1e-1,
                       max_epochs=1)
            t = Trainer(model, _criterion(), cfg, mesh=mesh)
            final, best = t.fit_grid_cached(params, grids, batch_size=8,
                                            augment=False,
                                            key=jax.random.PRNGKey(3))
            assert np.isfinite(best["train_loss"])
            outs.append((final, best))
        (ref_p, _), (ep_p, _) = outs
        _assert_tree_close(ep_p, ref_p, rtol=5e-3, atol=1e-5)


class TestEnsembleMeshFeatures:
    """Trainer features interacting with the EP step: hybrid (DCN×ICI)
    meshes, gradient accumulation, and preemption/resume."""

    def test_hybrid_dcn_ep_mesh_fit(self, devices8, tmp_path):
        """mesh_dcn_data × mesh_ensemble: DP across emulated slices over
        DCN, members inside a slice — the CLI's hybrid-EP composition."""
        from scenenet_tpu.parallel import make_hybrid_mesh
        from scenenet_tpu.train import Trainer

        batches = [_batch(seed=i) for i in range(2)]
        outs = []
        for tag, mesh in (
                ("href", None),
                ("hep", make_hybrid_mesh((2, 1), (1, 4),
                                         axis_names=("data", "model"),
                                         devices=devices8))):
            model, params = _model()
            t = Trainer(model, _criterion(), _cfg(tmp_path, tag), mesh=mesh)
            final, best = t.fit(params, batches)
            assert np.isfinite(best["train_loss"])
            outs.append(final)
        _assert_tree_close(outs[1], outs[0])

    def test_preempt_resume_matches_unkilled(self, devices8, tmp_path):
        import os

        from scenenet_tpu.train import Trainer
        from scenenet_tpu.train import preempt as pre

        batches = [_batch(seed=i) for i in range(4)]
        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        model, params = _model()

        full = Trainer(model, _criterion(), _cfg(tmp_path, "pfull"),
                       mesh=mesh)
        full_params, _ = full.fit(params, batches)

        class PreemptAfter:
            def __init__(self):
                self.armed = True

            def __iter__(self):
                for i, b in enumerate(batches):
                    if self.armed and i == 2:
                        pre.request_preemption()
                        self.armed = False
                    yield b

            def __len__(self):
                return len(batches)

        cfg = _cfg(tmp_path, "pkill")
        killed = Trainer(model, _criterion(), cfg, mesh=mesh)
        _, _ = killed.fit(params, PreemptAfter())
        assert killed.preempted
        snap = os.path.join(cfg.checkpoint_dir, pre.SNAPSHOT_NAME)
        assert os.path.exists(snap)

        resumed = Trainer(model, _criterion(), cfg, mesh=mesh)
        res_params, _ = resumed.fit(params, batches, resume_from=snap)
        _assert_tree_close(res_params, full_params, rtol=0, atol=0)
