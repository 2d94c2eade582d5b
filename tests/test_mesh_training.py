"""Mesh training as a user-facing feature: Trainer(mesh=...) and the CLI
mesh_data/mesh_space/mesh_dcn_data knobs route the per-batch fit through
the exactness-tested sharded step (DP × spatial halo conv). Equality is
checked against the plain single-logical-device Trainer on identical data
and seeds."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import SceneNet
from scenenet_tpu.parallel import make_hybrid_mesh, make_mesh
from scenenet_tpu.train import Trainer, TrainConfig, make_device_voxelize_prep


@pytest.fixture(scope="module")
def devices8():
    assert len(jax.devices()) == 8
    return jax.devices()


def _criterion():
    return resolve_criterion("geneo_tversky")(
        weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
        tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4,
    )


def _grid_batches(n=3, b=8, z=16):
    rng = np.random.default_rng(11)
    out = []
    for _ in range(n):
        x = (rng.random((b, 1, z, 12, 12)) > 0.9).astype(np.float32)
        y = (rng.random((b, 1, z, 12, 12)) > 0.97).astype(np.float32)
        out.append((x, y))
    return out


def _raw_batches(n=2, b=8, npts=1500):
    rng = np.random.default_rng(12)
    out = []
    for _ in range(n):
        pts = rng.uniform([0, 0, 0], [30, 30, 60], (b, npts, 3)).astype(np.float32)
        labels = rng.choice([1, 2, 15], size=(b, npts)).astype(np.int32)
        mask = np.ones((b, npts), bool)
        out.append((pts, labels, mask))
    return out


def _cfg(tmp_path, tag, **kw):
    base = dict(
        max_epochs=2, optimizer="sgd", learning_rate=1e-2,
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        run_dir=str(tmp_path / f"run_{tag}"),
        early_stop_metric=None)
    base.update(kw)
    return TrainConfig(**base)


def _assert_tree_close(a, b, rtol=2e-4, atol=1e-6):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=rtol, atol=atol)


class TestTrainerMesh:
    @pytest.mark.parametrize("shape", [(8, 1), (2, 4)])
    def test_fit_matches_single_device(self, devices8, tmp_path, shape):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        batches = _grid_batches()

        ref = Trainer(net, _criterion(), _cfg(tmp_path, "ref"))
        ref_params, ref_best = ref.fit(params, batches,
                                       val_loader=batches[:1])

        mesh = make_mesh(shape, devices=devices8)
        mt = Trainer(net, _criterion(), _cfg(tmp_path, f"mesh{shape[0]}"),
                     mesh=mesh)
        mesh_params, mesh_best = mt.fit(params, batches,
                                        val_loader=batches[:1])

        _assert_tree_close(mesh_params, ref_params)
        # f32 psum reduction-order noise only
        assert mesh_best["train_loss"] == pytest.approx(
            ref_best["train_loss"], rel=3e-4)
        assert mesh_best["train_F1Score"] == pytest.approx(
            ref_best["train_F1Score"], rel=1e-5)

    def test_fit_raw_prep_shard_local_matches(self, devices8, tmp_path):
        """Pure-DP mesh with device voxelization: the prep runs INSIDE
        shard_map on each shard's local samples and must equal the
        single-device prep + fit."""
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        prep = make_device_voxelize_prep((16, 16, 16), (15,),
                                         use_indices=False)
        batches = _raw_batches()

        ref = Trainer(net, _criterion(), _cfg(tmp_path, "refp"),
                      batch_prep=prep)
        ref_params, ref_best = ref.fit(params, batches)

        mesh = make_mesh((8, 1), devices=devices8)
        mt = Trainer(net, _criterion(), _cfg(tmp_path, "meshp"),
                     batch_prep=prep, mesh=mesh)
        mesh_params, mesh_best = mt.fit(params, batches)

        _assert_tree_close(mesh_params, ref_params)
        assert mesh_best["train_loss"] == pytest.approx(
            ref_best["train_loss"], rel=3e-4)

    def test_hybrid_mesh_fit_runs(self, devices8, tmp_path):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        mesh = make_hybrid_mesh((2, 1), (2, 2))
        mt = Trainer(net, _criterion(), _cfg(tmp_path, "hyb"), mesh=mesh)
        final, best = mt.fit(params, _grid_batches(n=2))
        assert np.isfinite(best["train_loss"])

    def test_indivisible_batch_raises(self, devices8, tmp_path):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        mesh = make_mesh((8, 1), devices=devices8)
        mt = Trainer(net, _criterion(), _cfg(tmp_path, "bad"), mesh=mesh)
        bad = [(np.zeros((3, 1, 16, 12, 12), np.float32),
                np.zeros((3, 1, 16, 12, 12), np.float32))]
        with pytest.raises(ValueError, match="not divisible"):
            mt.fit(params, bad)

    def test_bf16_mesh_fit_matches_single_device(self, devices8, tmp_path):
        """precision=bf16 under the mesh: the shard bodies apply the same
        mixed-precision rule as the single-device Trainer._loss (bf16
        forward, f32 masters + f32 loss accumulation)."""
        batches = _grid_batches(n=2)
        outs = []
        for tag, mesh in (("bref", None),
                          ("bmesh", make_mesh((8, 1), devices=devices8))):
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
            cfg = _cfg(tmp_path, tag, precision="bf16")
            t = Trainer(net, _criterion(), cfg, mesh=mesh)
            final, best = t.fit(params, batches, val_loader=batches[:1])
            assert np.isfinite(best["train_loss"])
            outs.append((final, best))
        (ref_p, ref_best), (mesh_p, mesh_best) = outs
        _assert_tree_close(mesh_p, ref_p, rtol=1e-3, atol=1e-5)
        for k in ("train_loss", "val_loss"):
            assert mesh_best[k] == pytest.approx(ref_best[k], rel=1e-3), k

    def test_lbfgs_mesh_fit_matches_single_device(self, devices8, tmp_path):
        """Linesearch optimizers now run under the mesh: the shard-local
        value_fn computes the GLOBAL (distributed + pmean'd) loss, and
        replicated params/grads keep the zoom linesearch's while_loop in
        SPMD lockstep on every shard."""
        batches = _grid_batches(n=2)
        outs = []
        for tag, mesh in (("lref", None),
                          ("lmesh", make_mesh((8, 1), devices=devices8))):
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
            cfg = _cfg(tmp_path, tag, optimizer="lbfgs", learning_rate=1e-1,
                       max_epochs=2)
            t = Trainer(net, _criterion(), cfg, mesh=mesh)
            final, best = t.fit(params, batches)
            assert np.isfinite(best["train_loss"])
            outs.append((final, best))
        (ref_p, ref_best), (mesh_p, mesh_best) = outs
        # linesearch amplifies reduction-order noise (step-size decisions
        # feed back into the iterates) — looser than the sgd/adam pins
        _assert_tree_close(mesh_p, ref_p, rtol=5e-3, atol=1e-5)
        assert mesh_best["train_loss"] == pytest.approx(
            ref_best["train_loss"], rel=1e-3)

    def test_unsupported_combinations_raise(self, devices8, tmp_path):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        mesh = make_mesh((8, 1), devices=devices8)
        batches = _grid_batches(n=1)

        from scenenet_tpu.models import CnnBaseline

        # pure-DP (space=1) accepts any stateless model; the SceneNet
        # forward protocol is required only once Z is spatially sharded
        cnn, cparams = CnnBaseline.create(kernel_size=(3, 3, 3), seed=0)
        smesh = make_mesh((2, 4), devices=devices8)
        mt = Trainer(cnn, _criterion(), _cfg(tmp_path, "cnn"), mesh=smesh)
        with pytest.raises(ValueError, match="SceneNet forward protocol"):
            mt.fit(cparams, batches)


class TestCLIMesh:
    @pytest.fixture(scope="class")
    def dataset(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("ts40k_mesh")
        rng = np.random.default_rng(3)
        for split, n in [("fit", 16), ("test", 2)]:
            (root / split).mkdir()
            for i in range(n):
                m = int(rng.integers(1500, 2500))
                xyz = rng.uniform([0, 0, 0], [30, 30, 60], (m, 3))
                labels = rng.choice([1, 2, 15], size=m, p=[0.5, 0.35, 0.15])
                np.save(root / split / f"sample_{i}.npy",
                        np.concatenate([xyz, labels[:, None]], axis=1))
        return str(root)

    def test_cli_mesh_data_end_to_end(self, dataset, tmp_path):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        cfg = ExperimentConfig(
            data_path=dataset, output_dir=str(tmp_path), batch_size=8,
            voxel_grid_size=(16, 16, 16), kernel_size=(9, 5, 5),
            max_epochs=1, num_workers=2, early_stop_metric=None,
            val_split=0.25, mesh_data=4, mesh_space=2,
        )
        scores = run(cfg)
        assert np.isfinite(scores["train_loss"])
        assert "test_F1Score" in scores

    def test_cli_mesh_validation(self, dataset, tmp_path):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        base = dict(data_path=dataset, output_dir=str(tmp_path),
                    voxel_grid_size=(16, 16, 16), max_epochs=1,
                    early_stop_metric=None)
        with pytest.raises(ValueError, match="devices"):
            run(ExperimentConfig(batch_size=4, mesh_data=3, **base))
        # cnn is fine pure-DP; spatial sharding stays scenenet-only
        with pytest.raises(ValueError, match="scenenet"):
            run(ExperimentConfig(batch_size=8, mesh_data=4, mesh_space=2,
                                 model="cnn", **base))
        # unet now trains pure-DP under a mesh (sync-BN,
        # tests/test_unet_mesh.py); the non-DP axes stay rejected by the
        # axis-specific guards (spatial sharding is scenenet-only)
        with pytest.raises(ValueError, match="scenenet"):
            run(ExperimentConfig(batch_size=8, mesh_data=4, mesh_space=2,
                                 model="unet", **base))
        with pytest.raises(ValueError, match="divide"):
            run(ExperimentConfig(batch_size=6, mesh_data=4, mesh_space=2,
                                 **base))


class TestMeshEval:
    """Eval under a mesh runs sharded (same per-device memory envelope as
    the train step); ragged tail batches take the batch-replicated,
    space-sharded variant — both must match single-device evaluation."""

    def test_evaluate_matches_with_ragged_tail(self, devices8, tmp_path):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        rng = np.random.default_rng(21)
        loader = []
        for b in (8, 5):  # 5 does NOT divide the 2-way data axis
            x = (rng.random((b, 1, 16, 12, 12)) > 0.9).astype(np.float32)
            y = (rng.random((b, 1, 16, 12, 12)) > 0.97).astype(np.float32)
            loader.append((x, y))

        ref = Trainer(net, _criterion(), _cfg(tmp_path, "er"))
        ref_scores = ref.evaluate(params, loader)

        mesh = make_mesh((2, 4), devices=devices8)
        mt = Trainer(net, _criterion(), _cfg(tmp_path, "em"), mesh=mesh)
        mesh_scores = mt.evaluate(params, loader)

        for k, v in ref_scores.items():
            assert mesh_scores[k] == pytest.approx(v, rel=3e-4, abs=1e-6), k

    def test_fit_with_ragged_val_loader(self, devices8, tmp_path):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        mesh = make_mesh((8, 1), devices=devices8)
        mt = Trainer(net, _criterion(), _cfg(tmp_path, "fv"), mesh=mesh)
        rng = np.random.default_rng(22)
        val = [(np.asarray((rng.random((3, 1, 16, 12, 12)) > 0.9), np.float32),
                np.asarray((rng.random((3, 1, 16, 12, 12)) > 0.97), np.float32))]
        final, best = mt.fit(params, _grid_batches(n=2), val_loader=val)
        assert np.isfinite(best["val_loss"])

    def test_cli_mesh_dataset_too_small(self, tmp_path):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "tiny"
        rng = np.random.default_rng(9)
        for split, n in [("fit", 3), ("test", 1)]:
            (root / split).mkdir(parents=True)
            for i in range(n):
                xyz = rng.uniform([0, 0, 0], [30, 30, 60], (1500, 3))
                labels = rng.choice([1, 2, 15], size=1500)
                np.save(root / split / f"s{i}.npy",
                        np.concatenate([xyz, labels[:, None]], axis=1))
        with pytest.raises(ValueError, match="at least one full batch"):
            run(ExperimentConfig(
                data_path=str(root), output_dir=str(tmp_path),
                batch_size=8, voxel_grid_size=(16, 16, 16), max_epochs=1,
                early_stop_metric=None, val_split=0.0, mesh_data=8))


class TestMeshOtherModels:
    """Pure-DP (space=1) mesh training covers the whole stateless model
    family: plain apply per shard, no halo forward needed."""

    def test_cnn_pure_dp_matches(self, devices8, tmp_path):
        from scenenet_tpu.models import CnnBaseline

        cnn, cparams = CnnBaseline.create(kernel_size=(3, 3, 3), seed=0)
        batches = _grid_batches(n=2)
        ref = Trainer(cnn, _criterion(), _cfg(tmp_path, "cref"))
        ref_params, ref_best = ref.fit(cparams, batches)
        mesh = make_mesh((8, 1), devices=devices8)
        mt = Trainer(cnn, _criterion(), _cfg(tmp_path, "cmesh"), mesh=mesh)
        mesh_params, mesh_best = mt.fit(cparams, batches)
        _assert_tree_close(mesh_params, ref_params)
        assert mesh_best["train_loss"] == pytest.approx(
            ref_best["train_loss"], rel=3e-4)

    def test_quantile_pure_dp_matches(self, devices8, tmp_path):
        """QuantileLoss carries axis_names now: its w_mse weights are
        globally normalized and the final mean pmean'd, so the sharded
        pinball loss equals the single-device one."""
        from scenenet_tpu.models import QuantileSceneNet

        qnet, qparams = QuantileSceneNet.create(kernel_size=(9, 5, 5),
                                                seed=0)
        crit = resolve_criterion("quantile_geneo")(
            weight_alpha=1, weight_epsilon=0.1, mse_weight=1,
            convex_weight=5)
        batches = _grid_batches(n=2)
        ref = Trainer(qnet, crit, _cfg(tmp_path, "qref"))
        ref_params, ref_best = ref.fit(qparams, batches)
        mesh = make_mesh((8, 1), devices=devices8)
        mt = Trainer(qnet, crit, _cfg(tmp_path, "qmesh"), mesh=mesh)
        mesh_params, mesh_best = mt.fit(qparams, batches)
        _assert_tree_close(mesh_params, ref_params)
        assert mesh_best["train_loss"] == pytest.approx(
            ref_best["train_loss"], rel=3e-4)

    def test_iou_loss_distributed_matches(self, devices8):
        """IoULoss psums its global intersection/union under sharding —
        the true global IoU, not a mean of per-shard IoUs (which differs
        whenever shards have different positive densities)."""
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from scenenet_tpu.losses.segmentation import IoULoss
        from scenenet_tpu.parallel.dp import make_distributed

        mesh = make_mesh((8, 1), devices=devices8)
        rng = np.random.default_rng(31)
        # deliberately skewed positives so per-shard IoUs differ
        pred = (rng.random((8, 1, 8, 8, 8)) ** 3).astype(np.float32)
        target = (rng.random((8, 1, 8, 8, 8)) > 0.99).astype(np.float32)
        target[:2] = (rng.random((2, 1, 8, 8, 8)) > 0.6).astype(np.float32)

        # axes match the batch's actual sharding (data only here; the
        # production steps shard over both axes and run check_vma=False)
        iou = make_distributed(IoULoss(), ("data",))
        spec = P("data", None, None, None, None)
        fn = jax.jit(shard_map(
            lambda p, t: iou(p, t), mesh=mesh,
            in_specs=(spec, spec), out_specs=P(), check_vma=False))
        sharding = NamedSharding(mesh, spec)
        loss_s = fn(jax.device_put(jnp.asarray(pred), sharding),
                    jax.device_put(jnp.asarray(target), sharding))
        loss_r = IoULoss()(jnp.asarray(pred), jnp.asarray(target))
        np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-6)


class TestRegistryShardingExactness:
    """Every registry criterion, computed inside shard_map on the
    data-sharded batch after make_distributed, must equal its unsharded
    value — the guarantee mesh training relies on for ANY configured
    criterion, not just the default geneo_tversky."""

    NAMES = ["mse", "dice", "dice_bce", "tversky", "focal_tversky",
             "geneo", "geneo_dice", "geneo_dice_bce", "geneo_tversky",
             "quantile", "quantile_geneo"]

    @pytest.mark.parametrize("name", NAMES)
    def test_sharded_equals_unsharded(self, devices8, name):
        self._check(devices8, name)

    @pytest.mark.parametrize("name", ["dice", "dice_bce"])
    def test_sum_reduction_sharded(self, devices8, name):
        """reduction='sum' needs a psum (a pmean'd per-shard sum would be
        global_sum / n_shards)."""
        self._check(devices8, name, reduction="sum")

    def _check(self, devices8, name, **crit_kw):
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from scenenet_tpu.parallel.dp import make_distributed

        crit = resolve_criterion(name)(
            weight_alpha=1, weight_epsilon=0.1, mse_weight=1,
            convex_weight=5, tversky_alpha=2, tversky_beta=1,
            tversky_smooth=1e-6, focal_gamma=4, **crit_kw)
        rng = np.random.default_rng(41)
        quantile = name.startswith("quantile")
        # skewed positives per sample so per-shard statistics differ
        thresh = np.linspace(0.6, 0.99, 8).reshape(8, 1, 1, 1, 1)
        y = (rng.random((8, 1, 8, 8, 8)) > thresh).astype(np.float32)
        pshape = (8, 3, 8, 8, 8) if quantile else (8, 1, 8, 8, 8)
        pred = (rng.random(pshape) ** 2).astype(np.float32)
        # GENEO penalty inputs are replicated params: identical per shard
        cvx = {"l0": jnp.asarray(0.4), "l1": jnp.asarray(-0.1)}
        geneo = {"r": jnp.asarray(-0.3), "s": jnp.asarray(0.7)}
        last = "l1"  # the derived-λ key the GENEO convexity penalty reads
        if quantile:
            cvx, geneo = [cvx, cvx], [geneo, geneo]

        ref = crit(jnp.asarray(pred), jnp.asarray(y), cvx, geneo, last)

        mesh = make_mesh((8, 1), devices=devices8)
        dist = make_distributed(crit, ("data",))
        spec = P("data", None, None, None, None)
        fn = jax.jit(shard_map(
            lambda p, t: jax.lax.pmean(dist(p, t, cvx, geneo, last),
                                       ("data",)),
            mesh=mesh, in_specs=(spec, spec), out_specs=P(),
            check_vma=False))
        sharding = NamedSharding(mesh, spec)
        loss_s = fn(jax.device_put(jnp.asarray(pred), sharding),
                    jax.device_put(jnp.asarray(y), sharding))
        np.testing.assert_allclose(float(loss_s), float(ref), rtol=2e-5)


class TestMeshFitFeatures:
    """Trainer features that interact with the sharded step: gradient
    accumulation and mid-epoch preemption/resume must behave identically
    to the single-device fit."""

    def test_grad_accumulation_matches(self, devices8, tmp_path):
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        batches = _grid_batches(n=4)
        cfg_kw = dict(max_epochs=1, accumulate_grad_batches=2)

        ref = Trainer(net, _criterion(),
                      _cfg(tmp_path, "aref", **cfg_kw))
        ref_params, _ = ref.fit(params, batches)

        mesh = make_mesh((2, 4), devices=devices8)
        mt = Trainer(net, _criterion(),
                     _cfg(tmp_path, "amesh", **cfg_kw), mesh=mesh)
        mesh_params, _ = mt.fit(params, batches)
        _assert_tree_close(mesh_params, ref_params)

    def test_preempt_resume_matches_unkilled(self, devices8, tmp_path):
        """request_preemption() mid-epoch under the mesh: the snapshot +
        resume must land on the same params as an uninterrupted run."""
        from scenenet_tpu.train import preempt as pre

        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        batches = _grid_batches(n=4)
        mesh = make_mesh((2, 4), devices=devices8)

        full = Trainer(net, _criterion(), _cfg(tmp_path, "pfull"),
                       mesh=mesh)
        full_params, _ = full.fit(params, batches)

        class PreemptAfter:
            """Loader that requests preemption after yielding 2 batches
            of the FIRST epoch (the fit flushes at the batch boundary)."""

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
        killed = Trainer(net, _criterion(), cfg, mesh=mesh)
        _, _ = killed.fit(params, PreemptAfter())
        assert killed.preempted
        snap = os.path.join(cfg.checkpoint_dir, pre.SNAPSHOT_NAME)
        assert os.path.exists(snap)

        resumed = Trainer(net, _criterion(), cfg, mesh=mesh)
        res_params, _ = resumed.fit(params, batches, resume_from=snap)
        _assert_tree_close(res_params, full_params, rtol=0, atol=0)


class _GridBox:
    def __init__(self, n, g, seed):
        rng = np.random.default_rng(seed)
        self.x = jnp.asarray((rng.random((n, 1, g, g, g)) > 0.9), jnp.uint8)
        self.y = jnp.asarray((rng.random((n, 1, g, g, g)) > 0.97), jnp.uint8)

    def __len__(self):
        return int(self.x.shape[0])


class TestMeshCachedEpochs:
    """fit_grid_cached under a pure-DP mesh: replicated cache + shard_map'd
    compute with batch composition IDENTICAL to the single-device scan —
    final params must match to psum reduction order."""

    @pytest.mark.parametrize("augment", [False, True])
    def test_matches_single_device(self, devices8, tmp_path, augment):
        outs = []
        for tag, mesh in (("sref", None),
                          ("smesh", make_mesh((8, 1), devices=devices8))):
            grids = _GridBox(48, 12, 0)
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
            cfg = _cfg(tmp_path, tag + str(augment), max_epochs=2,
                       epoch_chunks=2)
            t = Trainer(net, _criterion(), cfg, mesh=mesh)
            final, best = t.fit_grid_cached(
                params, grids, batch_size=8, augment=augment,
                key=jax.random.PRNGKey(11))
            assert np.isfinite(best["train_loss"])
            outs.append((final, best))
        (ref, ref_best), (mesh_p, mesh_best) = outs
        _assert_tree_close(mesh_p, ref)
        assert mesh_best["train_loss"] == pytest.approx(
            ref_best["train_loss"], rel=3e-4)

    def test_guards(self, devices8, tmp_path):
        grids = _GridBox(16, 12, 0)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
        smesh = make_mesh((2, 4), devices=devices8)
        t = Trainer(net, _criterion(), _cfg(tmp_path, "gsp"), mesh=smesh)
        with pytest.raises(ValueError, match="pure-DP"):
            t.fit_grid_cached(params, grids, batch_size=8)
        dmesh = make_mesh((8, 1), devices=devices8)
        t = Trainer(net, _criterion(), _cfg(tmp_path, "gdiv"), mesh=dmesh)
        with pytest.raises(ValueError, match="divide"):
            t.fit_grid_cached(params, grids, batch_size=6)

    def test_cli_mesh_grid_cache_end_to_end(self, devices8, tmp_path):
        """device_cache: grids + mesh_data runs DP cached epochs from
        the CLI."""
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        rng = np.random.default_rng(13)
        for split, n in [("fit", 20), ("test", 2)]:
            (root / split).mkdir(parents=True)
            for i in range(n):
                xyz = rng.uniform([0, 0, 0], [30, 30, 60], (1500, 3))
                labels = rng.choice([1, 2, 15], size=1500,
                                    p=[0.5, 0.35, 0.15])
                np.save(root / split / f"s{i}.npy",
                        np.concatenate([xyz, labels[:, None]], axis=1))
        cfg = ExperimentConfig(
            data_path=str(root), output_dir=str(tmp_path), batch_size=8,
            voxel_grid_size=(16, 16, 16), max_epochs=2, num_workers=2,
            early_stop_metric=None, val_split=0.2, mesh_data=8,
            device_cache="grids",
        )
        scores = run(cfg)
        assert np.isfinite(scores["train_loss"])
        assert "test_F1Score" in scores


class _PointBox:
    def __init__(self, n, npts, seed):
        rng = np.random.default_rng(seed)
        self.points = jnp.asarray(
            rng.uniform([0, 0, 0], [30, 30, 60], (n, npts, 3)), jnp.float32)
        self.labels = jnp.asarray(
            rng.choice([1, 2, 15], size=(n, npts)), jnp.int32)
        self.mask = jnp.ones((n, npts), bool)

    def __len__(self):
        return int(self.points.shape[0])


class TestMeshPointCachedEpochs:
    """fit_cached under a pure-DP mesh: replicated point cache, replicated
    augmentation (identical batch composition), shard-local voxelization
    + compute — must match the single-device scan."""

    @pytest.mark.parametrize("augment", [False, True])
    def test_matches_single_device(self, devices8, tmp_path, augment):
        prep = make_device_voxelize_prep((16, 16, 16), (15,),
                                         use_indices=False)
        outs = []
        for tag, mesh in (("pc_ref", None),
                          ("pc_mesh", make_mesh((8, 1), devices=devices8))):
            cache = _PointBox(32, 1200, 5)
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
            cfg = _cfg(tmp_path, tag + str(augment), max_epochs=2)
            t = Trainer(net, _criterion(), cfg, batch_prep=prep, mesh=mesh)
            final, best = t.fit_cached(
                params, cache, batch_size=8, augment=augment,
                key=jax.random.PRNGKey(7))
            assert np.isfinite(best["train_loss"])
            outs.append((final, best))
        (ref, ref_best), (mesh_p, mesh_best) = outs
        _assert_tree_close(mesh_p, ref)
        assert mesh_best["train_loss"] == pytest.approx(
            ref_best["train_loss"], rel=3e-4)


class TestCachedAccumulation:
    """The cached-epoch fits honor accumulate_grad_batches (they silently
    ignored it before): with K identical batches and accumulate=K, the
    mini-step gradients are all computed at the initial params, so the
    epoch equals exactly ONE optimizer step on that batch."""

    def _uniform_grids(self, n, g=12, seed=4):
        rng = np.random.default_rng(seed)
        x1 = (rng.random((1, 1, g, g, g)) > 0.9).astype(np.uint8)
        y1 = (rng.random((1, 1, g, g, g)) > 0.97).astype(np.uint8)

        class Box:
            x = jnp.asarray(np.repeat(x1, n, 0))
            y = jnp.asarray(np.repeat(y1, n, 0))

            def __len__(self):
                return n

        return Box()

    @pytest.mark.parametrize("use_mesh", [False, True])
    def test_acc2_equals_one_step(self, devices8, tmp_path, use_mesh):
        mesh = make_mesh((8, 1), devices=devices8) if use_mesh else None
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)

        t2 = Trainer(net, _criterion(),
                     _cfg(tmp_path, f"acc2{use_mesh}", max_epochs=1,
                          accumulate_grad_batches=2), mesh=mesh)
        acc_params, _ = t2.fit_grid_cached(
            params, self._uniform_grids(16), batch_size=8, augment=False,
            key=jax.random.PRNGKey(0))

        t1 = Trainer(net, _criterion(),
                     _cfg(tmp_path, f"acc1{use_mesh}", max_epochs=1),
                     mesh=mesh)
        one_params, _ = t1.fit_grid_cached(
            params, self._uniform_grids(8), batch_size=8, augment=False,
            key=jax.random.PRNGKey(0))

        _assert_tree_close(acc_params, one_params)


class TestMeshEvaluateCached:
    def test_matches_single_device_with_tail(self, devices8, tmp_path):
        """One-scan cached evaluation under the mesh (incl. the ragged
        replicated tail) equals the single-device scores."""
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        ref = Trainer(net, _criterion(), _cfg(tmp_path, "ecr"))
        ref_scores = ref.evaluate_cached(params, _GridBox(21, 12, 2),
                                         batch_size=8)
        mesh = make_mesh((8, 1), devices=devices8)
        mt = Trainer(net, _criterion(), _cfg(tmp_path, "ecm"), mesh=mesh)
        mesh_scores = mt.evaluate_cached(params, _GridBox(21, 12, 2),
                                         batch_size=8)
        for k, v in ref_scores.items():
            assert mesh_scores[k] == pytest.approx(v, rel=3e-4, abs=1e-6), k


class TestMeshCachedPreempt:
    def test_chunk_resume_matches_unkilled_under_mesh(self, devices8,
                                                      tmp_path):
        """Chunk-boundary preemption + resume of the DP cached-epoch fit:
        the snapshot stores replicated mesh arrays and the resumed run
        must land on the same params as an uninterrupted mesh run."""
        from scenenet_tpu.train.preempt import request_preemption

        mesh = make_mesh((8, 1), devices=devices8)

        def trainer(tag):
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
            return Trainer(net, _criterion(),
                           _cfg(tmp_path, tag, max_epochs=2, epoch_chunks=2),
                           mesh=mesh), params

        straight, params = trainer("mc_s")
        want, _ = straight.fit_grid_cached(params, _GridBox(32, 12, 1),
                                           batch_size=8, augment=True,
                                           key=jax.random.PRNGKey(4))

        t1, params1 = trainer("mc_k")
        request_preemption()
        t1.fit_grid_cached(params1, _GridBox(32, 12, 1), batch_size=8,
                           augment=True, key=jax.random.PRNGKey(4))
        assert t1.preempted
        snap = os.path.join(t1.config.checkpoint_dir, "preempt.npz")
        assert os.path.exists(snap)

        t2, params2 = trainer("mc_r")
        got, _ = t2.fit_grid_cached(params2, _GridBox(32, 12, 1),
                                    batch_size=8, augment=True,
                                    key=jax.random.PRNGKey(4),
                                    resume_from=snap)
        _assert_tree_close(got, want, rtol=0, atol=0)


class TestSingleCompileCarry:
    """The sharded steps' carried outputs come back committed to the
    replicated sharding; without ensure_replicated the host-initial first
    call used a second jit cache key, so every mesh fit silently compiled
    its step twice (measured 14.2 s + 12.4 s at 64³ b16 on a v5e —
    benchmarks/mesh_smoke_tpu.py). Pin: three carried calls, ONE compile."""

    def _n_compiles(self, step):
        return sum(j._cache_size() for j in step._jits())

    def test_dp_grid_step_compiles_once(self, devices8):
        from scenenet_tpu.parallel import make_sharded_train_step

        mesh = make_mesh((2, 4), devices=devices8)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        from scenenet_tpu.train.state import create_train_state
        from scenenet_tpu.train.metrics import init_metric_state

        state, tx = create_train_state(params, "sgd", 1e-2,
                                       net.trainable_mask(params))
        step = make_sharded_train_step(net, _criterion(), tx, mesh)
        x, y = _grid_batches(n=1)[0]
        m = init_metric_state()
        s = state
        for _ in range(3):
            s, m, _ = step(s, m, x, y)
        assert self._n_compiles(step) == 1

    def test_dp_raw_step_compiles_once(self, devices8):
        from scenenet_tpu.parallel import make_sharded_train_step

        mesh = make_mesh((8, 1), devices=devices8)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        from scenenet_tpu.train.state import create_train_state
        from scenenet_tpu.train.metrics import init_metric_state

        state, tx = create_train_state(params, "sgd", 1e-2,
                                       net.trainable_mask(params))
        prep = make_device_voxelize_prep((16, 12, 12), keep_labels=(15,))
        step = make_sharded_train_step(net, _criterion(), tx, mesh,
                                       batch_prep=prep)
        raw = _raw_batches(n=1)[0]
        m = init_metric_state()
        s = state
        for _ in range(3):
            s, m, _ = step(s, m, *raw)
        assert self._n_compiles(step) == 1

    def test_ep_step_compiles_once(self, devices8):
        from scenenet_tpu.losses import resolve_criterion
        from scenenet_tpu.models import QuantileSceneNet
        from scenenet_tpu.parallel import make_ensemble_train_step
        from scenenet_tpu.train.state import create_train_state
        from scenenet_tpu.train.metrics import init_metric_state

        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        qs = (0.1, 0.3, 0.5, 0.9)
        net, params = QuantileSceneNet.create(
            {"cy": 1, "cone": 1, "neg": 1}, kernel_size=(9, 5, 5),
            quantiles=qs, seed=3)
        crit = resolve_criterion("quantile")(
            quantiles=qs, weight_alpha=1.0, weight_epsilon=0.1,
            mse_weight=1.0)
        state, tx = create_train_state(params, "sgd", 1e-2,
                                       net.trainable_mask(params))
        step = make_ensemble_train_step(net, crit, tx, mesh)
        x, y = _grid_batches(n=1)[0]
        m = init_metric_state()
        s = state
        for _ in range(3):
            s, m, _ = step(s, m, x, y)
        assert self._n_compiles(step) == 1

    def test_cached_chunk_fn_compiles_once(self, devices8, tmp_path):
        """The cached-epoch chunk dispatcher is the costliest program in
        the codebase; pin that the carried (state, mstate, loss_sum, key)
        does not split its jit cache key across epochs (uniform chunk
        partition → exactly one entry). Covers fit_grid_cached and
        fit_cached (point cache)."""
        mesh = make_mesh((8, 1), devices=devices8)

        grids = _GridBox(32, 12, 0)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
        t = Trainer(net, _criterion(), _cfg(tmp_path, "cc1", max_epochs=3),
                    mesh=mesh)
        t.fit_grid_cached(params, grids, batch_size=8,
                          key=jax.random.PRNGKey(2))
        assert t._chunk_jit._cache_size() == 1

        pts = _PointBox(16, 800, 1)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
        t = Trainer(net, _criterion(), _cfg(tmp_path, "cc2", max_epochs=3),
                    batch_prep=make_device_voxelize_prep(
                        (16, 12, 12), (15,), use_indices=False),
                    mesh=mesh)
        t.fit_cached(params, pts, batch_size=8, key=jax.random.PRNGKey(2))
        assert t._chunk_jit._cache_size() == 1
