"""ADMM constrained training: multipliers drive constraint satisfaction."""

import numpy as np

import jax.numpy as jnp

from scenenet_tpu.losses import WeightedMSE
from scenenet_tpu.models import SceneNet
from scenenet_tpu.train.admm import ADMMConfig, ADMMTrainer, _constraint_values


def _batches(n=2, seed=0):
    rng = np.random.default_rng(seed)
    return [
        ((rng.random((2, 1, 12, 12, 12)) > 0.9).astype(np.float32),
         (rng.random((2, 1, 12, 12, 12)) > 0.97).astype(np.float32))
        for _ in range(n)
    ]


class TestADMMCLI:
    def test_cli_admm_mode(self, tmp_path, small_cloud):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        for split in ("fit", "test"):
            (root / split).mkdir(parents=True)
            for i in range(4):
                np.save(root / split / f"s{i}.npy", small_cloud)
        cfg = ExperimentConfig(
            data_path=str(root), output_dir=str(tmp_path / "out"),
            batch_size=2, voxel_grid_size=(12, 12, 12), max_epochs=2,
            num_workers=1, early_stop_metric=None, val_split=0.3,
            device_voxelization=False, constrained="admm", admm_rho=2.0,
        )
        scores = run(cfg)
        assert np.isfinite(scores["train_loss"])


class TestADMM:
    def test_reduces_constraint_violation(self, tmp_path):
        # seed 5 draws a negative λ at init (v2 init range is [-2/n, 1/n])
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=5)
        start_violation = float(jnp.maximum(-_constraint_values(net, params), 0).max())
        # pick a seed that actually starts infeasible
        seed = 5
        while start_violation == 0.0 and seed < 30:
            seed += 1
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=seed)
            start_violation = float(jnp.maximum(-_constraint_values(net, params), 0).max())
        assert start_violation > 0, "no infeasible init found"

        cfg = ADMMConfig(max_epochs=6, admm_rho=5.0, optimizer="adam",
                         learning_rate=5e-2,
                         checkpoint_dir=str(tmp_path / "c"),
                         run_dir=str(tmp_path / "r"), log_gradients=False)
        trainer = ADMMTrainer(net, WeightedMSE.create(), cfg)
        final, best = trainer.fit(params, _batches())
        end_violation = float(jnp.maximum(-_constraint_values(net, final), 0).max())
        assert end_violation < start_violation * 0.5
        assert trainer.history[-1]["mu_norm"] >= 0
        assert np.isfinite(best["train_loss"])


class TestADMMLbfgs:
    def test_lbfgs_admm_trains_single_compile(self, tmp_path):
        """admm_config.yml's optimizer/lr (lbfgs, 0.8) trains under ADMM,
        and the whole outer x inner loop compiles exactly once (mu is a
        step argument, not a baked constant) — VERDICT r1 #9."""
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=5)
        cfg = ADMMConfig(max_epochs=5, admm_rho=5.0, optimizer="lbfgs",
                         learning_rate=0.8,
                         checkpoint_dir=str(tmp_path / "c"),
                         run_dir=str(tmp_path / "r"), log_gradients=False)
        traces = {"n": 0}

        def prep(x, y):
            traces["n"] += 1  # incremented only when the step is (re)traced
            return x, y

        trainer = ADMMTrainer(net, WeightedMSE.create(), cfg, batch_prep=prep)
        final, best = trainer.fit(params, _batches(), None)
        # ≤2: one initial trace + at most one weak-type promotion retrace
        # after the first optimizer update; crucially NOT one per dual epoch
        # (5 epochs × 2 batches = 10 steps here)
        assert traces["n"] <= 2, f"step retraced {traces['n']} times"
        assert np.isfinite(best["train_loss"])
        start_violation = float(jnp.maximum(-_constraint_values(net, params), 0).max())
        end_violation = float(jnp.maximum(-_constraint_values(net, final), 0).max())
        assert end_violation < start_violation


class TestADMMValAndCheckpoints:
    def test_val_scores_checkpoints_early_stop(self, tmp_path):
        """val_loader is consumed (val_* scores recorded), per-metric
        checkpoints are written, and restore_best works — previously fit()
        silently ignored all three config intents."""
        import os

        import jax

        from scenenet_tpu.losses import resolve_criterion

        rng = np.random.default_rng(0)
        batches = [((rng.random((2, 1, 12, 12, 12)) > 0.9).astype(np.float32),
                    (rng.random((2, 1, 12, 12, 12)) > 0.97).astype(np.float32))
                   for _ in range(3)]
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        cfg = ADMMConfig(max_epochs=2, optimizer="adam", learning_rate=1e-2,
                         checkpoint_dir=str(tmp_path / "c"),
                         run_dir=str(tmp_path / "r"),
                         early_stop_metric="val_loss", early_stop_patience=5,
                         log_gradients=False, admm_rho=1.0)
        trainer = ADMMTrainer(net, resolve_criterion("mse")(), cfg)
        final, best = trainer.fit(params, batches, val_loader=batches[:1])
        assert "val_loss" in best and np.isfinite(best["val_loss"])
        assert os.path.exists(tmp_path / "c" / "last.npz")
        restored = trainer.restore_best("val_loss", final)
        assert jax.tree.structure(restored) == jax.tree.structure(final)


class TestADMMMesh:
    """ADMMTrainer(mesh=...): the shard_map'd primal step (distributed
    data loss + replicated constraint term) must match the single-device
    ADMM fit; μ stays a traced argument (one compile across dual updates)."""

    def _batches8(self, n=2, seed=0):
        rng = np.random.default_rng(seed)
        return [
            ((rng.random((8, 1, 16, 12, 12)) > 0.9).astype(np.float32),
             (rng.random((8, 1, 16, 12, 12)) > 0.97).astype(np.float32))
            for _ in range(n)
        ]

    def test_mesh_fit_matches_single_device(self, tmp_path):
        import jax

        from scenenet_tpu.parallel import make_mesh

        outs = []
        for tag, mesh in (("aref", None),
                          ("amesh", make_mesh((4, 2))),
                          ("adp", make_mesh((8, 1)))):
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=5)
            cfg = ADMMConfig(max_epochs=3, admm_rho=5.0, optimizer="adam",
                             learning_rate=5e-2,
                             checkpoint_dir=str(tmp_path / f"c{tag}"),
                             run_dir=str(tmp_path / f"r{tag}"),
                             log_gradients=False, early_stop_metric=None)
            t = ADMMTrainer(net, WeightedMSE.create(), cfg, mesh=mesh)
            final, best = t.fit(params, self._batches8())
            assert np.isfinite(best["train_loss"])
            outs.append((final, best, t.history))
        (ref_p, ref_best, ref_hist) = outs[0]
        for final, best, hist in outs[1:]:
            for a, b in zip(jax.tree.leaves(final), jax.tree.leaves(ref_p)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=5e-4, atol=1e-6)
            np.testing.assert_allclose(best["train_loss"],
                                       ref_best["train_loss"], rtol=3e-4)
            np.testing.assert_allclose(hist[-1]["max_violation"],
                                       ref_hist[-1]["max_violation"],
                                       rtol=1e-3, atol=1e-7)

    def test_mesh_lbfgs_admm(self, tmp_path):
        """The admm_config.yml combination (LBFGS primal) under a mesh."""
        from scenenet_tpu.parallel import make_mesh

        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=5)
        cfg = ADMMConfig(max_epochs=2, admm_rho=2.0, optimizer="lbfgs",
                         learning_rate=1e-1,
                         checkpoint_dir=str(tmp_path / "cl"),
                         run_dir=str(tmp_path / "rl"),
                         log_gradients=False, early_stop_metric=None)
        t = ADMMTrainer(net, WeightedMSE.create(), cfg,
                        mesh=make_mesh((8, 1)))
        final, best = t.fit(params, self._batches8())
        assert np.isfinite(best["train_loss"])

    def test_mesh_prep_with_space_axis_matches(self, tmp_path):
        """Raw point batches + a space axis: the prep must run OUTSIDE
        shard_map (a data-only sharding would replicate the full-Z grid
        over space and the halo conv would pull wraparound rows — caught
        as a 1.5e-3 loss deviation before the fix)."""
        import jax

        from scenenet_tpu.parallel import make_mesh
        from scenenet_tpu.train import make_device_voxelize_prep

        prep = make_device_voxelize_prep((16, 12, 12), (15,),
                                         use_indices=False)
        rng = np.random.default_rng(7)
        batches = []
        for _ in range(2):
            pts = rng.uniform([0, 0, 0], [30, 30, 60], (8, 900, 3)).astype(np.float32)
            labels = rng.choice([1, 2, 15], size=(8, 900)).astype(np.int32)
            mask = np.ones((8, 900), bool)
            batches.append((pts, labels, mask))

        outs = []
        for tag, mesh in (("pref", None), ("pmesh", make_mesh((4, 2)))):
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=5)
            cfg = ADMMConfig(max_epochs=2, admm_rho=5.0, optimizer="adam",
                             learning_rate=5e-2,
                             checkpoint_dir=str(tmp_path / f"c{tag}"),
                             run_dir=str(tmp_path / f"r{tag}"),
                             log_gradients=False, early_stop_metric=None)
            t = ADMMTrainer(net, WeightedMSE.create(), cfg, batch_prep=prep,
                            mesh=mesh)
            final, best = t.fit(params, batches)
            outs.append((final, best))
        (ref_p, ref_best), (mesh_p, mesh_best) = outs
        for a, b in zip(jax.tree.leaves(mesh_p), jax.tree.leaves(ref_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-6)
        np.testing.assert_allclose(mesh_best["train_loss"],
                                   ref_best["train_loss"], rtol=3e-4)


class TestADMMSingleCompileCarry:
    """Same guarantee as tests/test_mesh_training.py::TestSingleCompileCarry
    for the ADMM mesh primal step: the carried (state, μ, counts) must not
    split the jit cache key (host-initial vs committed-replicated)."""

    def test_mesh_primal_step_compiles_once(self, tmp_path):
        import jax

        from scenenet_tpu.parallel import make_mesh
        from scenenet_tpu.train.metrics import init_metric_state
        from scenenet_tpu.train.state import create_train_state

        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=5)
        cfg = ADMMConfig(max_epochs=1, admm_rho=5.0, optimizer="sgd",
                         learning_rate=1e-2,
                         checkpoint_dir=str(tmp_path / "cc"),
                         run_dir=str(tmp_path / "rc"),
                         log_gradients=False, early_stop_metric=None)
        t = ADMMTrainer(net, WeightedMSE.create(), cfg,
                        mesh=make_mesh((4, 2)))
        state, tx = create_train_state(params, "sgd", 1e-2,
                                       net.trainable_mask(params))
        step = t._make_mesh_step(tx, rho=5.0, needs_vf=False)
        mu = jnp.zeros(len(_constraint_values(net, params)))
        rng = np.random.default_rng(0)
        x = (rng.random((8, 1, 16, 12, 12)) > 0.9).astype(np.float32)
        y = (rng.random((8, 1, 16, 12, 12)) > 0.97).astype(np.float32)
        m = init_metric_state()
        s = state
        for _ in range(3):
            s, m, _ = step(s, mu, m, x, y)
        assert sum(j._cache_size() for j in step._jits()) == 1

    def test_mesh_dual_update_compiles_once(self, tmp_path):
        """Epoch 1's μ is host-built; epoch 2's is a committed jit output
        — the dual update must not recompile between them (review finding:
        _cache_size() went 1→2 across epochs before the fix)."""
        from scenenet_tpu.parallel import make_mesh

        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=5)
        cfg = ADMMConfig(max_epochs=3, admm_rho=5.0, optimizer="sgd",
                         learning_rate=1e-2,
                         checkpoint_dir=str(tmp_path / "cd"),
                         run_dir=str(tmp_path / "rd"),
                         log_gradients=False, early_stop_metric=None)
        t = ADMMTrainer(net, WeightedMSE.create(), cfg,
                        mesh=make_mesh((4, 2)))
        rng = np.random.default_rng(0)
        batches = [((rng.random((8, 1, 16, 12, 12)) > 0.9).astype(np.float32),
                    (rng.random((8, 1, 16, 12, 12)) > 0.97).astype(np.float32))]
        t.fit(params, batches)
        assert t._dual_update_jit._cache_size() == 1
