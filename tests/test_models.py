"""SceneNet model family: shapes, convexity reparameterization, fused-path
equivalence, gradient flow, baselines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scenenet_tpu.models import CnnBaseline, QuantileSceneNet, SceneNet, SceneNetClassifier, UNet3D


@pytest.fixture(scope="module")
def net_and_params():
    return SceneNet.create(seed=3, kernel_size=(9, 5, 5))


@pytest.fixture(scope="module")
def voxel_batch():
    rng = np.random.default_rng(0)
    x = (rng.random((2, 1, 16, 16, 16)) > 0.9).astype(np.float32)
    return jnp.asarray(x)


class TestSceneNet:
    def test_forward_shape_and_range(self, net_and_params, voxel_batch):
        net, params = net_and_params
        pred = net.apply(params, voxel_batch)
        assert pred.shape == voxel_batch.shape
        p = np.asarray(pred)
        assert (p >= 0).all() and (p <= 1).all()  # relu∘tanh

    def test_fused_equals_unfused(self, net_and_params, voxel_batch):
        net, params = net_and_params
        fused = net.apply(params, voxel_batch, fuse_observers=True)
        unfused = net.apply(params, voxel_batch, fuse_observers=False)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), atol=1e-5)

    def test_lambdas_sum_to_one(self, net_and_params):
        net, params = net_and_params
        lams = np.asarray(net.effective_lambdas(params))
        assert np.isclose(lams.sum(), 1.0, atol=1e-6)
        # stored params were synced at init too (reference SCENE_Net.py:291)
        stored = sum(float(v) for v in params["lambdas"].values())
        assert np.isclose(stored, 1.0, atol=1e-6)

    def test_last_lambda_derived_not_read(self, net_and_params, voxel_batch):
        net, params = net_and_params
        # corrupting the stored last λ must not change the forward pass
        corrupted = jax.tree.map(lambda x: x, params)
        corrupted["lambdas"] = dict(params["lambdas"])
        corrupted["lambdas"][net.last_lambda] = jnp.asarray(123.0)
        a = net.apply(params, voxel_batch)
        b = net.apply(corrupted, voxel_batch)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_trainable_mask(self, net_and_params):
        net, params = net_and_params
        mask = net.trainable_mask(params)
        assert mask["lambdas"][net.last_lambda] is False
        assert mask["geneo"]["cone_0"]["apex"] is False
        assert mask["geneo"]["cy_0"]["radius"] is True
        # 11 trainable / 13 total, like the reference run summary
        flat = jax.tree.leaves(mask)
        assert sum(flat) == 11 and len(flat) == 13

    def test_gradients_flow_through_kernel_synthesis(self, net_and_params, voxel_batch):
        net, params = net_and_params

        def loss(p):
            return jnp.mean((net.apply(p, voxel_batch) - 0.5) ** 2)

        grads = jax.grad(loss)(params)
        g_radius = float(grads["geneo"]["cy_0"]["radius"])
        assert np.isfinite(g_radius)
        lam_name = [n for n in net.lambda_names if n != net.last_lambda][0]
        assert np.isfinite(float(grads["lambdas"][lam_name]))

    def test_jit_and_vmap_compatible(self, net_and_params, voxel_batch):
        net, params = net_and_params
        jitted = jax.jit(net.apply)
        np.testing.assert_allclose(
            np.asarray(jitted(params, voxel_batch)),
            np.asarray(net.apply(params, voxel_batch)),
            atol=1e-6,
        )

    def test_v1_variant(self, voxel_batch):
        net, params = SceneNet.create(version="v1", kernel_size=(9, 5, 5), seed=1)
        pred = net.apply(params, voxel_batch)
        assert pred.shape == voxel_batch.shape

    def test_wider_observer_bank(self, voxel_batch):
        net, params = SceneNet.create({"cy": 3, "cone": 2, "neg": 2},
                                      kernel_size=(9, 5, 5), seed=2)
        assert len(net.observers) == 7
        pred = net.apply(params, voxel_batch)
        assert pred.shape == voxel_batch.shape

    def test_parameters_in_dict(self, net_and_params):
        net, params = net_and_params
        d = net.parameters_in_dict(params)
        assert "cy_0.radius" in d and "lambda_cy_0" in d
        lams = [v for k, v in d.items() if k.startswith("lambda")]
        assert np.isclose(sum(lams), 1.0, atol=1e-6)


class TestVariants:
    def test_quantile_ensemble(self, voxel_batch):
        model, params = QuantileSceneNet.create(kernel_size=(9, 5, 5), seed=0)
        pred = model.apply(params, voxel_batch)
        assert pred.shape == (2, 3, 16, 16, 16)

    def test_classifier_hard_output(self, voxel_batch):
        model, params = SceneNetClassifier.create(kernel_size=(9, 5, 5), seed=0)
        out = np.asarray(model.apply(params, voxel_batch))
        assert set(np.unique(out)).issubset({0.0, 1.0})

    def test_cnn_baseline(self, voxel_batch):
        model, params = CnnBaseline.create(conv_num=2, kernel_size=(5, 5, 5),
                                           input_shape=(1, 1, 16, 16, 16))
        pred = model.apply(params, voxel_batch)
        assert pred.shape == voxel_batch.shape
        assert model.cvx_coefficients(params) == {}

    def test_unet3d(self, voxel_batch):
        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        pred = model.apply(variables, voxel_batch)
        assert pred.shape == voxel_batch.shape
        p = np.asarray(pred)
        assert (p >= 0).all() and (p <= 1).all()  # sigmoid
        pred_t, updates = model.apply(variables, voxel_batch, train=True)
        assert "batch_stats" in updates


class TestGENEONetAlias:
    def test_is_v1_scenenet(self):
        from scenenet_tpu.models import GENEONet, SceneNet

        net, params = GENEONet(kernel_size=(9, 6, 6), seed=7)
        ref, ref_params = SceneNet.create(kernel_size=(9, 6, 6), version="v1", seed=7)
        assert net.version == "v1"
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestQuantilePallasBackend:
    def test_vmapped_pallas_matches_xla(self, monkeypatch):
        """QuantileSceneNet(backend=pallas): the vmapped ensemble forward
        through the Pallas stencil (interpret mode) matches the XLA
        backend member-for-member."""
        import scenenet_tpu.ops.pallas_conv as pc

        rng = np.random.default_rng(0)
        x = jnp.asarray((rng.random((2, 1, 16, 16, 16)) > 0.7)
                        .astype(np.float32))
        ref_m, ref_p = QuantileSceneNet.create(kernel_size=(9, 5, 5), seed=3)
        pal_m, pal_p = QuantileSceneNet.create(kernel_size=(9, 5, 5), seed=3,
                                               backend="pallas")
        orig = pc.geneo_stencil_conv
        monkeypatch.setattr(
            pc, "fused_geneo_conv",
            lambda x, k, interpret=False: orig(x, k, activation=True,
                                               interpret=True))
        ref = ref_m.apply(ref_p, x)
        out = pal_m.apply(pal_p, x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_vmapped_inference_kwarg_forwards(self, monkeypatch):
        """QuantileSceneNet.apply(inference=...) reaches each member's
        inference forward: the banded-y MXU path (interpret mode) matches
        the XLA ensemble within split-bf16 tolerance."""
        import scenenet_tpu.ops.pallas_conv as pc

        rng = np.random.default_rng(1)
        x = jnp.asarray((rng.random((2, 1, 16, 16, 16)) > 0.7)
                        .astype(np.float32))
        ref_m, ref_p = QuantileSceneNet.create(kernel_size=(9, 5, 5), seed=3)
        pal_m, pal_p = QuantileSceneNet.create(kernel_size=(9, 5, 5), seed=3,
                                               backend="pallas")
        orig = pc.geneo_stencil_conv_mxu
        monkeypatch.setattr(
            pc, "geneo_stencil_conv_mxu",
            lambda x, k, activation=True, split=True, **kw: orig(
                x, k, activation=activation, split=split, interpret=True))
        ref = ref_m.apply(ref_p, x)
        out = pal_m.apply(pal_p, x, inference="mxu")
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_cli_builds_quantile_model(self):
        from scenenet_tpu.cli.train import build_model
        from scenenet_tpu.utils.config import ExperimentConfig

        cfg = ExperimentConfig(model="quantile", quantiles=(0.2, 0.8),
                               kernel_size=(9, 5, 5))
        model, params = build_model(cfg, seed=0)
        assert model.quantiles == (0.2, 0.8)
        x = jnp.zeros((1, 1, 12, 12, 12), jnp.float32)
        out = model.apply(params, x)
        assert out.shape == (1, 2, 12, 12, 12)


class TestClassifierPenaltyHooks:
    def test_forwards_constraint_hooks(self):
        """SCENE_Net_Class forwards get_cvx_coefficients/get_geneo_params to
        its gnet (SCENE_Net.py:456-460); without these hooks GENEO criteria
        silently drop every penalty term when training the classifier."""
        from scenenet_tpu.models.scenenet import SceneNetClassifier

        clf, params = SceneNetClassifier.create(kernel_size=(9, 5, 5), seed=0)
        cvx = clf.cvx_coefficients(params)
        ge = clf.geneo_params_flat(params)
        assert cvx and ge
        assert isinstance(clf.last_lambda, str)
        pd = clf.parameters_in_dict(params)
        assert "tau" in pd
        # the penalty actually bites: a GENEO criterion sees the params
        from scenenet_tpu.losses import resolve_criterion

        crit = resolve_criterion("geneo_tversky")(
            weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
            tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6,
            focal_gamma=4)
        x = jnp.zeros((1, 1, 12, 12, 12))
        y = jnp.zeros((1, 1, 12, 12, 12))
        pred = clf.apply(params, x, straight_through=True)
        loss = crit(pred, y, clf.cvx_coefficients(params),
                    clf.geneo_params_flat(params), clf.last_lambda)
        assert np.isfinite(float(loss))

    def test_tau_matches_reference_draw(self):
        """Reference tau = (0.6-0.2)*rand — U[0, 0.4] (the tau_min shift is
        missing THERE; reproduced as executed)."""
        from scenenet_tpu.models.scenenet import SceneNetClassifier

        taus = [float(SceneNetClassifier.create(seed=s)[1]["tau"])
                for s in range(40)]
        assert 0.0 <= min(taus) and max(taus) <= 0.4
        assert max(taus) > 0.2  # spans the upper half of U[0, 0.4]
