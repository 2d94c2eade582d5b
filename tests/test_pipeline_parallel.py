"""Pipeline parallelism (parallel/pp.py): GPipe microbatch schedule over
a 'stage' mesh axis via shard_map + ppermute, applied to the CnnBaseline
conv stack. Pins: forward equality vs the unpipelined model, generic
deep-stack equality vs a sequential loop, gradient assembly exactness,
full train-step/fit equality vs the single-device path (incl. the inert
embedded weights staying inert), DP × PP composition, and the guards."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import CnnBaseline
from scenenet_tpu.parallel import make_mesh
from scenenet_tpu.parallel.pp import (
    cnn_pipeline_params,
    cnn_unstack_params,
    make_pipeline_inference_fn,
    make_pipeline_train_step,
    make_stage_params,
    pipeline_apply,
)
from scenenet_tpu.train.metrics import init_metric_state
from scenenet_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def devices8():
    assert len(jax.devices()) == 8
    return jax.devices()


def _model(seed=0, conv_num=3, g=16):
    return CnnBaseline.create(conv_num=conv_num, kernel_size=(3, 3, 3),
                              seed=seed, input_shape=(1, 1, g, g, g))


def _batch(b=8, g=16, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.random((b, 1, g, g, g)) > 0.9).astype(np.float32)
    y = (rng.random((b, 1, g, g, g)) > 0.97).astype(np.float32)
    return x, y


def _assert_tree_close(a, b, rtol=5e-4, atol=1e-5):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


class TestParamMapping:
    def test_round_trip(self):
        model, params = _model()
        stacked = cnn_pipeline_params(model, params)
        assert stacked["kernel"].shape == (2, 3, 3, 3, 3, 3)
        assert stacked["bias"].shape == (2, 3)
        back = cnn_unstack_params(stacked)
        _assert_tree_close(back, params, rtol=0, atol=0)

    def test_single_layer_rejected(self):
        model, params = CnnBaseline.create(two_layers=False,
                                           input_shape=(1, 1, 8, 8, 8))
        with pytest.raises(ValueError, match="single conv"):
            cnn_pipeline_params(model, params)

    def test_embedding_inert(self):
        """The zero-embedded extra input-channel weights receive zero
        gradient through the pipelined loss (the lifted input's padded
        channels are zero), so training the stacked tree IS training the
        original model."""
        model, params = _model()
        stacked = cnn_pipeline_params(model, params)
        mesh = make_mesh((1, 2), axis_names=("data", "stage"),
                         devices=jax.devices()[:2])
        x, y = _batch(b=4)
        crit = resolve_criterion("dice_bce")()

        def loss(st):
            from scenenet_tpu.parallel.pp import _cnn_pipeline_forward

            def body(st, x, y):
                pred = _cnn_pipeline_forward(
                    st, x, stage_axis="stage", n_microbatches=2)
                return crit(pred, y, {}, {}, None)

            return jax.jit(shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(None, None, None, None, None),
                          P(None, None, None, None, None)),
                out_specs=P(), check_vma=False))(st, x, y)

        g = jax.grad(lambda st: loss(st))(stacked)
        g = jax.device_get(g)
        # stage-0 kernel grads outside input channel 0 are exactly zero
        assert np.all(g["kernel"][0][..., 1:, :] == 0)
        # ... and inside channel 0 they are not (the conv actually trains)
        assert np.any(g["kernel"][0][..., 0, :] != 0)


class TestPipelineForward:
    @pytest.mark.parametrize("mesh_shape,m", [((1, 2), 4), ((4, 2), 2)])
    def test_matches_unpipelined(self, devices8, mesh_shape, m):
        model, params = _model()
        stacked = cnn_pipeline_params(model, params)
        mesh = make_mesh(mesh_shape, axis_names=("data", "stage"),
                         devices=devices8[: mesh_shape[0] * mesh_shape[1]])
        x, _ = _batch(b=8)
        want = jax.jit(model.apply)(params, x)
        run = make_pipeline_inference_fn(model, mesh, n_microbatches=m)
        got = run(stacked, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("mesh_shape,m", [((1, 2), 4), ((2, 2), 2)])
    def test_unet_pipeline_matches_apply_eval(self, devices8, mesh_shape, m):
        """VERDICT r4 #8: 2-stage GPipe over the UNet's down/up blocks
        (stage boundary at the bottleneck, skip tuple shipped through the
        ppermute hop) equals the single-device eval forward. Training PP
        is architecturally rejected for this model (microbatched BN —
        see make_unet_pipeline_inference_fn / docs/SCALING.md)."""
        from scenenet_tpu.models import UNet3D
        from scenenet_tpu.parallel.pp import make_unet_pipeline_inference_fn

        model, variables = UNet3D.create(seed=0,
                                         input_shape=(1, 1, 16, 16, 16))
        mesh = make_mesh(mesh_shape, axis_names=("data", "stage"),
                         devices=devices8[: mesh_shape[0] * mesh_shape[1]])
        rng = np.random.default_rng(4)
        x = (rng.random((8, 1, 16, 16, 16)) > 0.8).astype(np.float32)
        params, mstate = model.split_variables(variables)
        want = jax.jit(model.apply_eval)(params, mstate, x)
        run = make_unet_pipeline_inference_fn(model, mesh, n_microbatches=m)
        got = run(variables, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_unet_stage_split_matches_full(self):
        """encode→decode sub-graph composition == the plain forward (the
        explicit block names keep one param tree across sub-graphs)."""
        from scenenet_tpu.models import UNet3D

        model, variables = UNet3D.create(seed=1,
                                         input_shape=(1, 1, 16, 16, 16))
        rng = np.random.default_rng(5)
        x = (rng.random((2, 1, 16, 16, 16)) > 0.8).astype(np.float32)
        params, mstate = model.split_variables(variables)
        module = model._module()
        full = module.apply({"params": params, **mstate}, x, train=False)
        skips = module.apply({"params": params, **mstate}, x, train=False,
                             stage="encode")
        out = module.apply({"params": params, **mstate}, skips, train=False,
                           stage="decode")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(full))

    def test_deep_stack_matches_sequential(self, devices8):
        """Generic S=4 uniform conv chain: pipeline_apply == a plain
        sequential loop over the stages."""
        rng = np.random.default_rng(1)
        c, g, s, m, mb = 4, 8, 4, 3, 2
        kernels = [rng.normal(0, 0.2, (3, 3, 3, c, c)).astype(np.float32)
                   for _ in range(s)]
        biases = [rng.normal(0, 0.1, (c,)).astype(np.float32)
                  for _ in range(s)]
        stacked = make_stage_params(kernels, biases)
        x = rng.normal(0, 1, (m, mb, g, g, g, c)).astype(np.float32)

        h = jnp.asarray(x).reshape((-1, g, g, g, c))
        for k, b in zip(kernels, biases):
            h = lax.conv_general_dilated(
                h, jnp.asarray(k), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        want = np.asarray(h).reshape((m, mb, g, g, g, c))

        mesh = make_mesh((2, 4), axis_names=("data", "stage"),
                         devices=devices8)
        fwd = jax.jit(shard_map(
            lambda st, xm: pipeline_apply(st, xm, stage_axis="stage",
                                          n_stages=s),
            mesh=mesh, in_specs=(P(), P()), out_specs=P(),
            check_vma=False))
        got = np.asarray(fwd(stacked, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_bad_stage_count_rejected(self, devices8):
        model, _ = _model()
        mesh = make_mesh((2, 4), axis_names=("data", "stage"),
                         devices=devices8)
        with pytest.raises(ValueError, match="2 pipeline stages"):
            make_pipeline_inference_fn(model, mesh)

    def test_missing_axis_rejected(self, devices8):
        model, _ = _model()
        mesh = make_mesh((4, 2), devices=devices8)  # (data, space)
        with pytest.raises(ValueError, match="no 'stage' axis"):
            make_pipeline_inference_fn(model, mesh)

    def test_indivisible_microbatch_rejected(self, devices8):
        model, params = _model()
        stacked = cnn_pipeline_params(model, params)
        mesh = make_mesh((1, 2), axis_names=("data", "stage"),
                         devices=devices8[:2])
        run = make_pipeline_inference_fn(model, mesh, n_microbatches=3)
        x, _ = _batch(b=8)
        with pytest.raises(ValueError, match="microbatches"):
            run(stacked, x)


class TestPipelineTraining:
    def _plain_step(self, model, criterion, tx):
        @jax.jit
        def step(state, mstate, x, y):
            def lf(p):
                pred = model.apply(p, x)
                return criterion(pred, y, {}, {}, None), pred

            (loss, pred), grads = jax.value_and_grad(
                lf, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            from scenenet_tpu.parallel.dp import psum_confusion_delta

            mstate = psum_confusion_delta(mstate, pred, y, 0.65, ())
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state), mstate, loss

        return step

    @pytest.mark.parametrize("mesh_shape,m", [((1, 2), 4), ((2, 2), 2)])
    def test_step_matches_single_device(self, devices8, mesh_shape, m):
        """Loss, confusion counts, and the updated params over 3 steps
        match the plain single-device step (stacked → unstacked). The
        DP×PP case inherits pure-DP's float noise floor (the 2-way data
        split reorders the criterion's reductions — measured identical
        deviations through make_sharded_train_step on this model), so
        its param tolerance is the DP one; pure PP is bit-tight."""
        model, params = _model()
        criterion = resolve_criterion("dice_bce")()
        mesh = make_mesh(mesh_shape, axis_names=("data", "stage"),
                         devices=devices8[: mesh_shape[0] * mesh_shape[1]])

        ref_state, ref_tx = create_train_state(params, "sgd", 1e-2, None)
        ref_step = self._plain_step(model, criterion, ref_tx)

        stacked = cnn_pipeline_params(model, params)
        pp_state, pp_tx = create_train_state(stacked, "sgd", 1e-2, None)
        pp_step = make_pipeline_train_step(model, criterion, pp_tx, mesh,
                                           n_microbatches=m)

        ref_m, pp_m = init_metric_state(), init_metric_state()
        for i in range(3):
            x, y = _batch(b=8, seed=i)
            ref_state, ref_m, ref_loss = ref_step(ref_state, ref_m, x, y)
            pp_state, pp_m, pp_loss = pp_step(pp_state, pp_m, x, y)
            # rtol: distributed-criterion reductions reorder float sums
            np.testing.assert_allclose(float(pp_loss), float(ref_loss),
                                       rtol=1e-4)
        dp = mesh_shape[0] > 1
        _assert_tree_close(cnn_unstack_params(jax.device_get(pp_state.params)),
                           jax.device_get(ref_state.params),
                           rtol=5e-3 if dp else 5e-4,
                           atol=2e-4 if dp else 1e-5)
        for a, b in zip(jax.device_get(pp_m), jax.device_get(ref_m)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_adam_keeps_embedding_inert(self, devices8):
        """Even a stateful optimizer never moves the embedded zero
        weights (zero grad → zero adam update), so cnn_unstack_params
        stays exact over training."""
        model, params = _model()
        criterion = resolve_criterion("dice_bce")()
        mesh = make_mesh((1, 2), axis_names=("data", "stage"),
                         devices=devices8[:2])
        stacked = cnn_pipeline_params(model, params)
        state, tx = create_train_state(stacked, "adam", 1e-3, None)
        step = make_pipeline_train_step(model, criterion, tx, mesh,
                                        n_microbatches=2)
        m = init_metric_state()
        for i in range(2):
            x, y = _batch(b=4, seed=i)
            state, m, _ = step(state, m, x, y)
        k0 = np.asarray(jax.device_get(state.params)["kernel"])[0]
        assert np.all(k0[..., 1:, :] == 0)

    def test_single_compile(self, devices8):
        model, params = _model()
        criterion = resolve_criterion("dice_bce")()
        mesh = make_mesh((2, 2), axis_names=("data", "stage"),
                         devices=devices8[:4])
        stacked = cnn_pipeline_params(model, params)
        state, tx = create_train_state(stacked, "sgd", 1e-2, None)
        step = make_pipeline_train_step(model, criterion, tx, mesh,
                                        n_microbatches=2)
        m = init_metric_state()
        for i in range(3):
            x, y = _batch(b=8, seed=i)
            state, m, _ = step(state, m, x, y)
        (jit_step,) = step._jits()
        assert jit_step._cache_size() == 1

    def test_with_grads_assembles_full_gradient(self, devices8):
        """with_grads=True returns the psum-assembled stacked gradient ==
        jax.grad of the unpipelined loss (mapped into the stacked tree)."""
        model, params = _model()
        criterion = resolve_criterion("dice_bce")()
        mesh = make_mesh((1, 2), axis_names=("data", "stage"),
                         devices=devices8[:2])
        x, y = _batch(b=4)

        def ref_loss(p):
            return criterion(model.apply(p, x), y, {}, {}, None)

        ref_g = jax.grad(ref_loss)(params)

        stacked = cnn_pipeline_params(model, params)
        state, tx = create_train_state(stacked, "sgd", 1e-2, None)
        step = make_pipeline_train_step(model, criterion, tx, mesh,
                                        n_microbatches=2, with_grads=True)
        _, _, _, g = step(state, init_metric_state(), x, y)
        _assert_tree_close(cnn_unstack_params(jax.device_get(g)),
                           jax.device_get(ref_g))
