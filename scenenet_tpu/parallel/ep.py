"""Ensemble parallelism (EP) for the quantile SCENE-Net ensemble.

The reference's ``SCENENetQuantile`` (``core/models/SCENE_Net.py:347-415``)
runs one full SceneNet conv per target quantile — on one device the
ensemble multiplies the dominant conv cost by Q. Here the *member* axis
becomes a mesh axis: each device holds (and differentiates) only its
``Q / model_axis_size`` members, so the ensemble's conv FLOPs divide
across devices, composing with classic data parallelism on the other
axis. This is the "ep" leg of the framework's mesh story (alongside
``data`` DP and ``space`` spatial sharding, SURVEY.md §2.10/§5.7).

Design — replicated params, member-sharded compute:

- GENEO params are a few dozen scalars per member, so sharding the
  *storage* buys nothing; what costs is the per-member conv. Every shard
  keeps the full member-stacked param tree (leading axis Q) and slices
  its own members with ``lax.dynamic_slice_in_dim`` at
  ``axis_index(model) * Q_local``.
- The pinball loss and the per-member GENEO penalties both decompose as
  sums over members (``losses/quantile.py``; reference
  ``quant_loss.py:83-142``), so the shard-local loss ``psum``-assembles
  over the model axis and ``pmean``s over the data axis — exactly the
  unsharded ``QuantileLoss``/``QuantileGENEOLoss`` value. The quantile
  *values* differ per shard, so they ride a traced, dynamically-sliced
  array rather than the criterion's static tuple (one SPMD program).
- Gradients of the shard-local loss are zero outside the local members
  (the slice's transpose scatters into a zero tree), so
  ``psum(grads, model)`` assembles the full gradient and
  ``pmean(grads, data)`` is the DDP reduction; the optax update then
  runs replicated, keeping ``TrainState`` layout, checkpointing and
  preemption snapshots identical to every other fit path.

Exactness vs the single-device trainer is pinned in
``tests/test_ensemble_parallel.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scenenet_tpu.losses.geneo_loss import cvx_loss, positive_regularizer
from scenenet_tpu.losses.quantile import QuantileGENEOLoss, QuantileLoss
from scenenet_tpu.parallel.mesh import ensure_replicated
from scenenet_tpu.train.metrics import (
    MetricState, merge_metric_states, update_metrics,
)
from scenenet_tpu.train.state import TrainState


def _check_ensemble(model, mesh: Mesh, model_axis: str) -> int:
    """Validate the (model, mesh) pairing; returns members-per-shard."""
    quantiles = getattr(model, "quantiles", None)
    if quantiles is None or not hasattr(model, "net"):
        raise ValueError(
            "ensemble parallelism requires a member-stacked ensemble model "
            "(QuantileSceneNet: .net + .quantiles); got "
            f"{type(model).__name__}")
    if model_axis not in mesh.shape:
        raise ValueError(
            f"mesh has no '{model_axis}' axis (axes: "
            f"{tuple(mesh.axis_names)}); build it with "
            f"make_mesh(..., axis_names=('data', '{model_axis}'))")
    n = len(quantiles)
    m = mesh.shape[model_axis]
    if n % m:
        raise ValueError(
            f"{n} ensemble members do not divide over the mesh "
            f"'{model_axis}' axis ({m}); choose a divisible quantile count")
    return n // m


def _local_member_slice(params, model_axis: str, q_local: int):
    """This shard's members: slice ``q_local`` rows of every stacked leaf
    starting at ``axis_index(model) * q_local``. Differentiable — the
    transpose scatters cotangents into a zero full-shape tree, which is
    what makes ``psum(grads, model)`` assemble the exact full gradient."""
    start = lax.axis_index(model_axis) * q_local
    return jax.tree.map(
        lambda a: lax.dynamic_slice_in_dim(a, start, q_local, 0), params)


def _local_quantile_values(quantiles, model_axis: str, q_local: int):
    q_all = jnp.asarray(quantiles, jnp.float32)
    start = lax.axis_index(model_axis) * q_local
    return lax.dynamic_slice_in_dim(q_all, start, q_local, 0)


def _local_ensemble_forward(model, local_params, x,
                            inference: "bool | str" = False):
    """(B, 1, Z, X, Y) × local members → (B, Q_local, Z, X, Y).

    ``QuantileSceneNet.apply`` vmaps over the params' leading member axis
    (never over ``model.quantiles``), so it runs unchanged on the sliced
    local tree — one implementation of the member-axis layout."""
    return model.apply(local_params, x, inference=inference)


def _local_quantile_loss(criterion: QuantileLoss, model, params, x, y,
                         batch_axis: str, model_axis: str, q_local: int,
                         half: bool = False):
    """Shard-local contribution to the global quantile loss, built so that
    ``pmean(psum(local, model), data)`` equals the unsharded criterion:

    - pinball: ``mean_B(w · Σ_{q∈ALL} pin_q)`` = ``pmean_data psum_model``
      of ``mean_{B_local}(w · Σ_{q∈local} pin_q)`` (weights depend only on
      the replicated-over-model GT; their mean-1 normalization pmeans over
      the data axis, matching ``make_distributed``'s batch-global rule);
    - per-member GENEO penalties (``QuantileGENEOLoss`` only): local
      members' terms, psum-assembled; identical on every data shard so the
      trailing pmean is an identity.

    Semantics mirror ``QuantileLoss.__call__``/``QuantileGENEOLoss.__call__``
    with the member sum distributed; exactness vs the static-tuple
    criterion is pinned in tests.
    """
    local_p = _local_member_slice(params, model_axis, q_local)
    q_vals = _local_quantile_values(criterion.quantiles, model_axis, q_local)
    if half:  # bf16 member forward; f32 masters + f32 loss accumulation
        from scenenet_tpu.parallel.dp import cast_half

        pred = _local_ensemble_forward(model, cast_half(local_p),
                                       x.astype(jnp.bfloat16))
        pred = pred.astype(jnp.float32)
    else:
        pred = _local_ensemble_forward(model, local_p, x)
    gt = y
    if gt.ndim == pred.ndim and gt.shape[1] == 1:
        gt = gt[:, 0]
    w_mse = dataclasses.replace(criterion.w_mse, axis_names=(batch_axis,))
    w = w_mse.weight_target(gt)
    d = gt[:, None] - pred
    qb = q_vals.reshape((1, q_local) + (1,) * (pred.ndim - 2))
    pin = jnp.sum(jnp.maximum(qb * d, (qb - 1.0) * d), axis=1)
    loss = jnp.mean(w * pin)
    if isinstance(criterion, QuantileGENEOLoss):
        last = getattr(model, "last_lambda", None)
        members = [jax.tree.map(lambda a, i=i: a[i], local_p)
                   for i in range(q_local)]
        loss = loss + sum(
            cvx_loss(model.net.cvx_coefficients(p), last,
                     criterion.convex_weight) for p in members)
        loss = loss + sum(
            positive_regularizer(model.net.geneo_params_flat(p),
                                 criterion.convex_weight) for p in members)
    return loss, pred


def _check_criterion(criterion, model):
    if not isinstance(criterion, QuantileLoss):
        raise ValueError(
            "ensemble parallelism is defined for the quantile criterion "
            f"family (QuantileLoss/QuantileGENEOLoss); got "
            f"{type(criterion).__name__}")
    if tuple(criterion.quantiles) != tuple(model.quantiles):
        raise ValueError(
            f"criterion quantiles {tuple(criterion.quantiles)} != model "
            f"quantiles {tuple(model.quantiles)}")


def make_ensemble_inference_fn(model, mesh: Mesh, batch_axis: str = "data",
                               model_axis: str = "model",
                               inference: "bool | str" = False) -> Callable:
    """jit'd ensemble forward with the batch over ``data`` and the members
    over ``model``: each device convolves only its local members, and the
    (B, Q, Z, X, Y) stacked prediction assembles via the output sharding.
    ``inference`` passes through to each member's :meth:`SceneNet.apply`
    (``True`` = bf16 tap-scratch, ``"mxu"`` = banded-y MXU stencil)."""
    q_local = _check_ensemble(model, mesh, model_axis)

    def local_fwd(params, x):
        local_p = _local_member_slice(params, model_axis, q_local)
        return _local_ensemble_forward(model, local_p, x, inference=inference)

    x_spec = P(batch_axis, None, None, None, None)
    fwd = jax.jit(shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(), x_spec),
        out_specs=P(batch_axis, model_axis, None, None, None),
        check_vma=False))
    in_sharding = NamedSharding(mesh, x_spec)

    def run(params, x):
        x = jnp.asarray(x)
        if x.shape[0] % mesh.shape[batch_axis]:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by mesh "
                f"'{batch_axis}' axis ({mesh.shape[batch_axis]})")
        return fwd(params, jax.device_put(x, in_sharding))

    run.forward = fwd
    run.in_sharding = in_sharding
    return run


def make_local_ensemble_train_step(
    model,
    criterion,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    tau: float = 0.65,
    batch_axis: str = "data",
    model_axis: str = "model",
    batch_prep: Callable | None = None,
    with_grads: bool = False,
    needs_value_fn: bool = False,
    precision: str = "f32",
) -> Callable:
    """The shard-local EP train-step body (run inside ``shard_map``) —
    the ensemble counterpart of :func:`parallel.dp.make_local_train_step`,
    shared by :func:`make_ensemble_train_step` and the Trainer's
    cached-epoch scans so the EP math cannot drift between the streaming
    and cached fits. Returns ``local_step(state, mstate, *batch) ->
    (state, mstate, loss[, grads])``."""
    q_local = _check_ensemble(model, mesh, model_axis)
    _check_criterion(criterion, model)

    def local_step(state: TrainState, mstate: MetricState, *batch):
        if batch_prep is not None:
            x, y = batch_prep(*batch)
        else:
            x, y = batch

        def loss_fn(params):
            return _local_quantile_loss(criterion, model, params, x, y,
                                        batch_axis, model_axis, q_local,
                                        half=precision == "bf16")

        (loss, pred), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # assemble members (psum: local grads are zero outside this
        # shard's members) then DDP-reduce over data
        grads = lax.pmean(lax.psum(grads, model_axis), batch_axis)
        loss = lax.pmean(lax.psum(loss, model_axis), batch_axis)
        if needs_value_fn:
            # linesearch (lbfgs): identity-pmean value_fn (see
            # parallel.dp.linesearch_value_fn). The transpose algebra
            # composes with the member-psum: the psum's transpose scales
            # each shard's cotangent by the model-axis size, and the
            # identity pmean over BOTH axes then yields exactly
            # psum_model(pmean_data(local grads)) — the assembled gradient
            from scenenet_tpu.parallel.dp import linesearch_value_fn

            value_fn = linesearch_value_fn(
                loss_fn, (batch_axis, model_axis),
                reduce_loss=lambda l: lax.pmean(
                    lax.psum(l, model_axis), batch_axis))
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params,
                value=loss, grad=grads, value_fn=value_fn)
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        # confusion counts: every member's voxels score against the GT
        # (update_metrics broadcasts (B, Q_local, …) vs (B, 1, …)); psum
        # over both axes = the single-device all-members delta
        from scenenet_tpu.parallel.dp import psum_confusion_delta

        mstate = psum_confusion_delta(mstate, pred, y, tau,
                                      (batch_axis, model_axis))
        if with_grads:
            return new_state, mstate, loss, grads
        return new_state, mstate, loss

    return local_step


def make_ensemble_train_step(
    model,
    criterion,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    tau: float = 0.65,
    batch_axis: str = "data",
    model_axis: str = "model",
    batch_prep: Callable | None = None,
    with_grads: bool = False,
    compiler_options: dict | None = None,
    needs_value_fn: bool = False,
    precision: str = "f32",
) -> Callable:
    """Full (DP × EP) train step for the quantile ensemble: returns jit'd
    ``step(state, mstate, *batch) -> (state, mstate, loss[, grads])`` —
    the same contract as :func:`parallel.dp.make_sharded_train_step`, so
    the Trainer's streaming fit, watch-all grad logging, checkpointing and
    preemption snapshots work unchanged.

    ``batch_prep`` (per-sample, e.g. device voxelization) runs inside the
    shard body on the shard's local samples; it is replicated over the
    model axis (each member shard re-voxelizes its data shard — trivial
    next to the per-member convs it feeds).
    """
    data_size = mesh.shape[batch_axis]
    jit = (functools.partial(jax.jit, compiler_options=compiler_options)
           if compiler_options else jax.jit)
    local_step = make_local_ensemble_train_step(
        model, criterion, tx, mesh, tau=tau, batch_axis=batch_axis,
        model_axis=model_axis, batch_prep=batch_prep, with_grads=with_grads,
        needs_value_fn=needs_value_fn, precision=precision)

    out_specs = (P(), P(), P()) + ((P(),) if with_grads else ())
    sharded_cache: dict = {}

    def step(state, mstate, *batch):
        # one jit cache key whether the carry comes from the host (first
        # step) or from the previous sharded call — see ensure_replicated
        state, mstate = ensure_replicated((state, mstate), mesh)
        batch = tuple(jnp.asarray(b) for b in batch)
        if batch[0].shape[0] % data_size:
            raise ValueError(
                f"batch {batch[0].shape[0]} not divisible by mesh "
                f"'{batch_axis}' axis ({data_size})")
        key = tuple(b.ndim for b in batch)
        if key not in sharded_cache:
            specs = tuple(
                P(batch_axis, *([None] * (b.ndim - 1))) for b in batch)
            sharded_cache[key] = jit(shard_map(
                local_step, mesh=mesh, in_specs=(P(), P()) + specs,
                out_specs=out_specs, check_vma=False))
        placed = tuple(
            jax.device_put(b, NamedSharding(
                mesh, P(batch_axis, *([None] * (b.ndim - 1)))))
            for b in batch)
        return sharded_cache[key](state, mstate, *placed)

    step._jits = lambda: list(sharded_cache.values())  # test hook
    return step


def make_local_ensemble_eval_step(
    model,
    criterion,
    mesh: Mesh,
    tau: float = 0.65,
    batch_axis: str = "data",
    model_axis: str = "model",
    batch_sharded: bool = True,
    with_pred: bool = True,
    precision: str = "f32",
) -> Callable:
    """The shard-local EP eval body: forward on this shard's members +
    globally-assembled loss + psum'd confusion delta. ``batch_sharded``
    False = the batch is replicated over the data axis (ragged-tail
    variant); ``with_pred`` False drops the prediction output (the cached
    one-scan evaluation must not stack predictions). Returns
    ``local_eval(params, mstate, x, y) -> (mstate, loss[, pred])``."""
    q_local = _check_ensemble(model, mesh, model_axis)
    _check_criterion(criterion, model)

    def local_eval(params, mstate, x, y):
        loss, pred = _local_quantile_loss(
            criterion, model, params, x, y,
            batch_axis if batch_sharded else model_axis,
            model_axis, q_local, half=precision == "bf16")
        # replicated batch: the local loss already averages the FULL batch
        # (the weight normalization's pmean over the model axis, where
        # everything is replicated, is an identity), so the member psum
        # alone is the global value
        loss = lax.psum(loss, model_axis)
        if batch_sharded:
            loss = lax.pmean(loss, batch_axis)
        zero = MetricState(*(jnp.zeros_like(v) for v in mstate))
        delta = update_metrics(zero, pred, y, tau)
        axes = ((batch_axis, model_axis) if batch_sharded else (model_axis,))
        delta = MetricState(*(lax.psum(v, axes) for v in delta))
        if with_pred:
            return merge_metric_states(mstate, delta), loss, pred
        return merge_metric_states(mstate, delta), loss

    return local_eval


def make_ensemble_eval_step(
    model,
    criterion,
    mesh: Mesh,
    tau: float = 0.65,
    batch_axis: str = "data",
    model_axis: str = "model",
    batch_prep: Callable | None = None,
    compiler_options: dict | None = None,
    precision: str = "f32",
) -> Callable:
    """Eval twin of :func:`make_ensemble_train_step` (the contract of
    :func:`parallel.dp.make_sharded_eval_step`): forward + loss +
    confusion delta with members sharded over ``model``. Ragged tail
    batches (val loaders don't drop_last) fall back to a batch-REPLICATED
    variant sharded over members only, so correctness holds for any batch
    size while each device still convolves only its own members.

    Returns ``eval_step(params, model_state, mstate, *batch) ->
    (mstate, loss, pred)`` with the full (B, Q, …) assembled prediction.
    """
    data_size = mesh.shape[batch_axis]
    jit = (functools.partial(jax.jit, compiler_options=compiler_options)
           if compiler_options else jax.jit)
    prep_jit = jax.jit(batch_prep) if batch_prep is not None else None

    def _local_eval(batch_sharded: bool):
        return make_local_ensemble_eval_step(
            model, criterion, mesh, tau=tau, batch_axis=batch_axis,
            model_axis=model_axis, batch_sharded=batch_sharded,
            precision=precision)

    dp_x = P(batch_axis, None, None, None, None)
    rep_x = P(None, None, None, None, None)
    dp_out = P(batch_axis, model_axis, None, None, None)
    rep_out = P(None, model_axis, None, None, None)
    dp_step = jit(shard_map(
        _local_eval(True), mesh=mesh,
        in_specs=(P(), P(), dp_x, dp_x),
        out_specs=(P(), P(), dp_out), check_vma=False))
    rep_step = jit(shard_map(
        _local_eval(False), mesh=mesh,
        in_specs=(P(), P(), rep_x, rep_x),
        out_specs=(P(), P(), rep_out), check_vma=False))

    def eval_step(params, model_state, mstate, *batch):
        del model_state  # ensemble is stateless
        params, mstate = ensure_replicated((params, mstate), mesh)
        if prep_jit is not None:
            x, y = prep_jit(*batch)
        else:
            x, y = batch
        x, y = jnp.asarray(x), jnp.asarray(y)
        divisible = x.shape[0] % data_size == 0
        spec = dp_x if divisible else rep_x
        sharding = NamedSharding(mesh, spec)
        x = jax.device_put(x, sharding)
        y = jax.device_put(y, sharding)
        return (dp_step if divisible else rep_step)(params, mstate, x, y)

    return eval_step
