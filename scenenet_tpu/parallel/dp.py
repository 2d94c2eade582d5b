"""Mesh-parallel execution: data-parallel + spatially-sharded training.

TPU-native replacement for the reference's implicit Lightning-DDP/NCCL
scale-out (``scripts/main.py:228``, SURVEY.md §5.8): a ``shard_map`` train
step over a (data, space) mesh where

- the batch is sharded over ``data`` (classic DP),
- the voxel grid's Z axis is sharded over ``space`` with halo-exchange
  convolution (:mod:`scenenet_tpu.parallel.spatial`),
- gradients are ``pmean``-reduced over both axes (the psum XLA would emit
  for DDP, placed explicitly), and
- global-sum losses (Tversky) psum their statistics so the loss equals the
  unsharded one (equal shard sizes).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scenenet_tpu.parallel.mesh import ensure_replicated
from scenenet_tpu.parallel.spatial import spatial_scenenet_forward
from scenenet_tpu.train.metrics import (
    MetricState, merge_metric_states, update_metrics,
)
from scenenet_tpu.train.state import TrainState


def cast_half(tree):
    """bf16 copies of the float leaves (f32 masters stay outside) — THE
    mixed-precision cast rule, shared by the single-device Trainer and
    every mesh shard body so the paths cannot drift."""
    return jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else v,
        tree)


def linesearch_value_fn(loss_fn, axes: Tuple[str, ...],
                        reduce_loss: "Callable | None" = None):
    """``value_fn`` for linesearch optimizers (lbfgs) inside shard_map.

    Two load-bearing properties (see the zoom-deadlock note in
    :func:`make_local_train_step`): the VALUE is the global loss
    (``reduce_loss``, default pmean over ``axes``), and the per-shard
    GRADIENT is the GLOBAL gradient — the identity pmean on the
    (replicated) input, whose transpose all-reduces the cotangent. Without
    the latter each shard's linesearch sees its shard-local slope, the
    while_loop trip counts diverge, and the collectives inside deadlock
    (measured: 40 s rendezvous-timeout SIGABRT on the 8-device CPU mesh).
    """
    if reduce_loss is None:
        def reduce_loss(l):
            return lax.pmean(l, axes)

    def value_fn(p):
        p = jax.tree.map(lambda a: lax.pmean(a, axes), p)
        return reduce_loss(loss_fn(p)[0])

    return value_fn


def psum_confusion_delta(mstate: MetricState, pred, y, tau: float,
                         axes: Tuple[str, ...]) -> MetricState:
    """Merge THIS batch's globally-psum'd confusion delta into the carried
    (already-global) state — the overflow-safe two-limb merge; a raw leaf
    add would overflow the lo limbs over many batches."""
    zero = MetricState(*(jnp.zeros_like(v) for v in mstate))
    delta = update_metrics(zero, pred, y, tau)
    if axes:
        delta = MetricState(*(lax.psum(v, axes) for v in delta))
    return merge_metric_states(mstate, delta)


def make_distributed(criterion: Any, axes: Tuple[str, ...]) -> Any:
    """Recursively set ``axis_names`` on a (frozen dataclass) criterion and
    its nested sub-criteria so global sums/means run over the mesh."""
    if not dataclasses.is_dataclass(criterion):
        return criterion
    changes = {}
    for f in dataclasses.fields(criterion):
        val = getattr(criterion, f.name)
        if f.name == "axis_names":
            changes[f.name] = tuple(axes)
        elif dataclasses.is_dataclass(val) and not isinstance(val, type):
            changes[f.name] = make_distributed(val, axes)
    return dataclasses.replace(criterion, **changes) if changes else criterion


def shard_batch(batch, mesh: Mesh, batch_axis: str = "data",
                space_axis: str | None = None):
    """Place a host (x, y) voxel batch onto the mesh."""
    spec = P(batch_axis, None, space_axis, None, None)
    sharding = NamedSharding(mesh, spec)
    return tuple(jax.device_put(jnp.asarray(b), sharding) for b in batch)


def make_dp_inference_fn(model, mesh: Mesh, space_axis: str | None = None,
                         inference: "bool | str" = False,
                         overlap: bool = False) -> Callable:
    """jit'd forward with the batch sharded over ``data`` (and optionally Z
    over ``space``): XLA/GSPMD partitions the conv automatically for pure
    DP; with a space axis we run the explicit halo-exchange forward.

    ``inference=True`` opts into the bf16-tap-scratch Pallas forward where
    the model backend allows it — bit-exact for {0,1} occupancy grids (the
    standard binarized pipeline), a ~1e-3 relative change for arbitrary
    float grids, hence opt-in rather than default (ADVICE r2).
    ``inference="mxu"`` passes through to the banded-y MXU stencil
    (pure-DP path; the spatial halo path keeps the tap stencils).
    ``overlap=True`` (spatial path only) splits the halo conv so the ICI
    transfer overlaps the interior compute — see
    :func:`scenenet_tpu.parallel.spatial.halo_conv3d` for the measured
    regime where that pays."""
    if space_axis is None:
        import inspect

        in_sharding = NamedSharding(mesh, P("data", None, None, None, None))
        has_inference = "inference" in inspect.signature(
            model.apply).parameters  # cnn/unet have no inference knob

        @jax.jit
        def forward(params, x):
            if has_inference:
                return model.apply(params, x, inference=inference)
            return model.apply(params, x)

        def run(params, x):
            x = jax.device_put(jnp.asarray(x), in_sharding)
            return forward(params, x)

        run.forward = forward        # device-side forward (for on-device
        run.in_sharding = in_sharding  # timing loops / pre-sharded inputs)
        return run

    fwd = shard_map(
        lambda params, x: spatial_scenenet_forward(model, params, x, space_axis,
                                                   inference=inference,
                                                   overlap=overlap),
        mesh=mesh,
        in_specs=(P(), P("data", None, space_axis, None, None)),
        out_specs=P("data", None, space_axis, None, None),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    jit_fwd = jax.jit(fwd)

    def run(params, x):
        x = jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P("data", None, space_axis, None, None))
        )
        return jit_fwd(params, x)

    run.forward = jit_fwd
    run.in_sharding = NamedSharding(mesh, P("data", None, space_axis, None, None))
    return run


def make_sharded_eval_step(
    model,
    criterion,
    mesh: Mesh,
    tau: float = 0.65,
    batch_axis: str = "data",
    space_axis: str = "space",
    batch_prep: Callable | None = None,
    overlap: bool = False,
    compiler_options: dict | None = None,
    precision: str = "f32",
) -> Callable:
    """Eval twin of :func:`make_sharded_train_step`: forward + loss +
    confusion-count delta over the mesh, so validation/test passes fit in
    the same per-device memory envelope as the sharded training step
    (spatial sharding is chosen exactly when ONE device cannot hold the
    full grid — a replicated plain-jit eval would OOM there).

    Returns ``eval_step(params, model_state, mstate, *batch) ->
    (mstate, loss, pred)``. Stateful models (``is_stateful``) evaluate
    with their replicated running statistics via ``apply_eval`` — no
    cross-shard sync is needed at eval time. Batches
    whose leading dim divides the data axis are batch-sharded; ragged
    tails (val loaders don't drop_last) fall back to a batch-REPLICATED
    variant sharded over space only — every device computes the same
    full-batch forward on its Z slab, so correctness holds for any batch
    size while the memory bound stays per-slab. ``batch_prep`` runs under
    plain jit before sharding (eval batches are small; the conv/loss is
    the memory hog, not the prep).
    """
    last = getattr(model, "last_lambda", None)
    data_size = mesh.shape[batch_axis]
    jit = (functools.partial(jax.jit, compiler_options=compiler_options)
           if compiler_options else jax.jit)
    prep_jit = jax.jit(batch_prep) if batch_prep is not None else None

    # meshes without a space axis (e.g. a degenerate ('data', 'model') EP
    # mesh with one member shard) run pure-DP: drop the axis from every
    # spec/collective instead of KeyError'ing on its name
    space_size = mesh.shape.get(space_axis, 1)
    if space_axis not in mesh.shape:
        space_axis = None
    stateful = bool(getattr(model, "is_stateful", False))
    half = precision == "bf16"
    if stateful and space_size > 1:
        raise ValueError(
            "stateful models shard over the data axis only "
            f"(mesh '{space_axis}' axis is {space_size})")

    def _local_eval(axes):
        dist_criterion = make_distributed(criterion, axes)

        def local_eval(params, model_state, mstate, x, y):
            fparams, fx = ((cast_half(params), x.astype(jnp.bfloat16))
                           if half else (params, x))
            if stateful:  # running stats, replicated — no sync at eval
                pred = model.apply_eval(fparams, model_state, fx)
            elif space_size == 1:  # see make_sharded_train_step: pure-DP
                pred = model.apply(fparams, fx)  # works for any stateless
            else:  # model; halo forward only needed when Z is sharded
                pred = spatial_scenenet_forward(model, fparams, fx,
                                                space_axis, overlap=overlap)
            pred = pred.astype(jnp.float32)
            cvx = (model.cvx_coefficients(params)
                   if hasattr(model, "cvx_coefficients") else {})
            geneo = (model.geneo_params_flat(params)
                     if hasattr(model, "geneo_params_flat") else {})
            loss = dist_criterion(pred, y, cvx, geneo, last)
            if axes:
                loss = lax.pmean(loss, axes)
            zero = MetricState(*(jnp.zeros_like(v) for v in mstate))
            delta = update_metrics(zero, pred, y, tau)
            # psum only over the axes the batch is actually sharded on —
            # a replicated batch would double-count over the data axis
            # (and with NO sharded axes — replicated batch on a pure-DP
            # mesh — the local values are already global: no collective)
            if axes:
                delta = MetricState(*(lax.psum(v, axes) for v in delta))
            return merge_metric_states(mstate, delta), loss, pred

        return local_eval

    space_axes = (space_axis,) if space_axis is not None else ()
    dp_spec = P(batch_axis, None, space_axis, None, None)
    rep_spec = P(None, None, space_axis, None, None)
    dp_step = jit(shard_map(
        _local_eval((batch_axis,) + space_axes), mesh=mesh,
        in_specs=(P(), P(), P(), dp_spec, dp_spec),
        out_specs=(P(), P(), dp_spec), check_vma=False))
    rep_step = jit(shard_map(
        _local_eval(space_axes), mesh=mesh,
        in_specs=(P(), P(), P(), rep_spec, rep_spec),
        out_specs=(P(), P(), rep_spec), check_vma=False))

    def eval_step(params, model_state, mstate, *batch):
        # one jit cache key whether the carry comes from the host (first
        # batch) or from the previous sharded call — see ensure_replicated
        params, model_state, mstate = ensure_replicated(
            (params, model_state, mstate), mesh)
        if prep_jit is not None:
            x, y = prep_jit(*batch)
        else:
            x, y = batch
        x, y = jnp.asarray(x), jnp.asarray(y)
        if x.shape[2] % space_size:
            raise ValueError(
                f"grid Z extent {x.shape[2]} not divisible by mesh "
                f"'{space_axis}' axis ({space_size})")
        divisible = x.shape[0] % data_size == 0
        spec = dp_spec if divisible else rep_spec
        sharding = NamedSharding(mesh, spec)
        x = jax.device_put(x, sharding)
        y = jax.device_put(y, sharding)
        return (dp_step if divisible else rep_step)(
            params, model_state, mstate, x, y)

    return eval_step


def make_local_train_step(
    model,
    criterion,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    tau: float = 0.65,
    batch_axis: str = "data",
    space_axis: str = "space",
    overlap: bool = False,
    with_grads: bool = False,
    batch_prep: Callable | None = None,
    needs_value_fn: bool = False,
    precision: str = "f32",
) -> Callable:
    """The shard-local train-step body (run inside ``shard_map``) shared
    by :func:`make_sharded_train_step` and the Trainer's cached-epoch
    scans: optional per-sample ``batch_prep``, forward (plain apply on a
    pure-DP mesh, halo conv when Z is space-sharded), pmean'd grads/loss,
    optimizer update, and the overflow-safe psum'd confusion-delta merge.
    One implementation so the DDP math cannot drift between the
    streaming and cached fits.

    Returns ``local_step(state, mstate, *batch) ->
    (state, mstate, loss[, grads])``; ``*batch`` is ``(x, y)`` grids, or
    raw prep inputs when ``batch_prep`` is given.

    Stateful models (``is_stateful``, e.g. UNet3D) train pure-DP with
    CROSS-REPLICA BatchNorm: the model must expose ``with_bn_sync(axis)``
    (its BatchNorms then pmean batch statistics over the data axis inside
    shard_map), so normalization and the stored running stats use the
    GLOBAL batch — the sharded fit matches the single-device fit exactly.
    The updated ``model_state`` is identical on every shard (it is built
    from the psum'd statistics) and rides ``TrainState.model_state``.
    """
    space_size = mesh.shape.get(space_axis, 1)
    if space_axis not in mesh.shape:  # pure-DP mesh without a space axis
        axes = (batch_axis,)
    else:
        axes = (batch_axis, space_axis)
    dist_criterion = make_distributed(criterion, axes)
    last = getattr(model, "last_lambda", None)
    stateful = bool(getattr(model, "is_stateful", False))
    half = precision == "bf16"
    if stateful:
        if space_size > 1:
            raise ValueError(
                "stateful models shard over the data axis only "
                f"(mesh '{space_axis}' axis is {space_size})")
        if not hasattr(model, "with_bn_sync"):
            raise ValueError(
                f"stateful model {type(model).__name__} lacks with_bn_sync("
                "axis) — cross-shard batch-stats sync is required for mesh "
                "training")
        model = model.with_bn_sync(batch_axis)

    def local_step(state: TrainState, mstate: MetricState, *batch):
        if batch_prep is not None:
            x, y = batch_prep(*batch)
        else:
            x, y = batch

        def loss_fn(params):
            new_ms = state.model_state
            fparams, fx = ((cast_half(params), x.astype(jnp.bfloat16))
                           if half else (params, x))
            # space size 1: no halo needed — plain apply, so ANY stateless
            # model (quantile ensemble, CNN baseline) trains pure-DP; the
            # SceneNet-specific halo forward only gates space > 1
            if stateful:
                pred, new_ms = model.apply_train(fparams, state.model_state,
                                                 fx)
            elif space_size == 1:
                pred = model.apply(fparams, fx)
            else:
                pred = spatial_scenenet_forward(model, fparams, fx,
                                                space_axis, overlap=overlap)
            # loss + constraint terms accumulate in f32 on the f32 masters
            pred = pred.astype(jnp.float32)
            cvx = (model.cvx_coefficients(params)
                   if hasattr(model, "cvx_coefficients") else {})
            geneo = (model.geneo_params_flat(params)
                     if hasattr(model, "geneo_params_flat") else {})
            return dist_criterion(pred, y, cvx, geneo, last), (pred, new_ms)

        (loss, (pred, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # DDP gradient reduction (explicit psum/pmean over the mesh);
        # the pmean of the loss is an identity for distributed criteria
        # (already globally reduced) and a sane fallback otherwise
        grads = lax.pmean(grads, axes)
        loss = lax.pmean(loss, axes)
        if needs_value_fn:
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params,
                value=loss, grad=grads,
                value_fn=linesearch_value_fn(loss_fn, axes))
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, model_state=new_ms)
        mstate = psum_confusion_delta(mstate, pred, y, tau, axes)
        if with_grads:
            return new_state, mstate, loss, grads
        return new_state, mstate, loss

    return local_step


def make_sharded_train_step(
    model,
    criterion,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    tau: float = 0.65,
    batch_axis: str = "data",
    space_axis: str = "space",
    overlap: bool = False,
    batch_prep: Callable | None = None,
    with_grads: bool = False,
    compiler_options: dict | None = None,
    needs_value_fn: bool = False,
    precision: str = "f32",
) -> Callable:
    """Full (DP × spatial) train step: returns jit'd
    ``step(state, mstate, x, y) -> (state, mstate, loss)`` where x/y are
    (B, 1, Z, X, Y) host arrays; sharding is applied inside.
    ``overlap=True`` uses the overlapped halo-exchange conv (forward AND
    its AD-derived backward run through the split formulation).

    ``batch_prep`` (jittable, per-sample — e.g.
    :func:`scenenet_tpu.train.make_device_voxelize_prep`) lets the step
    consume RAW loader batches: on a pure-DP mesh (space size 1) the prep
    runs *inside* ``shard_map`` on each shard's local samples, so
    voxelization scales with the data axis; with a space axis the prep's
    full-Z grids cannot be produced shard-locally, so it runs once under
    plain jit and the grids are resharded (spatial sharding is a
    memory-capacity play for big grids — see RESULTS.md — so the extra
    reshard is off the critical path there).

    ``with_grads=True`` appends the pmean'd gradients to the return
    (``(state, mstate, loss, grads)``) for watch-all gradient logging.
    """
    space_size = mesh.shape.get(space_axis, 1)
    jit = (functools.partial(jax.jit, compiler_options=compiler_options)
           if compiler_options else jax.jit)
    local_step = make_local_train_step(
        model, criterion, tx, mesh, tau=tau, batch_axis=batch_axis,
        space_axis=space_axis, overlap=overlap, with_grads=with_grads,
        batch_prep=batch_prep if space_size == 1 else None,
        needs_value_fn=needs_value_fn, precision=precision)

    out_specs = (P(), P(), P()) + ((P(),) if with_grads else ())
    data_size = mesh.shape[batch_axis]

    def _check_divisible(b, z):
        if b % data_size:
            raise ValueError(
                f"batch {b} not divisible by mesh '{batch_axis}' axis "
                f"({data_size}); use drop_last or a divisible batch size")
        if z is not None and z % space_size:
            raise ValueError(
                f"grid Z extent {z} not divisible by mesh '{space_axis}' "
                f"axis ({space_size})")

    if batch_prep is not None and space_size == 1:
        # raw-batch path: prep runs shard-locally (voxelization is
        # per-sample, so sharding the raw (B, N, …) arrays over the data
        # axis keeps it exact); one shard_map per loader-batch arity
        sharded_cache: dict = {}

        def step(state, mstate, *batch):
            state, mstate = ensure_replicated((state, mstate), mesh)
            batch = tuple(jnp.asarray(b) for b in batch)
            _check_divisible(batch[0].shape[0], None)
            key = tuple(b.ndim for b in batch)
            if key not in sharded_cache:
                raw_specs = tuple(
                    P(batch_axis, *([None] * (b.ndim - 1))) for b in batch)
                sharded_cache[key] = jit(shard_map(
                    local_step, mesh=mesh, in_specs=(P(), P()) + raw_specs,
                    out_specs=out_specs, check_vma=False))
            placed = tuple(
                jax.device_put(b, NamedSharding(
                    mesh, P(batch_axis, *([None] * (b.ndim - 1)))))
                for b in batch)
            return sharded_cache[key](state, mstate, *placed)

        step._jits = lambda: list(sharded_cache.values())  # test hook
        return step

    batch_spec = P(batch_axis, None,
                   space_axis if space_axis in mesh.shape else None,
                   None, None)
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), batch_spec, batch_spec),
        out_specs=out_specs,
        check_vma=False,
    )
    jit_step = jit(sharded)
    sharding = NamedSharding(mesh, batch_spec)
    prep_jit = jax.jit(batch_prep) if batch_prep is not None else None

    def step(state, mstate, *batch):
        state, mstate = ensure_replicated((state, mstate), mesh)
        if prep_jit is not None:
            x, y = prep_jit(*batch)
        else:
            x, y = batch
        x, y = jnp.asarray(x), jnp.asarray(y)
        _check_divisible(x.shape[0], x.shape[2])
        x = jax.device_put(x, sharding)
        y = jax.device_put(y, sharding)
        return jit_step(state, mstate, x, y)

    step._jits = lambda: [jit_step]  # test hook (single-compile guarantee)
    return step
