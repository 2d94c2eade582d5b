"""GSPMD auto-partitioned training: channel tensor parallelism for the
black-box baselines.

Everything else in :mod:`scenenet_tpu.parallel` is ``shard_map``: the
program is written per-shard and the collectives are placed by hand —
the right tool when the model has white-box structure to exploit (the
GENEO conv's Z halo exchange in ``spatial.py``, the quantile ensemble's
member axis in ``ep.py``). The black-box baselines — UNet3D and the CNN
baselines (reference ``core/models/unet.py:17-135`` /
``CNNBaseline.py:19-109``) — have no such structure: they are generic
channel-heavy conv stacks, exactly the case XLA's GSPMD partitioner
(``jit`` + sharding annotations) is built for. This module is that other
half of the JAX parallelism toolbox, the scaling-book recipe: *pick a
mesh, annotate shardings, let XLA insert the collectives.*

The annotations implement **channel tensor parallelism composed with
data parallelism** over a ``(data, model)`` mesh:

- the leading (batch) dim of every batch argument → ``data``;
- conv kernels ``(k_d, k_h, k_w, C_in, C_out)``: ``C_out`` → ``model``
  when divisible (flax ``nn.Conv`` DHWIO layout — Megatron-style
  column-parallel convolution);
- per-channel vectors (BN scale/bias/running stats, conv bias) of a
  ``model``-divisible length → ``model``;
- everything else (scalars, tiny tensors, optimizer counters)
  replicated. Optimizer moments mirror the parameter shapes, so the same
  leafwise rule shards adam's ``mu``/``nu`` alongside their parameters.

XLA then inserts the all-gathers/reduce-scatters the dataflow needs —
e.g. the activation all-gather between a C_out-sharded conv and the next
layer's full-C_in contraction — instead of us hand-placing them.

Why this is exact BY CONSTRUCTION: ``jit`` of one logical program keeps
single-device semantics under GSPMD (annotations only constrain layout).
So BatchNorm batch statistics are *global-batch* with no sync-BN
plumbing (contrast ``UNet3D.with_bn_sync`` for the ``shard_map`` DP
path), every criterion works unchanged, and the step equals the
single-device step up to float reduction order. Exactness is still
pinned in ``tests/test_gspmd.py``.

Single-compile carry: the steps are jitted with explicit
``in_shardings``/``out_shardings`` built from the first call's pytrees,
so the carried state returns committed to exactly the shardings the next
call requires — one cache key, no double compile (the failure mode
``mesh.ensure_replicated`` exists to prevent on the shard_map paths).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scenenet_tpu.parallel.dp import cast_half
from scenenet_tpu.train.metrics import MetricState, update_metrics
from scenenet_tpu.train.state import TrainState


def channel_spec(shape, n_shards: int, axis: str = "model") -> P:
    """The leafwise channel-TP rule: where (if anywhere) does ``axis``
    shard an array of this shape."""
    if n_shards <= 1:
        return P()
    if len(shape) == 5 and shape[-1] >= n_shards and shape[-1] % n_shards == 0:
        # conv kernel (DHWIO): column-parallel over C_out
        return P(None, None, None, None, axis)
    if len(shape) == 1 and shape[0] >= n_shards and shape[0] % n_shards == 0:
        # per-channel vector (BN scale/bias/stats, conv bias)
        return P(axis)
    return P()


def channel_specs(tree, mesh: Mesh, axis: str = "model"):
    """Pytree of :func:`channel_spec` PartitionSpecs for ``tree``."""
    m = int(mesh.shape.get(axis, 1))
    return jax.tree.map(
        lambda leaf: channel_spec(jnp.shape(leaf), m, axis), tree)


def channel_shardings(tree, mesh: Mesh, axis: str = "model"):
    """Pytree of NamedShardings implementing the channel-TP rule."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        channel_specs(tree, mesh, axis))


def _replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def _check_shardable(params, mesh: Mesh, model_axis: str):
    """Loud guard: a >1 ``model`` axis must actually shard SOMETHING.
    Otherwise every parameter silently replicates and the model-axis
    devices do redundant identical work — the exact
    declared-but-inert-knob failure mode this framework bans. Hit by
    (a) models with no channel structure (SceneNet's scalar params) and
    (b) a ``mesh_channel`` that divides no channel width (e.g. 3 on the
    32/64/128/256 UNet ladder)."""
    m = int(mesh.shape.get(model_axis, 1))
    if m <= 1:
        return
    specs = jax.tree.leaves(
        channel_specs(params, mesh, model_axis),
        is_leaf=lambda s: isinstance(s, P))
    if not any(model_axis in (s or ()) for s in specs):
        raise ValueError(
            f"channel TP over a {m}-wide '{model_axis}' axis shards NO "
            "parameter of this model — every channel width must be "
            f"divisible by {m} for at least one conv kernel / channel "
            "vector. Use a divisor of the model's channel widths, or a "
            "mesh without a model axis (SceneNet-family scalar-parameter "
            "models have no channel dimension to shard — use data/space/"
            "ensemble axes for them).")


def _check_batch_divisible(batch, data_size: int, data_axis: str):
    b = jnp.shape(batch[0])[0]
    if b % data_size:
        raise ValueError(
            f"batch {b} not divisible by mesh '{data_axis}' axis "
            f"({data_size}); use drop_last or a divisible batch size")


def _ensure_placed(tree, shardings):
    """device_put only the leaves that are not already committed to the
    target sharding. The carried outputs of a step ARE (out_shardings),
    so steady-state this is a pure Python check — an unconditional
    per-call device_put over a ~100-leaf UNet state tree measured
    +210 ms/step through the remote-dispatch tunnel."""

    def place(a, s):
        if isinstance(a, jax.Array) and a.sharding == s:
            return a
        return jax.device_put(a, s)

    return jax.tree.map(place, tree, shardings)


def _make_loss_fn(model, criterion, precision: str):
    """Mirror of ``Trainer._loss`` (train/loop.py): bf16 forward on f32
    masters when ``precision == 'bf16'``, f32 loss accumulation, the
    cvx/geneo constraint hooks (empty dicts for the black-box models —
    reference ``CNNBaseline.py:42-47``)."""
    stateful = bool(getattr(model, "is_stateful", False))
    half = precision == "bf16"
    last = getattr(model, "last_lambda", None)

    def loss_fn(params, model_state, x, y, train):
        fparams = cast_half(params) if half else params
        fx = x.astype(jnp.bfloat16) if half else x
        new_ms = model_state
        if stateful:
            if train:
                pred, new_ms = model.apply_train(fparams, model_state, fx)
            else:
                pred = model.apply_eval(fparams, model_state, fx)
        else:
            pred = model.apply(fparams, fx)
        pred = pred.astype(jnp.float32)
        cvx = (model.cvx_coefficients(params)
               if hasattr(model, "cvx_coefficients") else {})
        geneo = (model.geneo_params_flat(params)
                 if hasattr(model, "geneo_params_flat") else {})
        return criterion(pred, y, cvx, geneo, last), (pred, new_ms)

    return loss_fn


def make_gspmd_train_step(
    model,
    criterion,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    tau: float = 0.65,
    batch_prep: Optional[Callable] = None,
    needs_value_fn: bool = False,
    precision: str = "f32",
    compiler_options: Optional[dict] = None,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """(state, mstate, *batch) → (state, mstate, loss, grads), the
    Trainer step signature, as ONE logical program jitted with channel-TP
    × DP sharding annotations over ``mesh``.

    The body is the plain single-device step — GSPMD partitions it; no
    per-shard math, no explicit collectives, no sync-BN view needed.
    """
    loss_fn = _make_loss_fn(model, criterion, precision)

    def body(state: TrainState, mstate: MetricState, *batch):
        x, y = batch_prep(*batch) if batch_prep else batch

        def lf(p):
            return loss_fn(p, state.model_state, x, y, True)

        (loss, (pred, new_ms)), grads = jax.value_and_grad(
            lf, has_aux=True)(state.params)
        if needs_value_fn:
            # linesearch optimizers (lbfgs) re-evaluate along the search
            # direction; under GSPMD this is just another region of the
            # one logical program — none of the per-shard zoom-deadlock
            # hazards the shard_map path has to defuse (dp.py)
            def value_fn(p):
                return loss_fn(p, state.model_state, x, y, True)[0]

            updates, opt_state = tx.update(
                grads, state.opt_state, state.params,
                value=loss, grad=grads, value_fn=value_fn)
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, model_state=new_ms)
        mstate = update_metrics(mstate, pred, y, tau)
        return new_state, mstate, loss, grads

    box: dict = {}
    data_size = int(mesh.shape.get(data_axis, 1))

    def step(state: TrainState, mstate: MetricState, *batch):
        _check_batch_divisible(batch, data_size, data_axis)
        if "fn" not in box:
            _check_shardable(state.params, mesh, model_axis)
            s_state = channel_shardings(state, mesh, model_axis)
            s_m = _replicated(mstate, mesh)
            s_batch = tuple(NamedSharding(mesh, P(data_axis)) for _ in batch)
            s_grads = channel_shardings(state.params, mesh, model_axis)
            jkw: dict = dict(
                in_shardings=(s_state, s_m) + s_batch,
                out_shardings=(s_state, s_m, NamedSharding(mesh, P()),
                               s_grads),
            )
            if compiler_options:
                jkw["compiler_options"] = compiler_options
            box["fn"] = jax.jit(body, **jkw)
            box["put"] = (s_state, s_m)
        # commit the carry-shaped inputs to the target shardings BEFORE the
        # call: a host-built (uncommitted) first state would trace under a
        # different aval than the committed carried outputs — two cache
        # keys for one program (the double-compile ensure_replicated
        # prevents on the shard_map paths; same hazard, same cure)
        s_state, s_m = box["put"]
        state = _ensure_placed(state, s_state)
        mstate = _ensure_placed(mstate, s_m)
        return box["fn"](state, mstate, *batch)

    # compile-count introspection (tests' _n_compiles convention)
    step._jits = lambda: [box["fn"]] if "fn" in box else []
    return step


def make_gspmd_eval_step(
    model,
    criterion,
    mesh: Mesh,
    *,
    tau: float = 0.65,
    batch_prep: Optional[Callable] = None,
    precision: str = "f32",
    compiler_options: Optional[dict] = None,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """(params, model_state, mstate, *batch) → (mstate, loss, pred):
    GSPMD twin of the plain eval step, same annotations as the train
    step so validation fits the same per-device memory envelope."""
    loss_fn = _make_loss_fn(model, criterion, precision)

    def body(params, model_state, mstate: MetricState, *batch):
        x, y = batch_prep(*batch) if batch_prep else batch
        loss, (pred, _) = loss_fn(params, model_state, x, y, False)
        mstate = update_metrics(mstate, pred, y, tau)
        return mstate, loss, pred

    box: dict = {}
    data_size = int(mesh.shape.get(data_axis, 1))

    def step(params, model_state, mstate: MetricState, *batch):
        # ragged tails (val/test loaders don't drop_last): a batch whose
        # leading dim doesn't divide the data axis cannot be batch-sharded
        # — fall back to a batch-REPLICATED variant (same logical program;
        # under GSPMD the annotations only constrain layout, so the
        # replicated-input program computes identical counts/loss), the
        # same rule as the dp/ep eval twins
        divisible = jnp.shape(batch[0])[0] % data_size == 0
        key = "fn" if divisible else "fn_rep"
        if key not in box:
            if not box:
                _check_shardable(params, mesh, model_axis)
            s_p = channel_shardings(params, mesh, model_axis)
            s_ms = channel_shardings(model_state, mesh, model_axis)
            s_m = _replicated(mstate, mesh)
            b_spec = P(data_axis) if divisible else P()
            s_batch = tuple(NamedSharding(mesh, b_spec) for _ in batch)
            jkw: dict = dict(
                in_shardings=(s_p, s_ms, s_m) + s_batch,
                out_shardings=(s_m, NamedSharding(mesh, P()),
                               NamedSharding(mesh, b_spec)),
            )
            if compiler_options:
                jkw["compiler_options"] = compiler_options
            box[key] = jax.jit(body, **jkw)
            box["put"] = (s_p, s_ms, s_m)
        # single-compile: commit inputs to the annotated shardings (see
        # the train step's note) — params usually arrive already committed
        # by the train step, making this a pure Python check mid-fit
        s_p, s_ms, s_m = box["put"]
        params = _ensure_placed(params, s_p)
        if model_state is not None:
            model_state = _ensure_placed(model_state, s_ms)
        mstate = _ensure_placed(mstate, s_m)
        return box[key](params, model_state, mstate, *batch)

    step._jits = lambda: [box[k] for k in ("fn", "fn_rep") if k in box]
    return step
