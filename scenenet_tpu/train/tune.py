"""Trainer tuning utilities: LR range test and batch-size probing.

The reference *declares* ``auto_lr_find`` / ``auto_scale_batch_size`` in
its config and passes them to ``pl.Trainer``, but the ``trainer.tune()``
call that would act on them is commented out
(``/root/reference/scripts/main.py:238-239``, config keys
``defaults_config.yml:85-88``) — like its ``precision: 16``, the intent
exists with no wiring. Here both are implemented:

- :func:`lr_range_test` — the Leslie-Smith LR range test Lightning's
  tuner runs: ramp the learning rate geometrically across a window,
  record the (smoothed) loss, suggest the LR at the steepest descent.
  One compile: the LR rides through ``optax.inject_hyperparams`` as a
  device value, so every probe step reuses the same jitted program.
- :func:`find_max_batch_size` — power-of-two probing of the largest
  batch that compiles + executes (``RESOURCE_EXHAUSTED``-driven), the
  ``auto_scale_batch_size="power"`` strategy.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def lr_range_test(
    model: Any,
    criterion: Callable,
    params: Any,
    batches: Iterable[Tuple],
    min_lr: float = 1e-5,
    max_lr: float = 1.0,
    steps: int = 30,
    optimizer: str = "adam",
    batch_prep: Optional[Callable] = None,
    smooth_beta: float = 0.8,
) -> Tuple[float, List[Tuple[float, float]]]:
    """Suggest a learning rate: geometric LR ramp, steepest-descent pick.

    Returns ``(suggested_lr, history)`` where history is a list of
    ``(lr, smoothed_loss)``. ``batches`` is cycled if shorter than
    ``steps``. The model/params are untouched (the test trains a throwaway
    copy).
    """
    base = {"adam": optax.adam, "sgd": optax.sgd,
            "rmsprop": optax.rmsprop}.get(optimizer)
    if base is None:
        raise NotImplementedError(f"lr_range_test: optimizer {optimizer!r}")
    tx = optax.inject_hyperparams(base)(learning_rate=min_lr)
    opt_state = tx.init(params)

    def loss_fn(p, x, y):
        pred = model.apply(p, x)
        cvx = model.cvx_coefficients(p) if hasattr(model, "cvx_coefficients") else {}
        geneo = model.geneo_params_flat(p) if hasattr(model, "geneo_params_flat") else {}
        last = getattr(model, "last_lambda", None)
        return criterion(pred, y, cvx, geneo, last)

    @jax.jit
    def step(p, opt_state, lr, *batch):
        x, y = batch_prep(*batch) if batch_prep else batch
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    batch_list = list(batches)
    if not batch_list:
        raise ValueError("lr_range_test needs at least one batch")
    ratio = (max_lr / min_lr) ** (1.0 / max(steps - 1, 1))
    lrs = [min_lr * ratio**i for i in range(steps)]

    history: List[Tuple[float, float]] = []
    smoothed = None
    p = params
    for i, lr in enumerate(lrs):
        batch = tuple(jnp.asarray(b) for b in batch_list[i % len(batch_list)])
        p, opt_state, loss = step(p, opt_state, jnp.asarray(lr, jnp.float32),
                                  *batch)
        loss = float(loss)
        if not np.isfinite(loss):
            break  # diverged — the useful range ends here
        smoothed = loss if smoothed is None else \
            smooth_beta * smoothed + (1 - smooth_beta) * loss
        history.append((lr, smoothed))
        if len(history) > 5 and smoothed > 4 * history[0][1]:
            break  # early divergence guard (Lightning's tuner does the same)

    if len(history) < 3:
        return min_lr, history
    # steepest negative slope of smoothed loss w.r.t. log(lr)
    losses = np.array([h[1] for h in history])
    grads = np.gradient(losses)
    return float(history[int(np.argmin(grads))][0]), history


def find_max_batch_size(
    probe: Callable[[int], None],
    start: int = 2,
    max_batch: int = 4096,
) -> int:
    """Largest power-of-two batch for which ``probe(batch)`` succeeds.

    ``probe`` should build + run one real step at the given batch size and
    raise on failure (XLA surfaces device OOM as ``RESOURCE_EXHAUSTED`` /
    ``XlaRuntimeError``). Doubles from ``start`` until OOM or
    ``max_batch``; returns the last good size. Raises if even ``start``
    OOMs. Non-OOM failures (shape bugs, bad configs, criterion
    mismatches) are re-raised — treating them as the memory ceiling would
    silently cap the batch size (ADVICE r2).
    """
    good = None
    b = start
    while b <= max_batch:
        try:
            probe(b)
        except Exception as e:  # pragma: no branch
            if not _is_oom(e):
                raise
            break
        good = b
        b *= 2
    if good is None:
        raise RuntimeError(f"even batch={start} failed the probe with OOM")
    return good


def _is_oom(e: Exception) -> bool:
    """OOM-shaped: XLA RESOURCE_EXHAUSTED / allocation failures (any
    platform's wording), or a stdlib MemoryError from host-side staging."""
    if isinstance(e, MemoryError):
        return True
    msg = str(e).lower()
    return any(s in msg for s in
               ("resource_exhausted", "resource exhausted", "out of memory",
                "failed to allocate", "allocation failure", "hbm"))


def measure_train_step_ms(model, criterion, params, x, y,
                          optimizer: str = "sgd", iters: int = 6) -> float:
    """Wall-time one jitted train step (grads + optax update), honest
    through the remote-execution tunnel: ``iters`` steps form a data
    dependency chain (each consumes the previous TrainState), and the
    final loss is fetched as a host scalar — so every step must have
    executed before the clock stops (``block_until_ready`` alone can
    return early through the tunnel; see bench.py)."""
    import time

    from scenenet_tpu.train.state import (
        create_train_state,
        optimizer_needs_value_fn,
    )

    mask = (model.trainable_mask(params)
            if hasattr(model, "trainable_mask") else None)
    state, tx = create_train_state(params, optimizer, 1e-3, mask)
    last = getattr(model, "last_lambda", None)
    needs_vf = optimizer_needs_value_fn(optimizer)

    @jax.jit
    def step(state, x, y):
        def loss_fn(p):
            pred = model.apply(p, x)
            cvx = (model.cvx_coefficients(p)
                   if hasattr(model, "cvx_coefficients") else {})
            geneo = (model.geneo_params_flat(p)
                     if hasattr(model, "geneo_params_flat") else {})
            return criterion(pred, y, cvx, geneo, last)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if needs_vf:  # linesearch optimizers (lbfgs) re-evaluate the loss
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params,
                value=loss, grad=grads, value_fn=loss_fn)
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=opt_state), loss

    s, loss = step(state, x, y)  # compile + warm
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, loss = step(s, x, y)
    float(loss)
    return (time.perf_counter() - t0) / iters * 1e3


def autotune_backend(
    make_model: Callable[[str], Tuple[Any, Any]],
    criterion: Callable,
    batch_size: int,
    grid_zxy: Tuple[int, int, int],
    candidates: Tuple[str, ...] = ("pallas", "pallas_mxu"),
    optimizer: str = "sgd",
    iters: int = 6,
    cache_path: Optional[str] = None,
    cache_key_extra: str = "",
    refresh: bool = False,
) -> Tuple[str, dict]:
    """Measured backend selection (``model_backend: autotune``): time one
    real train step per candidate backend on the live device at the run's
    exact (batch, grid) shape and pick the fastest.

    The static regime table (benchmarks/RESULTS.md: ``pallas_mxu`` wins
    64³ training, loses at 128³) becomes a live measurement — new shapes,
    chip generations, or toolchains re-derive it instead of trusting the
    doc. Results are cached in a JSON file keyed by
    (device_kind, shapes, optimizer, candidates) so the measurement is
    paid once per configuration, not per run; atomic-replace writes keep
    concurrent runs safe. Returns ``(winner, {backend: ms})`` (the cached
    ms dict on a hit).
    """
    import json
    import os
    import tempfile

    dev = jax.devices()[0]
    key = json.dumps({
        "device": getattr(dev, "device_kind", dev.platform),
        "batch": int(batch_size), "grid": list(map(int, grid_zxy)),
        "optimizer": optimizer, "candidates": list(candidates),
        "extra": cache_key_extra,
    }, sort_keys=True)
    if cache_path is None:
        cache_path = os.path.expanduser(
            "~/.cache/scenenet_tpu/autotune.json")
    cache = {}
    if os.path.exists(cache_path):
        try:
            with open(cache_path) as f:
                cache = json.load(f)
        except (OSError, ValueError):
            cache = {}
    if not refresh and key in cache:
        entry = cache[key]
        return entry["winner"], entry["times_ms"]

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((batch_size, 1, *grid_zxy)) > 0.9)
                    .astype(np.float32))
    y = jnp.asarray((rng.random((batch_size, 1, *grid_zxy)) > 0.97)
                    .astype(np.float32))
    times = {}
    for cand in candidates:
        model, params = make_model(cand)
        try:
            times[cand] = measure_train_step_ms(
                model, criterion, params, x, y, optimizer=optimizer,
                iters=iters)
        except Exception as e:  # one infeasible candidate must not
            if not _is_oom(e):  # abort the run (find_max_batch_size idiom)
                raise
            print(f"[autotune] candidate {cand!r} OOMs at this shape; "
                  "skipped")
            times[cand] = float("inf")
    if not any(np.isfinite(v) for v in times.values()):
        raise RuntimeError(
            f"every autotune candidate {candidates} OOM'd at batch "
            f"{batch_size} grid {grid_zxy}")
    winner = min(times, key=times.get)

    cache[key] = {"winner": winner, "times_ms": times}
    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(cache_path))
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(cache, f, indent=1)
        os.replace(tmp, cache_path)
    except OSError:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return winner, times
