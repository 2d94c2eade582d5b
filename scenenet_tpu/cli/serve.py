"""Inference server: point clouds in, tower probabilities/labels out.

The production-serving face of the framework: a single-process HTTP
server (stdlib, zero deps) holding the compiled end-to-end pipeline —
padded points → on-device voxelization → SceneNet (Pallas backend on TPU)
→ probabilities → optional τ-mask and voxel→point gather — with one fixed
executable shape so every request after the first is compile-free.

Protocol (POST /predict):
    request body: npz with ``points`` (N, 3) float and optional ``tau``
    response body: npz with ``point_probs`` (N,), ``mask`` (N,) (if tau),
                   and ``voxel_pred`` (Z, X, Y)

``--model quantile`` serves the aleatoric-uncertainty ensemble: the
response additionally carries ``point_quantiles`` (Q, N) and
``uncertainty`` (N, — spread between the extreme quantiles, the
reference's quantile-uncertainty measure); ``point_probs``/``mask`` come
from the member closest to the median. ``--mesh-ensemble m`` shards the
Q member convs over m local devices (parallel/ep.py) — ensemble-parallel
serving, latency divided by m up to Q.

``--max-batch B`` (with ``--batch-window-ms w``) enables dynamic
micro-batching: concurrent requests queue for up to ``w`` ms and run as
ONE batched dispatch, padded to a power-of-two bucket so the executable
set stays fixed, pipelined so uploads/compute/downloads of consecutive
batches overlap (see `_MicroBatcher`). The batched path reuses the
throughput kernels (`voxelize_batch_occupancy`, batched gather) and
produces the same results as the batch-1 path. Measured regime
(`benchmarks/serve_latency.py`, v5e): the chip already serves batch-1
of this pipeline in ~1-1.7 ms, so device-side batching only pays at
large buckets (3.1× at b=32, 32³ grids) — leave ``--max-batch 1``
unless sustained concurrency exceeds several hundred req/s or requests
are small; it's a knob for chip efficiency under load, not a default.

GET /healthz returns build/model info (+ live batching stats).

Usage:
    python -m scenenet_tpu.cli.serve --checkpoint ckpt.npz [--port 8400]
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Pipeline:
    def __init__(self, checkpoint: str | None, grid=(64, 64, 64),
                 max_points: int = 131072, kernel_size=(9, 5, 5),
                 inference: "bool | str" = True, model: str = "scenenet",
                 quantiles=(0.1, 0.5, 0.9), mesh_ensemble: int = 1,
                 max_batch: int = 1, batch_window_ms: float = 2.0,
                 warm_buckets: bool = True, adaptive: bool = False):
        import jax
        import jax.numpy as jnp

        from scenenet_tpu.models import SceneNet
        from scenenet_tpu.ops.voxelize import (
            _flat_zxy_idx, batch_flat_ids, gather_point_values, grid_bounds,
            voxel_indices, voxelize_batch_hist, voxelize_batch_occupancy,
        )
        from scenenet_tpu.train.checkpoint import restore_checkpoint

        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.model = model
        self.quantiles = tuple(quantiles)
        self.mesh_ensemble = int(mesh_ensemble)
        if model == "quantile":
            from scenenet_tpu.models import QuantileSceneNet

            self.net, self.params = QuantileSceneNet.create(
                kernel_size=kernel_size, quantiles=self.quantiles, seed=0,
                backend=backend)
            inner_backend = self.net.net.backend
        elif model == "scenenet":
            self.net, self.params = SceneNet.create(kernel_size=kernel_size,
                                                    seed=0, backend=backend)
            inner_backend = self.net.backend
        else:
            raise ValueError(f"serve supports scenenet/quantile, got {model!r}")
        if checkpoint:
            self.params = restore_checkpoint(checkpoint, self.params)
        self.grid = grid
        self.max_points = max_points
        # binarized occupancy input → the bf16-scratch inference forward is
        # bit-exact here; "mxu"/"mxu_fast" ride the banded-y MXU stencil
        # (near-f32 / single-bf16)
        infer = inference if inner_backend != "xla" else False

        if model == "quantile":
            if self.mesh_ensemble > 1:
                # ensemble-parallel serving: each device convolves only
                # Q/m members; the (1, Q, Z, X, Y) prediction assembles
                # via the output sharding (parallel/ep.py)
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                from scenenet_tpu.parallel import make_mesh
                from scenenet_tpu.parallel.ep import (
                    _check_ensemble, _local_ensemble_forward,
                    _local_member_slice,
                )

                mesh = make_mesh(
                    (1, self.mesh_ensemble), axis_names=("data", "model"),
                    devices=jax.devices()[:self.mesh_ensemble])
                q_local = _check_ensemble(self.net, mesh, "model")
                net = self.net
                ens_fwd = shard_map(
                    lambda p, x: _local_ensemble_forward(
                        net, _local_member_slice(p, "model", q_local), x,
                        inference=infer),
                    mesh=mesh,
                    in_specs=(P(), P(None, None, None, None, None)),
                    out_specs=P(None, "model", None, None, None),
                    check_vma=False)
            else:
                def ens_fwd(p, x):
                    return self.net.apply(p, x, inference=infer)
        else:
            def ens_fwd(p, x):
                return self.net.apply(p, x, inference=infer)[:, 0]

        @jax.jit
        def run(params, pts, mask):
            hist = voxelize_batch_hist(pts[None], mask[None], grid)
            x = (hist > 0).astype(jnp.float32)[:, None]
            pred = ens_fwd(params, x)[0]  # (Z,X,Y) or (Q,Z,X,Y)
            lo, hi = grid_bounds(pts, mask)
            flat = _flat_zxy_idx(voxel_indices(pts, lo, hi, grid), grid)
            if pred.ndim == 4:  # quantile ensemble: gather per member
                probs = jax.vmap(
                    lambda pr: gather_point_values(pr, flat, mask))(pred)
            else:
                probs = gather_point_values(pred, flat, mask)
            return pred, probs

        @jax.jit
        def run_batch(params, pts, mask):
            """(B, N, 3)/(B, N) → (pred (B[,Q],Z,X,Y), probs (B[,Q],N)).

            Same math as `run`: `voxelize_batch_occupancy` is exactly
            `voxelize_batch_hist > 0` and `batch_flat_ids` vmaps the
            identical per-sample bounds+binning recipe."""
            x = voxelize_batch_occupancy(pts, mask, grid)[:, None]
            pred = ens_fwd(params, x)  # (B,Z,X,Y) or (B,Q,Z,X,Y)
            flat = batch_flat_ids(pts, mask, grid)
            if pred.ndim == 5:  # (B, Q, ...): gather per member
                q = pred.shape[1]
                flat_q = jnp.broadcast_to(flat[:, None], (flat.shape[0], q,
                                                          flat.shape[1]))
                probs = gather_point_values(pred, flat_q, mask[:, None])
            else:
                probs = gather_point_values(pred, flat, mask)
            return pred, probs

        self._run = run
        self._run_batch = run_batch
        self._jnp = jnp
        self._batcher = None
        # warm the executable(s): jit caches per batch shape, so each
        # power-of-two bucket is its own one-time compile
        self.predict(np.zeros((16, 3), np.float32))
        if max_batch > 1:
            self._batcher = _MicroBatcher(self, max_batch, batch_window_ms,
                                          adaptive=adaptive)
            if warm_buckets:
                b = 1
                while b <= self._batcher.max_batch:
                    pts = np.zeros((b, self.max_points, 3), np.float32)
                    msk = np.zeros((b, self.max_points), bool)
                    msk[:, 0] = True
                    jax.block_until_ready(
                        self._run_batch(self.params, pts, msk))
                    b *= 2

    def predict(self, points: np.ndarray):
        """Returns (voxel_pred, point_probs): (Z,X,Y)/(N,) for scenenet,
        (Q,Z,X,Y)/(Q,N) for the quantile ensemble."""
        n = min(len(points), self.max_points)
        pts = np.zeros((self.max_points, 3), np.float32)
        mask = np.zeros(self.max_points, bool)
        pts[:n] = points[:n] - points[:n].min(0)
        mask[:n] = True
        if self._batcher is not None:
            if self._batcher.adaptive and self._batcher.direct_mode():
                # adaptive "single" phase: bypass the batcher funnel
                # entirely — concurrent handler threads issue PARALLEL
                # batch-1 dispatches exactly like a --max-batch 1 server
                # (funnelling singles through one dispatch thread can
                # never match that on a transfer-bound link; measured in
                # the r5 A/B iterations). Completions still feed the
                # throughput probe that decides the phase.
                self._batcher.note_direct_request()
                pred, probs = self._run(self.params,
                                        self._jnp.asarray(pts),
                                        self._jnp.asarray(mask))
                pred = np.asarray(pred)
                probs = np.asarray(probs)
                self._batcher.note_direct_completion()
                return pred, probs[..., :n]
            # H2D transfer happens HERE, in the handler thread — transfers
            # from concurrent requests overlap each other and the in-flight
            # batched dispatches (the batcher worker never touches the wire)
            pred, probs = self._batcher.submit(self._jnp.asarray(pts),
                                               self._jnp.asarray(mask))
        else:
            pred, probs = self._run(self.params, self._jnp.asarray(pts),
                                    self._jnp.asarray(mask))
        return np.asarray(pred), np.asarray(probs)[..., :n]

class _MicroBatcher:
    """Dynamic micro-batching: coalesce concurrent requests into one
    batched dispatch, pipelined so the wire overlaps the chip.

    Static mode: the first queued request opens a window of ``window_ms``;
    whatever arrives before it closes (up to ``max_batch``) rides the same
    executable. Single requests on an idle server pay at most the window
    (2 ms default) on top of batch-1 latency; under concurrency the
    server moves to the throughput regime of the batched kernels.

    Adaptive mode (``adaptive=True``, the ``--max-batch auto`` CLI knob —
    VERDICT r3 #7/r4 #5): the coalescing decisions are made from
    MEASUREMENTS instead of fixed knobs, on two levels.

    1. Whether to coalesce at all: a phase-based THROUGHPUT probe.
       Whether batching pays depends on the link — on a local PCIe host
       batched dispatches win from b≥16 (device-side receipts), but
       through a transfer-bound tunnel parallel batch-1 dispatches win
       (measured: --adaptive-ab, static-1 13.6 vs static-batched 6.6
       req/s) — and a fixed policy cannot know which world it is in.
       Per-request service latency CANNOT decide it either: under
       saturation the queue delay divides by the batch size, so batched
       dispatches always look better per request even while throughput
       is worse (measured and rejected in r5). So the batcher alternates
       fixed-length dispatch phases (coalescing on/off), measures
       completed requests per second in each, commits to the winner for
       _COMMIT_LEN dispatches, and periodically re-probes the other mode
       so load/link changes flip it back. Phases that straggle past
       _PHASE_MAX_S are low-load phases and discard their sample
       (coalescing is moot on an empty queue).
    2. Whether to WAIT for company: draining the queue is free
       (zero added latency); the window additionally opens only when the
       EWMA arrival rate predicts ≥ _GAIN_MIN more arrivals within it.

    Low load therefore behaves like static batch-1 (no window, batch-1
    bucket = the same executable); sustained load converges to whichever
    of {batch-1 parallelism, batched coalescing} measures faster:
    adaptive ≈ max(static-1, static-batched) in both regimes on both
    transport classes, which serve_latency.py --adaptive-ab verifies.

    Pipelining: handler threads transfer their request H2D *before*
    queueing (overlapped uploads), the dispatch thread only stacks
    device arrays (on-device op) and enqueues the async ``run_batch``
    call — it never blocks on results — and a separate fetch thread
    drains the (bounded, depth-2) in-flight queue D2H. Batch k+1 is
    computing while batch k's results stream back; without this split
    a single worker serializes transfer against compute and batching
    can LOSE to concurrent batch-1 requests on transfer-bound links
    (measured: 8.0 vs 12.6 req/s through the dev tunnel).
    """

    _GAIN_MIN = 8          # open the window only if ≥ this many arrivals
    # are predicted within it (moves the bucket toward the b≥16 break-even)
    _EWMA_ALPHA = 0.2      # arrival-interval smoothing
    _PROBE_LEN = 48        # requests per throughput-probe phase
    _COMMIT_LEN = 384      # requests to stay on the measured winner
    # before re-probing the other mode
    _PHASE_MAX_S = 10.0    # a probe phase that takes longer than this is
    # a low-load phase — discard its sample (coalescing is moot when the
    # queue is empty; drain-only already degenerates to batch-1 there)

    def __init__(self, pipeline: _Pipeline, max_batch: int,
                 window_ms: float, adaptive: bool = False):
        # round DOWN to a power of two (bucket set == warmed set): the
        # operator's --max-batch is a memory/latency CAP — dispatching
        # bigger batches than asked for is never acceptable
        b = 1
        while b * 2 <= max_batch:
            b *= 2
        self.max_batch = b
        self.window = max(window_ms, 0.0) / 1e3
        self.adaptive = adaptive
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "dispatches": 0,
                      "max_batch_seen": 0, "failed_dispatches": 0,
                      "windows_opened": 0}
        # EWMA of request inter-arrival time (seconds); inf = idle
        self._ewma_interval = float("inf")
        self._last_arrival = None
        # phase-based throughput probe: whether coalescing pays depends
        # on the link — on a local PCIe host batched dispatches win ≥b16
        # (device-side receipts), but through a transfer-bound tunnel
        # parallel batch-1 dispatches win (measured: --adaptive-ab,
        # static-1 13.6 vs static-batched 6.6 req/s). Per-request
        # latency CANNOT decide this (queue delay divides by the batch
        # size, so batched always looks better under saturation —
        # measured and rejected in r5); completed-requests-per-second
        # over alternating fixed-length dispatch phases can.
        self._mode = "multi"          # current phase's coalescing mode
        self._phase_len = self._PROBE_LEN
        self._phase_count = 0         # dispatches completed this phase
        self._phase_reqs = 0          # requests completed this phase
        self._phase_t0 = None         # first completion time in phase
        self._tp = {"multi": None, "single": None}  # measured req/s
        self._pipeline = pipeline
        self._q: "queue.Queue" = queue.Queue()
        self._fetch_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._dispatch = threading.Thread(target=self._dispatch_loop,
                                          daemon=True)
        self._fetch = threading.Thread(target=self._fetch_loop, daemon=True)
        self._dispatch.start()
        self._fetch.start()

    def _note_arrival(self):
        now = time.monotonic()
        with self._stats_lock:
            if self._last_arrival is not None:
                dt = now - self._last_arrival
                prev = self._ewma_interval
                self._ewma_interval = dt if prev == float("inf") else \
                    (1 - self._EWMA_ALPHA) * prev + self._EWMA_ALPHA * dt
            self._last_arrival = now

    def _should_wait(self) -> bool:
        """Adaptive coalescing decision (adaptive mode only): wait the
        window only when the measured arrival rate predicts ≥ _GAIN_MIN
        more requests within it. A stale rate estimate expires (no
        arrival for 10×EWMA — a burst that ended must not keep opening
        windows for lone stragglers)."""
        with self._stats_lock:
            ew = self._ewma_interval
            last = self._last_arrival
        if self.window <= 0 or ew == float("inf") or ew <= 0:
            return False
        if last is not None and time.monotonic() - last > 10 * ew:
            return False
        return self.window / ew >= self._GAIN_MIN

    def _should_coalesce(self) -> bool:
        """Adaptive: follow the current throughput-probe phase."""
        with self._stats_lock:
            return self._mode == "multi"

    def direct_mode(self) -> bool:
        """True while the probe has the server in its "single" phase:
        handler threads dispatch batch-1 directly (parallel), bypassing
        the batcher funnel — leftovers already queued keep draining."""
        with self._stats_lock:
            return self._mode == "single"

    def note_direct_request(self) -> None:
        self._note_arrival()
        with self._stats_lock:
            self.stats["requests"] += 1
            self.stats["direct_requests"] = \
                self.stats.get("direct_requests", 0) + 1

    def note_direct_completion(self) -> None:
        self._note_completion(1)

    def _other(self, mode: str) -> str:
        return "single" if mode == "multi" else "multi"

    def _note_completion(self, n_requests: int) -> None:
        """Fetch-side phase accounting: count completed requests; at the
        phase's dispatch quota, measure its throughput and pick the next
        phase — probe the unmeasured/other mode, or commit to the
        measured winner for _COMMIT_LEN dispatches."""
        now = time.monotonic()
        with self._stats_lock:
            if self._phase_t0 is None:
                self._phase_t0 = now
            self._phase_reqs += n_requests
            self._phase_count += 1
            if self._phase_reqs < self._phase_len:
                return
            wall = now - self._phase_t0
            mode = self._mode
            if 0 < wall <= self._PHASE_MAX_S and self._phase_count > 1:
                self._tp[mode] = self._phase_reqs / wall
            # else: low-load/idle phase — discard the sample
            tp_m, tp_s = self._tp["multi"], self._tp["single"]
            if tp_m is None or tp_s is None:
                nxt, ln = self._other(mode), self._PROBE_LEN
            else:
                best = "multi" if tp_m >= tp_s else "single"
                if mode == best:
                    # been committed: re-probe the other mode briefly
                    nxt, ln = self._other(mode), self._PROBE_LEN
                else:
                    nxt, ln = best, self._COMMIT_LEN
            self._mode, self._phase_len = nxt, ln
            self._phase_count = 0
            self._phase_reqs = 0
            self._phase_t0 = None

    def submit(self, pts, mask):
        """pts/mask are DEVICE arrays (the caller pays the H2D transfer in
        its own thread); returns per-request numpy (pred, probs)."""
        if self.adaptive:
            self._note_arrival()
        done = threading.Event()
        slot = {"done": done}
        self._q.put((pts, mask, slot))
        # bounded wait: if a worker thread ever dies (the loops fail their
        # whole batch on any exception, but belt-and-braces), surface a
        # 500 to this request instead of wedging the handler thread (and
        # with it the whole ThreadingHTTPServer) forever
        while not done.wait(timeout=5.0):
            if not (self._dispatch.is_alive() and self._fetch.is_alive()):
                raise RuntimeError(
                    "micro-batcher worker thread died; restart the server")
        if "exc" in slot:
            raise slot["exc"]
        return slot["result"]

    @staticmethod
    def _fail(batch, exc):
        # per-slot exception instances: multiple handler threads re-raise
        # concurrently, and `raise` mutates the exception's __traceback__ —
        # sharing one instance produces confusing cross-request tracebacks
        for _, _, slot in batch:
            wrapped = RuntimeError(f"batched inference failed: {exc!r}")
            wrapped.__cause__ = exc
            slot["exc"] = wrapped
            slot["done"].set()

    def _dispatch_loop(self):
        jnp = self._pipeline._jnp
        while True:
            batch = [self._q.get()]
            # the WHOLE iteration is guarded: any exception fails this
            # batch's slots (handlers return 500) instead of killing the
            # daemon thread and wedging every future request
            try:
                if self.adaptive:
                    coalesce = self._should_coalesce()
                    wait = coalesce and self._should_wait()
                    if wait:
                        with self._stats_lock:
                            self.stats["windows_opened"] += 1
                else:
                    coalesce, wait = True, True
                if coalesce:
                    deadline = time.monotonic() + (self.window if wait
                                                   else 0.0)
                    while len(batch) < self.max_batch:
                        left = deadline - time.monotonic()
                        if left <= 0 and self._q.empty():
                            break
                        try:
                            batch.append(self._q.get(timeout=max(left, 0)))
                        except queue.Empty:
                            break
                n = len(batch)
                bucket = 1
                while bucket < n:
                    bucket *= 2
                # bucket-pad by repeating request 0's device refs: no extra
                # host bytes cross the wire for the padding rows' upload
                rows_p = [b[0] for b in batch] + [batch[0][0]] * (bucket - n)
                rows_m = [b[1] for b in batch] + [batch[0][1]] * (bucket - n)
                pred, probs = self._pipeline._run_batch(
                    self._pipeline.params, jnp.stack(rows_p),
                    jnp.stack(rows_m))
                # slice off the padding rows ON DEVICE so only live
                # results cross the wire at fetch time (the full-bucket
                # fetch was measured 2.5x the live bytes)
                pred, probs = pred[:n], probs[:n]
                # stats AFTER the dispatch call succeeds: a batch that
                # fails tracing/shape checks must not count as served work
                # (healthz would overstate requests/avg-batch after errors)
                with self._stats_lock:  # healthz snapshots under this lock
                    self.stats["requests"] += n
                    self.stats["dispatches"] += 1
                    self.stats["max_batch_seen"] = max(
                        self.stats["max_batch_seen"], n)
            except Exception as exc:  # trace/shape errors surface here
                with self._stats_lock:
                    self.stats["failed_dispatches"] += 1
                self._fail(batch, exc)
                continue
            # async values: hand to the fetcher and go collect the next
            # batch while the chip works (bounded queue = backpressure)
            self._fetch_q.put((batch, pred, probs))

    def _fetch_loop(self):
        while True:
            batch, pred, probs = self._fetch_q.get()
            try:
                pred, probs = np.asarray(pred), np.asarray(probs)
                results = [(pred[i], probs[i]) for i in range(len(batch))]
                if self.adaptive:
                    # phase accounting: completed requests drive the
                    # throughput probe that decides coalescing
                    self._note_completion(len(batch))
            except Exception as exc:  # runtime errors surface at fetch
                self._fail(batch, exc)
                continue
            for (_, _, slot), res in zip(batch, results):
                slot["result"] = res
                slot["done"].set()

    def stats_snapshot(self) -> dict:
        """Mutually-consistent copy of the counters (healthz derives
        avg batch = requests/dispatches; an unlocked read can observe
        requests incremented but dispatches not yet)."""
        with self._stats_lock:
            out = dict(self.stats)
            if self.adaptive:
                out["coalesce_mode"] = self._mode
                out["tp_multi_rps"] = (round(self._tp["multi"], 1)
                                       if self._tp["multi"] else None)
                out["tp_single_rps"] = (round(self._tp["single"], 1)
                                        if self._tp["single"] else None)
            return out


def make_handler(pipeline: _Pipeline):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            info = {
                "model": pipeline.model,
                "grid": pipeline.grid,
                "max_points": pipeline.max_points,
                "backend": getattr(pipeline.net, "backend",
                                   getattr(getattr(pipeline.net, "net", None),
                                           "backend", "?")),
            }
            if pipeline.model == "quantile":
                info["quantiles"] = list(pipeline.quantiles)
                info["mesh_ensemble"] = pipeline.mesh_ensemble
            if pipeline._batcher is not None:
                info["batching"] = dict(
                    pipeline._batcher.stats_snapshot(),
                    max_batch=pipeline._batcher.max_batch,
                    mode=("adaptive" if pipeline._batcher.adaptive
                          else "static"))
            body = json.dumps(info).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            # malformed bodies must produce an HTTP error, not an unhandled
            # exception in the handler thread (which drops the connection
            # with no response at all)
            try:
                length = int(self.headers.get("Content-Length", 0))
                data = np.load(io.BytesIO(self.rfile.read(length)))
                points = np.asarray(data["points"], np.float32)
                if points.ndim != 2 or points.shape[1] != 3:
                    raise ValueError(f"points must be (N, 3), got "
                                     f"{points.shape}")
                if len(points) == 0:
                    raise ValueError("points is empty")
                tau = float(data["tau"]) if "tau" in data else None
            except Exception as exc:
                self.send_error(400, explain=f"bad request body: {exc}")
                return

            try:
                t0 = time.perf_counter()
                pred, probs = pipeline.predict(points)
                latency = time.perf_counter() - t0
            except Exception as exc:  # keep the server alive
                self.send_error(500, explain=f"inference failed: {exc}")
                return

            out = io.BytesIO()
            if probs.ndim == 2:  # quantile ensemble (Q, N)
                qs = np.asarray(pipeline.quantiles)
                med = int(np.argmin(np.abs(qs - 0.5)))
                payload = {
                    "point_probs": probs[med],
                    "point_quantiles": probs,
                    # spread between the extreme quantiles — the
                    # reference's quantile-uncertainty measure
                    "uncertainty": probs.max(0) - probs.min(0),
                    "voxel_pred": pred,
                }
                if tau is not None:
                    payload["mask"] = (probs[med] >= tau).astype(np.float32)
            else:
                payload = {"point_probs": probs, "voxel_pred": pred}
                if tau is not None:
                    payload["mask"] = (probs >= tau).astype(np.float32)
            np.savez_compressed(out, **payload)
            body = out.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Latency-Ms", f"{latency * 1e3:.2f}")
            self.end_headers()
            self.wfile.write(body)

    return Handler


def _enable_compile_cache():
    """Persistent XLA compile cache: a --max-batch server warms one
    executable per power-of-two bucket at startup — minutes of fresh
    compiles through a remote tunnel, instant on restart with the cache."""
    try:
        import os

        import jax

        cache_dir = os.path.expanduser("~/.cache/jax_compilation")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    _enable_compile_cache()
    parser = argparse.ArgumentParser(description="Serve SCENE-Net inference")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--port", type=int, default=8400)
    parser.add_argument("--grid", type=int, default=64)
    parser.add_argument("--max-points", type=int, default=131072)
    parser.add_argument("--model", default="scenenet",
                        choices=["scenenet", "quantile"])
    parser.add_argument("--quantiles", default="0.1,0.5,0.9",
                        help="quantile levels for --model quantile")
    parser.add_argument("--mesh-ensemble", type=int, default=1,
                        help="shard the ensemble's members over this many "
                             "local devices (quantile model only)")
    parser.add_argument("--inference", default="bf16",
                        choices=["bf16", "mxu", "mxu_fast"],
                        help="conv forward on TPU: bf16 tap-scratch VPU "
                             "stencil (bit-exact on occupancy), banded-y "
                             "MXU split (near-f32), or single-bf16 MXU "
                             "(fastest; for mask-only consumers)")
    parser.add_argument("--max-batch", type=str, default="1",
                        help=">1 enables dynamic micro-batching: concurrent "
                             "requests coalesce into one batched dispatch "
                             "(power-of-two buckets, warmed at startup; "
                             "non-powers round DOWN — this is a cap, the "
                             "server never dispatches a bigger batch). "
                             "'auto' = adaptive mode (cap 32): drain-only "
                             "coalescing at low load, window opens only "
                             "when the measured arrival rate crosses the "
                             "batched-kernel break-even")
    parser.add_argument("--batch-window-ms", type=float, default=2.0,
                        help="how long the first queued request waits for "
                             "company before dispatching")
    args = parser.parse_args(argv)

    inference = True if args.inference == "bf16" else args.inference
    quantiles = tuple(float(q) for q in args.quantiles.split(","))
    adaptive = args.max_batch.strip().lower() == "auto"
    max_batch = 32 if adaptive else int(args.max_batch)
    pipeline = _Pipeline(args.checkpoint, (args.grid,) * 3, args.max_points,
                         inference=inference, model=args.model,
                         quantiles=quantiles,
                         mesh_ensemble=args.mesh_ensemble,
                         max_batch=max_batch,
                         batch_window_ms=args.batch_window_ms,
                         adaptive=adaptive)
    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(pipeline))
    batching = (f", micro-batching ≤{pipeline._batcher.max_batch} "
                f"@ {args.batch_window_ms} ms"
                f"{' (adaptive)' if adaptive else ''}"
                if pipeline._batcher is not None else "")
    print(f"serving SCENE-Net ({args.model}) on http://127.0.0.1:{args.port} "
          f"(grid {args.grid}³, ≤{args.max_points} pts{batching})")
    server.serve_forever()


if __name__ == "__main__":
    main()
