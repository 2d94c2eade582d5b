"""Serving latency: single-request (batch-1) end-to-end percentiles.

The serving receipts so far are throughput-shaped (grids/s at batch
128-512); a production server is judged on request latency. This
benchmark drives the REAL server (`scenenet_tpu.cli.serve` in a
subprocess, stdlib HTTP) with one fixture cloud per request and reports:

  - e2e:    client-side wall time per POST /predict (connect + npz
            serialize + server + npz response)
  - server: the server's own X-Latency-Ms header (host pad/copy +
            device dispatch + fetch inside `_Pipeline.predict`)
  - device: chained-fori_loop compute time of the same jitted `run`
            executable in-process (the honest on-chip cost; everything
            between `server` and `device` is host prep + tunnel RTT —
            on a local TPU host that gap collapses to the PCIe copy)

plus closed-loop concurrency runs for sustained single-server RPS —
without and (``--max-batch B``) with dynamic micro-batching, the A/B
that justifies the serve CLI's ``--max-batch`` knob.

Usage: python benchmarks/serve_latency.py [--inference bf16|mxu|mxu_fast]
           [--model scenenet|quantile] [--requests 50] [--max-batch 8]
"""

from __future__ import annotations

import argparse
import io
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request
from json import loads as json_loads

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/root/reference/data-sample/sample_575.npy"
PORT = 8437

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _server_env():
    """Subprocess env with the repo importable. PREPEND to PYTHONPATH —
    overwriting it would drop this environment's sitecustomize dir
    (/root/.axon_site) and with it the axon TPU plugin registration."""
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _wait_healthy(port: int, proc: subprocess.Popen, timeout: float = 900.0):
    """Generous: a --max-batch server warms one executable per
    power-of-two bucket at startup (fresh compiles ~60 s each through
    the dev tunnel)."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            raise RuntimeError(f"server died rc={proc.returncode}")
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                return r.read()
        except Exception:
            time.sleep(1.0)
    raise TimeoutError("server never became healthy")


def _request_body(points: np.ndarray, tau: float = 0.65) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, points=points.astype(np.float32), tau=np.float32(tau))
    return buf.getvalue()


def _post(port: int, body: bytes):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=body,
        headers={"Content-Type": "application/octet-stream"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=120) as r:
        server_ms = float(r.headers.get("X-Latency-Ms", "nan"))
        payload = r.read()
    e2e_ms = (time.perf_counter() - t0) * 1e3
    return e2e_ms, server_ms, payload


def _pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def device_compute_ms(inference, model, grid, max_points, iters=30,
                      max_batch=1):
    """Chained fori_loop timing of the serve pipeline's own executables
    (tunnel-honest: one dispatch for all iters). Returns (batch-1 ms,
    {bucket: per-request ms}) — the second is the device-side
    batched-vs-sequential A/B, i.e. the regime a LOCAL TPU host serves
    in (PCIe wire, device compute dominant)."""
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.cli.serve import _Pipeline

    pipe = _Pipeline(None, grid, max_points, inference=inference,
                     model=model)
    cloud = np.load(FIXTURE)[:, :3]
    n = min(len(cloud), max_points)
    pts = np.zeros((max_points, 3), np.float32)
    mask = np.zeros(max_points, bool)
    pts[:n] = cloud[:n] - cloud[:n].min(0)
    mask[:n] = True
    pts_d, mask_d = jnp.asarray(pts), jnp.asarray(mask)

    def chained_ms(run_fn, pts_a, mask_a, reps):
        @jax.jit
        def chain(params, pts, mask):
            def body(_, acc):
                pred, probs = run_fn(params, pts + acc * 0, mask)
                return acc + probs.ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        chain(pipe.params, pts_a, mask_a).block_until_ready()  # compile
        t0 = time.perf_counter()
        chain(pipe.params, pts_a, mask_a).block_until_ready()
        return (time.perf_counter() - t0) / reps * 1e3

    ms1 = chained_ms(pipe._run, pts_d, mask_d, iters)
    batched = {}
    b = 2
    while b <= max_batch:
        pts_b = jnp.broadcast_to(pts_d, (b,) + pts_d.shape)
        mask_b = jnp.broadcast_to(mask_d, (b,) + mask_d.shape)
        batched[b] = chained_ms(pipe._run_batch, pts_b, mask_b,
                                max(iters // b, 4)) / b
        b *= 2
    return ms1, batched


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--inference", default="bf16",
                    choices=["bf16", "mxu", "mxu_fast"])
    ap.add_argument("--model", default="scenenet",
                    choices=["scenenet", "quantile"])
    ap.add_argument("--requests", type=int, default=50)
    ap.add_argument("--max-points", type=int, default=65536)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--max-batch", type=int, default=8,
                    help=">1 adds a micro-batched server A/B leg")
    ap.add_argument("--device-only", action="store_true",
                    help="skip the HTTP server legs; just the in-process "
                         "device-side batched-vs-sequential A/B")
    ap.add_argument("--adaptive-ab", action="store_true",
                    help="mixed open/closed-load A/B of the three batching "
                         "modes (VERDICT r4 #5): static-1, static-batched, "
                         "adaptive (--max-batch auto) — each measured in a "
                         "LOW regime (sequential requests) and a HIGH "
                         "regime (threaded closed loop); adaptive should "
                         "match static-1 in low and static-batched in high")
    ap.add_argument("--batched-only", action="store_true",
                    help="skip the direct server leg (re-run the batched "
                         "A/B against already-recorded direct numbers)")
    args = ap.parse_args(argv)
    if args.max_batch > 1:
        # keep the batcher's queue fed: 2× oversubscription; same thread
        # count for the direct leg (a serial device pipeline gains nothing
        # from extra clients, so the A/B stays fair)
        args.threads = max(args.threads, 2 * args.max_batch)

    cloud = np.load(FIXTURE)[:, :3]  # 58,243 points, a real TS40K crop
    body = _request_body(cloud)
    print(f"[serve_latency] model={args.model} inference={args.inference} "
          f"cloud={len(cloud)} pts, body={len(body) / 1e6:.2f} MB")

    def closed_loop(threads, per):
        lat, errs, lock = [], [], threading.Lock()

        def worker(k):
            for _ in range(k):
                try:
                    e, s, _ = _post(PORT, body)
                except Exception as exc:  # count failures; keep the loop
                    with lock:             # honest instead of dying silently
                        errs.append(repr(exc))
                    continue
                with lock:
                    lat.append(e)

        ts = [threading.Thread(target=worker, args=(per,))
              for _ in range(threads)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.perf_counter() - t0
        if errs:
            print(f"  [closed-loop] {len(errs)} FAILED requests "
                  f"(first: {errs[0]})")
        # completed/wall — threads*per/wall would overstate throughput
        # exactly when the server is struggling
        return len(lat) / wall, lat

    def run_server(extra, label, measure_sequential):
        # server logs go to a tempfile, NOT a PIPE: an undrained pipe
        # fills the OS buffer once JAX/libtpu logs exceed ~64 KB and the
        # server blocks mid-write — the benchmark then hangs on healthz
        log = tempfile.NamedTemporaryFile(
            mode="w+b", prefix="serve_latency_", suffix=".log", delete=False)
        proc = subprocess.Popen(
            [sys.executable, "-m", "scenenet_tpu.cli.serve",
             "--port", str(PORT), "--grid", str(args.grid),
             "--max-points", str(args.max_points),
             "--model", args.model, "--inference", args.inference] + extra,
            stdout=log, stderr=subprocess.STDOUT, env=_server_env())
        print(f"  [{label}] server log: {log.name}")
        try:
            _wait_healthy(PORT, proc)
            for _ in range(3):  # warmup
                _post(PORT, body)

            if measure_sequential:
                e2e, server = [], []
                for _ in range(args.requests):
                    e, s, payload = _post(PORT, body)
                    e2e.append(e)
                    server.append(s)
                print(f"  [{label}] sequential x{args.requests}: "
                      f"e2e p50={_pct(e2e, 50):.1f} p95={_pct(e2e, 95):.1f} "
                      f"p99={_pct(e2e, 99):.1f} ms | server "
                      f"p50={_pct(server, 50):.1f} "
                      f"p95={_pct(server, 95):.1f} ms | "
                      f"response {len(payload) / 1e6:.2f} MB")

            per = max(args.requests // args.threads, 8)
            rps, lat = closed_loop(args.threads, per)
            print(f"  [{label}] {args.threads}-thread closed loop: "
                  f"{rps:.1f} req/s sustained, p50={_pct(lat, 50):.1f} "
                  f"p99={_pct(lat, 99):.1f} ms")
            if "batched" in label:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{PORT}/healthz") as r:
                    print(f"  [{label}] healthz batching: "
                          f"{json_loads(r.read())['batching']}")
        finally:
            proc.terminate()
            proc.wait(timeout=30)

    def run_ab_server(extra, label):
        """One server, both regimes; prints a JSON line per regime."""
        from json import dumps

        log = tempfile.NamedTemporaryFile(
            mode="w+b", prefix="serve_ab_", suffix=".log", delete=False)
        proc = subprocess.Popen(
            [sys.executable, "-m", "scenenet_tpu.cli.serve",
             "--port", str(PORT), "--grid", str(args.grid),
             "--max-points", str(args.max_points),
             "--model", args.model, "--inference", args.inference] + extra,
            stdout=log, stderr=subprocess.STDOUT, env=_server_env())
        try:
            _wait_healthy(PORT, proc)
            for _ in range(3):
                _post(PORT, body)
            # LOW regime: one request at a time (open, idle server)
            e2e = []
            for _ in range(args.requests):
                e, _, _ = _post(PORT, body)
                e2e.append(e)
            print(dumps({"tag": "adaptive_ab", "mode": label,
                         "regime": "low", "p50_ms": round(_pct(e2e, 50), 1),
                         "p99_ms": round(_pct(e2e, 99), 1)}), flush=True)
            # HIGH regime: threaded closed loop (sustained concurrency)
            rps, lat = closed_loop(args.threads, max(args.requests
                                                     // args.threads, 8))
            rec = {"tag": "adaptive_ab", "mode": label, "regime": "high",
                   "rps": round(rps, 1), "p50_ms": round(_pct(lat, 50), 1),
                   "p99_ms": round(_pct(lat, 99), 1)}
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{PORT}/healthz") as r:
                    rec["batching"] = json_loads(r.read()).get("batching")
            except Exception:
                pass
            print(dumps(rec), flush=True)
        finally:
            proc.terminate()
            proc.wait(timeout=30)

    if args.adaptive_ab:
        run_ab_server([], "static-1")
        run_ab_server(["--max-batch", "32", "--batch-window-ms", "2"],
                      "static-batched")
        run_ab_server(["--max-batch", "auto", "--batch-window-ms", "2"],
                      "adaptive")
        return

    if not args.device_only:
        if not args.batched_only:
            run_server([], "direct", measure_sequential=True)
        if args.max_batch > 1:
            run_server(["--max-batch", str(args.max_batch),
                        "--batch-window-ms", "2"],
                       f"batched<={args.max_batch}", measure_sequential=False)

    if args.batched_only:
        return
    dev, dev_batched = device_compute_ms(
        True if args.inference == "bf16" else args.inference,
        args.model, (args.grid,) * 3, args.max_points,
        max_batch=args.max_batch)
    print(f"  device compute (chained fori_loop, in-process): {dev:.2f} ms "
          f"— the on-chip cost; server−device = host pad/copy + tunnel RTT")
    for b, ms in sorted(dev_batched.items()):
        print(f"  device compute batched b={b}: {ms:.2f} ms/request "
              f"({dev / ms:.2f}x batch-1) — the local-host (PCIe) "
              f"micro-batching regime")


if __name__ == "__main__":
    main()
