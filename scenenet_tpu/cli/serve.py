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

GET /healthz returns build/model info.

Usage:
    python -m scenenet_tpu.cli.serve --checkpoint ckpt.npz [--port 8400]
"""

from __future__ import annotations

import argparse
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Pipeline:
    def __init__(self, checkpoint: str | None, grid=(64, 64, 64),
                 max_points: int = 131072, kernel_size=(9, 5, 5),
                 inference: "bool | str" = True):
        import jax
        import jax.numpy as jnp

        from scenenet_tpu.models import SceneNet
        from scenenet_tpu.ops.voxelize import (
            _flat_zxy_idx, gather_point_values, grid_bounds, voxel_indices,
            voxelize_batch_hist,
        )
        from scenenet_tpu.train.checkpoint import restore_checkpoint

        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.net, self.params = SceneNet.create(kernel_size=kernel_size,
                                                seed=0, backend=backend)
        if checkpoint:
            self.params = restore_checkpoint(checkpoint, self.params)
        self.grid = grid
        self.max_points = max_points

        @jax.jit
        def run(params, pts, mask):
            hist = voxelize_batch_hist(pts[None], mask[None], grid)
            x = (hist > 0).astype(jnp.float32)[:, None]
            # binarized occupancy input → the bf16-scratch inference
            # forward is bit-exact here; "mxu"/"mxu_fast" ride the
            # banded-y MXU stencil (near-f32 / single-bf16)
            infer = inference if self.net.backend != "xla" else False
            pred = self.net.apply(params, x, inference=infer)[0, 0]
            lo, hi = grid_bounds(pts, mask)
            flat = _flat_zxy_idx(voxel_indices(pts, lo, hi, grid), grid)
            probs = gather_point_values(pred, flat, mask)
            return pred, probs

        self._run = run
        self._jnp = jnp
        # warm the executable
        self.predict(np.zeros((16, 3), np.float32))

    def predict(self, points: np.ndarray):
        n = min(len(points), self.max_points)
        pts = np.zeros((self.max_points, 3), np.float32)
        mask = np.zeros(self.max_points, bool)
        pts[:n] = points[:n] - points[:n].min(0)
        mask[:n] = True
        pred, probs = self._run(self.params, self._jnp.asarray(pts),
                                self._jnp.asarray(mask))
        return np.asarray(pred), np.asarray(probs)[:n]


def make_handler(pipeline: _Pipeline):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            info = {
                "model": "scenenet",
                "grid": pipeline.grid,
                "max_points": pipeline.max_points,
                "backend": pipeline.net.backend,
            }
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


def main(argv=None):
    parser = argparse.ArgumentParser(description="Serve SCENE-Net inference")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--port", type=int, default=8400)
    parser.add_argument("--grid", type=int, default=64)
    parser.add_argument("--max-points", type=int, default=131072)
    parser.add_argument("--inference", default="bf16",
                        choices=["bf16", "mxu", "mxu_fast"],
                        help="conv forward on TPU: bf16 tap-scratch VPU "
                             "stencil (bit-exact on occupancy), banded-y "
                             "MXU split (near-f32), or single-bf16 MXU "
                             "(fastest; for mask-only consumers)")
    args = parser.parse_args(argv)

    inference = True if args.inference == "bf16" else args.inference
    pipeline = _Pipeline(args.checkpoint, (args.grid,) * 3, args.max_points,
                         inference=inference)
    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(pipeline))
    print(f"serving SCENE-Net on http://127.0.0.1:{args.port} "
          f"(grid {args.grid}³, ≤{args.max_points} pts)")
    server.serve_forever()


if __name__ == "__main__":
    main()
