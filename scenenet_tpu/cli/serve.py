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
                 inference: "bool | str" = True, model: str = "scenenet",
                 quantiles=(0.1, 0.5, 0.9), mesh_ensemble: int = 1):
        import jax
        import jax.numpy as jnp

        from scenenet_tpu.models import SceneNet
        from scenenet_tpu.ops.voxelize import (
            _flat_zxy_idx, gather_point_values, grid_bounds, voxel_indices,
            voxelize_batch_hist,
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

        self._run = run
        self._jnp = jnp
        # warm the executable
        self.predict(np.zeros((16, 3), np.float32))

    def predict(self, points: np.ndarray):
        """Returns (voxel_pred, point_probs): (Z,X,Y)/(N,) for scenenet,
        (Q,Z,X,Y)/(Q,N) for the quantile ensemble."""
        n = min(len(points), self.max_points)
        pts = np.zeros((self.max_points, 3), np.float32)
        mask = np.zeros(self.max_points, bool)
        pts[:n] = points[:n] - points[:n].min(0)
        mask[:n] = True
        pred, probs = self._run(self.params, self._jnp.asarray(pts),
                                self._jnp.asarray(mask))
        return np.asarray(pred), np.asarray(probs)[..., :n]


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


def main(argv=None):
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
    args = parser.parse_args(argv)

    inference = True if args.inference == "bf16" else args.inference
    quantiles = tuple(float(q) for q in args.quantiles.split(","))
    pipeline = _Pipeline(args.checkpoint, (args.grid,) * 3, args.max_points,
                         inference=inference, model=args.model,
                         quantiles=quantiles,
                         mesh_ensemble=args.mesh_ensemble)
    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(pipeline))
    print(f"serving SCENE-Net ({args.model}) on http://127.0.0.1:{args.port} "
          f"(grid {args.grid}³, ≤{args.max_points} pts)")
    server.serve_forever()


if __name__ == "__main__":
    main()
