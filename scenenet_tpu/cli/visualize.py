"""Prediction + visualization entry point.

Twin of the reference ``scripts/visualize.py``: loads a checkpoint, runs
prediction over the test split, and exports colored point clouds (input /
GT / prediction / pred-vs-GT composite) plus tower-proposal coordinates.

Usage:
    python -m scenenet_tpu.cli.visualize --config experiments/defaults.yaml \
        --checkpoint path/to/ckpt.npz --out out_dir [--n 4]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax

from scenenet_tpu.cli.train import build_datasets, build_model
from scenenet_tpu.ops.voxel_np import prob_to_label_np
from scenenet_tpu.train.checkpoint import restore_checkpoint
from scenenet_tpu.utils.config import load_config
from scenenet_tpu.utils.proposals import get_tower_proposals
from scenenet_tpu.utils.viz import pred_vs_gt_points, voxelgrid_to_points, write_ply


def main(argv=None):
    parser = argparse.ArgumentParser(description="Visualize SCENE-Net predictions")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--out", type=str, default="visualizations")
    parser.add_argument("--n", type=int, default=4, help="number of test samples")
    parser.add_argument("--tau", type=float, default=0.65)
    args = parser.parse_args(argv)

    cfg = load_config(args.config)
    cfg.device_voxelization = False  # visualization wants host (x, y) grids
    model, params = build_model(cfg)
    params = restore_checkpoint(args.checkpoint, params)
    _, _, test_ds = build_datasets(cfg)
    os.makedirs(args.out, exist_ok=True)

    apply = jax.jit(model.apply)
    summary = []
    for i in range(min(args.n, len(test_ds))):
        x, y = test_ds[i]
        pred = np.asarray(apply(params, np.asarray(x)[None]))[0]
        mask = prob_to_label_np(pred, args.tau)

        write_ply(os.path.join(args.out, f"sample{i}_input.ply"),
                  voxelgrid_to_points(np.squeeze(x), "ranges"))
        write_ply(os.path.join(args.out, f"sample{i}_gt.ply"),
                  voxelgrid_to_points(np.squeeze(y), "ranges"))
        write_ply(os.path.join(args.out, f"sample{i}_pred.ply"),
                  voxelgrid_to_points(np.squeeze(pred), "ranges"))
        write_ply(os.path.join(args.out, f"sample{i}_pred_vs_gt.ply"),
                  pred_vs_gt_points(mask, np.squeeze(y)))

        proposals = get_tower_proposals(pred, density_grid=np.squeeze(x), tau=args.tau)
        summary.append({
            "sample": i,
            "pred_voxels": int(mask.sum()),
            "gt_voxels": int((np.squeeze(y) > 0).sum()),
            "proposals": proposals.tolist(),
        })
        print(f"sample {i}: {int(mask.sum())} pred voxels, "
              f"{len(proposals)} tower proposals")

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
