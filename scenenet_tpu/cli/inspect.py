"""White-box model inspection: the interpretability story of SCENE-Net.

Dumps, from a checkpoint (native npz or imported reference .ckpt):
- every GENEO scalar parameter and convex coefficient (with the derived
  last λ), as a table and JSON;
- each observer's synthesized 3D kernel as a colored PLY point cloud
  (positive weights red, negative blue — the reference shows these in an
  open3d window, ``GENEO_kernel_torch.plot_kernel``);
- the combined (λ-weighted) kernel.

Usage:
    python -m scenenet_tpu.cli.inspect --checkpoint ckpt.npz \
        [--config cfg.yaml] [--out inspect_out]
    python -m scenenet_tpu.cli.inspect --reference-ckpt FBetaScore.ckpt
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from scenenet_tpu.utils.viz import voxelgrid_to_points, write_ply


def main(argv=None):
    parser = argparse.ArgumentParser(description="Inspect a SCENE-Net checkpoint")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="native npz checkpoint")
    parser.add_argument("--reference-ckpt", type=str, default=None,
                        help="reference Lightning .ckpt to import")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--out", type=str, default="inspect_out")
    args = parser.parse_args(argv)

    if args.reference_ckpt:
        from scenenet_tpu.compat import import_scenenet_params

        model, params = import_scenenet_params(args.reference_ckpt)
    else:
        from scenenet_tpu.cli.train import build_model
        from scenenet_tpu.train.checkpoint import restore_checkpoint
        from scenenet_tpu.utils.config import load_config

        if args.checkpoint is None:
            parser.error("provide --checkpoint or --reference-ckpt")
        cfg = load_config(args.config)
        model, params = build_model(cfg)
        params = restore_checkpoint(args.checkpoint, params)

    os.makedirs(args.out, exist_ok=True)
    table = model.parameters_in_dict(params)
    print(f"{'parameter':34s} value")
    print("-" * 46)
    for name, value in table.items():
        print(f"{name:34s} {value: .5f}")
    with open(os.path.join(args.out, "parameters.json"), "w") as f:
        json.dump(table, f, indent=2)

    kernels = np.asarray(model.synthesize_kernels(params))
    lams = np.asarray(model.effective_lambdas(params))
    for (name, _), k in zip(model.observers, kernels):
        scale = max(abs(k.min()), abs(k.max()), 1e-9)
        pts = voxelgrid_to_points(k / scale, "density")
        write_ply(os.path.join(args.out, f"kernel_{name}.ply"), pts)
        print(f"kernel {name}: shape {k.shape}, sum {k.sum():+.5f}, "
              f"range [{k.min():+.4f}, {k.max():+.4f}]")
    combined = np.einsum("g,gzxy->zxy", lams, kernels)
    scale = max(abs(combined.min()), abs(combined.max()), 1e-9)
    write_ply(os.path.join(args.out, "kernel_combined.ply"),
              voxelgrid_to_points(combined / scale, "density"))
    print(f"combined kernel sum {combined.sum():+.5f} "
          f"(λ = {np.round(lams, 4).tolist()})")


if __name__ == "__main__":
    main()
