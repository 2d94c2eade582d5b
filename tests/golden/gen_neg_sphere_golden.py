"""Generate the non-cubic neg_sphere golden fixture (VERDICT r3 #4).

The reference's neg_sphere classes build their kernels row-major over a
meshgrid and then ``torch.t(...).view(kernel_size)`` — for NON-cubic sizes
that reshape scrambles the (z, x, y) index mapping, so the executed
reference code cannot serve as an oracle there
(``/root/reference/core/models/geneos/neg_sphere.py:150,199``). This script
pins the INTENDED radial math instead, computed by a brute-force float64
triple Python loop — no numpy broadcasting, no jax, no shared helpers with
the implementation under test:

    v1 (``neg_sphere.py:123-158``):
        g[z,x,y]  = exp(-((‖(z,x,y) − c‖² − r²)²) / (2σ²))
        out       = g − mean(g) − neg_factor
    v2 (``neg_sphere.py:160-199``):
        g[z,x,y]  = σ·exp(-((‖(z,x,y) − c‖²)²) / (2(r + 1e-8)²))
        k         = −neg_factor·g
        out       = k − (sum(k) + neg_factor) / volume

with c = ((k_z−1)/2, (k_x−1)/2, (k_y−1)/2).

Parameter draws replicate the reference's random init distribution
(``neg_sphere.py:87-104``) via ``random_geneo_params`` so the golden covers
the live regime. Run from the repo root:

    python tests/golden/gen_neg_sphere_golden.py
"""

import math
import os

import numpy as np

from scenenet_tpu.geneo.kernels import random_geneo_params

KSIZES = [(9, 5, 5), (9, 6, 6)]
N_DRAWS = 3


def oracle(kind, ks, radius, sigma, neg_factor):
    k_z, k_x, k_y = ks
    cz, cx, cy = (k_z - 1) / 2.0, (k_x - 1) / 2.0, (k_y - 1) / 2.0
    out = np.empty(ks, dtype=np.float64)
    for z in range(k_z):
        for x in range(k_x):
            for y in range(k_y):
                d2 = (z - cz) ** 2 + (x - cx) ** 2 + (y - cy) ** 2
                if kind == "neg_sphere":
                    circ = d2 - radius**2
                    out[z, x, y] = math.exp(circ**2 * (-1.0 / (2.0 * sigma**2)))
                else:
                    g = sigma * math.exp(d2**2 * (-1.0 / (2.0 * (radius + 1e-8) ** 2)))
                    out[z, x, y] = -neg_factor * g
    vol = k_z * k_x * k_y
    if kind == "neg_sphere":
        return out - out.sum() / vol - neg_factor
    return out - (out.sum() + neg_factor) / vol


def main():
    arrays = {}
    for kind in ("neg_sphere", "neg_sphere_v2"):
        for ks in KSIZES:
            for seed in range(N_DRAWS):
                rng = np.random.default_rng(100 * seed + sum(map(ord, kind)) % 97)
                draw = random_geneo_params(kind, rng, ks)
                key = f"{kind}__{'x'.join(map(str, ks))}__{seed}"
                arrays[key + "__kernel"] = oracle(kind, ks, **draw)
                arrays[key + "__params"] = np.array(
                    [draw["radius"], draw["sigma"], draw["neg_factor"]],
                    dtype=np.float64)
    path = os.path.join(os.path.dirname(__file__), "neg_sphere_noncubic.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}: {len(arrays)} arrays")


if __name__ == "__main__":
    main()
