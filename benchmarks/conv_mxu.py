"""Stencil-conv MXU experiments (round-3 roofline lever).

The headline roofline puts the Pallas stencil forward at ~8× the VPU
FLOP floor and names "move the z-chain onto the MXU" as the untried
lever. Variants at the headline shape (64³, kernel (9,5,5), batch 128,
occupancy input, activation fused):

- c0_current: production `geneo_stencil_conv` (bf16 tap scratch)
- c1_stage_only / c2_chain_only: micro-ablation of the current kernel —
  where do the ~1.2 µs/tap-slab actually go (staging vs FMA chains)?
- c3_mxu_by: fold the k_y lane-shifts into banded matmuls — per (dx, dz)
  one (z, xx, yp) @ (yp, yy) bf16 dot with B_y[dz,dx][y+dy, y] =
  k[dz,dx,dy]; the dy rotates disappear and the z-chain rides the MXU.
  Occupancy inputs are exact in bf16; the kernel weights round (~1e-3).
- c4_mxu_by_split: same with B_y split into two bf16 matrices
  (B = hi + lo) — error ~6e-5, far below the 9.5e-3 XLA-conv delta.
- c5_banded_z: the literal named lever — per (dx,dy) tap, the 9-FMA
  z-chain as a (z, zp) banded contraction (staging unchanged).

Each variant is exactness-checked (max|Δ| + τ=0.65 mask flip count vs
the f32 production kernel) before timing. One JSON line per result.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import os
import sys
import time

import numpy as np

BATCH = 128
GRID = (64, 64, 64)
KSIZE = (9, 5, 5)
ITERS = 16
BZ = 16


def _enable_compile_cache():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _ablate_kernel(x_ref, k_ref, o_ref, shift_ref, *, kernel_size,
                   mode: str):
    """mode='stage': all 25 stagings, one chain. mode='chain': one
    staging, all 25 chains. Timing-only (wrong results by design)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    k_z, k_x, k_y = kernel_size
    _, z, x, y = o_ref.shape
    base = pl.program_id(1) * z
    zp = shift_ref.shape[0]
    first = True
    for dx in range(k_x):
        for dy in range(k_y):
            if mode == "stage" or (dx, dy) == (0, 0):
                shift_ref[...] = x_ref[
                    0, pl.ds(base, zp), dx:dx + x, dy:dy + y
                ].astype(shift_ref.dtype)
            if mode == "chain" or (dx, dy) == (0, 0):
                acc = shift_ref[pl.ds(0, z)] * k_ref[0, dx, dy]
                for dz in range(1, k_z):
                    acc = acc + shift_ref[pl.ds(dz, z)] * k_ref[dz, dx, dy]
                if first:
                    o_ref[0] = acc
                    first = False
                else:
                    o_ref[0] += acc


def _mxu_by_kernel(x_ref, by_ref, o_ref, shift_ref, *, kernel_size,
                   activation: bool, split: bool):
    """Per (dx, dz): (z, xx, yp) @ (yp, yy) dot against the banded
    B_y matrix — k_y folded into the contraction, z-chain on the MXU.
    Dot dtype follows the scratch/band dtype (f32 or bf16)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    k_z, k_x, k_y = kernel_size
    _, z, xx, yy = o_ref.shape
    base = pl.program_id(1) * z
    zp = shift_ref.shape[0]
    dims = (((2,), (0,)), ((), ()))
    for dx in range(k_x):
        shift_ref[...] = x_ref[0, pl.ds(base, zp), dx:dx + xx, :].astype(
            shift_ref.dtype)
        acc = None
        for dz in range(k_z):
            s = shift_ref[pl.ds(dz, z)]  # (z, xx, yp)
            d = lax.dot_general(s, by_ref[0, dz, dx], dims,
                                preferred_element_type=jnp.float32)
            if split:
                d += lax.dot_general(s, by_ref[1, dz, dx], dims,
                                     preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        if dx == 0:
            o_ref[0] = acc
        else:
            o_ref[0] += acc
    if activation:
        o_ref[0] = jax.nn.relu(jnp.tanh(o_ref[0]))


def _banded_z_kernel(x_ref, w2_ref, o_ref, shift_ref, *,
                     kernel_size, activation: bool):
    """Named lever verbatim: staging as production, z-chain as a banded
    (zp, z) contraction on the MXU (bf16)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    k_z, k_x, k_y = kernel_size
    _, z, xx, yy = o_ref.shape
    base = pl.program_id(1) * z
    zp = shift_ref.shape[0]
    first = True
    for dx in range(k_x):
        for dy in range(k_y):
            shift_ref[...] = x_ref[
                0, pl.ds(base, zp), dx:dx + xx, dy:dy + yy
            ].astype(jnp.bfloat16)
            # out[z,x,y] = sum_j W2[j,z] * S[j,x,y]; tap weight folded
            # into W2's band. Contract the major (j) dim.
            s = shift_ref[...]
            d = lax.dot_general(
                w2_ref[dx, dy].astype(jnp.bfloat16), s,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if first:
                o_ref[0] = d
                first = False
            else:
                o_ref[0] += d
    if activation:
        o_ref[0] = jax.nn.relu(jnp.tanh(o_ref[0]))


def build_variants():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k_z, k_x, k_y = KSIZE
    zz, xx, yy = GRID
    zp = BZ + k_z - 1
    yp = yy + k_y - 1

    def pad_input(x):
        pads = [(0, 0), (0, 0), ((k_z - 1) // 2, k_z // 2),
                ((k_x - 1) // 2, k_x // 2), ((k_y - 1) // 2, k_y // 2)]
        return jnp.pad(x, pads)[:, 0]

    def run_ablate(x, kernel, mode):
        xp = pad_input(x)
        b = x.shape[0]
        return pl.pallas_call(
            functools.partial(_ablate_kernel, kernel_size=KSIZE, mode=mode),
            out_shape=jax.ShapeDtypeStruct((b, zz, xx, yy), jnp.float32),
            grid=(b, zz // BZ),
            in_specs=[
                pl.BlockSpec((1, zz + k_z - 1, xx + k_x - 1, yy + k_y - 1),
                             lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BZ, xx, yy), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((zp, xx, yy), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp, kernel.astype(jnp.float32))

    def make_by(kernel, split, kp=yp, dtype=jnp.bfloat16):
        """(1|2, k_z, k_x, kp, yy) banded matrices (kp≥yp rows, rest 0)."""
        band = np.zeros((k_z, k_x, kp, yy), np.float32)
        k = np.asarray(kernel, np.float32)
        for dz in range(k_z):
            for dx in range(k_x):
                for dy in range(k_y):
                    for y in range(yy):
                        band[dz, dx, y + dy, y] = k[dz, dx, dy]
        hi = band.astype(np.float32)
        hi16 = hi.astype(dtype)
        if not split:
            return jnp.asarray(hi16)[None]
        lo16 = (hi - np.asarray(hi16, np.float32)).astype(dtype)
        return jnp.stack([jnp.asarray(hi16), jnp.asarray(lo16)])

    def run_mxu_by(x, by, activation=True, split=False,
                   sdtype=jnp.bfloat16):
        kp = by.shape[3]  # contraction rows (yp or 128-aligned)
        xp = pad_input(x)
        if kp > yp:
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, kp - yp)))
        b = x.shape[0]
        return pl.pallas_call(
            functools.partial(_mxu_by_kernel, kernel_size=KSIZE,
                              activation=activation, split=split),
            out_shape=jax.ShapeDtypeStruct((b, zz, xx, yy), jnp.float32),
            grid=(b, zz // BZ),
            in_specs=[
                pl.BlockSpec((1, zz + k_z - 1, xx + k_x - 1, kp),
                             lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BZ, xx, yy), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((zp, xx, kp), sdtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp, by)

    def make_w2(kernel):
        """(k_x, k_y, zp, BZ) banded: W2[dx,dy][j, z] = k[j-z, dx, dy]."""
        k = np.asarray(kernel, np.float32)
        w2 = np.zeros((k_x, k_y, zp, BZ), np.float32)
        for dx in range(k_x):
            for dy in range(k_y):
                for z in range(BZ):
                    for dz in range(k_z):
                        w2[dx, dy, z + dz, z] = k[dz, dx, dy]
        return jnp.asarray(w2)

    def run_banded_z(x, w2, activation=True):
        xp = pad_input(x)
        b = x.shape[0]
        return pl.pallas_call(
            functools.partial(_banded_z_kernel, kernel_size=KSIZE,
                              activation=activation),
            out_shape=jax.ShapeDtypeStruct((b, zz, xx, yy), jnp.float32),
            grid=(b, zz // BZ),
            in_specs=[
                pl.BlockSpec((1, zz + k_z - 1, xx + k_x - 1, yy + k_y - 1),
                             lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BZ, xx, yy), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((zp, xx, yy), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp, w2)

    return run_ablate, make_by, run_mxu_by, make_w2, run_banded_z


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from scenenet_tpu.models import SceneNet
    from scenenet_tpu.ops.pallas_conv import geneo_stencil_conv
    from scenenet_tpu.ops.voxelize import voxelize_batch_occupancy

    files = sorted(os.listdir("/root/reference/data-sample"))
    clouds = [np.load(os.path.join("/root/reference/data-sample", f))
              for f in files if f.endswith(".npy")]
    pts = np.zeros((BATCH, 81920, 3), np.float32)
    mask = np.zeros((BATCH, 81920), bool)
    for b in range(BATCH):
        xyz = clouds[b % len(clouds)][:, :3]
        n = min(len(xyz), 81920)
        pts[b, :n] = (xyz[:n] - xyz[:n].min(0)).astype(np.float32)
        mask[b, :n] = True
    grids = voxelize_batch_occupancy(jnp.asarray(pts), jnp.asarray(mask),
                                     GRID)[:, None]
    grids = jax.device_put(grids)

    # a real combined GENEO kernel from the flagship model
    net, params = SceneNet.create(kernel_size=KSIZE, seed=0,
                                  backend="pallas")
    import jax.numpy as _jnp
    ks = net.synthesize_kernels(params)
    lams = net.effective_lambdas(params)
    kernel = np.asarray(_jnp.einsum("g,gzxy->zxy", lams, ks))
    kd = jax.device_put(jnp.asarray(kernel, jnp.float32))

    run_ablate, make_by, run_mxu_by, make_w2, run_banded_z = build_variants()

    ref = np.asarray(geneo_stencil_conv(grids, kd, activation=True,
                                        scratch_dtype="f32"))
    refm = ref > 0.65

    def check(tag, out):
        out = np.asarray(out).reshape(ref.shape)
        dmax = float(np.abs(out - ref).max())
        flips = int((refm ^ (out > 0.65)).sum())
        print(json.dumps({"tag": f"{tag}_exact", "max_abs_diff": dmax,
                          "tau_mask_flips": flips,
                          "total_vox": int(ref.size)}), flush=True)

    def timed(tag, fn, *args):
        @jax.jit
        def loop(g, *a):
            def body(i, acc):
                out = fn(g + i * 0.0, *a)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        float(loop(grids, *args))
        t0 = time.perf_counter()
        total = float(loop(grids, *args))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(total)
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3),
                          "us_per_sample": round(dt / BATCH * 1e6, 1)}),
              flush=True)
        return dt

    timed("c0_current_bf16scr",
          lambda g: geneo_stencil_conv(g, kd, activation=True,
                                       scratch_dtype="bf16"))
    timed("c1_stage_only", lambda g: run_ablate(g, kd, "stage"))
    timed("c2_chain_only", lambda g: run_ablate(g, kd, "chain"))

    # K=68 bf16 variants (c3/c4) are MISCOMPILED by this Mosaic toolchain
    # (unaligned bf16 contraction; see /tmp/dbg_mxu_chip.py receipts:
    # bf16 K=68 max|Δ|=2.48 vs K=128 and f32 both 0.0) — superseded by
    # the K=128-aligned variants below.
    import jax.numpy as jnp2
    by_f32 = make_by(kernel, split=False, kp=128, dtype=jnp2.float32)
    by_16 = make_by(kernel, split=False, kp=128, dtype=jnp2.bfloat16)
    by_sp = make_by(kernel, split=True, kp=128, dtype=jnp2.bfloat16)
    for tag, by, kw in [
        ("c6_f32_k128", by_f32, dict(split=False, sdtype=jnp2.float32)),
        ("c7_bf16_k128", by_16, dict(split=False, sdtype=jnp2.bfloat16)),
        ("c8_split_k128", by_sp, dict(split=True, sdtype=jnp2.bfloat16)),
    ]:
        try:
            check(tag, run_mxu_by(grids, by, **kw))
            timed(tag, lambda g, by=by, kw=kw: run_mxu_by(g, by, **kw))
        except Exception as e:  # noqa: BLE001 - record compile rejects
            print(json.dumps({"tag": f"{tag}_failed", "err": str(e)[:300]}),
                  flush=True)

    w2 = make_w2(kernel)
    try:
        check("c5_banded_z", run_banded_z(grids, w2))
        timed("c5_banded_z", lambda g: run_banded_z(g, w2))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"tag": "c5_failed", "err": str(e)[:300]}),
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
