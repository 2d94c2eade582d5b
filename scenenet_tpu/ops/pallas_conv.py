"""Pallas TPU kernel: fused GENEO stencil convolution + activation head.

The SceneNet hot op is a SAME 3D conv of a (B, 1, 64, 64, 64) occupancy
grid with one small combined GENEO kernel (k ≈ (9,5,5)), followed by
relu∘tanh. XLA lowers this 1-in/1-out-channel conv poorly on the MXU (no
contraction depth), leaving it HBM-bound: every tap re-reads the volume.

Kernels here (all validated in interpret mode on CPU and exactness-tested
against the XLA formulations):

- ``geneo_stencil_conv`` — forward: padded volume resident in VMEM (small
  grids) or HBM-streamed z-slab DMA (128³+), shift-hoisted taps (k_x·k_y
  sublane/lane shifts instead of k_z·k_x·k_y), fused relu∘tanh, each
  output voxel written once.
- ``stencil_dk`` — kernel gradient as x-batched plane-dot matmuls + masked
  diagonal contraction (MXU), accumulated in a grid-revisited VMEM block.
- ``fused_geneo_conv`` — custom-VJP composition: Pallas forward, Pallas
  dx (mirrored stencil, exact for odd kernels) and Pallas dk, with XLA
  conv fallbacks for shapes the kernels don't cover.

Measured on a v5e (batch 16-32, 64³, kernel (9,5,5)): forward 2.4 ms/32
(13.5× the XLA conv), full train step 95 → 10.9 ms after the voxelizer
work; 128³ train step 62.3 → 26.2 ms once `stencil_dk` streams from HBM
(see benchmarks/RESULTS.md).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_kernel(x_ref, k_ref, o_ref, shift_ref, *,
                    kernel_size: Tuple[int, int, int], activation: bool):
    """Stencil body, shift-hoisted.

    The (x, y) tap offsets are sublane/lane shifts — the expensive part of
    a VPU stencil. Looping (dx, dy) on the outside materializes each
    2D-shifted view ONCE into a VMEM scratch (k_x·k_y shifts total); the
    inner z taps then read plain row-offset slices (the z dim is untiled,
    so z slicing is free), turning ~k_z·k_x·k_y shift pairs into k_x·k_y.
    Accumulation goes through the output VMEM ref — a register accumulator
    over a large block spills catastrophically (~300 MB observed).
    """
    k_z, k_x, k_y = kernel_size
    _, z, x, y = o_ref.shape
    base = pl.program_id(1) * z  # z-slab offset into the padded volume
    zp = shift_ref.shape[0]
    first = True
    for dx in range(k_x):
        for dy in range(k_y):
            # the scratch dtype is the caller's choice: bf16 halves the
            # shift-scratch traffic (taps upcast to f32 against the f32
            # kernel scalar) — exact for {0,1} occupancy inputs
            shift_ref[...] = x_ref[
                0, pl.ds(base, zp), dx:dx + x, dy:dy + y
            ].astype(shift_ref.dtype)
            # chain the z taps as one value expression: the output block is
            # written once per (dx, dy) instead of once per tap — ~2.4×
            # less VMEM read-modify-write traffic (measured 13% end-to-end)
            acc = shift_ref[pl.ds(0, z)] * k_ref[0, dx, dy]
            for dz in range(1, k_z):
                acc = acc + shift_ref[pl.ds(dz, z)] * k_ref[dz, dx, dy]
            if first:
                o_ref[0] = acc
                first = False
            else:
                o_ref[0] += acc
    if activation:
        o_ref[0] = jax.nn.relu(jnp.tanh(o_ref[0]))


def _pick_slab(z_out: int, max_bz: int = 16) -> Tuple[int, int]:
    """Choose the z-slab size and trailing zero-pad for a Z extent.

    Prefers an exact divisor in [8, max_bz] (no wasted planes); otherwise
    pads Z up to a multiple of max_bz (computed-then-sliced planes read
    only the zero padding, so results are exact for any Z).

    Slab-size lesson (measured): bz 16→64 is 16% faster for the conv in
    ISOLATION (amortized shift-scratch halo re-staging) but SLOWER inside
    full programs — with one grid step per sample the pipeline loses the
    input-block prefetch overlap with the producer (train step 10.9→11.7
    ms, headline 3059→2841 grids/s; HBM variant likewise 13.6→13.9 ms at
    128³, its slab DMA being synchronous). bz=16 stays the default."""
    bz = min(max_bz, z_out)
    if z_out % bz == 0:
        return bz, 0
    for cand in range(min(max_bz, z_out), 7, -1):
        if z_out % cand == 0:
            return cand, 0
    return bz, (-z_out) % bz


@functools.partial(jax.jit, static_argnames=("activation", "z_prepadded",
                                             "interpret", "scratch_dtype"))
def geneo_stencil_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    activation: bool = True,
    z_prepadded: bool = False,
    interpret: bool = False,
    scratch_dtype: str = "f32",
) -> jnp.ndarray:
    """Fused SAME conv + (optional) relu∘tanh.

    x : (B, 1, Z, X, Y) float32; kernel : (k_z, k_x, k_y) float32.
    Returns (B, 1, Z, X, Y).

    SAME padding follows torch's asymmetric rule (low = (k−1)//2,
    high = k//2), matching :func:`scenenet_tpu.ops.conv3d.conv3d_same`.

    ``z_prepadded=True`` treats the input's z extent as already carrying
    the k_z−1 halo planes (low = (k_z−1)//2, high = k_z//2) — the
    spatially-sharded halo-exchange path (``parallel/spatial.py``) — and
    returns z = Z − (k_z − 1) output planes (VALID z, SAME x/y).

    Any Z is supported: extents that don't divide into a z-slab are
    zero-padded internally and sliced back (exact — the extra output
    planes read only zeros).

    ``scratch_dtype="bf16"`` stages the shifted tap views in a bfloat16
    VMEM scratch (taps still accumulate in f32 against the f32 kernel):
    measured 12% off the kernel at batch-16 64³ and **bit-exact for {0,1}
    occupancy inputs** (bf16 represents them exactly); for general float
    inputs it rounds the taps to bf16 (~1e-3 relative). The training path
    keeps the f32 default — its dx backward reuses this kernel with
    full-float cotangents.
    """
    b, c, z, xx, yy = x.shape
    assert c == 1, "fused stencil path is single-channel"
    k_z, k_x, k_y = kernel.shape
    z_out = z - (k_z - 1) if z_prepadded else z
    assert z_out >= 1, f"Z={z} too small for kernel z={k_z} (prepadded)"
    zpads = (0, 0) if z_prepadded else ((k_z - 1) // 2, k_z // 2)
    pads = [(0, 0), (0, 0), zpads] + [
        ((k - 1) // 2, k // 2) for k in (k_x, k_y)
    ]
    xp = jnp.pad(x, pads)[:, 0]  # (B, Z_out+kz-1, X+kx-1, Y+ky-1)

    # z-slab blocking bounds VMEM working set; bz=16 keeps several grid
    # steps per sample so the pipeline overlaps input staging with compute
    # (see the slab-size lesson in _pick_slab)
    resident = 4 * (z_out + k_z - 1) * (xx + k_x - 1) * (yy + k_y - 1) \
        <= 4 * 1024 * 1024
    sdtype = jnp.bfloat16 if scratch_dtype == "bf16" else jnp.float32
    bz, zpad = _pick_slab(z_out)
    if zpad:
        xp = jnp.pad(xp, ((0, 0), (0, zpad), (0, 0), (0, 0)))
    z = z_out + zpad

    if resident:
        # small grids (≤ ~96³): whole padded volume resident in VMEM
        kernel_fn = functools.partial(
            _stencil_kernel, kernel_size=(k_z, k_x, k_y), activation=activation
        )
        out = pl.pallas_call(
            kernel_fn,
            out_shape=jax.ShapeDtypeStruct((b, z, xx, yy), jnp.float32),
            grid=(b, z // bz),
            in_specs=[
                pl.BlockSpec(
                    (1, z + k_z - 1, xx + k_x - 1, yy + k_y - 1),
                    lambda i, j: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bz, xx, yy), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bz + k_z - 1, xx, yy), sdtype)],
            # XLA's VMEM-placement pass may scope-allocate the full result
            # (e.g. 16 MiB at batch-16 64³) — give it headroom beyond the
            # 16 MiB default instead of failing the compile
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xp, kernel.astype(jnp.float32))
        return out[:, None, :z_out] if zpad else out[:, None]

    # large grids (128³+): stream overlapping z-slab windows from HBM via
    # explicit DMA into a VMEM scratch, compute the output slab in VMEM and
    # DMA it back out — the output ref lives in HBM too, so VMEM holds only
    # the scratches (the blocked-output form stack-allocated the FULL
    # output array in VMEM: 33.5 MB at batch-4 128³, a scoped-vmem OOM).
    # DMA'd planes must align to the (8, 128) f32 tile: pad the output x/y
    # up to (8, 128) multiples and the input window to cover the padded
    # output's taps.
    ox = xx + ((-xx) % 8)
    oy = yy + ((-yy) % 128)
    xp_x = ox + k_x - 1 + ((-(ox + k_x - 1)) % 8)
    xp_y = oy + k_y - 1 + ((-(oy + k_y - 1)) % 128)
    xp = jnp.pad(xp, ((0, 0), (0, 0),
                      (0, xp_x - (xx + k_x - 1)), (0, xp_y - (yy + k_y - 1))))
    kernel_hbm = functools.partial(
        _stencil_kernel_hbm, kernel_size=(k_z, k_x, k_y), activation=activation,
        bz=bz, xp_shape=(xp_x, xp_y), sdtype=sdtype,
    )
    out = pl.pallas_call(
        kernel_hbm,
        out_shape=jax.ShapeDtypeStruct((b, z, ox, oy), jnp.float32),
        grid=(b, z // bz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.HBM),
        # 100 MiB measured-required: this toolchain's placement pass stages
        # custom-call operands on the VMEM stack for this variant (a fixed
        # ~122 MiB scoped total at batch-4 128²-xy, independent of the
        # limit), and full-128³ compiles under 100 MiB but not under 32.
        # KNOWN LIMITATION: mid-size z extents (~48–96 planes at 128² xy,
        # e.g. a 2-way-sharded 128³) still exceed the scoped budget and
        # fail to compile — shard ≥4-way (resident-VMEM variant) or use
        # backend="xla" there.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, kernel.astype(jnp.float32))
    return out[:, None, :z_out, :xx, :yy]


_EYES_CACHE: dict = {}


def _band_eyes(k_y: int, yy: int, kp: int):
    """(k_y, kp, yy) constants with eyes[dy, y+dy, y] = 1 — the shifted
    identities whose kernel-weighted sum is the banded B_y matrix."""
    import numpy as np

    key = (k_y, yy, kp)
    if key not in _EYES_CACHE:
        eyes = np.zeros((k_y, kp, yy), np.float32)
        ar = np.arange(yy)
        for dy in range(k_y):
            eyes[dy, ar + dy, ar] = 1.0
        _EYES_CACHE[key] = eyes
    return _EYES_CACHE[key]


_LO_SCALE = 512.0  # 2^9: shifts the residual into bf16's mantissa window
_INV_LO_SCALE = 1.0 / 512.0


def banded_y_weights(kernel: jnp.ndarray, yy: int, kp: int,
                     split: bool) -> jnp.ndarray:
    """(k_z, k_x, k_y) kernel → (1|2, k_z, k_x, kp, yy) banded bf16
    matrices with B_y[dz, dx][y+dy, y] = k[dz, dx, dy] (jit-friendly:
    placed elementwise against static shifted identities, built per
    forward from the synthesized GENEO kernel). ``split=True`` adds the
    bf16 residual
    (B − bf16(B)) as a second matrix — two MXU dots recover near-f32
    accuracy (measured on-chip max|Δ| 2.6e-5 vs the f32 stencil, after
    the residual-zeroing fix below; single bf16 is ~3.9e-3 on the
    probabilities / 0.0028% τ=0.65 mask flips end-to-end)."""
    k_y = kernel.shape[2]
    eyes = jnp.asarray(_band_eyes(k_y, yy, kp))
    # Elementwise placement, NOT an einsum: a TPU dot at default matmul
    # precision truncates its f32 inputs to bf16, which would make `band`
    # bf16-valued and the residual identically zero before the
    # convert-elision below even enters.
    band = jnp.sum(kernel.astype(jnp.float32)[:, :, :, None, None]
                   * eyes[None, None], axis=2)
    hi = band.astype(jnp.bfloat16)
    if not split:
        return hi[None]
    # reduce_precision is load-bearing: writing the residual as
    # `band - band.astype(bf16).astype(f32)` produces IDENTICALLY ZERO on
    # TPU — XLA's allow_excess_precision (default-on) elides the
    # f32→bf16→f32 convert pair, so the subtraction cancels exactly.
    # Found on-chip: the production split output was bit-identical to
    # single-bf16 (max|Δ| 3.9e-3 vs f32) while CPU/interpret showed the
    # intended ~5e-6; `jnp.abs(by[1]).max()` on TPU was 0.0 over all
    # 368,640 entries. lax.reduce_precision(·, 8, 7) performs the bf16
    # value-rounding in f32 and is never elided. The residual also ships
    # PRE-SCALED by 2^9 (the kernels scale the lo dot's f32 result back
    # down — exact power-of-two) so the two same-lhs dots cannot be
    # algebraically merged back into one bf16 matrix either.
    hi_val = jax.lax.reduce_precision(band, exponent_bits=8,
                                      mantissa_bits=7)
    lo = ((band - hi_val) * _LO_SCALE).astype(jnp.bfloat16)
    return jnp.stack([hi, lo])


def banded_y_weights_packed(kernel: jnp.ndarray, yy: int,
                            kp: int) -> jnp.ndarray:
    """Split banded matrices PACKED along the output-lane dim:
    (k_z, k_x, kp, 2·yy) with columns [:yy] = bf16(B) and [yy:] = the
    ×2⁹-scaled bf16 residual (see :func:`banded_y_weights`).

    Round-5 measured fact (`benchmarks/conv_dot_shapes.py`): an
    (m, 128) @ (128, 128) bf16 dot costs the same wall time as the
    (m, 128) @ (128, 64) one — N=64 wastes half the MXU's output lanes.
    Packing hi|lo side by side turns the split path's two dots per
    (dx, dz) tap into ONE (m, kp) @ (kp, 2·yy) dot: identical staging,
    identical f32 column sums (each output column accumulates
    independently on the MXU), half the dot issues. The kernels
    accumulate the packed (…, 2·yy) partials and recombine once per
    block: out = acc[…, :yy] + 2⁻⁹·acc[…, yy:]."""
    by = banded_y_weights(kernel, yy, kp, split=True)
    return jnp.concatenate([by[0], by[1]], axis=-1)


def _stencil_mxu_kernel(x_ref, by_ref, o_ref, shift_ref, acc_ref, *,
                        kernel_size, activation: bool, split: bool,
                        tau=None):
    """MXU stencil forward: per dx, one sublane-shifted staging; per
    (dx, dz), a (bz, xx, kp) @ (kp, yy|2·yy) bf16 dot against the banded
    B_y — the k_y lane-rotates fold into the contraction and the z-chain
    rides the systolic array.

    ``split=True`` (round-5 packed form): by_ref is the hi|lo-packed
    (k_z, k_x, kp, 2·yy) matrix of :func:`banded_y_weights_packed` — one
    N=2·yy dot per tap replaces the former hi+lo dot pair at the SAME
    wall time per dot (measured: N=64 wastes half the MXU output lanes,
    `benchmarks/conv_dot_shapes.py`), the packed partials accumulate in
    the ``acc_ref`` VMEM scratch, and the hi/lo halves recombine once
    per block. f32 column sums are identical to the two-dot form (each
    MXU output column accumulates independently).

    The contraction MUST be 128-lane-aligned: this Mosaic toolchain
    MISCOMPILES bf16 dot_general with unaligned K (K=68: max|Δ|=2.48 vs
    0.0 at K=128 on identical inputs — benchmarks/RESULTS.md "MXU
    stencil"), so callers pad the y-halo to kp = ⌈yp/128⌉·128.
    """
    k_z, k_x, k_y = kernel_size
    _, z, xx, yy = o_ref.shape
    base = pl.program_id(1) * z
    zp = shift_ref.shape[0]
    dims = (((2,), (0,)), ((), ()))
    out_ref = acc_ref if split else o_ref
    for dx in range(k_x):
        shift_ref[...] = x_ref[0, pl.ds(base, zp), dx:dx + xx, :].astype(
            shift_ref.dtype)
        acc = None
        for dz in range(k_z):
            s = shift_ref[pl.ds(dz, z)]  # (z, xx, kp) bf16
            b = by_ref[dz, dx] if split else by_ref[0, dz, dx]
            d = lax.dot_general(s, b, dims,
                                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        if dx == 0:
            if split:
                out_ref[...] = acc
            else:
                out_ref[0] = acc
        else:
            if split:
                out_ref[...] += acc
            else:
                out_ref[0] += acc
    if split:
        # recombine hi + 2⁻⁹·lo once per output block
        res = acc_ref[:, :, :yy] + _INV_LO_SCALE * acc_ref[:, :, yy:]
        if activation:
            res = jax.nn.relu(jnp.tanh(res))
        if tau is not None:
            # fused τ-threshold (prob_to_label semantics): saves the
            # separate 512 MB-read HBM pass over the probabilities when
            # the consumer only wants the mask (the headline contract)
            res = (res >= tau).astype(jnp.float32)
        o_ref[0] = res
    else:
        res = o_ref[0]
        if activation:
            res = jax.nn.relu(jnp.tanh(res))
        if tau is not None:
            res = (res >= tau).astype(jnp.float32)
        if activation or tau is not None:
            o_ref[0] = res


def _stencil_kernel_hbm_mxu(x_hbm, by_ref, o_hbm, *, kernel_size,
                            activation: bool, split: bool, bz: int,
                            xp_shape, tau=None):
    """HBM-streamed banded-y MXU forward (128³+): DMA one overlapping
    z-slab window per grid step (as :func:`_stencil_kernel_hbm`), but per
    (dx, dz) run a (bz, ox, kp) @ (kp, oy|2·oy) bf16 dot against the
    banded B_y instead of the k_y-deep VPU shift/FMA chains. With
    ``split=True`` the hi|lo-packed matrices (see
    :func:`banded_y_weights_packed`) make it one N=2·oy dot per tap,
    recombined once per slab. The banded matrices span the 128-aligned
    padded output columns; the extra columns read only input zero
    padding and are sliced away by the caller."""
    k_z, k_x, k_y = kernel_size
    _, _, ox, oy = o_hbm.shape
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body(scratch, shift, acc_vmem, out_vmem, sem_in, sem_out):
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * bz, bz + k_z - 1)], scratch, sem_in
        )
        dma.start()
        dma.wait()
        dims = (((2,), (0,)), ((), ()))
        target = acc_vmem if split else out_vmem
        for dx in range(k_x):
            shift[...] = scratch[:, dx:dx + ox, :].astype(shift.dtype)
            acc = None
            for dz in range(k_z):
                s = shift[pl.ds(dz, bz)]  # (bz, ox, kp) bf16
                b = by_ref[dz, dx] if split else by_ref[0, dz, dx]
                d = lax.dot_general(s, b, dims,
                                    preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            if dx == 0:
                target[...] = acc
            else:
                target[...] += acc
        if split:
            res = acc_vmem[:, :, :oy] + _INV_LO_SCALE * acc_vmem[:, :, oy:]
        else:
            res = out_vmem[...]
        if activation:
            res = jax.nn.relu(jnp.tanh(res))
        if tau is not None:
            res = (res >= tau).astype(jnp.float32)
        if split or activation or tau is not None:
            out_vmem[...] = res
        dma_out = pltpu.make_async_copy(
            out_vmem, o_hbm.at[i, pl.ds(j * bz, bz)], sem_out
        )
        dma_out.start()
        dma_out.wait()

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((bz + k_z - 1, *xp_shape), jnp.float32),
        shift=pltpu.VMEM((bz + k_z - 1, ox, xp_shape[1]), jnp.bfloat16),
        acc_vmem=pltpu.VMEM((bz, ox, 2 * oy if split else 1), jnp.float32),
        out_vmem=pltpu.VMEM((bz, ox, oy), jnp.float32),
        sem_in=pltpu.SemaphoreType.DMA(()),
        sem_out=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("activation", "split",
                                             "interpret", "max_bz", "tau"))
def geneo_stencil_conv_mxu(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    activation: bool = True,
    split: bool = True,
    interpret: bool = False,
    max_bz: int = 16,
    tau: "float | None" = None,
) -> jnp.ndarray:
    """Banded-y MXU formulation of :func:`geneo_stencil_conv`
    (SAME conv + optional relu∘tanh; torch's asymmetric SAME rule).
    Not differentiable by itself — training uses the
    :func:`fused_geneo_conv_mxu` custom-VJP wrapper.

    Numerics: occupancy inputs ({0,1}) are exact in bf16; the kernel
    weights round to bf16 — ``split=True`` (default) adds the residual
    dot per tap for near-f32 accuracy (see :func:`banded_y_weights`).
    Volumes beyond the VMEM-resident size stream overlapping z-slab
    windows from HBM (as :func:`geneo_stencil_conv`) with the same
    banded-y dots per slab.
    """
    b, c, z, xx, yy = x.shape
    assert c == 1, "fused stencil path is single-channel"
    k_z, k_x, k_y = kernel.shape
    resident = 4 * (z + k_z - 1) * (xx + k_x - 1) * (yy + k_y - 1) \
        <= 4 * 1024 * 1024
    if not resident:
        return _geneo_stencil_conv_mxu_hbm(x, kernel, activation=activation,
                                           split=split, interpret=interpret,
                                           tau=tau)
    yp = yy + k_y - 1
    kp = -(-yp // 128) * 128
    pads = [(0, 0), (0, 0), ((k_z - 1) // 2, k_z // 2),
            ((k_x - 1) // 2, k_x // 2),
            ((k_y - 1) // 2, kp - yy - (k_y - 1) // 2)]
    xp = jnp.pad(x, pads)[:, 0]
    bz, zpad = _pick_slab(z, max_bz)
    if zpad:
        xp = jnp.pad(xp, ((0, 0), (0, zpad), (0, 0), (0, 0)))
    zz = z + zpad
    by = banded_y_weights_packed(kernel, yy, kp) if split else \
        banded_y_weights(kernel, yy, kp, False)
    out = pl.pallas_call(
        functools.partial(_stencil_mxu_kernel, kernel_size=(k_z, k_x, k_y),
                          activation=activation, split=split, tau=tau),
        out_shape=jax.ShapeDtypeStruct((b, zz, xx, yy), jnp.float32),
        grid=(b, zz // bz),
        in_specs=[
            pl.BlockSpec((1, zz + k_z - 1, xx + k_x - 1, kp),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bz, xx, yy), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bz + k_z - 1, xx, kp), jnp.bfloat16),
            pltpu.VMEM((bz, xx, 2 * yy if split else 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, by)
    return out[:, None, :z]


@functools.partial(jax.jit, static_argnames=("activation", "split",
                                             "interpret", "tau"))
def _geneo_stencil_conv_mxu_hbm(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    activation: bool = True,
    split: bool = True,
    interpret: bool = False,
    tau: "float | None" = None,
) -> jnp.ndarray:
    """Streamed variant of :func:`geneo_stencil_conv_mxu` for volumes past
    the VMEM-resident cap (128³+): per grid step one overlapping z-slab
    window is DMA'd from HBM and convolved via the banded-y MXU dots.

    DMA'd planes align to the (8, 128) f32 tile: output x/y pad up to
    (8, 128) multiples; input y pads to the 128-aligned contraction width
    kp (the bf16-dot alignment requirement — see
    :func:`geneo_stencil_conv_mxu`). Inherits the streamed path's
    scoped-vmem caveat for mid-size z extents (see
    :func:`geneo_stencil_conv`).
    """
    b, c, z, xx, yy = x.shape
    assert c == 1, "fused stencil path is single-channel"
    k_z, k_x, k_y = kernel.shape
    bz, zpad = _pick_slab(z)
    ox = xx + ((-xx) % 8)
    oy = yy + ((-yy) % 128)
    kp = -(-(oy + k_y - 1) // 128) * 128
    xp_x = ox + k_x - 1 + ((-(ox + k_x - 1)) % 8)
    pads = [(0, 0), (0, 0), ((k_z - 1) // 2, k_z // 2),
            ((k_x - 1) // 2, xp_x - xx - (k_x - 1) // 2),
            ((k_y - 1) // 2, kp - yy - (k_y - 1) // 2)]
    xp = jnp.pad(x, pads)[:, 0]
    if zpad:
        xp = jnp.pad(xp, ((0, 0), (0, zpad), (0, 0), (0, 0)))
    zz = z + zpad
    by = banded_y_weights_packed(kernel, oy, kp) if split else \
        banded_y_weights(kernel, oy, kp, False)
    out = pl.pallas_call(
        functools.partial(_stencil_kernel_hbm_mxu,
                          kernel_size=(k_z, k_x, k_y),
                          activation=activation, split=split, bz=bz,
                          xp_shape=(xp_x, kp), tau=tau),
        out_shape=jax.ShapeDtypeStruct((b, zz, ox, oy), jnp.float32),
        grid=(b, zz // bz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            memory_space=pltpu.ANY if interpret else pltpu.HBM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, by)
    return out[:, None, :z, :xx, :yy]


def _stencil_kernel_hbm(x_hbm, k_ref, o_hbm, *, kernel_size, activation,
                        bz, xp_shape, sdtype=jnp.float32):
    """Large-grid variant: DMA one overlapping z-slab window per grid step,
    compute into a VMEM slab, DMA the slab back to the HBM output."""
    k_z, k_x, k_y = kernel_size
    _, _, ox, oy = o_hbm.shape
    # program_id must be read OUTSIDE run_scoped: the scoped trace drops
    # the grid context in interpret mode
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body(scratch, shift, out_vmem, sem_in, sem_out):
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * bz, bz + k_z - 1)], scratch, sem_in
        )
        dma.start()
        dma.wait()
        # shift-hoisted tap order + chained z taps (see _stencil_kernel)
        first = True
        for dx in range(k_x):
            for dy in range(k_y):
                shift[...] = scratch[:, dx:dx + ox, dy:dy + oy].astype(
                    shift.dtype)
                acc = shift[pl.ds(0, bz)] * k_ref[0, dx, dy]
                for dz in range(1, k_z):
                    acc = acc + shift[pl.ds(dz, bz)] * k_ref[dz, dx, dy]
                if first:
                    out_vmem[...] = acc
                    first = False
                else:
                    out_vmem[...] += acc
        if activation:
            out_vmem[...] = jax.nn.relu(jnp.tanh(out_vmem[...]))
        dma_out = pltpu.make_async_copy(
            out_vmem, o_hbm.at[i, pl.ds(j * bz, bz)], sem_out
        )
        dma_out.start()
        dma_out.wait()

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((bz + k_z - 1, *xp_shape), jnp.float32),
        shift=pltpu.VMEM((bz + k_z - 1, ox, oy), sdtype),
        out_vmem=pltpu.VMEM((bz, ox, oy), jnp.float32),
        sem_in=pltpu.SemaphoreType.DMA(()),
        sem_out=pltpu.SemaphoreType.DMA(()),
    )


def _stencil_dk_kernel(x_ref, g_ref, o_ref, shift_ref, *,
                       kernel_size: Tuple[int, int, int], bz: int):
    """Kernel-gradient stencil: dk[dz,dx,dy] = Σ x_pad[shifted]·g.

    Same shift-hoisted structure as the forward; the (k_z·k_x·k_y) scalar
    accumulators live in the revisited VMEM output block (all grid steps
    map to block (0,0,0), so it stays resident across the whole grid)."""
    k_z, k_x, k_y = kernel_size
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref[...])

    base = j * bz
    g = g_ref[0]  # (bz, X, Y)
    _, x, y = g.shape
    t = bz + k_z - 1
    # mask[dz, t', z'] = (t' == z' + dz): turns the per-tap z-correlation
    # into x-batched plane-dot matmuls per (dx, dy) plus a masked
    # contraction — Mosaic's tpu.matmul wants exactly one contracting dim
    # (and at most one batch dim), so both steps contract a single axis.
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (k_z, t, bz), 1)
    z_ids = jax.lax.broadcasted_iota(jnp.int32, (k_z, t, bz), 2)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (k_z, t, bz), 0)
    masks = (t_ids == z_ids + d_ids).astype(jnp.float32)
    for dx in range(k_x):
        for dy in range(k_y):
            shift_ref[...] = x_ref[0, pl.ds(base, t), dx:dx + x, dy:dy + y]
            # (x, T, bz) = batch-x matmul contracting y, then reduce x
            mx = jax.lax.dot_general(
                shift_ref[...].transpose(1, 0, 2), g.transpose(1, 0, 2),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m = jnp.sum(mx, axis=0)  # (T, bz) plane dots
            # (T, k_z) = batch-T matmul contracting z', then reduce T
            rowt = jax.lax.dot_general(
                masks.transpose(1, 0, 2), m,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            row = jnp.sum(rowt, axis=0)  # (k_z,) diagonal sums
            r = dx * k_y + dy
            o_ref[pl.ds(r, 1), :] += row[None, :]


def _stencil_dk_kernel_hbm(x_hbm, g_hbm, o_ref, *, kernel_size, bz, out_xy):
    """Large-grid dk: DMA one overlapping x z-slab window + the matching g
    slab from HBM per grid step; same x-batched plane-dot matmuls + masked
    diagonal contraction as :func:`_stencil_dk_kernel`; the (k_x·k_y, k_z)
    accumulators live in the revisited VMEM output block. The zero padding
    of g (xy tile alignment + z slab round-up) contributes nothing to any
    contraction, so results are exact."""
    k_z, k_x, k_y = kernel_size
    ox, oy = out_xy
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref[...])

    t = bz + k_z - 1

    def body(scratch, gslab, shift, sem_x, sem_g):
        dma_x = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * bz, t)], scratch, sem_x)
        dma_g = pltpu.make_async_copy(
            g_hbm.at[i, pl.ds(j * bz, bz)], gslab, sem_g)
        dma_x.start()
        dma_g.start()
        dma_x.wait()
        dma_g.wait()
        g = gslab[...]  # (bz, ox, oy)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (k_z, t, bz), 1)
        z_ids = jax.lax.broadcasted_iota(jnp.int32, (k_z, t, bz), 2)
        d_ids = jax.lax.broadcasted_iota(jnp.int32, (k_z, t, bz), 0)
        masks = (t_ids == z_ids + d_ids).astype(jnp.float32)
        for dx in range(k_x):
            for dy in range(k_y):
                shift[...] = scratch[:, dx:dx + ox, dy:dy + oy]
                mx = jax.lax.dot_general(
                    shift[...].transpose(1, 0, 2), g.transpose(1, 0, 2),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                m = jnp.sum(mx, axis=0)  # (T, bz) plane dots
                rowt = jax.lax.dot_general(
                    masks.transpose(1, 0, 2), m,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                row = jnp.sum(rowt, axis=0)  # (k_z,)
                r = dx * k_y + dy
                o_ref[pl.ds(r, 1), :] += row[None, :]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((t, ox + k_x - 1 + ((-(ox + k_x - 1)) % 8),
                            oy + k_y - 1 + ((-(oy + k_y - 1)) % 128)),
                           jnp.float32),
        gslab=pltpu.VMEM((bz, ox, oy), jnp.float32),
        shift=pltpu.VMEM((t, ox, oy), jnp.float32),
        sem_x=pltpu.SemaphoreType.DMA(()),
        sem_g=pltpu.SemaphoreType.DMA(()),
    )


def stencil_dk(x: jnp.ndarray, g: jnp.ndarray,
               kernel_size: Tuple[int, int, int],
               interpret: bool = False,
               z_prepadded: bool = False) -> jnp.ndarray:
    """Pallas kernel-gradient for the SAME stencil conv: x, g (B,1,Z,X,Y) →
    dk (k_z,k_x,k_y). The XLA batch-as-feature conv formulation measures
    ~12 ms per batch-16 step on a v5e — it dominated the train step; this
    kernel cuts the full step from 23.4 to 17.9 ms.

    Small volumes keep the padded x resident in VMEM; larger ones (128³+)
    stream overlapping x z-slab windows and g slabs from HBM via explicit
    DMA — the same structure as the forward's HBM variant — so big-grid
    *training* gets the fast kernel gradient too.

    ``z_prepadded=True`` treats x's z extent as already carrying the
    k_z − 1 halo planes (the spatially-sharded halo path: x has
    Z_local + k_z − 1 planes, g has Z_local) — VALID z, SAME x/y."""
    b, _, z, xx, yy = x.shape
    k_z, k_x, k_y = kernel_size
    if z_prepadded:
        z = z - (k_z - 1)
        assert g.shape[2] == z, (g.shape, x.shape)
        pads = [(0, 0), (0, 0), (0, 0),
                ((k_x - 1) // 2, k_x // 2), ((k_y - 1) // 2, k_y // 2)]
    else:
        pads = [(0, 0), (0, 0)] + [((k - 1) // 2, k // 2) for k in kernel_size]
    xp = jnp.pad(x, pads)[:, 0]
    bz, zpad = _pick_slab(z)
    if zpad:
        # zero g/x planes contribute nothing to the accumulated dk
        xp = jnp.pad(xp, ((0, 0), (0, zpad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, zpad), (0, 0), (0, 0)))
        z = z + zpad

    resident = 4 * (z + k_z - 1) * (xx + k_x - 1) * (yy + k_y - 1) \
        <= 4 * 1024 * 1024
    if resident:
        kernel_fn = functools.partial(_stencil_dk_kernel,
                                      kernel_size=kernel_size, bz=bz)
        out = pl.pallas_call(
            kernel_fn,
            out_shape=jax.ShapeDtypeStruct((k_x * k_y, k_z), jnp.float32),
            grid=(b, z // bz),
            in_specs=[
                pl.BlockSpec((1, z + k_z - 1, xx + k_x - 1, yy + k_y - 1),
                             lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bz, xx, yy), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k_x * k_y, k_z), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bz + k_z - 1, xx, yy), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xp, g[:, 0])
        return out.reshape(k_x, k_y, k_z).transpose(2, 0, 1)

    # HBM-streamed: tile-align the DMA'd planes — g to (8, 128) multiples
    # (zero-padded; padding contracts against zeros), x to cover the padded
    # g's taps plus its own (8, 128) alignment
    ox = xx + ((-xx) % 8)
    oy = yy + ((-yy) % 128)
    xp_x = ox + k_x - 1 + ((-(ox + k_x - 1)) % 8)
    xp_y = oy + k_y - 1 + ((-(oy + k_y - 1)) % 128)
    xp = jnp.pad(xp, ((0, 0), (0, 0),
                      (0, xp_x - (xx + k_x - 1)), (0, xp_y - (yy + k_y - 1))))
    gp = jnp.pad(g[:, 0], ((0, 0), (0, 0), (0, ox - xx), (0, oy - yy)))
    kernel_fn = functools.partial(_stencil_dk_kernel_hbm,
                                  kernel_size=kernel_size, bz=bz,
                                  out_xy=(ox, oy))
    space = pltpu.ANY if interpret else pltpu.HBM
    out = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((k_x * k_y, k_z), jnp.float32),
        grid=(b, z // bz),
        in_specs=[
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
        ],
        out_specs=pl.BlockSpec((k_x * k_y, k_z), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, gp)
    return out.reshape(k_x, k_y, k_z).transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# Differentiable fused conv+activation (custom VJP: Pallas forward, Pallas
# dx/dk where shapes allow, XLA conv fallbacks otherwise)
# ---------------------------------------------------------------------------

def _same_pads(shape: Tuple[int, int, int]):
    return [((k - 1) // 2, k // 2) for k in shape]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_geneo_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """relu(tanh(conv_same(x, kernel))) with a Pallas forward."""
    return geneo_stencil_conv(x, kernel, activation=True, interpret=interpret)


def _fused_fwd(x, kernel, interpret):
    out = geneo_stencil_conv(x, kernel, activation=True, interpret=interpret)
    return out, (x, kernel, out)


def _fused_bwd(interpret, res, g):
    from jax import lax

    x, kernel, out = res
    k_z, k_x, k_y = kernel.shape
    # d relu(tanh(c)) / dc = 1 - tanh(c)^2 where tanh(c) > 0; out = relu(tanh(c))
    act_grad = g * jnp.where(out > 0, 1.0 - out * out, 0.0)

    # dx: correlation with the flipped kernel, SAME pads mirrored. For
    # all-odd kernels the mirrored pads equal the forward pads, so the fast
    # Pallas stencil applies directly (the slow XLA stencil conv here was
    # the dominant cost of the whole train step).
    flipped = kernel[::-1, ::-1, ::-1]
    all_odd = (k_z % 2) and (k_x % 2) and (k_y % 2)
    if all_odd and not interpret:
        dx = geneo_stencil_conv(act_grad, flipped, activation=False)
    else:
        pads = [(hi, lo) for (lo, hi) in _same_pads((k_z, k_x, k_y))]
        dx = lax.conv_general_dilated(
            act_grad, flipped[None, None], (1, 1, 1), pads,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32,
        )

    # dk[dz,dx,dy] = Σ_{b,z,x,y} x_pad[b, z+dz, ...] · act_grad[b, z, ...]
    # stencil_dk self-dispatches: VMEM-resident for small volumes,
    # HBM-streamed slabs for 128³+ (big-grid training)
    if not interpret:
        dk = stencil_dk(x, act_grad, (k_z, k_x, k_y))
    else:
        # fallback: conv with the batch dim playing the input-feature role
        pads_x = [(0, 0), (0, 0)] + _same_pads((k_z, k_x, k_y))
        x_pad = jnp.pad(x, pads_x)
        lhs = x_pad[:, 0][None]              # (1, B, Zp, Xp, Yp): N=1, C=B
        rhs = act_grad[:, 0][:, None]
        rhs = jnp.swapaxes(rhs, 0, 1)        # (1, B, Z, X, Y): O=1, I=B
        dk = lax.conv_general_dilated(
            lhs, rhs, (1, 1, 1), "VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32,
        )[0, 0]
    return dx, dk


fused_geneo_conv.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_geneo_conv_mxu(x: jnp.ndarray, kernel: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """relu(tanh(conv_same(x, kernel))) with the banded-y MXU forward
    (:func:`geneo_stencil_conv_mxu`, split-bf16 — near-f32: max|Δ|
    2.6e-5 for occupancy inputs) and the exact-f32 backward of
    :func:`fused_geneo_conv` (Pallas ``stencil_dk`` for dk; the f32 VPU
    stencil for dx — which XLA dead-code-eliminates in the standard
    train step, where x is data, not a function of params).

    Opt-in training path (``SceneNet(backend="pallas_mxu")``): the
    forward rides the systolic array instead of the VPU tap chains; the
    parameter gradients stay f32-exact up to the 2.6e-5 forward rounding
    entering the activation cotangent.
    """
    return geneo_stencil_conv_mxu(x, kernel, activation=True, split=True,
                                  interpret=interpret)


def _fused_mxu_fwd(x, kernel, interpret):
    out = geneo_stencil_conv_mxu(x, kernel, activation=True, split=True,
                                 interpret=interpret)
    return out, (x, kernel, out)


fused_geneo_conv_mxu.defvjp(_fused_mxu_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def halo_stencil_conv(x_ext: jnp.ndarray, kernel: jnp.ndarray,
                      activation: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """VALID-z / SAME-x/y fused stencil conv for the spatially-sharded
    halo-exchange path (``parallel/spatial.py``).

    x_ext : (B, 1, Z_local + k_z − 1, X, Y) — the local Z shard with its
    ppermute-exchanged halo planes already concatenated. Returns
    (B, 1, Z_local, X, Y); concatenating shard outputs over Z equals the
    unsharded SAME conv. Differentiable: Pallas forward, XLA-conv backward
    (the fwd is the 128³ hot path; see benchmarks/spatial_128.py).
    """
    return geneo_stencil_conv(x_ext, kernel, activation=activation,
                              z_prepadded=True, interpret=interpret)


def _halo_fwd(x_ext, kernel, activation, interpret):
    out = halo_stencil_conv(x_ext, kernel, activation, interpret)
    return out, (x_ext, kernel, out)


def _halo_bwd(activation, interpret, res, g):
    from jax import lax

    x_ext, kernel, out = res
    k_z, k_x, k_y = kernel.shape
    if activation:
        # out = relu(tanh(c)); d/dc = 1 − tanh²(c) where tanh(c) > 0
        g = g * jnp.where(out > 0, 1.0 - out * out, 0.0)
    # dx_ext: full correlation along z (pads k_z−1 both sides), mirrored
    # SAME pads in x/y — standard conv-transpose algebra for VALID/SAME.
    # For all-odd kernels the mirrored x/y pads equal the forward SAME
    # pads, so z-padding g by k_z−1 both sides turns it into exactly the
    # VALID-z stencil — the Pallas kernel streams it at any volume.
    flipped = kernel[::-1, ::-1, ::-1]
    all_odd = (k_z % 2) and (k_x % 2) and (k_y % 2)
    if all_odd and not interpret:
        g_ext = jnp.pad(g, [(0, 0), (0, 0), (k_z - 1, k_z - 1),
                            (0, 0), (0, 0)])
        dx = geneo_stencil_conv(g_ext, flipped, activation=False,
                                z_prepadded=True)
    else:
        pads = [(k_z - 1, k_z - 1), (k_x // 2, (k_x - 1) // 2),
                (k_y // 2, (k_y - 1) // 2)]
        dx = lax.conv_general_dilated(
            g, flipped[None, None], (1, 1, 1), pads,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32,
        )
    # dk: z VALID (x_ext already carries the halos), x/y SAME — the
    # prepadded Pallas kernel gradient (VMEM-resident or HBM-streamed)
    if not interpret:
        dk = stencil_dk(x_ext, g, (k_z, k_x, k_y), z_prepadded=True)
    else:
        pads_x = [(0, 0), (0, 0), (0, 0),
                  ((k_x - 1) // 2, k_x // 2), ((k_y - 1) // 2, k_y // 2)]
        x_pad = jnp.pad(x_ext, pads_x)
        lhs = x_pad[:, 0][None]                  # (1, B, Z_ext, Xp, Yp)
        rhs = jnp.swapaxes(g[:, 0][:, None], 0, 1)  # (1, B, Z_local, X, Y)
        dk = lax.conv_general_dilated(
            lhs, rhs, (1, 1, 1), "VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32,
        )[0, 0]
    return dx, dk


halo_stencil_conv.defvjp(_halo_fwd, _halo_bwd)


def scenenet_forward_pallas(model, params, x: jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """SceneNet forward through the fused Pallas stencil (combined-kernel
    observer path — exact up to float association with ``model.apply``;
    measured 2.7× the XLA conv on a v5e). Differentiable via the custom
    VJP, so it drops into training."""
    kernels = model.synthesize_kernels(params).astype(jnp.float32)
    lams = model.effective_lambdas(params).astype(jnp.float32)
    combined = jnp.sum(lams[:, None, None, None] * kernels, axis=0)
    return fused_geneo_conv(x.astype(jnp.float32), combined, interpret)
