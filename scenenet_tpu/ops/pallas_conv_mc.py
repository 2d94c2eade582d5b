"""Pallas TPU kernel: multi-channel 3³ SAME conv3d as one deep-K MXU matmul.

XLA's TPU conv3d lowering measures 2.5–7.7 TFLOP/s on the UNet3D layer
shapes (benchmarks/RESULTS.md "XLA conv3d layer profile") — 6–20× off the
MXU. This kernel restructures the conv with three ideas that keep every
step in the TPU's cheap regimes:

1. **Pad-and-flat-shift, channels-last**: zero-pad the volume by 1 per
   spatial side, pad the padded Y extent so the x-stride ``sx = Y_p`` is a
   multiple of 8, and flatten (Z+2, X+2, Y_p) into one row axis with
   channels minor: ``(B, L, C)``. A tap (dz, dx, dy) becomes the flat row
   offset ``dz·sz + dx·sx + dy`` where ``sz, sx ≡ 0 (mod 8)`` — so the
   nine (dz, dx) base offsets are sublane-aligned (free addressing) and
   only the three dy values need a materialized row shift. Out-of-bounds
   taps read the zero padding (a row overflow lands exactly in the padding
   cells), so SAME semantics come for free.
2. **Aligned im2col**: per flat tile of N output positions, the patch
   matrix (N, 27·C_p) is assembled from 27 sublane-aligned reads (out of
   the three dy-shifted copies) written at 128-aligned lane offsets —
   every copy is tile-aligned, no crossbar relayouts anywhere.
3. **One deep matmul**: the conv is then a single
   ``patches (N, 27·C_p) @ W (27·C_p, C_out)`` per tile — contraction
   depth 27·C_p (≥ 3456), large M, contracting lhs lanes against rhs
   sublanes: the MXU's native form — instead of 27 shallow accumulated
   dots whose pass latency dominates (the histogram kernel's measured
   "+= chain serializes MXU passes" lesson).

Channels are zero-padded to a multiple of 128 (DMA lane alignment); the
zero rows contract to zero, costing utilization only for C_in < 128.

Measured (v5e, batch 4, f32): see benchmarks/RESULTS.md "Multi-channel
Pallas conv3d".

Reference scope: the reference's UNet (``core/models/unet.py:17-135``) and
CNN baseline (``core/models/CNNBaseline.py``) are its only multi-channel
conv users; both use 3³ kernels, which is all this kernel supports.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mc_kernel_vmem(x_ref, w_ref, o_ref, patches, *, n_tile: int,
                    cin_p: int, bases: Tuple[int, ...], n_tiles: int):
    """Whole-volume-resident variant: one grid step per sample, tiles
    looped in-kernel — no DMA and no per-tile grid-step overhead (the
    measured limiter of the streamed variant at small volumes)."""
    for j in range(n_tiles):
        for t in range(27):
            base, dy = bases[t]
            patches[:, t * cin_p:(t + 1) * cin_p] = \
                x_ref[0, pl.ds(j * n_tile + base + dy, n_tile), :]
        o_ref[0, pl.ds(j * n_tile, n_tile), :] = lax.dot_general(
            patches[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _mc_kernel(x_hbm, w_ref, o_ref, *, n_tile: int, win: int, cin_p: int,
               bases: Tuple[int, ...]):
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body(window, rot1, rot2, patches, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * n_tile, win), :], window, sem)
        dma.start()
        dma.wait()
        # the only unaligned row shifts: dy = 1, 2 (sz, sx are 8-aligned)
        rot1[...] = window[pl.ds(1, win - 8), :]
        rot2[...] = window[pl.ds(2, win - 8), :]
        srcs = (window, rot1, rot2)
        for t in range(27):
            base, dy = bases[t]
            patches[:, t * cin_p:(t + 1) * cin_p] = \
                srcs[dy][pl.ds(base, n_tile), :]
        o_ref[0] = lax.dot_general(
            patches[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    pl.run_scoped(
        body,
        window=pltpu.VMEM((win, cin_p), jnp.float32),
        rot1=pltpu.VMEM((win - 8, cin_p), jnp.float32),
        rot2=pltpu.VMEM((win - 8, cin_p), jnp.float32),
        patches=pltpu.VMEM((n_tile, 27 * cin_p), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "n_tile",
                                             "channels_last"))
def conv3d_mc_same(x: jnp.ndarray, w: jnp.ndarray,
                   interpret: bool = False,
                   n_tile: int = 1024,
                   channels_last: bool = False) -> jnp.ndarray:
    """SAME 3³ conv3d.

    x (B, C_in, Z, X, Y) × w (C_out, C_in, 3, 3, 3) → (B, C_out, Z, X, Y),
    f32. With ``channels_last=True``, x is (B, Z, X, Y, C_in) and the
    output matches — use this end-to-end to skip the NCDHW transposes.
    """
    if not channels_last:
        x = jnp.moveaxis(x, 1, -1)
    b, z, xx, yy, cin = x.shape
    cout = w.shape[0]
    assert w.shape == (cout, cin, 3, 3, 3), w.shape
    # pad the minor spatial extent so sx (and hence sz) are 8-aligned:
    # the nine (dz, dx) base offsets then need no row rotation at all
    sx = yy + 2 + ((-(yy + 2)) % 8)
    sz = (xx + 2) * sx
    xp = jnp.pad(x.astype(jnp.float32),
                 [(0, 0), (1, 1), (1, 1), (1, sx - yy - 1), (0, 0)])
    flat = xp.reshape(b, (z + 2) * sz, cin)

    cin_p = -(-cin // 128) * 128  # DMA lane alignment; zeros contract to 0
    if cin_p != cin:
        flat = jnp.pad(flat, [(0, 0), (0, 0), (0, cin_p - cin)])

    # tap t = (dz, dx, dy) reads rows [base_t + dy, …) — base_t 8-aligned
    bases = tuple((dz * sz + dx * sx, dy)
                  for dz in range(3) for dx in range(3) for dy in range(3))
    max_base = 2 * sz + 2 * sx
    p_total = z * sz  # superset of valid outputs, reshapes to (z, X+2, sx)
    n_tiles = -(-p_total // n_tile)
    win = n_tile + max_base + 8  # + dy headroom, keeps rot slices in-bounds
    win += (-win) % 8
    need = (n_tiles - 1) * n_tile + win
    flat = jnp.pad(flat, [(0, 0), (0, max(0, need - flat.shape[1])), (0, 0)])

    # W rows match the patches' (tap, channel) lane order
    wt = jnp.transpose(w.reshape(cout, cin, 27), (2, 1, 0))  # (27, Cin, Cout)
    if cin_p != cin:
        wt = jnp.pad(wt, [(0, 0), (0, cin_p - cin), (0, 0)])
    w_arg = wt.reshape(27 * cin_p, cout)

    flat_bytes = 4 * flat.shape[1] * cin_p
    out_bytes = 4 * n_tiles * n_tile * cout
    if flat_bytes + out_bytes <= 24 * 1024 * 1024:
        # small volumes (deep UNet layers): whole sample resident in VMEM,
        # tiles looped in-kernel — one grid step per sample
        out = pl.pallas_call(
            functools.partial(_mc_kernel_vmem, n_tile=n_tile, cin_p=cin_p,
                              bases=bases, n_tiles=n_tiles),
            out_shape=jax.ShapeDtypeStruct((b, n_tiles * n_tile, cout),
                                           jnp.float32),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, flat.shape[1], cin_p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_tiles * n_tile, cout),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_tile, 27 * cin_p), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(flat, w_arg.astype(jnp.float32))
        out = out[:, :p_total].reshape(b, z, xx + 2, sx, cout)
        out = out[:, :, :xx, :yy]
        return out if channels_last else jnp.moveaxis(out, -1, 1)

    out = pl.pallas_call(
        functools.partial(_mc_kernel, n_tile=n_tile, win=win, cin_p=cin_p,
                          bases=bases),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * n_tile, cout),
                                       jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_tile, cout), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flat, w_arg.astype(jnp.float32))

    out = out[:, :p_total].reshape(b, z, xx + 2, sx, cout)
    out = out[:, :, :xx, :yy]
    return out if channels_last else jnp.moveaxis(out, -1, 1)
