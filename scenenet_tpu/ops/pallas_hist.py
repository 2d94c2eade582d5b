"""Pallas TPU kernel: voxel histogram as fused one-hot matmuls on the MXU.

Same math as :func:`scenenet_tpu.ops.voxelize._mxu_bin_counts` — split the
flat bin id into (hi, lo) halves and accumulate
``counts[hi, lo] += OneHot(hi_chunk)ᵀ @ OneHot(lo_chunk)`` — but the
one-hot operands are built *inside* the kernel in VMEM right before each
``dot_general``, so they never round-trip through HBM. That HBM traffic is
exactly what bounds the XLA einsum formulation: XLA materializes both
one-hot operands per chunk (~100 MB/chunk at batch 16), and the round-2
ablation showed int8 vs bf16 einsums time within 6% of each other — the
matmul FLOPs are not the bottleneck there.

Kernel layout: one grid step per sample; the whole (n_chunks, CHUNK) id
plane sits in VMEM (~0.26 MB for 65k points) and an in-kernel fori_loop
builds int8 one-hots (hi via shift, lo via mask when LO is a power of
two) and feeds s8×s8→s32 MXU dots, accumulating into the VMEM output
block.

Measured (v5e, 16×65k pts → 64³, two channels): 5.66 ms vs 8.91 ms for
the XLA int8 einsum (1.6×); sweep: split_dots beats the concatenated
two-channel lhs by ~8%, chunk ∈ {2048, 4096, 8192} within 2%. The
production default via ``voxelize._batch_from_flat(method="mxu")`` on
TPU. (The round-1 bf16 variant of this kernel lost to XLA at 13.1 vs
10.5 ms on 32×82k — int8 dots plus the in-kernel hi/lo split flipped it.)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO = 512
CHUNK = 4096


def _live_chunk_count(valid: jnp.ndarray) -> jnp.ndarray:
    """(n_chunks, chunk) {0,1} validity → scalar count of chunks up to and
    including the last one holding any valid point. Trailing all-padding
    chunks (real clouds are 40–70k points padded to the batch max) then
    never reach the MXU: the histogram loop runs with this dynamic bound,
    which measured ~20-25%% off the voxelization kernel on the TS40K
    fixtures. Interior all-invalid chunks still run (exact for any mask)."""
    rows = lax.broadcasted_iota(jnp.int32, valid.shape, 0) + 1
    return jnp.max(valid * rows)


def _hist_kernel(ids_ref, w_ref, o_ref, *, n_hi: int, channels: int,
                 n_chunks: int, chunk: int, dtype, split_dots: bool):
    acc_dtype = o_ref.dtype
    o_ref[0] = jnp.zeros_like(o_ref[0])
    lo_shift = LO.bit_length() - 1  # LO is a power of two
    invalid = n_hi * LO
    n_live = _live_chunk_count((ids_ref[0] != invalid).astype(jnp.int32))

    def body(c, _):
        ids = ids_ref[0, pl.ds(c, 1)][0]  # (chunk,) int32
        hi = ids >> lo_shift
        lo = ids & (LO - 1)
        # all minor-dim insertions/broadcasts happen at 32 bits (Mosaic
        # rejects sub-32-bit minor-dim insertion); cast to int8/bf16 last
        mask_hi = hi[:, None] == lax.broadcasted_iota(jnp.int32, (chunk, n_hi), 1)
        a = mask_hi.astype(dtype)
        b = (lo[:, None] == lax.broadcasted_iota(jnp.int32, (chunk, LO), 1))
        b = b.astype(dtype)
        dims = (((0,), (0,)), ((), ()))
        if channels == 2:
            wcol = w_ref[0, pl.ds(c, 1)][0][:, None]  # (chunk, 1) 32-bit
            if dtype == jnp.int8:
                # {0,1} indicator contract of the s8 path
                aw = jnp.logical_and(mask_hi, wcol != 0).astype(dtype)
            else:
                # int8=False: arbitrary float weights ride the lhs one-hot
                # (applied at bf16 lhs precision); masked/padded points
                # have mask_hi rows that never fire, so no w masking needed
                aw = a * wcol.astype(dtype)
            if split_dots:
                o_ref[0, :n_hi] += lax.dot_general(
                    a, b, dims, preferred_element_type=acc_dtype)
                o_ref[0, n_hi:] += lax.dot_general(
                    aw, b, dims, preferred_element_type=acc_dtype)
                return 0
            a = jnp.concatenate([a, aw], axis=1)
        o_ref[0] += lax.dot_general(a, b, dims,
                                    preferred_element_type=acc_dtype)
        return 0

    lax.fori_loop(0, n_live, body, 0)


def _bin_flat_ids_in_kernel(pts_ref, m, grid_shape, invalid: int):
    """Shared in-kernel bounds + binning: masked per-axis bounds reduced to
    scalars (regular-bounding-box expansion), then each point's flat
    (z, x, y) bin id via the pyntcloud edge rule with the f32 1e-4 bias —
    the ONE id recipe (parity with ``voxelize.voxel_indices``); used by
    both the fused histogram kernel and the id-only kernel so the math
    cannot drift between them. ``pts_ref`` is a (1, 3, n_chunks, chunk)
    block ref, ``m`` the (n_chunks, chunk) bool mask; returns int32 ids
    with masked points set to ``invalid``."""
    n_x, n_y, n_z = grid_shape
    big = jnp.float32(3.4e38)
    axes_lo = []
    axes_hi = []
    for a in range(3):
        p = pts_ref[0, a]
        axes_lo.append(jnp.min(jnp.where(m, p, big)))
        axes_hi.append(jnp.max(jnp.where(m, p, -big)))
    rngs = [h - l for l, h in zip(axes_lo, axes_hi)]
    rmax = jnp.maximum(rngs[0], jnp.maximum(rngs[1], rngs[2]))
    lo = [l - (rmax - r) * 0.5 for l, r in zip(axes_lo, rngs)]
    hi = [h + (rmax - r) * 0.5 for h, r in zip(axes_hi, rngs)]
    shape_f = (jnp.float32(n_x), jnp.float32(n_y), jnp.float32(n_z))
    inv_step = [s / jnp.maximum(h - l, jnp.float32(1e-30))
                for l, h, s in zip(lo, hi, shape_f)]

    def bin_axis(a, n):
        p = pts_ref[0, a]
        rel = (p - lo[a]) * inv_step[a]
        idx = jnp.ceil(rel - jnp.float32(1e-4)).astype(jnp.int32) - 1
        return jnp.clip(idx, 0, n - 1)

    ix = bin_axis(0, n_x)
    iy = bin_axis(1, n_y)
    iz = bin_axis(2, n_z)
    return jnp.where(m, (iz * n_x + ix) * n_y + iy, invalid)


def _points_hist_kernel(pts_ref, m_ref, w_ref, o_ref, flat_ref,
                        acc32_ref=None, *, grid_shape,
                        n_hi: int, channels: int, n_chunks: int, chunk: int,
                        dtype, binarize: bool = False):
    """Fused raw-points → two-channel histogram.

    Phase 1 reduces masked per-axis bounds (regular-bounding-box expanded,
    pyntcloud rule) to scalars; phase 2 computes each chunk's flat (z,x,y)
    bin ids in VMEM and feeds the same one-hot MXU dots as
    :func:`_hist_kernel`. Raw points are read from HBM exactly once and no
    intermediate id tensor ever exists in HBM (the XLA formulation spends
    ~1.4 ms/batch on the index computation alone, plus its HBM round-trip).

    ``binarize=True`` (channels=1 only; o_ref is f32, requires
    ``LO % n_y == 0``): fold the occupancy binarization —
    ``counts > per-y-column min``, the minmax-normalization parity rule
    of ``voxelize_batch_occupancy`` — into the kernel epilogue and emit
    f32 {0,1} directly, skipping the separate XLA convert/reduce/compare
    HBM passes over the counts. The y-column id is ``lo % n_y``
    (flat = (iz·n_x+ix)·n_y+iy), so the min reduces over all hi rows ×
    the LO/n_y lo-groups. Counts accumulate exactly in f32 (≤ 2²⁴
    points per grid — integer-exact in a float32)."""
    acc_dtype = o_ref.dtype
    o_ref[0] = jnp.zeros_like(o_ref[0])
    lo_shift = LO.bit_length() - 1

    m = m_ref[0] != 0  # (n_chunks, CHUNK)
    n_live = _live_chunk_count(m_ref[0])
    # staged through a VMEM scratch: Mosaic has no dynamic_slice on values
    flat_ref[...] = _bin_flat_ids_in_kernel(pts_ref, m, grid_shape,
                                            invalid=n_hi * LO)
    if binarize:
        acc_dtype = jnp.int32
        acc32_ref[...] = jnp.zeros_like(acc32_ref[...])

    def body(c, acc):
        ids = flat_ref[pl.ds(c, 1)]  # (1, chunk)
        hi_c = ids >> lo_shift
        lo_c = ids & (LO - 1)
        # lhs one-hot built directly transposed, (n_hi, chunk): the dot
        # then contracts lhs lanes against rhs sublanes — the MXU's
        # natural (M,K)@(K,N) form, no internal lhsT relayout
        mask_hi = hi_c == lax.broadcasted_iota(jnp.int32, (n_hi, chunk), 0)
        at = mask_hi.astype(dtype)
        b = (lo_c[0][:, None] == lax.broadcasted_iota(jnp.int32, (chunk, LO), 1))
        b = b.astype(dtype)
        dims = (((1,), (0,)), ((), ()))
        if channels == 2:
            wrow = w_ref[0, pl.ds(c, 1)]  # (1, chunk)
            awt = jnp.logical_and(mask_hi, wrow != 0).astype(dtype)
            if binarize:
                acc32_ref[:n_hi] += lax.dot_general(
                    at, b, dims, preferred_element_type=acc_dtype)
                acc32_ref[n_hi:] += lax.dot_general(
                    awt, b, dims, preferred_element_type=acc_dtype)
            else:
                o_ref[0, :n_hi] += lax.dot_general(
                    at, b, dims, preferred_element_type=acc_dtype)
                o_ref[0, n_hi:] += lax.dot_general(
                    awt, b, dims, preferred_element_type=acc_dtype)
            return acc
        d = lax.dot_general(at, b, dims, preferred_element_type=acc_dtype)
        if binarize:
            acc32_ref[...] += d  # int32 counts in a VMEM scratch
        else:
            o_ref[0] += d
        return acc

    lax.fori_loop(0, n_live, body, 0)
    if binarize:
        n_y = grid_shape[1]
        groups = LO // n_y
        assert groups & (groups - 1) == 0, "binarize needs 2^k lo-groups"
        counts = acc32_ref[:n_hi] if channels == 2 else acc32_ref[...]
        # per-y-column min: rows first (lanewise), then fold the LO/n_y
        # lo-groups with log₂(groups) cyclic lane-rotates — {l + k·n_y
        # mod LO} is exactly the congruence class of l mod n_y, so after
        # the fold every lane holds its column's min (Mosaic supports
        # tpu.rotate; the lane-shrinking reshape it would take to do
        # this as a 2D reduction is an unsupported shape cast)
        m0 = jnp.min(counts, axis=0, keepdims=True)  # (1, LO)
        shift = n_y
        while shift < LO:
            m0 = jnp.minimum(m0, jnp.roll(m0, -shift, axis=1))
            shift *= 2
        if channels == 2:
            # x = occupancy (counts > column min); y = tower presence
            o_ref[0, :n_hi] = (counts > m0).astype(jnp.float32)
            o_ref[0, n_hi:] = (acc32_ref[n_hi:] > 0).astype(jnp.float32)
        else:
            o_ref[0] = (counts > m0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("grid_shape", "interpret",
                                             "chunk", "channels"))
def pallas_points_bin_counts(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    tower: Optional[jnp.ndarray],
    grid_shape: Tuple[int, int, int],
    interpret: bool = False,
    chunk: Optional[int] = None,
    channels: int = 2,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(B, N, 3) raw points (+mask, optional tower indicator) →
    (B, size) counts [, tower counts]: bounds, binning and histogram fused
    in one Pallas kernel (int8 MXU dots; f32 binning math identical to
    :func:`scenenet_tpu.ops.voxelize.voxel_indices`).

    ``chunk=None`` auto-picks: 4096 at ≤512 hi-bins (64³; sweep showed
    2048–8192 within 2% there), 8192 for larger grids (128³: the taller
    (n_hi, chunk) one-hot amortizes over a deeper contraction — measured
    9% off the kernel)."""
    b, n, _ = points.shape
    n_x, n_y, n_z = grid_shape
    size = n_x * n_y * n_z
    n_hi = -(-size // LO)
    if chunk is None:
        chunk = 8192 if n_hi > 512 else CHUNK
    if n % chunk:
        pad = chunk - n % chunk
        points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        if tower is not None:
            tower = jnp.pad(tower, ((0, 0), (0, pad)))
        n += pad
    n_chunks = n // chunk
    pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2)  # (B, 3, N)
    pts_t = pts_t.reshape(b, 3, n_chunks, chunk)
    m = mask.astype(jnp.int32).reshape(b, n_chunks, chunk)
    w = (tower.astype(jnp.int32) if tower is not None else
         jnp.zeros((b, n), jnp.int32)).reshape(b, n_chunks, chunk)

    pts_spec = pl.BlockSpec((1, 3, n_chunks, chunk), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    id_spec = pl.BlockSpec((1, n_chunks, chunk), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_points_hist_kernel, grid_shape=grid_shape,
                          n_hi=n_hi, channels=channels, n_chunks=n_chunks,
                          chunk=chunk, dtype=jnp.int8),
        out_shape=jax.ShapeDtypeStruct((b, channels * n_hi, LO), jnp.int32),
        grid=(b,),
        in_specs=[pts_spec, id_spec, id_spec],
        out_specs=pl.BlockSpec((1, channels * n_hi, LO), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_chunks, chunk), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pts_t, m, w)

    out = out.astype(jnp.float32)
    counts = out[:, :n_hi].reshape(b, n_hi * LO)[:, :size]
    if channels == 2:
        wsum = out[:, n_hi:].reshape(b, n_hi * LO)[:, :size]
        return counts, wsum
    return counts, None


@functools.partial(jax.jit, static_argnames=("grid_shape", "interpret",
                                             "chunk"))
def pallas_points_occupancy(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    interpret: bool = False,
    chunk: Optional[int] = None,
) -> jnp.ndarray:
    """(B, N, 3) raw points (+mask) → (B, size) f32 {0,1} occupancy with
    the binarization (``counts > per-y-column min`` — the minmax parity
    rule) fused into the histogram kernel epilogue: the int32 counts
    never leave VMEM, skipping the XLA convert/reduce/compare HBM passes
    of the counts-then-binarize path. Requires ``LO % n_y == 0`` (the
    y-column layout assumption); callers route through
    ``voxelize_batch_occupancy``, which falls back otherwise."""
    b, n, _ = points.shape
    n_x, n_y, n_z = grid_shape
    assert LO % n_y == 0, (LO, n_y)
    size = n_x * n_y * n_z
    n_hi = -(-size // LO)
    assert n_hi * LO == size, "binarize epilogue needs an exact hi/LO tiling"
    if chunk is None:
        chunk = 8192 if n_hi > 512 else CHUNK
    if n % chunk:
        pad = chunk - n % chunk
        points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        n += pad
    n_chunks = n // chunk
    pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2).reshape(
        b, 3, n_chunks, chunk)
    m = mask.astype(jnp.int32).reshape(b, n_chunks, chunk)
    w = jnp.zeros((b, n_chunks, chunk), jnp.int32)

    pts_spec = pl.BlockSpec((1, 3, n_chunks, chunk), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    id_spec = pl.BlockSpec((1, n_chunks, chunk), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_points_hist_kernel, grid_shape=grid_shape,
                          n_hi=n_hi, channels=1, n_chunks=n_chunks,
                          chunk=chunk, dtype=jnp.int8, binarize=True),
        out_shape=jax.ShapeDtypeStruct((b, n_hi, LO), jnp.float32),
        grid=(b,),
        in_specs=[pts_spec, id_spec, id_spec],
        out_specs=pl.BlockSpec((1, n_hi, LO), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_chunks, chunk), jnp.int32),
                        pltpu.VMEM((n_hi, LO), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pts_t, m, w)
    return out.reshape(b, size)


@functools.partial(jax.jit, static_argnames=("grid_shape", "interpret",
                                             "chunk"))
def pallas_points_binary(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    tower_w: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    interpret: bool = False,
    chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-channel twin of :func:`pallas_points_occupancy` for the
    TRAINING prep: (B, N, 3) raw points (+mask, {0,1} tower indicator) →
    ((B, size) occupancy, (B, size) tower-presence), both f32 {0,1},
    binarization fused into the kernel epilogue — exactly
    ``voxelize_batch_binary``'s outputs with the counts never leaving
    VMEM. Same layout gates as the occupancy wrapper."""
    b, n, _ = points.shape
    n_x, n_y, n_z = grid_shape
    assert LO % n_y == 0, (LO, n_y)
    size = n_x * n_y * n_z
    n_hi = -(-size // LO)
    assert n_hi * LO == size, "binarize epilogue needs an exact hi/LO tiling"
    if chunk is None:
        chunk = 8192 if n_hi > 512 else CHUNK
    if n % chunk:
        pad = chunk - n % chunk
        points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        tower_w = jnp.pad(tower_w, ((0, 0), (0, pad)))
        n += pad
    n_chunks = n // chunk
    pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2).reshape(
        b, 3, n_chunks, chunk)
    m = mask.astype(jnp.int32).reshape(b, n_chunks, chunk)
    w = tower_w.astype(jnp.int32).reshape(b, n_chunks, chunk)

    pts_spec = pl.BlockSpec((1, 3, n_chunks, chunk), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    id_spec = pl.BlockSpec((1, n_chunks, chunk), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_points_hist_kernel, grid_shape=grid_shape,
                          n_hi=n_hi, channels=2, n_chunks=n_chunks,
                          chunk=chunk, dtype=jnp.int8, binarize=True),
        out_shape=jax.ShapeDtypeStruct((b, 2 * n_hi, LO), jnp.float32),
        grid=(b,),
        in_specs=[pts_spec, id_spec, id_spec],
        out_specs=pl.BlockSpec((1, 2 * n_hi, LO), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_chunks, chunk), jnp.int32),
                        pltpu.VMEM((2 * n_hi, LO), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pts_t, m, w)
    return (out[:, :n_hi].reshape(b, size),
            out[:, n_hi:].reshape(b, size))


@functools.partial(jax.jit, static_argnames=("size", "interpret", "int8",
                                             "chunk", "split_dots"))
def pallas_bin_counts(
    flat: jnp.ndarray,
    mask: jnp.ndarray,
    size: int,
    weights: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    int8: bool = True,
    chunk: int = CHUNK,
    split_dots: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(B, N) flat bin ids (+mask, optional per-point {0,1} weights) →
    (B, size) counts [, (B, size) weighted counts].

    ``int8=True`` (default) runs exact s8×s8→s32 MXU dots — only valid
    while one-hots and weights are {0,1} (they are: weights are the
    is-tower indicator). ``int8=False`` keeps the bf16→f32 variant for
    arbitrary float weights, which are multiplied onto the lhs one-hot at
    bf16 precision (f32 accumulation).
    """
    b, n = flat.shape
    n_hi = -(-size // LO)
    invalid = n_hi * LO
    flat = jnp.where(mask, flat, invalid)
    if n % chunk:
        pad = chunk - n % chunk
        flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=invalid)
        if weights is not None:
            weights = jnp.pad(weights, ((0, 0), (0, pad)))
        n += pad
    n_chunks = n // chunk
    ids = flat.astype(jnp.int32).reshape(b, n_chunks, chunk)
    channels = 2 if weights is not None else 1
    wdt = jnp.int32 if int8 else jnp.float32
    w = (weights.astype(wdt) if weights is not None else
         jnp.zeros((b, n), wdt)).reshape(b, n_chunks, chunk)
    dtype = jnp.int8 if int8 else jnp.bfloat16
    acc_dtype = jnp.int32 if int8 else jnp.float32

    id_spec = pl.BlockSpec((1, n_chunks, chunk), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, n_hi=n_hi, channels=channels,
                          n_chunks=n_chunks, chunk=chunk, dtype=dtype,
                          split_dots=split_dots),
        out_shape=jax.ShapeDtypeStruct((b, channels * n_hi, LO), acc_dtype),
        grid=(b,),
        in_specs=[id_spec, id_spec],
        out_specs=pl.BlockSpec((1, channels * n_hi, LO), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ids, w)

    out = out.astype(jnp.float32)
    counts = out[:, :n_hi].reshape(b, n_hi * LO)[:, :size]
    if channels == 2:
        wsum = out[:, n_hi:].reshape(b, n_hi * LO)[:, :size]
        return counts, wsum
    return counts, None


def _hist_kernel_sorted(ids_ref, starts_ref, o_ref, *, n_hi_slab: int,
                        channels: int, chunk: int, dtype):
    """Two-level (hierarchical) histogram over SORTED ids — VERDICT r2 #4.

    Program (i, s) owns slab ``s`` of sample ``i``: the contiguous flat-id
    range [s·n_hi_slab·LO, (s+1)·n_hi_slab·LO). Because the ids are sorted,
    this slab's points occupy a contiguous run of the id array, located by
    the precomputed ``starts`` positions (host-side searchsorted); the
    chunk loop runs ONLY over that run, and the hi one-hot spans only the
    slab's ``n_hi_slab`` rows instead of all of n_hi. MXU work drops from
    points × bins to ≈ points × bins / n_slabs (+ one shared boundary
    chunk per slab) — the difference between 4096-row and 256-row one-hots
    at 128³.

    For ``channels == 2`` the input is the PACKED key ``(flat << 1) | w``
    (w the {0,1} tower indicator): packing rides the indicator through the
    sort for free — a single-array sort instead of a key+payload sort, and
    one VMEM operand instead of two — and the VPU unpack here (shift/and)
    is noise against the dots."""
    acc_dtype = o_ref.dtype
    o_ref[0] = jnp.zeros_like(o_ref[0])
    lo_shift = LO.bit_length() - 1
    i = pl.program_id(0)
    s = pl.program_id(1)
    p0 = starts_ref[i, s]
    p1 = starts_ref[i, s + 1]
    c0 = p0 // chunk
    c1 = (p1 + chunk - 1) // chunk
    hi_base = s * n_hi_slab

    def body(c, _):
        packed = ids_ref[0, pl.ds(c, 1)]  # (1, chunk)
        ids = (packed >> 1) if channels == 2 else packed
        hi_c = (ids >> lo_shift) - hi_base
        lo_c = ids & (LO - 1)
        # lhs one-hot built transposed (n_hi_slab, chunk): rows outside
        # [0, n_hi_slab) — neighbor-slab spill in boundary chunks and
        # invalid/padding ids — never fire, keeping the result exact
        mask_hi = hi_c == lax.broadcasted_iota(jnp.int32, (n_hi_slab, chunk), 0)
        at = mask_hi.astype(dtype)
        b = (lo_c[0][:, None] == lax.broadcasted_iota(jnp.int32, (chunk, LO), 1))
        b = b.astype(dtype)
        dims = (((1,), (0,)), ((), ()))
        if channels == 2:
            awt = jnp.logical_and(mask_hi, (packed & 1) != 0).astype(dtype)
            o_ref[0, 0] += lax.dot_general(
                at, b, dims, preferred_element_type=acc_dtype)
            o_ref[0, 1] += lax.dot_general(
                awt, b, dims, preferred_element_type=acc_dtype)
        else:
            o_ref[0, 0] += lax.dot_general(at, b, dims,
                                           preferred_element_type=acc_dtype)
        return 0

    lax.fori_loop(c0, c1, body, 0)


@functools.partial(jax.jit, static_argnames=("size", "n_slabs", "chunk",
                                             "interpret", "channels"))
def pallas_sorted_bin_counts(
    flat: jnp.ndarray,
    mask: jnp.ndarray,
    weights: Optional[jnp.ndarray],
    size: int,
    n_slabs: Optional[int] = None,
    chunk: int = 2048,
    interpret: bool = False,
    channels: int = 2,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(B, N) flat bin ids → (B, size) counts [, indicator-weighted counts]
    via the hierarchical sorted two-level kernel.

    ``weights`` must be {0,1} indicators (the tower-point flags of the
    two-channel voxelization, same contract as :func:`pallas_bin_counts`):
    the second channel counts points whose weight is NONZERO — it is a
    per-bin count of flagged points, not a sum of arbitrary weights.

    Sorts one int32 key array per sample: for ``channels == 2`` the {0,1}
    indicator weight is PACKED into the key's low bit — ``(flat << 1) | w``
    — so a single-array ``lax.sort`` replaces the key+payload sort (half
    the sort data movement; run ordering within a bin is irrelevant to a
    histogram, and ``packed < (b << 1) ⟺ flat < b`` keeps the slab
    ``searchsorted`` exact). Masked points get a beyond-range sentinel and
    sort to the tail, outside every slab's run. For 64³ (n_hi ≤ 512) the
    flat single-level kernel is already optimal — this path pays off when
    n_hi ≫ 512 (128³: n_hi=4096), where it cuts the one-hot matmul work
    ≈ n_slabs× (measured on-chip: see benchmarks/RESULTS.md "128³
    training").
    """
    b, n = flat.shape
    n_hi = -(-size // LO)
    if n_slabs is None:
        # keep each slab's one-hot ≲256 rows: the measured-best K at 128³
        # (n_hi=4096 → 16 slabs of 256, RESULTS.md sweep) generalized so
        # 256³-class grids (n_hi=32768) stay at the same rows-per-dot
        n_slabs = max(16, -(-n_hi // 256))
    n_hi_slab = -(-n_hi // n_slabs)
    invalid = n_slabs * n_hi_slab * LO  # sorts past every slab
    flat = jnp.where(mask, flat, invalid).astype(jnp.int32)
    shift = 1 if channels == 2 else 0
    key = flat << shift
    if channels == 2 and weights is not None:
        # indicator contract (see docstring): nonzero weight → bit set;
        # masked/sentinel entries never carry the bit
        key = key | jnp.where(mask, (weights != 0).astype(jnp.int32), 0)
    pad_val = invalid << shift
    ids_s = lax.sort(key, dimension=1)
    bounds = (jnp.arange(n_slabs + 1, dtype=jnp.int32)
              * (n_hi_slab * LO)) << shift
    starts = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds, side="left"))(ids_s)
    starts = starts.astype(jnp.int32)

    if n % chunk:
        pad = chunk - n % chunk
        ids_s = jnp.pad(ids_s, ((0, 0), (0, pad)), constant_values=pad_val)
        n += pad
    n_chunks = n // chunk
    ids_s = ids_s.reshape(b, n_chunks, chunk)

    id_spec = pl.BlockSpec((1, n_chunks, chunk), lambda i, s: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_hist_kernel_sorted, n_hi_slab=n_hi_slab,
                          channels=channels, chunk=chunk, dtype=jnp.int8),
        out_shape=jax.ShapeDtypeStruct(
            (b, channels, n_slabs * n_hi_slab, LO), jnp.int32),
        grid=(b, n_slabs),
        in_specs=[
            id_spec,
            # SMEM block = the whole (B, K+1) array (Mosaic requires
            # full-dim or tile-aligned blocks); the kernel indexes [i, s]
            pl.BlockSpec((b, n_slabs + 1), lambda i, s: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, channels, n_hi_slab, LO),
                               lambda i, s: (i, 0, s, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ids_s, starts)

    out = out.astype(jnp.float32).reshape(b, channels, -1)[:, :, :size]
    if channels == 2:
        return out[:, 0], out[:, 1]
    return out[:, 0], None


def _points_ids_kernel(pts_ref, m_ref, o_ref, *, grid_shape, invalid: int):
    """Raw points → flat (z,x,y) bin ids, bounds computed in-kernel.

    The id-computation prefix of the hierarchical sorted path: identical
    bounds + binning math to :func:`_points_hist_kernel` (regular-
    bounding-box expansion, pyntcloud edge rule, f32 1e-4 bias), but the
    ids ARE the output — one HBM read of the points, one id write,
    instead of the vmapped XLA formulation's multiple reduction passes
    (measured 2.6 ms → ~0.3 ms for b4 × 131k at 128³)."""
    m = m_ref[0] != 0  # (n_chunks, chunk)
    o_ref[0] = _bin_flat_ids_in_kernel(pts_ref, m, grid_shape, invalid)


@functools.partial(jax.jit, static_argnames=("grid_shape", "interpret",
                                             "chunk"))
def pallas_flat_ids(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    interpret: bool = False,
    chunk: int = CHUNK,
) -> jnp.ndarray:
    """(B, N, 3) raw points (+mask) → (B, N) flat bin ids (masked points
    get an out-of-range sentinel). Matches
    ``_flat_zxy_idx(voxel_indices(grid_bounds(...)))`` exactly."""
    b, n, _ = points.shape
    n_x, n_y, n_z = grid_shape
    invalid = -(-(n_x * n_y * n_z) // LO) * LO
    n0 = n
    if n % chunk:
        pad = chunk - n % chunk
        points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        n += pad
    n_chunks = n // chunk
    pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2).reshape(
        b, 3, n_chunks, chunk)
    m = mask.astype(jnp.int32).reshape(b, n_chunks, chunk)
    pts_spec = pl.BlockSpec((1, 3, n_chunks, chunk), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    id_spec = pl.BlockSpec((1, n_chunks, chunk), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_points_ids_kernel, grid_shape=grid_shape,
                          invalid=invalid),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, chunk), jnp.int32),
        grid=(b,),
        in_specs=[pts_spec, id_spec],
        out_specs=id_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(pts_t, m)
    return out.reshape(b, n)[:, :n0]
