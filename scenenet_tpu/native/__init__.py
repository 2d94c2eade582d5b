"""ctypes bindings for the native (C++) host kernels.

``libsnt_native.so`` is built with ``make -C scenenet_tpu/native`` (or
automatically on first import when a compiler is available). Every binding
has a pure-numpy fallback elsewhere in the package — the native layer is a
throughput optimization for the host data pipeline (voxelize / DBSCAN /
LAS decode), mirroring where the reference leaned on third-party native
code (SURVEY.md §2.9).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libsnt_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        return True
    except Exception:
        return False


def load_native(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and build_if_missing and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.snt_voxelize.restype = ctypes.c_int
    lib.snt_fit_spec.restype = ctypes.c_int
    lib.snt_dbscan.restype = ctypes.c_int
    lib.snt_read_las.restype = ctypes.c_int64
    lib.snt_load_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return load_native() is not None


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def voxelize_native(
    xyz: np.ndarray,
    labels: Optional[np.ndarray],
    keep_labels: Sequence[float] = (15,),
    vxg_size: Optional[Tuple[int, int, int]] = (64, 64, 64),
    vox_size: Optional[Tuple[float, float, float]] = None,
    want_indices: bool = False,
):
    """Fused host voxelization: returns (hist_counts, reg, spec_dict[, idx]).

    ``hist_counts`` are raw per-voxel counts in (z, x, y) layout; apply
    :func:`scenenet_tpu.ops.voxel_np.normalize_per_column_np` for the model
    input convention.
    """
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xyz = np.ascontiguousarray(xyz, np.float64)
    n = len(xyz)
    labels_arr = None
    if labels is not None:
        labels_arr = np.ascontiguousarray(labels, np.float64)
    keep = np.ascontiguousarray(np.asarray(keep_labels, np.float64).reshape(-1))

    use_vox = vox_size is not None
    vxg = np.asarray(vxg_size if vxg_size else (64, 64, 64), np.int64)
    vox = np.asarray(vox_size if use_vox else (0, 0, 0), np.float64)

    mins = np.zeros(3)
    maxs = np.zeros(3)
    shape = np.zeros(3, np.int64)

    # when voxel sizes are used the shape is data-dependent: size the
    # output buffers with the C++ fit itself (snt_fit_spec) — NOT a
    # host-side numpy reimplementation, whose float path could disagree
    # by one truncated bin and under-allocate (the main call below runs
    # the identical fit_spec, so the shapes match by construction)
    if use_vox:
        ret = lib.snt_fit_spec(
            _ptr(xyz, ctypes.c_double), ctypes.c_int64(n),
            _ptr(vxg, ctypes.c_int64), _ptr(vox, ctypes.c_double),
            ctypes.c_int(1),
            _ptr(mins, ctypes.c_double), _ptr(maxs, ctypes.c_double),
            _ptr(shape, ctypes.c_int64))
        if ret != 0:
            raise RuntimeError(f"snt_fit_spec failed (code {ret})")
    else:
        shape[:] = vxg
    alloc_shape = shape.copy()

    size = int(shape[0] * shape[1] * shape[2])
    hist = np.zeros(size, np.float64)
    reg = np.zeros(size, np.float64)
    idx = np.zeros(n, np.int64) if want_indices else None

    ret = lib.snt_voxelize(
        _ptr(xyz, ctypes.c_double),
        _ptr(labels_arr, ctypes.c_double) if labels_arr is not None else None,
        ctypes.c_int64(n),
        _ptr(vxg, ctypes.c_int64),
        _ptr(vox, ctypes.c_double),
        ctypes.c_int(1 if use_vox else 0),
        _ptr(keep, ctypes.c_double),
        ctypes.c_int64(len(keep)),
        _ptr(mins, ctypes.c_double),
        _ptr(maxs, ctypes.c_double),
        _ptr(shape, ctypes.c_int64),
        _ptr(hist, ctypes.c_double),
        _ptr(reg, ctypes.c_double),
        _ptr(idx, ctypes.c_int64) if idx is not None else None,
    )
    if ret != 0:
        raise RuntimeError(f"snt_voxelize failed (code {ret})")
    assert (shape == alloc_shape).all(), "fit_spec shape drifted between calls"
    n_x, n_y, n_z = (int(s) for s in shape)
    zxy = (n_z, n_x, n_y)
    spec = {"xyzmin": mins, "xyzmax": maxs, "shape": (n_x, n_y, n_z)}
    out = (hist.reshape(zxy), reg.reshape(zxy), spec)
    return out + ((idx,) if want_indices else ())


def dbscan_native(xyz: np.ndarray, eps: float, min_points: int) -> np.ndarray:
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xyz = np.ascontiguousarray(xyz, np.float64)
    labels = np.zeros(len(xyz), np.int64)
    lib.snt_dbscan(_ptr(xyz, ctypes.c_double), ctypes.c_int64(len(xyz)),
                   ctypes.c_double(eps), ctypes.c_int64(min_points),
                   _ptr(labels, ctypes.c_int64))
    return labels


def read_las_native(path: str) -> Tuple[np.ndarray, np.ndarray]:
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = lib.snt_read_las(path.encode(), None, None)
    if n < 0:
        raise ValueError(f"snt_read_las failed (code {n}) for {path}")
    xyz = np.zeros((n, 3), np.float64)
    classes = np.zeros(n, np.uint8)
    ret = lib.snt_read_las(path.encode(), _ptr(xyz, ctypes.c_double),
                           _ptr(classes, ctypes.c_uint8))
    if ret != n:
        raise ValueError(f"snt_read_las short read ({ret}/{n}) for {path}")
    return xyz, classes


def load_batch_native(
    paths: Sequence[str],
    max_points: int,
    threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel native batch prep: .npy crop files → (points (B,M,3) f32
    min-centered, labels (B,M) i32, mask (B,M) bool), padded to
    ``max_points``. Runs in C++ threads (the GIL is released for the whole
    call) — the host-pipeline hot path that bounds TS40K-scale epochs
    (benchmarks/RESULTS.md). ``threads=0`` → one per file (≤ cpu count)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    b = len(paths)
    pts = np.empty((b, max_points, 3), np.float32)
    labels = np.empty((b, max_points), np.int32)
    mask = np.empty((b, max_points), np.uint8)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    if threads <= 0:
        threads = min(b, os.cpu_count() or 1)
    rc = lib.snt_load_batch(
        ctypes.c_char_p(blob), ctypes.c_int(b), ctypes.c_int64(max_points),
        ctypes.c_int(threads), _ptr(pts, ctypes.c_float),
        _ptr(labels, ctypes.c_int32), _ptr(mask, ctypes.c_uint8))
    if rc != 0:
        raise ValueError(f"snt_load_batch failed on {paths[rc - 1]!r}")
    return pts, labels, mask.astype(bool)
