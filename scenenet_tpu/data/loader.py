"""Batched data loading with background prefetch.

Replaces the reference's torch ``DataLoader(num_workers=8)``
(``core/lit_modules/lit_data_wrappers.py:62-72``) with a thread-pool
prefetcher feeding pinned numpy batches. Two modes:

- :class:`VoxelLoader` — samples transformed to dense voxel grids on the
  host (oracle path), stacked into (B, 1, Z, X, Y).
- :class:`PointCloudLoader` — fixed-size padded point batches for the
  on-device voxelization path (points, labels, mask, flat_idx), letting the
  TPU do the scatter (see ``scenenet_tpu/ops/voxelize.py``).

Both accept a ``sharding`` for multi-host/multi-device placement of the
host batch (``jax.device_put`` with a NamedSharding = the JAX-native DDP
input pipeline).
"""

from __future__ import annotations

import concurrent.futures as cf
import random
from typing import Any, Iterator, Optional, Sequence

import numpy as np


class _BaseLoader:
    def __init__(self, dataset: Any, batch_size: int = 4, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False, seed: int = 0,
                 sharding: Optional[Any] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.seed = seed
        self.sharding = sharding
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> Sequence[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self._epoch).shuffle(idx)
        return idx

    def _collate(self, samples):
        parts = list(zip(*samples))
        return tuple(np.stack(p) for p in parts)

    def _place(self, batch):
        if self.sharding is None:
            return batch
        import jax

        return tuple(jax.device_put(b, self.sharding) for b in batch)

    def __iter__(self) -> Iterator:
        idx = self._indices()
        self._epoch += 1
        batches = [idx[i:i + self.batch_size] for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            # BOUNDED prefetch: keep at most num_workers+1 batches in
            # flight. Submitting the whole epoch upfront (round-1 bug) let
            # the pool race ahead of the consumer and buffer every
            # collated batch in RAM (GBs at TS40K scale), collapsing
            # throughput ~10× once allocation pressure kicked in.
            from collections import deque

            it = iter(batches)
            pending: deque = deque()

            def submit_next():
                b = next(it, None)
                if b is not None:
                    pending.append(pool.submit(
                        lambda b=b: self._collate([self.dataset[i] for i in b])))

            for _ in range(self.num_workers + 1):
                submit_next()
            while pending:
                out = pending.popleft().result()
                submit_next()
                yield self._place(out)


class VoxelLoader(_BaseLoader):
    """Dataset must yield (input_grid (1,Z,X,Y), gt_grid (1,Z,X,Y))."""


class PointCloudLoader(_BaseLoader):
    """Dataset must yield (points, labels, mask, flat_idx) fixed-size arrays
    (see :class:`scenenet_tpu.data.transforms.PointPadding`)."""


def random_split(n: int, val_fraction: float, seed: int = 0):
    """Index split mirroring the reference's ``random_split`` usage
    (``lit_data_wrappers.py:50-53``)."""
    idx = list(range(n))
    random.Random(seed).shuffle(idx)
    n_val = int(n * val_fraction)
    return idx[: n - n_val], idx[n - n_val:]


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


class NativePointCloudLoader(_BaseLoader):
    """Point batches prepared by the C++ loader (`native.load_batch_native`).

    The per-sample hot path — npy parse, read, f64→f32, min-centering,
    subsample, pad — runs in real ``std::thread``s with the GIL released,
    so host prep scales with cores (measured 929 samples/s on ONE core vs
    425/s for the Python ``PointPadding``; benchmarks/RESULTS.md). Emits
    the same (points, labels, mask, flat_idx) tuples as
    ``PointCloudLoader`` + ``PointPadding(compute_indices=False)``; pair
    with on-device voxelization.

    The dataset must expose ``.dataset_path`` and ``.npy_files`` (TS40K /
    SemanticKITTICrops do) or be a ``Subset`` of one.
    """

    def __init__(self, dataset: Any, batch_size: int = 4, shuffle: bool = False,
                 max_points: int = 65536, threads: int = 0,
                 drop_last: bool = False, seed: int = 0,
                 sharding: Optional[Any] = None):
        super().__init__(dataset, batch_size, shuffle, num_workers=1,
                         drop_last=drop_last, seed=seed, sharding=sharding)
        self.max_points = max_points
        self.threads = threads
        self._paths = self._resolve_paths(dataset)

    @staticmethod
    def _resolve_paths(dataset) -> Sequence[str]:
        import os

        if isinstance(dataset, Subset):
            base = NativePointCloudLoader._resolve_paths(dataset.dataset)
            return [base[i] for i in dataset.indices]
        return [os.path.join(dataset.dataset_path, f)
                for f in dataset.npy_files]

    def __iter__(self) -> Iterator:
        import concurrent.futures as cf

        from scenenet_tpu import native

        idx = self._indices()
        self._epoch += 1
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        def load(b):
            pts, labels, mask = native.load_batch_native(
                [self._paths[i] for i in b], self.max_points, self.threads)
            flat = np.zeros((len(b), self.max_points), np.int32)
            return pts, labels, mask, flat

        # single prefetch thread: the C++ call releases the GIL, so one
        # Python thread is enough to overlap prep with consumption
        with cf.ThreadPoolExecutor(1) as pool:
            pending = None
            for b in batches:
                fut = pool.submit(load, b)
                if pending is not None:
                    yield self._place(pending.result())
                pending = fut
            if pending is not None:
                yield self._place(pending.result())
