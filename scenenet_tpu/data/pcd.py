"""Point-cloud geometry + TS40K label taxonomy (host-side, numpy).

Covers the reference's ``utils/pcd_processing.py`` capability surface
without the open3d/pyntcloud/laspy dependencies: label constants and remap
(``:36-87``), object selection (``:508``), DBSCAN tower extraction
(``:577-652`` — via :mod:`scenenet_tpu.ops.dbscan`), radius / two-tower /
ground cropping (``:666-833``), down-sampling (``:375-470``) and
normalization helpers (``:305-330``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from scenenet_tpu.ops.dbscan import extract_clusters
from scenenet_tpu.ops.voxel_np import compute_grid_spec, voxel_indices_np

# --- TS40K class taxonomy (reference pcd_processing.py:36-57) ---------------
CREATED = 0
UNCLASSIFIED = 1
GROUND = 2
LOW_VEGETATION = 3
MEDIUM_VEGETATION = 4
NATURAL_OBSTACLE = 5
HUMAN_STRUCTURES = 6
LOW_POINT = 7
MODEL_KEYPOINTS = 8
WATER = 9
RAIL = 10
ROAD_SURFACE = 11
OVERLAP_POINTS = 12
MEDIUM_RELIABILITY = 13
LOW_RELIABILITY = 14
POWER_LINE_SUPPORT_TOWER = 15
MAIN_POWER_LINE = 16
OTHER_POWER_LINE = 17
FIBER_OPTIC_CABLE = 18
NOT_RATED_OBJ_TBC = 19
NOT_RATED_OBJ_TBIG = 20
INCIDENTS = 21

# 22-class → 7-class semantic remap (reference pcd_processing.py:59-87)
DICT_NEW_LABELS = {
    CREATED: 0, UNCLASSIFIED: 0, LOW_POINT: 0, MODEL_KEYPOINTS: 0,
    OVERLAP_POINTS: 0, MEDIUM_RELIABILITY: 0, LOW_RELIABILITY: 0,
    NOT_RATED_OBJ_TBC: 0, NOT_RATED_OBJ_TBIG: 0, RAIL: 0,          # noise
    GROUND: 1, ROAD_SURFACE: 1,                                     # ground
    LOW_VEGETATION: 2, MEDIUM_VEGETATION: 2,                        # vegetation
    NATURAL_OBSTACLE: 3, HUMAN_STRUCTURES: 3, INCIDENTS: 3,         # obstacles
    WATER: 4,
    POWER_LINE_SUPPORT_TOWER: 5,
    MAIN_POWER_LINE: 6, OTHER_POWER_LINE: 6, FIBER_OPTIC_CABLE: 6,  # power lines
}


def remap_labels(labels: np.ndarray) -> np.ndarray:
    """Apply DICT_NEW_LABELS (vectorized)."""
    lut = np.zeros(max(DICT_NEW_LABELS) + 1, np.int64)
    for k, v in DICT_NEW_LABELS.items():
        lut[k] = v
    return lut[np.asarray(labels, np.int64)]


# --- selection / clustering ---------------------------------------------------

def select_object(xyz: np.ndarray, classes: np.ndarray,
                  obj_class: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Points (and their classes) whose class is in ``obj_class``."""
    mask = np.isin(classes, np.asarray(obj_class).reshape(-1))
    return xyz[mask], classes[mask]


def extract_towers(xyz_towers: np.ndarray, eps: float = 10, min_points: int = 300) -> List[np.ndarray]:
    """DBSCAN instance segmentation of a tower-only point cloud
    (reference ``pcd_processing.py:608-652``; params tuned for towers)."""
    return extract_clusters(np.asarray(xyz_towers, np.float64), eps, min_points)


# --- crops (the TS40K "samples") ---------------------------------------------

def crop_tower_radius(xyz: np.ndarray, classes: np.ndarray, xyz_tower: np.ndarray,
                      radius: float = 0) -> Tuple[np.ndarray, np.ndarray]:
    """All points within an xy-radius of the tower's barycenter
    (``pcd_processing.py:666-698``; radius 0 → tower height)."""
    if radius == 0:
        radius = np.max(xyz_tower[:, 2]) - np.min(xyz_tower[:, 2])
    center = np.mean(xyz_tower, axis=0)
    d2 = np.sum((xyz[:, :2] - center[:2]) ** 2, axis=1)
    keep = d2 <= radius * radius
    return xyz[keep], np.asarray(classes)[keep].astype(int)


def crop_two_towers(xyz: np.ndarray, classes: np.ndarray, tower1: np.ndarray,
                    tower2: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Axis-aligned xy-box spanned by the two towers (``:700-740``)."""
    tt = np.concatenate([tower1, tower2])
    lo, hi = tt.min(0), tt.max(0)
    keep = ((xyz[:, :2] >= lo[:2]) & (xyz[:, :2] <= hi[:2])).all(axis=1)
    return xyz[keep], np.asarray(classes)[keep].astype(int)


def crop_ground_samples(xyz: np.ndarray, classes: np.ndarray,
                        min_points: int = 300) -> List[np.ndarray]:
    """Tower-free strips along x (``:742-768``).

    Working version of the reference's intent: ~100 m strips tiling the
    x extent. The reference reuses its strip COUNT (``int(extent/100)``)
    as the strip WIDTH in meters and linspaces starts up to ``x_max`` —
    covering only a sliver of the ground and always testing one empty
    strip at the far edge; here the strips partition the extent exactly
    (contiguous, no gaps, no dangling start)."""
    lo, hi = xyz.min(0), xyz.max(0)
    n_strips = max(int((hi[0] - lo[0]) / 100), 1)
    step = (hi[0] - lo[0]) / n_strips
    samples = []
    for x0 in lo[0] + step * np.arange(n_strips):
        keep = (xyz[:, 0] >= x0) & (xyz[:, 0] <= x0 + step)
        strip_cls = np.asarray(classes)[keep]
        if keep.sum() > min_points and len(np.unique(strip_cls)) >= 2:
            if POWER_LINE_SUPPORT_TOWER not in strip_cls.astype(int):
                samples.append(np.concatenate(
                    [xyz[keep], strip_cls.reshape(-1, 1)], axis=1))
    return samples


def crop_tower_samples(xyz: np.ndarray, classes: np.ndarray,
                       obj_class: Sequence[int] = (POWER_LINE_SUPPORT_TOWER,),
                       radius: float = 15, eps: float = 10,
                       min_points: int = 300) -> List[np.ndarray]:
    """One (N, 4) crop per detected tower instance (``:805-818``)."""
    tower_xyz, _ = select_object(xyz, classes, obj_class)
    towers = extract_towers(tower_xyz, eps=eps, min_points=min_points)
    samples = []
    for tower in towers:
        crop, crop_cls = crop_tower_radius(xyz, classes, tower, radius=radius)
        samples.append(np.concatenate([crop, crop_cls.reshape(-1, 1)], axis=1))
    return samples


def crop_at_locations(xyz: np.ndarray, coords: np.ndarray, radius: float = 0,
                      classes: Optional[np.ndarray] = None) -> List[np.ndarray]:
    """Radius crops centered on given coordinates (``:820-840``)."""
    if classes is not None:
        xyz = np.concatenate([xyz, np.asarray(classes).reshape(-1, 1)], axis=1)
    if radius == 0:
        radius = xyz[:, 2].max() - xyz[:, 2].min()
    out = []
    for c in np.asarray(coords):
        d2 = np.sum((xyz[:, :2] - c[:2]) ** 2, axis=1)
        out.append(xyz[d2 <= radius * radius])
    return out


# --- downsampling --------------------------------------------------------------

def downsampling(xyz: np.ndarray, classes: np.ndarray, samp_per: float = 0.5,
                 seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Per-voxel uniform sampling (reference ``pcd_processing.py:375-421``).

    The reference buckets points into a 64³ voxel grid, then retains each
    voxel's points with independent probability ``samp_per`` and emits them
    *grouped by voxel in first-appearance order* (its ``dict`` iteration).
    Each point's retention draw is i.i.d. uniform either way, so selection
    is distributionally identical to per-point sampling — but the output
    ordering is the per-voxel grouping, reproduced here vectorized."""
    xyz = np.asarray(xyz)
    classes = np.asarray(classes)
    n = len(xyz)
    if n == 0:
        return xyz, classes
    from scenenet_tpu.ops.voxel_np import compute_grid_spec, voxel_indices_np

    spec = compute_grid_spec(xyz, (64, 64, 64))
    idx = voxel_indices_np(xyz, spec)
    n_x, n_y, _ = spec.shape
    flat = (idx[:, 2] * n_x + idx[:, 0]) * n_y + idx[:, 1]

    uniq, first_pos = np.unique(flat, return_index=True)
    vox_rank = np.empty(len(uniq), np.int64)
    vox_rank[np.argsort(first_pos, kind="stable")] = np.arange(len(uniq))
    point_rank = vox_rank[np.searchsorted(uniq, flat)]
    perm = np.argsort(point_rank, kind="stable")  # voxel groups, stable within

    rng = np.random.default_rng(seed)
    keep = rng.random(n) <= samp_per  # one i.i.d. draw per point, as the ref
    sel = perm[keep[perm]]
    return xyz[sel], classes[sel]


def downsampling_relative_height(xyz: np.ndarray, classes: np.ndarray,
                                 sampling_per: float = 0.8,
                                 seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Height-weighted sampling: lower points are dropped more aggressively
    (``:423-470``)."""
    rng = np.random.default_rng(seed)
    z = xyz[:, 2]
    rel = (z - z.min()) / max(z.max() - z.min(), 1e-12)
    keep_prob = sampling_per * (0.25 + 0.75 * rel)
    keep = rng.random(len(xyz)) <= keep_prob
    return xyz[keep], np.asarray(classes)[keep]


# --- misc ------------------------------------------------------------------------

def normalize_xyz(data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-last-dim-column min-max scaling; returns ((min, max), scaled)
    (reference returns the fitted sklearn scaler, ``:305-321``)."""
    shape = data.shape
    flat = data.reshape(-1, shape[-1]).astype(np.float64)
    lo, hi = flat.min(0), flat.max(0)
    scale = np.where(hi - lo == 0, 1.0, hi - lo)
    return (lo, hi), ((flat - lo) / scale).reshape(shape)


def xyz_centroid(xyz: np.ndarray) -> np.ndarray:
    return np.median(xyz, axis=0)


def euclidean_distance(x: np.ndarray, y: np.ndarray, axis=None) -> np.ndarray:
    return np.linalg.norm(np.asarray(x) - np.asarray(y), axis=axis)
