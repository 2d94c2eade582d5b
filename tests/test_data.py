"""Data layer: transforms, datasets, loaders, LAS reader, DBSCAN, ETL."""

import os

import numpy as np
import pytest

from scenenet_tpu.data import (
    Compose,
    PointPadding,
    ToFullDense,
    TS40K,
    Voxelization,
    VoxelLoader,
    build_data_samples,
    crop_tower_radius,
    crop_tower_samples,
    select_object,
)
from scenenet_tpu.data.las import read_las_xyz_class, write_las
from scenenet_tpu.data.loader import PointCloudLoader, Subset, random_split
from scenenet_tpu.ops.dbscan import dbscan, extract_clusters


def _make_scene(rng, n_towers=2, n_ground=4000):
    """Synthetic scene: flat ground + vertical tower-like clusters."""
    ground = np.column_stack([
        rng.uniform(0, 100, n_ground), rng.uniform(0, 100, n_ground),
        rng.normal(0, 0.2, n_ground),
    ])
    ground_cls = np.full(n_ground, 2.0)
    parts, classes = [ground], [ground_cls]
    for t in range(n_towers):
        cx, cy = 25 + 50 * t, 50
        n = 400
        tower = np.column_stack([
            rng.normal(cx, 0.8, n), rng.normal(cy, 0.8, n), rng.uniform(0, 25, n),
        ])
        parts.append(tower)
        classes.append(np.full(n, 15.0))
    xyz = np.concatenate(parts)
    cls = np.concatenate(classes)
    return xyz, cls


class TestDBSCAN:
    def test_two_clusters_and_noise(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 0.3, (100, 3))
        b = rng.normal(10, 0.3, (120, 3))
        noise = np.array([[100.0, 100.0, 100.0]])
        pts = np.concatenate([a, b, noise])
        labels = dbscan(pts, eps=1.5, min_points=5)
        assert labels[-1] == -1
        assert len(set(labels[:100])) == 1
        assert len(set(labels[100:220])) == 1
        assert labels[0] != labels[150]

    def test_matches_sklearn(self):
        from sklearn.cluster import DBSCAN as SkDBSCAN

        rng = np.random.default_rng(1)
        pts = np.concatenate([
            rng.normal(0, 0.5, (200, 3)),
            rng.normal(5, 0.5, (150, 3)),
            rng.uniform(-20, 20, (30, 3)),
        ])
        ours = dbscan(pts, eps=1.0, min_points=8)
        sk = SkDBSCAN(eps=1.0, min_samples=8).fit(pts).labels_
        # same noise set; same partition structure (up to label permutation)
        np.testing.assert_array_equal(ours == -1, sk == -1)
        for c in set(sk) - {-1}:
            members = ours[sk == c]
            core_labels = members[members >= 0]
            assert len(set(core_labels)) == 1

    def test_extract_clusters(self):
        rng = np.random.default_rng(2)
        pts = np.concatenate([rng.normal(0, 0.2, (50, 3)), rng.normal(8, 0.2, (60, 3))])
        clusters = extract_clusters(pts, eps=1.0, min_points=5)
        assert sorted(len(c) for c in clusters) == [50, 60]


class TestCrops:
    def test_tower_pipeline(self):
        rng = np.random.default_rng(3)
        xyz, cls = _make_scene(rng)
        samples = crop_tower_samples(xyz, cls, radius=15, eps=3, min_points=50)
        assert len(samples) == 2
        for s in samples:
            assert s.shape[1] == 4
            assert (s[:, 3] == 15).sum() > 100  # contains its tower
            # radius crop really is a radius crop
            tower_pts = s[s[:, 3] == 15, :3]
            center = tower_pts.mean(0)
            d = np.linalg.norm(s[:, :2] - center[:2], axis=1)
            assert d.max() <= 15 + 1e-6

    def test_select_object(self):
        rng = np.random.default_rng(4)
        xyz, cls = _make_scene(rng, n_towers=1)
        sel, sel_cls = select_object(xyz, cls, [15])
        assert (sel_cls == 15).all()
        assert len(sel) == (cls == 15).sum()


class TestTransforms:
    def test_voxelization_transform(self, small_cloud):
        t = Voxelization([15], vxg_size=(16, 16, 16))
        hist, reg = t((small_cloud[:, :3], small_cloud[:, 3]))
        assert hist.shape == (1, 16, 16, 16) and reg.shape == (1, 16, 16, 16)
        assert hist.dtype == np.float32

    def test_full_dense(self, small_cloud):
        t = Compose([Voxelization([15], vxg_size=(16, 16, 16)), ToFullDense((True, True))])
        x, y = t((small_cloud[:, :3], small_cloud[:, 3]))
        assert set(np.unique(x)).issubset({0.0, 1.0})
        assert set(np.unique(y)).issubset({0.0, 1.0})

    def test_point_padding(self, small_cloud):
        t = PointPadding(max_points=4096, vxg_size=(16, 16, 16))
        pts, labels, mask, idx = t((small_cloud[:, :3], small_cloud[:, 3]))
        assert pts.shape == (4096, 3) and mask.sum() == min(len(small_cloud), 4096)
        assert idx.max() < 16**3

    def test_point_padding_subsamples(self):
        rng = np.random.default_rng(0)
        pts = rng.random((5000, 3)) * 10
        t = PointPadding(max_points=1024, vxg_size=(8, 8, 8))
        out_pts, _, mask, _ = t((pts, np.zeros(5000)))
        assert mask.sum() == 1024


class TestTS40KDataset:
    @pytest.fixture()
    def dataset_dir(self, tmp_path, small_cloud):
        fit = tmp_path / "fit"
        fit.mkdir()
        for i in range(6):
            np.save(fit / f"sample_{i}.npy", small_cloud)
        # one corrupted file
        (fit / "sample_bad.npy").write_bytes(b"not-a-npy")
        return str(tmp_path)

    def test_getitem_with_transform(self, dataset_dir):
        t = Compose([Voxelization([15], vxg_size=(8, 8, 8)), ToFullDense()])
        ds = TS40K(dataset_dir, split="fit", transform=t)
        assert len(ds) == 7
        x, y = ds[0]
        assert x.shape == (1, 8, 8, 8)

    def test_corrupted_fallback(self, dataset_dir):
        ds = TS40K(dataset_dir, split="fit",
                   transform=Voxelization([15], vxg_size=(8, 8, 8)))
        # the corrupted file is sorted last; loading it must still succeed
        bad_idx = list(ds.npy_files).index("sample_bad.npy")
        x, y = ds[bad_idx]
        assert x.shape == (1, 8, 8, 8)

    def test_loader_batches(self, dataset_dir):
        t = Compose([Voxelization([15], vxg_size=(8, 8, 8)), ToFullDense()])
        ds = TS40K(dataset_dir, split="fit", transform=t)
        loader = VoxelLoader(ds, batch_size=3, shuffle=True, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2
        x, y = batches[0]
        assert x.shape == (3, 1, 8, 8, 8)

    def test_random_split(self):
        train, val = random_split(100, 0.1, seed=0)
        assert len(train) == 90 and len(val) == 10
        assert not set(train) & set(val)


class TestAugmentation:
    def test_rotate_z_preserves_heights_and_distances(self, small_cloud):
        from scenenet_tpu.data import RandomRotateZ

        pts, labels = small_cloud[:, :3], small_cloud[:, 3]
        rot_pts, rot_labels = RandomRotateZ(seed=1)((pts, labels))
        np.testing.assert_allclose(rot_pts[:, 2], pts[:, 2], atol=1e-9)
        np.testing.assert_array_equal(rot_labels, labels)
        # pairwise xy distances preserved (rigid rotation)
        d0 = np.linalg.norm(pts[0, :2] - pts[100, :2])
        d1 = np.linalg.norm(rot_pts[0, :2] - rot_pts[100, :2])
        assert d0 == pytest.approx(d1, rel=1e-9)

    def test_flip_involution_of_extent(self, small_cloud):
        from scenenet_tpu.data import RandomFlip

        pts = small_cloud[:, :3]
        out, _ = RandomFlip(seed=0, p=1.0)((pts, small_cloud[:, 3]))
        # mirroring about the centroid preserves extent and pair distances
        np.testing.assert_allclose(out[:, 0].max() - out[:, 0].min(),
                                   pts[:, 0].max() - pts[:, 0].min(), atol=1e-9)
        d0 = np.linalg.norm(pts[0] - pts[50])
        d1 = np.linalg.norm(out[0] - out[50])
        assert d0 == pytest.approx(d1, rel=1e-9)

    def test_jitter_bounded(self, small_cloud):
        from scenenet_tpu.data import Jitter

        pts = small_cloud[:, :3]
        out, _ = Jitter(sigma=0.01, clip=0.03, seed=0)((pts, small_cloud[:, 3]))
        assert np.abs(out - pts).max() <= 0.03 + 1e-12


class TestCachedDataset:
    def test_cache_hit_matches_and_persists(self, tmp_path, small_cloud):
        from scenenet_tpu.data import CachedDataset, Compose, ToFullDense, Voxelization

        calls = {"n": 0}

        class DS:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                calls["n"] += 1
                t = Compose([Voxelization([15], vxg_size=(8, 8, 8)), ToFullDense()])
                return t((small_cloud[:, :3], small_cloud[:, 3]))

        ds = CachedDataset(DS(), str(tmp_path / "cache"))
        a = ds[0]
        b = ds[0]  # cache hit
        assert calls["n"] == 1
        np.testing.assert_array_equal(a[0], b[0])
        ds.warm()
        assert calls["n"] == 3
        assert len(os.listdir(tmp_path / "cache")) == 3


class TestLAS:
    def test_roundtrip(self, tmp_path, small_cloud):
        path = str(tmp_path / "test.las")
        write_las(path, small_cloud[:, :3], small_cloud[:, 3].astype(np.uint8))
        xyz, cls = read_las_xyz_class(path)
        np.testing.assert_allclose(xyz, small_cloud[:, :3], atol=1e-3)
        np.testing.assert_array_equal(cls, small_cloud[:, 3].astype(np.uint8))


class TestETL:
    def test_build_data_samples(self, tmp_path):
        rng = np.random.default_rng(5)
        xyz, cls = _make_scene(rng)
        las_dir = tmp_path / "las"
        las_dir.mkdir()
        write_las(str(las_dir / "scene.las"), xyz, cls.astype(np.uint8))
        save_dir = str(tmp_path / "out")
        # note: synthetic towers are small → lower DBSCAN threshold via crop
        import scenenet_tpu.data.ts40k as ts40k_mod
        import scenenet_tpu.data.pcd as eda

        orig = eda.extract_towers
        eda.extract_towers = lambda x, eps=10, min_points=300: orig(x, eps=3, min_points=50)
        try:
            n = build_data_samples([str(las_dir)], save_dir,
                                   data_split={"fit": 0.5, "test": 0.5})
        finally:
            eda.extract_towers = orig
        assert n == 2
        total = len(os.listdir(os.path.join(save_dir, "fit"))) + \
            len(os.listdir(os.path.join(save_dir, "test")))
        assert total == 2
        # resumability: second run reads the progress file, adds nothing
        n2 = build_data_samples([str(las_dir)], save_dir,
                                data_split={"fit": 0.5, "test": 0.5})
        assert n2 <= n


class TestDownsampling:
    """Per-voxel downsampling semantics (reference pcd_processing.py:375-421;
    VERDICT r1 'what's missing' #2)."""

    def test_output_grouped_by_voxel(self, small_cloud):
        from scenenet_tpu.data.pcd import downsampling
        from scenenet_tpu.ops.voxel_np import compute_grid_spec, voxel_indices_np

        xyz, classes = small_cloud[:, :3], small_cloud[:, 3]
        out_xyz, out_cls = downsampling(xyz, classes, samp_per=0.7, seed=1)
        assert 0 < len(out_xyz) < len(xyz)
        # reference ordering contract: each voxel's survivors are contiguous
        spec = compute_grid_spec(xyz, (64, 64, 64))
        idx = voxel_indices_np(out_xyz, spec)
        n_x, n_y, _ = spec.shape
        flat = (idx[:, 2] * n_x + idx[:, 0]) * n_y + idx[:, 1]
        changes = np.count_nonzero(np.diff(flat) != 0) + 1
        assert changes == len(np.unique(flat)), "voxel groups not contiguous"

    def test_classes_follow_points(self, small_cloud):
        from scenenet_tpu.data.pcd import downsampling

        xyz, classes = small_cloud[:, :3], small_cloud[:, 3]
        out_xyz, out_cls = downsampling(xyz, classes, samp_per=0.5, seed=2)
        # every output (point, class) pair exists in the input pairing
        lookup = {tuple(np.round(p, 9)): c for p, c in zip(xyz, classes)}
        for p, c in zip(out_xyz[:200], out_cls[:200]):
            assert lookup[tuple(np.round(p, 9))] == c

    def test_retention_rate_binomial(self, small_cloud):
        from scenenet_tpu.data.pcd import downsampling

        xyz, classes = small_cloud[:, :3], small_cloud[:, 3]
        n = len(xyz)
        for p in (0.25, 0.5, 0.8):
            kept = len(downsampling(xyz, classes, samp_per=p, seed=3)[0])
            # 5-sigma binomial bound — retention is i.i.d. per point,
            # exactly the reference's per-voxel rand() draws
            sigma = np.sqrt(n * p * (1 - p))
            assert abs(kept - n * p) < 5 * sigma


class TestXYZVoxelization:
    """Working twins of the reference's dead-code xyz_ transforms
    (torch_transforms.py:109-166 calls undefined centroid_* functions)."""

    def test_centroid_channels(self, small_cloud):
        from scenenet_tpu.data.transforms import XYZToFullDense, XYZVoxelization
        from scenenet_tpu.ops.voxel_np import (
            compute_grid_spec, hist_on_voxel_np, reg_on_voxel_np, voxel_indices_np,
        )

        xyz, labels = small_cloud[:, :3], small_cloud[:, 3]
        cent, dense, reg = XYZVoxelization((15,), vxg_size=(16, 16, 16))((xyz, labels))
        assert cent.shape == (1, 3, 16, 16, 16)
        assert dense.shape == reg.shape == (1, 16, 16, 16)
        # density channel equals hist_on_voxel; reg channel equals reg_on_voxel
        np.testing.assert_allclose(dense[0], hist_on_voxel_np(xyz, (16, 16, 16)),
                                   atol=1e-6)
        np.testing.assert_allclose(reg[0], reg_on_voxel_np(xyz, labels, 15, (16, 16, 16)),
                                   atol=1e-6)
        # centroid of an occupied voxel is the mean of its points
        spec = compute_grid_spec(xyz, (16, 16, 16))
        idx = voxel_indices_np(xyz, spec)
        xi, yi, zi = idx[0]
        in_vox = np.all(idx == idx[0], axis=1)
        np.testing.assert_allclose(cent[0, :, zi, xi, yi], xyz[in_vox].mean(0),
                                   rtol=1e-6)
        # empty voxels carry zero centroid
        empty = dense[0] == 0
        assert np.all(cent[0][:, empty] == 0)
        # FullDense binarizes dense + labels, keeps centroid untouched
        c2, d2, r2 = XYZToFullDense()((cent, dense, reg))
        assert set(np.unique(d2)) <= {0.0, 1.0}
        np.testing.assert_array_equal(c2, cent)


class TestDevicePointCache:
    def test_serves_dataset_batches_on_device(self, small_cloud, tmp_path):
        import jax
        import jax.numpy as jnp

        from scenenet_tpu.data.device_cache import DevicePointCache, rotate_z_batch
        from scenenet_tpu.data.transforms import PointPadding
        from scenenet_tpu.data.ts40k import TS40K

        root = tmp_path / "ds" / "fit"
        root.mkdir(parents=True)
        for i in range(6):
            np.save(root / f"s{i}.npy", small_cloud)
        ds = TS40K(str(tmp_path / "ds"), split="fit",
                   transform=PointPadding(max_points=4096, compute_indices=False))
        cache = DevicePointCache(ds, load_batch=4)
        assert len(cache) == 6
        # unshuffled epoch reproduces the dataset exactly
        batches = list(cache.epoch(2, shuffle=False, augment=False))
        assert len(batches) == 3
        p0, l0, m0 = ds[0][:3]
        np.testing.assert_allclose(np.asarray(batches[0][0][0]), p0, atol=0)
        np.testing.assert_array_equal(np.asarray(batches[0][1][0]), l0)
        # shuffled + augmented epoch: same multiset of labels, z preserved
        key = jax.random.PRNGKey(0)
        aug = list(cache.epoch(2, key=key, shuffle=True, augment=True))
        assert len(aug) == 3
        z_orig = np.sort(np.asarray(cache.points[..., 2]).ravel())
        z_aug = np.sort(np.concatenate([np.asarray(b[0][..., 2]).ravel() for b in aug]))
        np.testing.assert_allclose(z_aug, z_orig, atol=1e-5)

    def test_rotate_z_preserves_pairwise_distances(self):
        import jax.numpy as jnp

        from scenenet_tpu.data.device_cache import rotate_z_batch

        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(0, 10, (2, 50, 3)).astype(np.float32))
        out = rotate_z_batch(pts, jnp.asarray([0.7, -1.2]))
        d_in = np.linalg.norm(np.asarray(pts)[:, :, None] - np.asarray(pts)[:, None], axis=-1)
        d_out = np.linalg.norm(np.asarray(out)[:, :, None] - np.asarray(out)[:, None], axis=-1)
        np.testing.assert_allclose(d_out, d_in, atol=1e-3)


class TestRound3ReviewFixes:
    def test_point_cache_tail_batch_is_augmented(self, small_cloud, tmp_path):
        """drop_last=False: the ragged tail batch must go through the same
        augmentation as full batches (it used to be a plain slice)."""
        import jax
        from scenenet_tpu.data.device_cache import DevicePointCache
        from scenenet_tpu.data.transforms import PointPadding
        from scenenet_tpu.data.ts40k import TS40K

        root = tmp_path / "ds" / "fit"
        root.mkdir(parents=True)
        for i in range(5):
            np.save(root / f"s{i}.npy", small_cloud)
        ds = TS40K(str(tmp_path / "ds"), split="fit",
                   transform=PointPadding(max_points=2048, compute_indices=False))
        cache = DevicePointCache(ds, load_batch=4)
        key = jax.random.PRNGKey(3)
        batches = list(cache.epoch(2, key=key, shuffle=False, augment=True,
                                   drop_last=False))
        assert [int(b[0].shape[0]) for b in batches] == [2, 2, 1]
        tail = np.asarray(batches[-1][0][0])
        plain = np.asarray(cache.points[4])
        live = np.asarray(cache.mask[4])
        # z preserved, xy rotated: the tail is NOT the raw slice
        np.testing.assert_allclose(tail[live, 2], plain[live, 2], atol=1e-6)
        assert np.abs(tail[live, :2] - plain[live, :2]).max() > 1e-3

    def test_ground_strips_tile_the_extent(self):
        """crop_ground_samples strips partition [x_min, x_max] — no gaps
        (the reference's count-as-width quirk is documented + fixed)."""
        from scenenet_tpu.data.pcd import crop_ground_samples

        rng = np.random.default_rng(0)
        n = 20000
        xyz = np.stack([rng.uniform(0, 450, n), rng.uniform(0, 30, n),
                        rng.uniform(0, 5, n)], axis=1)
        classes = rng.choice([1, 2], n)  # two classes, no towers
        samples = crop_ground_samples(xyz, classes, min_points=10)
        got = np.concatenate([s for s in samples])
        # every point appears in exactly one strip (edges may duplicate)
        assert len(got) >= n  # full coverage
        assert len(got) <= n + 200  # only edge duplicates beyond n

    def test_build_data_samples_resume_does_not_overwrite(self, tmp_path,
                                                          small_cloud):
        """After a split leaves sparse names in fit/, a resumed ETL must
        continue from max-index+1, not len(listdir) (which would silently
        overwrite surviving samples)."""
        from scenenet_tpu.data.ts40k import build_data_samples

        save_dir = str(tmp_path / "out")
        fit = os.path.join(save_dir, "fit")
        test = os.path.join(save_dir, "test")
        os.makedirs(fit)
        os.makedirs(test)
        # simulate run 1 + split: sparse survivors in fit/, others in test/
        np.save(os.path.join(fit, "sample_7.npy"), small_cloud)
        np.save(os.path.join(test, "sample_9.npy"), small_cloud)
        sentinel = small_cloud.copy()
        sentinel[0, 0] += 123.0
        np.save(os.path.join(fit, "sample_3.npy"), sentinel)

        # run 2 over an empty LAS dir list: nothing written, nothing clobbered
        n = build_data_samples([], save_dir, data_split=0)
        assert n >= 10  # next-free-index accounting spans ALL split dirs
        back = np.load(os.path.join(fit, "sample_3.npy"))
        np.testing.assert_array_equal(back, sentinel)


class TestPallasHistFloatWeights:
    def test_int8_false_weighted_sums(self):
        """pallas_bin_counts(int8=False) must produce true weighted sums
        for arbitrary float weights (it used to booleanize them)."""
        import jax.numpy as jnp
        from scenenet_tpu.ops.pallas_hist import pallas_bin_counts

        rng = np.random.default_rng(5)
        B, N, size = 2, 2048, 4096
        flat = rng.integers(0, size, (B, N)).astype(np.int32)
        mask = rng.random((B, N)) > 0.1
        w = rng.choice([0.5, 1.25, 2.0], (B, N)).astype(np.float32)
        counts, wsum = pallas_bin_counts(
            jnp.asarray(flat), jnp.asarray(mask), size,
            weights=jnp.asarray(w), int8=False, interpret=True)
        ref_c = np.zeros((B, size))
        ref_w = np.zeros((B, size))
        for b in range(B):
            np.add.at(ref_c[b], flat[b][mask[b]], 1)
            np.add.at(ref_w[b], flat[b][mask[b]], w[b][mask[b]])
        np.testing.assert_array_equal(np.asarray(counts), ref_c)
        # bf16 lhs precision: weights round to bf16 before accumulation
        np.testing.assert_allclose(np.asarray(wsum), ref_w, rtol=1e-2)


class TestBuildSamplesCLI:
    """The reference's ETL entry (`core/datasets/ts40k.py:229` main) as a
    CLI, wiring the config's test_split fraction into the folder split."""

    def test_ts40k_subcommand(self, tmp_path):
        rng = np.random.default_rng(5)
        xyz, cls = _make_scene(rng)
        las_dir = tmp_path / "las"
        las_dir.mkdir()
        write_las(str(las_dir / "scene.las"), xyz, cls.astype(np.uint8))
        out = str(tmp_path / "out")
        import scenenet_tpu.data.pcd as eda
        from scenenet_tpu.cli.build_samples import main

        orig = eda.extract_towers
        eda.extract_towers = lambda x, eps=10, min_points=300: orig(x, eps=3, min_points=50)
        try:
            n = main(["ts40k", "--las-dir", str(las_dir), "--out", out,
                      "--test-split", "0.5"])
        finally:
            eda.extract_towers = orig
        assert n == 2
        assert len(os.listdir(os.path.join(out, "fit"))) + \
            len(os.listdir(os.path.join(out, "test"))) == 2

    def test_bad_split_rejected(self, tmp_path):
        import pytest as _pytest

        from scenenet_tpu.cli.build_samples import main

        with _pytest.raises(SystemExit):
            main(["ts40k", "--las-dir", "x", "--out", str(tmp_path),
                  "--test-split", "1.5"])
