"""Native C++ kernels: bit-exact parity with the numpy oracle + LAS
roundtrip + DBSCAN contract. Skipped when the toolchain can't build."""

import numpy as np
import pytest

from scenenet_tpu import native
from scenenet_tpu.ops import voxel_np as vnp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


class TestNativeVoxelize:
    def test_bit_exact_vs_oracle(self, sample_clouds):
        for cloud in sample_clouds[:3]:
            xyz, labels = cloud[:, :3], cloud[:, 3]
            counts, reg, spec, idx = native.voxelize_native(
                xyz, labels, (15,), (64, 64, 64), want_indices=True)
            oracle = vnp.compute_grid_spec(xyz, (64, 64, 64))
            hist_np = vnp.hist_on_voxel_np(xyz, spec=oracle)
            reg_np = vnp.reg_on_voxel_np(xyz, labels, 15, spec=oracle)
            np.testing.assert_allclose(vnp.normalize_per_column_np(counts),
                                       hist_np, atol=1e-12)
            np.testing.assert_allclose(reg, reg_np, atol=1e-12)
            idx_np = vnp.voxel_indices_np(xyz, oracle)
            flat_np = (idx_np[:, 2] * 64 + idx_np[:, 0]) * 64 + idx_np[:, 1]
            np.testing.assert_array_equal(idx, flat_np)

    def test_vox_size_mode(self, small_cloud):
        xyz = small_cloud[:, :3]
        counts, reg, spec = native.voxelize_native(
            xyz, small_cloud[:, 3], (15,), None, vox_size=(0.5, 0.5, 0.2))
        oracle = vnp.compute_grid_spec(xyz, None, (0.5, 0.5, 0.2))
        assert tuple(spec["shape"]) == oracle.shape
        hist_np = vnp.hist_on_voxel_np(xyz, spec=oracle)
        np.testing.assert_allclose(vnp.normalize_per_column_np(counts),
                                   hist_np, atol=1e-12)

    def test_multi_keep_labels(self, small_cloud):
        xyz, labels = small_cloud[:, :3], small_cloud[:, 3]
        _, reg, _ = native.voxelize_native(xyz, labels, (2, 15), (16, 16, 16))
        reg_np = vnp.reg_on_voxel_np(xyz, labels, [2, 15], (16, 16, 16))
        np.testing.assert_allclose(reg, reg_np, atol=1e-12)


class TestNativeDBSCAN:
    def test_matches_python(self):
        from scenenet_tpu.ops.dbscan import dbscan as py_dbscan

        rng = np.random.default_rng(0)
        pts = np.concatenate([
            rng.normal(0, 0.4, (300, 3)),
            rng.normal(6, 0.4, (200, 3)),
            rng.uniform(-30, 30, (40, 3)),
        ])
        ours = native.dbscan_native(pts, eps=1.0, min_points=8)
        ref = py_dbscan(pts, eps=1.0, min_points=8)
        np.testing.assert_array_equal(ours == -1, ref == -1)
        # identical partitioning up to label permutation
        for c in set(ref) - {-1}:
            assert len(set(ours[ref == c]) - {-1}) == 1


class TestNativeLAS:
    def test_roundtrip(self, tmp_path, small_cloud):
        from scenenet_tpu.data.las import write_las

        path = str(tmp_path / "native.las")
        write_las(path, small_cloud[:, :3], small_cloud[:, 3].astype(np.uint8))
        xyz, cls = native.read_las_native(path)
        np.testing.assert_allclose(xyz, small_cloud[:, :3], atol=1e-3)
        np.testing.assert_array_equal(cls, small_cloud[:, 3].astype(np.uint8))


class TestTransformsUseNative:
    def test_voxelization_transform_native_matches_numpy(self, small_cloud):
        from scenenet_tpu.data.transforms import Voxelization

        t_nat = Voxelization([15], vxg_size=(16, 16, 16), use_native=True)
        t_np = Voxelization([15], vxg_size=(16, 16, 16), use_native=False)
        sample = (small_cloud[:, :3], small_cloud[:, 3])
        h1, r1 = t_nat(sample)
        h2, r2 = t_np(sample)
        np.testing.assert_allclose(h1, h2, atol=1e-6)
        np.testing.assert_allclose(r1, r2, atol=1e-6)

    def test_point_padding_native_matches_numpy(self, small_cloud):
        from scenenet_tpu.data.transforms import PointPadding

        sample = (small_cloud[:, :3], small_cloud[:, 3])
        a = PointPadding(max_points=4096, vxg_size=(16, 16, 16), use_native=True)(sample)
        b = PointPadding(max_points=4096, vxg_size=(16, 16, 16), use_native=False)(sample)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
class TestNativeBatchLoader:
    def _crops(self, tmp_path, n=5, sizes=(3000, 4000, 5000, 70000, 2000)):
        rng = np.random.default_rng(0)
        root = tmp_path / "fit"
        root.mkdir(parents=True, exist_ok=True)
        paths = []
        for i, m in enumerate(sizes[:n]):
            xyz = rng.uniform([5e5, 4.6e6, 100], [5e5 + 30, 4.6e6 + 30, 160], (m, 3))
            lab = rng.choice([1, 2, 15], m)
            crop = np.concatenate([xyz, lab[:, None]], 1)
            # mix dtypes: f64 (reference fixtures) and f32 (rehearsal crops)
            crop = crop.astype(np.float64 if i % 2 == 0 else np.float32)
            p = root / f"sample_{i}.npy"
            np.save(p, crop)
            paths.append(str(p))
        return paths

    def test_matches_point_padding(self, tmp_path):
        from scenenet_tpu.data.transforms import PointPadding
        from scenenet_tpu.native import load_batch_native

        paths = self._crops(tmp_path, n=3, sizes=(3000, 4000, 5000))
        pts, labels, mask = load_batch_native(paths, 8192)
        pp = PointPadding(max_points=8192, compute_indices=False)
        for i, p in enumerate(paths):
            c = np.load(p)
            p0, l0, m0, _ = pp((c[:, :3], c[:, 3]))
            np.testing.assert_allclose(pts[i], p0, atol=1e-5)
            np.testing.assert_array_equal(labels[i], l0)
            np.testing.assert_array_equal(mask[i], m0)

    def test_subsample_contract(self, tmp_path):
        from scenenet_tpu.native import load_batch_native

        paths = self._crops(tmp_path, n=4)
        pts, labels, mask = load_batch_native(paths, 8192)
        big = 3  # 70k points > 8192
        assert mask[big].all()
        # centered: per-axis minimum ~0 (subsample keeps near-min points whp)
        assert pts[big].min() >= 0
        # labels still from the source label set
        assert set(np.unique(labels[big])) <= {1, 2, 15}

    def test_loader_epoch(self, tmp_path):
        from scenenet_tpu.data.loader import NativePointCloudLoader, Subset
        from scenenet_tpu.data.ts40k import TS40K

        self._crops(tmp_path, n=5)
        ds = TS40K(str(tmp_path), split="fit")
        loader = NativePointCloudLoader(Subset(ds, [0, 1, 2, 3]),
                                        batch_size=2, max_points=8192,
                                        shuffle=True, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2
        for pts, labels, mask, flat in batches:
            assert pts.shape == (2, 8192, 3) and mask.dtype == bool
            assert flat.shape == (2, 8192)

    def test_failure_raises(self, tmp_path):
        from scenenet_tpu.native import load_batch_native

        with pytest.raises(ValueError):
            load_batch_native([str(tmp_path / "missing.npy")], 64)
