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
