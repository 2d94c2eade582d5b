"""Pallas MXU histogram kernel (interpret mode): exact counts vs numpy."""

import numpy as np
import pytest

import jax

import jax.numpy as jnp

from scenenet_tpu.ops.pallas_hist import pallas_bin_counts


class TestPallasHist:
    def test_counts_and_weighted(self):
        rng = np.random.default_rng(0)
        b, n, v = 2, 5000, 16**3
        flat = rng.integers(0, v, (b, n)).astype(np.int32)
        mask = np.ones((b, n), bool)
        mask[1, 4500:] = False
        w = rng.integers(0, 2, (b, n)).astype(np.float32)

        counts, wsum = pallas_bin_counts(jnp.asarray(flat), jnp.asarray(mask),
                                         v, jnp.asarray(w), interpret=True)
        ref = np.zeros((b, v))
        refw = np.zeros((b, v))
        for i in range(b):
            np.add.at(ref[i], flat[i][mask[i]], 1.0)
            np.add.at(refw[i], flat[i][mask[i]], w[i][mask[i]])
        np.testing.assert_allclose(np.asarray(counts), ref)
        np.testing.assert_allclose(np.asarray(wsum), refw)

    def test_single_channel_and_ragged_bins(self):
        rng = np.random.default_rng(1)
        b, n, v = 1, 3000, 10 * 10 * 10  # not a multiple of 512
        flat = rng.integers(0, v, (b, n)).astype(np.int32)
        mask = np.ones((b, n), bool)
        counts, none = pallas_bin_counts(jnp.asarray(flat), jnp.asarray(mask),
                                         v, None, interpret=True)
        assert none is None
        ref = np.zeros((b, v))
        np.add.at(ref[0], flat[0], 1.0)
        np.testing.assert_allclose(np.asarray(counts), ref)


class TestFusedPointsHist:
    """Fused raw-points → histogram kernel (bounds+binning in VMEM)."""

    def test_matches_index_path(self):
        import jax

        from scenenet_tpu.ops.pallas_hist import pallas_points_bin_counts
        from scenenet_tpu.ops.voxelize import (
            _flat_zxy_idx, _mxu_bin_counts2, grid_bounds, voxel_indices,
        )

        rng = np.random.default_rng(3)
        B, N, grid = 2, 5000, (16, 16, 16)
        pts = jnp.asarray(rng.uniform(0, 30, (B, N, 3)).astype(np.float32))
        mask = jnp.asarray(rng.random((B, N)) > 0.1)
        tower = jnp.asarray(rng.random((B, N)) > 0.7)
        tower_w = jnp.logical_and(tower, mask)

        def per_sample_flat(p, m):
            lo, hi = grid_bounds(p, m)
            return _flat_zxy_idx(voxel_indices(p, lo, hi, grid), grid)

        flat = jax.vmap(per_sample_flat)(pts, mask)
        c_ref, t_ref = _mxu_bin_counts2(flat, mask, tower_w, 16**3)
        c, t = pallas_points_bin_counts(pts, mask, tower_w, grid, interpret=True)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
        np.testing.assert_array_equal(np.asarray(t), np.asarray(t_ref))

    def test_voxelize_batch_binary_matches_composition(self):
        from scenenet_tpu.ops.voxelize import (
            normalize_per_column, voxelize_batch, voxelize_batch_binary,
        )

        rng = np.random.default_rng(5)
        B, N, grid = 2, 4000, (16, 16, 16)
        pts = jnp.asarray(rng.uniform(0, 20, (B, N, 3)).astype(np.float32))
        labels = jnp.asarray(rng.choice([1, 2, 15], (B, N)).astype(np.int32))
        mask = jnp.asarray(rng.random((B, N)) > 0.05)
        hist, reg = voxelize_batch(pts, labels, mask, (15,), grid)
        x, y = voxelize_batch_binary(pts, labels, mask, (15,), grid)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(hist > 0))
        np.testing.assert_array_equal(np.asarray(y), np.asarray(reg > 0))

    def test_points_hist_single_channel(self):
        import jax

        from scenenet_tpu.ops.pallas_hist import pallas_points_bin_counts
        from scenenet_tpu.ops.voxelize import (
            _flat_zxy_idx, _mxu_bin_counts, grid_bounds, voxel_indices,
        )

        rng = np.random.default_rng(9)
        B, N, grid = 2, 3000, (16, 16, 16)
        pts = jnp.asarray(rng.uniform(0, 25, (B, N, 3)).astype(np.float32))
        mask = jnp.asarray(rng.random((B, N)) > 0.2)

        def per_sample_flat(p, m):
            lo, hi = grid_bounds(p, m)
            return _flat_zxy_idx(voxel_indices(p, lo, hi, grid), grid)

        flat = jax.vmap(per_sample_flat)(pts, mask)
        c_ref = _mxu_bin_counts(flat, mask, 16**3)
        c, none = pallas_points_bin_counts(pts, mask, None, grid,
                                           interpret=True, channels=1)
        assert none is None
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))

    def test_trailing_padding_chunks_skipped_exactly(self):
        """Heavy trailing padding (several all-invalid chunks) plus one
        all-invalid interior chunk: the dynamic live-chunk loop bound must
        leave counts exact (trailing chunks skipped, interior ones kept)."""
        import jax

        from scenenet_tpu.ops.pallas_hist import pallas_points_bin_counts
        from scenenet_tpu.ops.voxelize import (
            _flat_zxy_idx, _mxu_bin_counts2, grid_bounds, voxel_indices,
        )

        rng = np.random.default_rng(11)
        B, N, grid, chunk = 2, 8192, (16, 16, 16), 1024
        pts = jnp.asarray(rng.uniform(0, 30, (B, N, 3)).astype(np.float32))
        mask_np = np.zeros((B, N), bool)
        mask_np[0, :2500] = True          # 3 live chunks of 8
        mask_np[0, 1024:2048] = False     # all-invalid interior chunk
        mask_np[1, :5000] = True          # 5 live chunks of 8
        mask = jnp.asarray(mask_np)
        tower = jnp.asarray(np.logical_and(rng.random((B, N)) > 0.6, mask_np))

        def per_sample_flat(p, m):
            lo, hi = grid_bounds(p, m)
            return _flat_zxy_idx(voxel_indices(p, lo, hi, grid), grid)

        flat = jax.vmap(per_sample_flat)(pts, mask)
        c_ref, t_ref = _mxu_bin_counts2(flat, mask, tower, 16**3)
        c, t = pallas_points_bin_counts(pts, mask, tower, grid,
                                        interpret=True, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
        np.testing.assert_array_equal(np.asarray(t), np.asarray(t_ref))

    def test_flat_ids_trailing_padding_skipped(self):
        from scenenet_tpu.ops.pallas_hist import pallas_bin_counts

        rng = np.random.default_rng(12)
        b, n, v = 2, 8192, 16**3
        flat = rng.integers(0, v, (b, n)).astype(np.int32)
        mask_np = np.zeros((b, n), bool)
        mask_np[0, :1500] = True
        mask_np[1, :6000] = True
        counts, none = pallas_bin_counts(jnp.asarray(flat),
                                         jnp.asarray(mask_np), v, None,
                                         interpret=True, chunk=1024)
        ref = np.zeros((b, v))
        for i in range(b):
            np.add.at(ref[i], flat[i][mask_np[i]], 1.0)
        np.testing.assert_array_equal(np.asarray(counts), ref)


class TestSortedHierarchical:
    """VERDICT r2 #4: the hierarchical sorted two-level kernel (128³-class
    grids) — exact in interpret mode vs brute force."""

    @pytest.mark.parametrize("n_slabs", [4, 16])
    def test_exact_vs_numpy(self, n_slabs):
        from scenenet_tpu.ops.pallas_hist import pallas_sorted_bin_counts

        rng = np.random.default_rng(1)
        B, N, size = 2, 3000, 128 * 128 * 16
        # heavy duplication (realistic: many points per occupied voxel)
        flat = rng.integers(0, size // 50, (B, N)).astype(np.int32) * 37
        mask = rng.random((B, N)) > 0.15
        w = (rng.random((B, N)) > 0.6).astype(np.int32)
        counts, wsum = pallas_sorted_bin_counts(
            jnp.asarray(flat), jnp.asarray(mask), jnp.asarray(w), size,
            n_slabs=n_slabs, chunk=512, interpret=True)
        ref_c = np.zeros((B, size))
        ref_w = np.zeros((B, size))
        for b in range(B):
            np.add.at(ref_c[b], flat[b][mask[b]], 1)
            np.add.at(ref_w[b], flat[b][mask[b]], w[b][mask[b]])
        np.testing.assert_array_equal(np.asarray(counts), ref_c)
        np.testing.assert_array_equal(np.asarray(wsum), ref_w)

    def test_matches_flat_mxu_path(self):
        """Same result as the einsum-based _mxu_bin_counts2 (the CPU/oracle
        route) on identical inputs."""
        from scenenet_tpu.ops.pallas_hist import pallas_sorted_bin_counts
        from scenenet_tpu.ops.voxelize import _mxu_bin_counts2

        rng = np.random.default_rng(2)
        B, N, size = 2, 4096, 64 * 64 * 64
        flat = rng.integers(0, size, (B, N)).astype(np.int32)
        mask = rng.random((B, N)) > 0.1
        w = (rng.random((B, N)) > 0.8)
        a_c, a_w = pallas_sorted_bin_counts(
            jnp.asarray(flat), jnp.asarray(mask), jnp.asarray(w.astype(np.int32)),
            size, n_slabs=8, chunk=1024, interpret=True)
        b_c, b_w = _mxu_bin_counts2(jnp.asarray(flat), jnp.asarray(mask),
                                    jnp.asarray(w), size)
        np.testing.assert_array_equal(np.asarray(a_c), np.asarray(b_c))
        np.testing.assert_array_equal(np.asarray(a_w), np.asarray(b_w))

    def test_all_masked_and_single_slab_pile(self):
        from scenenet_tpu.ops.pallas_hist import pallas_sorted_bin_counts

        size = 128 * 128 * 16
        flat = np.full((1, 600), 7, np.int32)  # all points in one voxel
        counts, wsum = pallas_sorted_bin_counts(
            jnp.asarray(flat), jnp.ones((1, 600), bool),
            jnp.ones((1, 600), jnp.int32), size, n_slabs=16, chunk=256,
            interpret=True)
        assert float(counts[0, 7]) == 600 and float(counts.sum()) == 600
        assert float(wsum[0, 7]) == 600
        counts, _ = pallas_sorted_bin_counts(
            jnp.asarray(flat), jnp.zeros((1, 600), bool), None, size,
            n_slabs=16, chunk=256, interpret=True)
        assert float(counts.sum()) == 0

    def test_auto_slabs_single_channel(self):
        """n_slabs=None auto-picks ~256 hi-rows per slab; channels=1 is the
        large-grid occupancy route (`voxelize._tpu_occupancy_counts`)."""
        from scenenet_tpu.ops.pallas_hist import pallas_sorted_bin_counts

        rng = np.random.default_rng(3)
        B, N, size = 2, 2500, 64 * 64 * 40  # n_hi = 320 → auto 16 slabs
        flat = rng.integers(0, size, (B, N)).astype(np.int32)
        mask = rng.random((B, N)) > 0.2
        counts, none = pallas_sorted_bin_counts(
            jnp.asarray(flat), jnp.asarray(mask), None, size,
            chunk=512, interpret=True, channels=1)
        assert none is None
        ref = np.zeros((B, size))
        for b in range(B):
            np.add.at(ref[b], flat[b][mask[b]], 1)
        np.testing.assert_array_equal(np.asarray(counts), ref)


class TestPallasFlatIds:
    def test_matches_xla_ids(self):
        from scenenet_tpu.ops.pallas_hist import pallas_flat_ids
        from scenenet_tpu.ops.voxelize import (
            _flat_zxy_idx, grid_bounds, voxel_indices,
        )

        rng = np.random.default_rng(5)
        pts = rng.uniform(0, 30, (3, 4000, 3)).astype(np.float32)
        mask = rng.random((3, 4000)) > 0.1
        for gs in [(64, 64, 64), (64, 64, 256), (128, 128, 128)]:
            ours = np.asarray(pallas_flat_ids(
                jnp.asarray(pts), jnp.asarray(mask), gs, interpret=True,
                chunk=512))
            def per(p, m):
                lo, hi = grid_bounds(p, m)
                return _flat_zxy_idx(voxel_indices(p, lo, hi, gs), gs)
            ref = np.asarray(jax.vmap(per)(jnp.asarray(pts), jnp.asarray(mask)))
            np.testing.assert_array_equal(ours[mask], ref[mask])
            assert np.all(ours[~mask] >= gs[0] * gs[1] * gs[2])


class TestSortedPackedEdgeCases:
    """Round-3 packing (indicator in the key's low bit): seeded fuzz over
    the edge geometry — ids exactly on slab boundaries, all-masked samples,
    every point in one bin, weights all-set/all-zero, ragged N vs chunk."""

    def test_fuzz_vs_numpy(self):
        from scenenet_tpu.ops.pallas_hist import pallas_sorted_bin_counts

        rng = np.random.default_rng(7)
        size = 96 * 64 * 16  # n_hi = 192
        for trial in range(6):
            B = int(rng.integers(1, 3))
            N = int(rng.choice([500, 1000, 1537]))  # ragged vs chunk=512
            style = trial % 3
            if style == 0:  # slab-boundary ids (n_slabs=6 → slab = 16·512)
                flat = (rng.integers(0, 13, (B, N)) * 16 * 512
                        - rng.integers(0, 2, (B, N))).clip(0, size - 1)
            elif style == 1:  # single hot bin
                flat = np.full((B, N), int(rng.integers(0, size)))
            else:
                flat = rng.integers(0, size, (B, N))
            flat = flat.astype(np.int32)
            mask = rng.random((B, N)) > 0.2
            if trial == 4:
                mask[0] = False  # an entirely-masked sample
            w = rng.choice([0, 1], (B, N), p=[0.3, 0.7]).astype(np.int32)
            if trial == 5:
                w[:] = trial % 2
            counts, wsum = pallas_sorted_bin_counts(
                jnp.asarray(flat), jnp.asarray(mask), jnp.asarray(w), size,
                n_slabs=6, chunk=512, interpret=True)
            occ, _ = pallas_sorted_bin_counts(
                jnp.asarray(flat), jnp.asarray(mask), None, size,
                n_slabs=6, chunk=512, channels=1, interpret=True)
            ref_c = np.zeros((B, size))
            ref_w = np.zeros((B, size))
            for b in range(B):
                np.add.at(ref_c[b], flat[b][mask[b]], 1)
                np.add.at(ref_w[b], flat[b][mask[b]], w[b][mask[b]])
            np.testing.assert_array_equal(np.asarray(counts), ref_c,
                                          err_msg=f"trial {trial}")
            np.testing.assert_array_equal(np.asarray(wsum), ref_w,
                                          err_msg=f"trial {trial}")
            np.testing.assert_array_equal(np.asarray(occ), ref_c,
                                          err_msg=f"trial {trial} occ")


class TestFusedOccupancy:
    """r5: the binarization (counts > per-y-column min, the minmax parity
    rule) fused into the histogram kernel epilogue — the headline's vox
    stage went 75.2 → 67.8 ms at batch 512 (benchmarks/r5_probe3,
    on-chip exactness check included there)."""

    def test_matches_counts_then_binarize(self):
        from scenenet_tpu.ops.pallas_hist import (
            pallas_points_bin_counts, pallas_points_occupancy,
        )

        rng = np.random.default_rng(0)
        B, N, G = 3, 9000, (64, 64, 64)
        pts = rng.uniform(0, 30, (B, N, 3)).astype(np.float32)
        mask = np.arange(N)[None, :] < np.array([9000, 7000, 4500])[:, None]
        counts, _ = pallas_points_bin_counts(
            jnp.asarray(pts), jnp.asarray(mask), None, G, interpret=True,
            channels=1)
        counts = np.asarray(counts).reshape(B, 64, 64, 64)
        colmin = counts.reshape(B, -1, 64).min(1)[:, None, None, :]
        want = (counts > colmin).astype(np.float32)
        occ = np.asarray(pallas_points_occupancy(
            jnp.asarray(pts), jnp.asarray(mask), G, interpret=True))
        np.testing.assert_array_equal(occ.reshape(B, 64, 64, 64), want)

    def test_nonzero_colmin_column(self):
        """The column-min rule differs from (counts > 0) exactly when a
        whole y-column is occupied — pin that the fused epilogue keeps
        the minmax-parity semantics, not the shortcut."""
        from scenenet_tpu.ops.pallas_hist import pallas_points_occupancy

        G = (8, 8, 8)
        # every voxel of column y=0 gets ≥2 points; one voxel gets 3
        pts = []
        for iz in range(8):
            for ix in range(8):
                for _ in range(2):
                    pts.append([ix + 0.5, 0.5, iz + 0.5])
        pts.append([0.5, 0.5, 0.5])   # the 3-count voxel
        # and a far corner point to pin the bounds to [0,8)³
        pts.append([7.9, 7.9, 7.9])
        pts = np.asarray(pts, np.float32)[None]
        mask = np.ones(pts.shape[:2], bool)
        occ = np.asarray(pallas_points_occupancy(
            jnp.asarray(pts), jnp.asarray(mask), G,
            interpret=True)).reshape(8, 8, 8)
        # y=0 column: min is 2 (the corner voxel shares (z,x)=(7,7)?? no —
        # (7.9,…) is y=7). Column y=0 has counts 2 everywhere except
        # (z,x)=(0,0) with 3 → only that voxel exceeds the column min
        col0 = occ[:, :, 0]
        assert col0.sum() == 1 and col0[0, 0] == 1
        # y=7 column: single occupied voxel, min 0 → stays occupied
        assert occ[7, 7, 7] == 1

    def test_two_channel_binary_matches(self):
        """r5 train-prep twin: both channels binarized in-kernel equals
        the counts-then-binarize composition (x: counts > column min,
        y: tower counts > 0)."""
        from scenenet_tpu.ops.pallas_hist import (
            pallas_points_bin_counts, pallas_points_binary,
        )

        rng = np.random.default_rng(1)
        B, N, G = 3, 9000, (64, 64, 64)
        pts = rng.uniform(0, 30, (B, N, 3)).astype(np.float32)
        mask = np.arange(N)[None, :] < np.array([9000, 7000, 4500])[:, None]
        tower = (rng.random((B, N)) < 0.03) & mask
        counts, tw = pallas_points_bin_counts(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(tower), G,
            interpret=True, channels=2)
        counts = np.asarray(counts).reshape(B, 64, 64, 64)
        tw = np.asarray(tw).reshape(B, 64, 64, 64)
        colmin = counts.reshape(B, -1, 64).min(1)[:, None, None, :]
        x, y = pallas_points_binary(jnp.asarray(pts), jnp.asarray(mask),
                                    jnp.asarray(tower), G, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(x).reshape(B, 64, 64, 64),
            (counts > colmin).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(y).reshape(B, 64, 64, 64),
            (tw > 0).astype(np.float32))
