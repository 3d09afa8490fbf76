"""Voxel-hash grid NN vs brute force / cKDTree (radius-limited semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

import mola_fe_lidar_tpu.ops.grid_nn as grid_nn
import mola_fe_lidar_tpu.ops.matching as matching

scipy_spatial = pytest.importorskip("scipy.spatial")


def clouds(rng, n=400, m=800, scale=15.0):
    src = (rng.standard_normal((n, 3)) * scale).astype(np.float32)
    tgt = (rng.standard_normal((m, 3)) * scale).astype(np.float32)
    return src, tgt


class TestGridNN:
    def test_matches_kdtree_within_cell(self, rng):
        src, tgt = clouds(rng)
        cell = 2.0
        res = grid_nn.grid_nn(jnp.asarray(src), jnp.ones(len(src)),
                              jnp.asarray(tgt), jnp.ones(len(tgt)), cell=cell)
        tree = scipy_spatial.cKDTree(tgt)
        ref_d, ref_i = tree.query(src)
        d = np.asarray(res.dist)
        i = np.asarray(res.idx)
        within = ref_d < cell  # guaranteed-coverage zone
        # distances must match exactly where the true NN is within one cell
        np.testing.assert_allclose(d[within], ref_d[within], rtol=1e-4, atol=1e-4)
        assert (i[within] == ref_i[within]).mean() > 0.999

    def test_dense_cloud_bucket_overflow_tolerated(self, rng):
        # ~31 points per cell: an undersized bucket degrades gracefully
        # (never better than optimal, never corrupt); a density-sized bucket
        # recovers near-exact results
        src = (rng.random((200, 3)) * 4).astype(np.float32)
        tgt = (rng.random((2000, 3)) * 4).astype(np.float32)
        tree = scipy_spatial.cKDTree(tgt)
        ref_d, _ = tree.query(src)
        small = grid_nn.grid_nn(jnp.asarray(src), jnp.ones(200),
                                jnp.asarray(tgt), jnp.ones(2000), cell=1.0, bucket=8)
        d8 = np.asarray(small.dist)
        assert np.all(d8 >= ref_d - 1e-5)  # degraded, never corrupt
        big = grid_nn.grid_nn(jnp.asarray(src), jnp.ones(200),
                              jnp.asarray(tgt), jnp.ones(2000), cell=1.0, bucket=64)
        d64 = np.asarray(big.dist)
        np.testing.assert_allclose(d64, ref_d, rtol=1e-3, atol=1e-4)

    def test_no_candidate_returns_sentinel(self, rng):
        src = np.array([[100.0, 100, 100]], np.float32)  # far from everything
        tgt = (rng.standard_normal((50, 3))).astype(np.float32)
        res = grid_nn.grid_nn(jnp.asarray(src), jnp.ones(1),
                              jnp.asarray(tgt), jnp.ones(50), cell=1.0)
        assert float(res.dist[0]) > 1e10

    def test_masked_targets_excluded(self, rng):
        src = np.zeros((4, 3), np.float32)
        tgt = np.array([[0.01, 0, 0], [0.5, 0, 0]], np.float32)
        mask = np.array([0.0, 1.0], np.float32)
        res = grid_nn.grid_nn(jnp.asarray(src), jnp.ones(4),
                              jnp.asarray(tgt), jnp.asarray(mask), cell=1.0)
        assert np.all(np.asarray(res.idx) == 1)

    def test_build_once_query_many(self, rng):
        src, tgt = clouds(rng, n=100, m=300)
        g = grid_nn.build_grid(jnp.asarray(tgt), jnp.ones(300), cell=2.0)
        res = grid_nn.grid_nearest_neighbors(
            jnp.asarray(src), jnp.ones(100), g, jnp.asarray(tgt), jnp.ones(300))
        ref = matching.nearest_neighbors(jnp.asarray(src), jnp.ones(100),
                                         jnp.asarray(tgt), jnp.ones(300))
        close = np.asarray(ref.dist) < 2.0
        np.testing.assert_allclose(np.asarray(res.dist)[close],
                                   np.asarray(ref.dist)[close], atol=1e-4)


class TestGridMatcherInEngine:
    def test_align_with_grid_backend(self, rng):
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.geometry import se3
        from mola_fe_lidar_tpu.models import (
            ICPParams, Matcher, PairWeights, Solver, align)
        from tests.test_icp import structured_world, pose_error
        world = structured_world(rng, n=1024)
        true = se3.from_xyz_ypr(0.4, -0.2, 0.05, 0.03, 0, 0)
        src_pts = np.array(se3.transform(se3.inverse(true), jnp.asarray(world)))
        src = {"raw": from_points(src_pts, capacity=1024)}
        tgt = {"raw": from_points(world, capacity=1024)}
        params = ICPParams(
            max_iterations=40,
            matchers=(Matcher(kind="point2point", distance_threshold=2.0,
                              nn_backend="grid"),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        res = align(src, tgt, se3.identity(), params)
        et, er = pose_error(res.pose, true)
        assert et < 1e-2 and er < 1e-3
        assert float(res.quality) > 0.9
