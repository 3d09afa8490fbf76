"""Kernel tests: NN correspondence vs scipy cKDTree ground truth (SURVEY §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mola_fe_lidar_tpu.cloud import metric_map as mm
import mola_fe_lidar_tpu.ops.matching as knn_mod

scipy_spatial = pytest.importorskip("scipy.spatial")


def make_clouds(rng, n=300, m=400, scale=20.0, offset=0.0):
    src = (rng.standard_normal((n, 3)) * scale + offset).astype(np.float32)
    tgt = (rng.standard_normal((m, 3)) * scale + offset).astype(np.float32)
    return src, tgt


class TestNearestNeighbors:
    def test_matches_kdtree(self, rng):
        src, tgt = make_clouds(rng)
        res = knn_mod.nearest_neighbors(jnp.asarray(src), jnp.ones(len(src)),
                                        jnp.asarray(tgt), jnp.ones(len(tgt)))
        tree = scipy_spatial.cKDTree(tgt)
        ref_d, ref_i = tree.query(src)
        np.testing.assert_array_equal(np.asarray(res.idx), ref_i)
        np.testing.assert_allclose(np.asarray(res.dist), ref_d, rtol=1e-3, atol=1e-4)

    def test_far_from_origin(self, rng):
        # The catastrophic-cancellation case the centroid shift protects against.
        src, tgt = make_clouds(rng, scale=5.0, offset=500.0)
        res = knn_mod.nearest_neighbors(jnp.asarray(src), jnp.ones(len(src)),
                                        jnp.asarray(tgt), jnp.ones(len(tgt)))
        tree = scipy_spatial.cKDTree(tgt)
        ref_d, ref_i = tree.query(src)
        match = np.mean(np.asarray(res.idx) == ref_i)
        assert match > 0.99
        np.testing.assert_allclose(np.asarray(res.dist), ref_d, rtol=1e-2, atol=1e-3)

    def test_masked_targets_never_win(self, rng):
        src = np.zeros((4, 3), np.float32)
        tgt = np.array([[0.01, 0, 0], [5, 5, 5]], np.float32)
        tgt_mask = np.array([0.0, 1.0], np.float32)  # nearest one is masked out
        res = knn_mod.nearest_neighbors(jnp.asarray(src), jnp.ones(4),
                                        jnp.asarray(tgt), jnp.asarray(tgt_mask))
        assert np.all(np.asarray(res.idx) == 1)

    def test_masked_sources_flagged(self, rng):
        src, tgt = make_clouds(rng, n=10, m=20)
        src_mask = np.ones(10, np.float32)
        src_mask[3] = 0.0
        res = knn_mod.nearest_neighbors(jnp.asarray(src), jnp.asarray(src_mask),
                                        jnp.asarray(tgt), jnp.ones(20))
        assert float(res.dist[3]) > 1e10

    def test_padded_cloud_pipeline(self, rng):
        pts_s = rng.standard_normal((100, 3)).astype(np.float32) * 10
        pts_t = rng.standard_normal((150, 3)).astype(np.float32) * 10
        s = mm.from_points(pts_s, capacity=256)
        t = mm.from_points(pts_t, capacity=512)
        res = knn_mod.nearest_neighbors(s.xyz, s.mask, t.xyz, t.mask)
        tree = scipy_spatial.cKDTree(pts_t)
        _, ref_i = tree.query(pts_s)
        np.testing.assert_array_equal(np.asarray(res.idx[:100]), ref_i)

    def test_non_multiple_tile(self, rng):
        src, tgt = make_clouds(rng, n=100, m=333)
        res = knn_mod.nearest_neighbors(jnp.asarray(src), jnp.ones(100),
                                        jnp.asarray(tgt), jnp.ones(333), tile=128)
        tree = scipy_spatial.cKDTree(tgt)
        _, ref_i = tree.query(src)
        np.testing.assert_array_equal(np.asarray(res.idx), ref_i)

    def test_vmap_batched(self, rng):
        srcs = rng.standard_normal((3, 50, 3)).astype(np.float32) * 5
        tgts = rng.standard_normal((3, 80, 3)).astype(np.float32) * 5
        f = jax.vmap(lambda s, t: knn_mod.nearest_neighbors(
            s, jnp.ones(50), t, jnp.ones(80)))
        res = f(jnp.asarray(srcs), jnp.asarray(tgts))
        for b in range(3):
            tree = scipy_spatial.cKDTree(tgts[b])
            _, ref_i = tree.query(srcs[b])
            np.testing.assert_array_equal(np.asarray(res.idx[b]), ref_i)


class TestKNN:
    def test_matches_kdtree_k6(self, rng):
        src, tgt = make_clouds(rng, n=200, m=500)
        res = knn_mod.knn(jnp.asarray(src), jnp.ones(200),
                          jnp.asarray(tgt), jnp.ones(500), k=6)
        tree = scipy_spatial.cKDTree(tgt)
        ref_d, ref_i = tree.query(src, k=6)
        # sets should match (order can differ on ties)
        np.testing.assert_allclose(np.sort(np.asarray(res.dist), -1),
                                   np.sort(ref_d, -1), rtol=1e-3, atol=1e-4)
        same = np.mean(np.sort(np.asarray(res.idx), -1) == np.sort(ref_i, -1))
        assert same > 0.999

    def test_ascending_order(self, rng):
        src, tgt = make_clouds(rng, n=50, m=100)
        res = knn_mod.knn(jnp.asarray(src), jnp.ones(50),
                          jnp.asarray(tgt), jnp.ones(100), k=4)
        d = np.asarray(res.dist)
        assert np.all(np.diff(d, axis=-1) >= -1e-6)

    def test_k_larger_than_valid_targets(self, rng):
        src = rng.standard_normal((10, 3)).astype(np.float32)
        tgt = rng.standard_normal((3, 3)).astype(np.float32)
        t = mm.from_points(tgt, capacity=8)
        res = knn_mod.knn(jnp.asarray(src), jnp.ones(10), t.xyz, t.mask, k=6)
        d = np.asarray(res.dist)
        assert np.all(d[:, 3:] > 1e10)  # only 3 real neighbors exist


class TestKNNMxu:
    """bf16-candidates + f32-rescore path (ops/matching.py::knn_mxu).

    On CPU the candidate pass is plain f32, so these check the CONTRACT
    (agreement with exact kNN, masking, ordering); the bf16 recall on real
    TPU hardware is measured by scripts/bench_nn_backends.py and recorded
    in docs/nn_crossover.json."""

    def test_matches_exact_k6(self, rng):
        src, tgt = make_clouds(rng, n=200, m=500)
        res = knn_mod.knn_mxu(jnp.asarray(src), jnp.ones(200),
                              jnp.asarray(tgt), jnp.ones(500), k=6,
                              cand_k=32)
        tree = scipy_spatial.cKDTree(tgt)
        ref_d, ref_i = tree.query(src, k=6)
        np.testing.assert_allclose(np.sort(np.asarray(res.dist), -1),
                                   np.sort(ref_d, -1), rtol=1e-3, atol=1e-4)
        same = np.mean(np.sort(np.asarray(res.idx), -1) == np.sort(ref_i, -1))
        assert same > 0.999

    def test_far_from_origin_rescore_exact(self, rng):
        # the rescore is difference-form: distances stay exact even where
        # the expansion form cancels catastrophically
        src, tgt = make_clouds(rng, scale=5.0, offset=500.0)
        res = knn_mod.nearest_neighbors_mxu(
            jnp.asarray(src), jnp.ones(len(src)),
            jnp.asarray(tgt), jnp.ones(len(tgt)), cand_k=16)
        tree = scipy_spatial.cKDTree(tgt)
        ref_d, ref_i = tree.query(src)
        assert np.mean(np.asarray(res.idx) == ref_i) > 0.99
        np.testing.assert_allclose(np.asarray(res.dist), ref_d,
                                   rtol=1e-2, atol=1e-3)

    def test_masking_and_order(self, rng):
        src = np.zeros((4, 3), np.float32)
        tgt = np.array([[0.01, 0, 0], [5, 5, 5]], np.float32)
        tgt_mask = np.array([0.0, 1.0], np.float32)
        res = knn_mod.nearest_neighbors_mxu(
            jnp.asarray(src), jnp.ones(4), jnp.asarray(tgt),
            jnp.asarray(tgt_mask), cand_k=2)
        assert np.all(np.asarray(res.idx) == 1)
        src2, tgt2 = make_clouds(rng, n=50, m=100)
        r2 = knn_mod.knn_mxu(jnp.asarray(src2), jnp.ones(50),
                             jnp.asarray(tgt2), jnp.ones(100), k=4,
                             cand_k=16)
        assert np.all(np.diff(np.asarray(r2.dist), axis=-1) >= -1e-6)

    def test_masked_sources_flagged(self, rng):
        src, tgt = make_clouds(rng, n=10, m=20)
        src_mask = np.ones(10, np.float32)
        src_mask[3] = 0.0
        res = knn_mod.knn_mxu(jnp.asarray(src), jnp.asarray(src_mask),
                              jnp.asarray(tgt), jnp.ones(20), k=3,
                              cand_k=8)
        assert float(res.dist[3, 0]) > 1e10
