"""Integration tests for the ICP engine: recover known rigid transforms
(SURVEY §4.2/4.3). This is the canonical "two scans in → relative pose out"
recipe (the reference seam at src/LidarOdometry.cpp:869-871)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.models import (
    ICPParams, Matcher, PairWeights, Quality, Solver,
    align, align_pipeline, TERM_CONVERGED,
)


def structured_world(rng, n=2000, extent=20.0):
    """Synthetic LiDAR-ish scene: ground plane + two walls + scatter.

    Structured geometry (not a Gaussian blob) so point-to-plane has real
    planes and the pose is fully constrained.
    """
    n_each = n // 4
    ground = np.stack([
        rng.uniform(-extent, extent, n_each),
        rng.uniform(-extent, extent, n_each),
        rng.normal(0, 0.02, n_each),
    ], -1)
    wall1 = np.stack([
        rng.uniform(-extent, extent, n_each),
        np.full(n_each, extent) + rng.normal(0, 0.02, n_each),
        rng.uniform(0, 5, n_each),
    ], -1)
    wall2 = np.stack([
        np.full(n_each, -extent) + rng.normal(0, 0.02, n_each),
        rng.uniform(-extent, extent, n_each),
        rng.uniform(0, 5, n_each),
    ], -1)
    scatter = np.stack([
        rng.uniform(-extent, extent, n_each),
        rng.uniform(-extent, extent, n_each),
        rng.uniform(0, 4, n_each),
    ], -1)
    return np.concatenate([ground, wall1, wall2, scatter]).astype(np.float32)


def pose_error(est, true):
    d = se3.log(se3.compose(est, se3.inverse(true)))
    return float(jnp.linalg.norm(d[:3])), float(jnp.linalg.norm(d[3:]))


@pytest.fixture
def world(rng):
    return structured_world(rng)


def make_maps(world, true_pose, rng, noise=0.0, cap=2048):
    tgt_pts = world
    src_pts = np.array(se3.transform(se3.inverse(true_pose), jnp.asarray(world)))
    if noise:
        src_pts = src_pts + rng.normal(0, noise, src_pts.shape).astype(np.float32)
    src = {"raw": from_points(src_pts, capacity=cap)}
    tgt = {"raw": from_points(tgt_pts, capacity=cap)}
    return src, tgt


P2P_HORN = ICPParams(
    max_iterations=60,
    matchers=(Matcher(kind="point2point", distance_threshold=2.0),),
    solver=Solver(kind="horn"),
    weights=PairWeights(use_scale_outlier_detector=False),
)

P2PLANE = ICPParams(
    max_iterations=40,
    matchers=(Matcher(kind="point2plane_knn", distance_threshold=2.0, knn=6,
                      plane_eigen_threshold=0.1),),
    solver=Solver(kind="gauss_newton", max_iterations=10),
    weights=PairWeights(use_scale_outlier_detector=False),
)


class TestAlign:
    def test_point2point_horn_recovers(self, world, rng):
        true = se3.from_xyz_ypr(0.4, -0.2, 0.05, 0.03, 0.0, 0.01)
        src, tgt = make_maps(world, true, rng)
        res = align(src, tgt, se3.identity(), P2P_HORN)
        et, er = pose_error(res.pose, true)
        assert et < 5e-3 and er < 5e-4
        assert int(res.term_reason) == TERM_CONVERGED
        assert float(res.quality) > 0.9

    def test_point2plane_recovers(self, world, rng):
        true = se3.from_xyz_ypr(0.3, 0.15, -0.02, -0.02, 0.005, 0.0)
        src, tgt = make_maps(world, true, rng)
        res = align(src, tgt, se3.identity(), P2PLANE)
        et, er = pose_error(res.pose, true)
        # local plane fits carry the synthetic world's 2 cm surface jitter,
        # so expect mm-level, not exact, recovery
        assert et < 1e-2 and er < 2e-3
        assert float(res.quality) > 0.8

    def test_with_noise_and_robust_kernel(self, world, rng):
        true = se3.from_xyz_ypr(0.3, 0.0, 0.0, 0.02, 0, 0)
        src, tgt = make_maps(world, true, rng, noise=0.02)
        params = ICPParams(
            max_iterations=40,
            matchers=(Matcher(kind="point2point", distance_threshold=1.0),),
            solver=Solver(kind="gauss_newton", max_iterations=8),
            weights=PairWeights(use_scale_outlier_detector=False,
                                use_robust_kernel=True,
                                robust_kernel="cauchy", robust_kernel_param=0.2),
        )
        res = align(src, tgt, se3.identity(), params)
        et, er = pose_error(res.pose, true)
        assert et < 0.03 and er < 3e-3

    def test_initial_guess_helps_large_motion(self, world, rng):
        true = se3.from_xyz_ypr(3.0, 1.0, 0.0, 0.25, 0, 0)
        src, tgt = make_maps(world, true, rng)
        near = se3.from_xyz_ypr(2.8, 0.9, 0.0, 0.22, 0, 0)
        res = align(src, tgt, near, P2P_HORN)
        et, er = pose_error(res.pose, true)
        assert et < 1e-2 and er < 1e-3

    def test_cov_finite_and_psd(self, world, rng):
        true = se3.from_xyz_ypr(0.2, 0.1, 0.0, 0.01, 0, 0)
        src, tgt = make_maps(world, true, rng, noise=0.01)
        res = align(src, tgt, se3.identity(), P2PLANE)
        cov = np.asarray(res.cov)
        assert cov.shape == (6, 6)
        assert np.all(np.isfinite(cov))
        assert np.all(np.linalg.eigvalsh(cov) > -1e-9)

    def test_vmap_batch_of_pairs(self, world, rng):
        # The loop-closure Monte-Carlo pattern: one source/target pair,
        # a batch of perturbed initial guesses, single vmapped dispatch
        # (reference src/LidarOdometry.cpp:775-787 does this as a thread loop).
        true = se3.from_xyz_ypr(0.5, -0.1, 0.0, 0.05, 0, 0)
        src, tgt = make_maps(world, true, rng)
        K = 8
        taus = rng.normal(0, 0.05, (K, 6)).astype(np.float32)
        guesses = jax.vmap(se3.exp)(jnp.asarray(taus))
        f = jax.vmap(lambda g: align(src, tgt, g, P2P_HORN))
        res = f(guesses)
        assert res.quality.shape == (K,)
        best = int(jnp.argmax(res.quality))
        et, er = pose_error(jax.tree.map(lambda x: x[best], res.pose), true)
        assert et < 1e-2

    def test_pipeline_coarse_to_fine(self, world, rng):
        true = se3.from_xyz_ypr(1.0, 0.5, 0.0, 0.1, 0, 0)
        src, tgt = make_maps(world, true, rng)
        coarse = ICPParams(
            max_iterations=30,
            matchers=(Matcher(kind="point2point", distance_threshold=5.0),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        res = align_pipeline(src, tgt, se3.identity(), (coarse, P2PLANE))
        et, er = pose_error(res.pose, true)
        assert et < 5e-3

    def test_quality_low_for_bad_alignment(self, world, rng):
        src, tgt = make_maps(world, se3.identity(), rng)
        bad = se3.from_xyz_ypr(15.0, 15.0, 5.0, 1.5, 0, 0)
        params = ICPParams(
            max_iterations=3,
            matchers=(Matcher(kind="point2point", distance_threshold=0.3),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        res = align(src, tgt, bad, params)
        assert float(res.quality) < 0.5


class TestCandidateCache:
    """Candidate-cached matching (Matcher.cand_k): top-K refresh every
    cand_refresh iterations + O(N*K) re-argmin in between must recover the
    same transforms as full per-iteration NN."""

    def test_p2p_cached_matches_full(self, world, rng):
        true = se3.from_xyz_ypr(0.4, -0.2, 0.05, 0.03, 0.0, 0.01)
        src, tgt = make_maps(world, true, rng)
        cached = ICPParams(
            max_iterations=60, cand_refresh=4,
            matchers=(Matcher(kind="point2point", distance_threshold=2.0,
                              cand_k=4),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        res = align(src, tgt, se3.identity(), cached)
        full = align(src, tgt, se3.identity(), P2P_HORN)
        et, er = pose_error(res.pose, true)
        assert et < 5e-3 and er < 5e-4
        # same quality scale as the full path
        assert abs(float(res.quality) - float(full.quality)) < 0.05
        assert int(res.n_iterations) <= 60

    def test_p2plane_normals_cached_recovers(self, rng):
        # plane-rich scene with precomputed normals on the target
        from mola_fe_lidar_tpu.filters.pipeline import FilterEdgesPlanes

        world_pts = structured_world(rng, n=4000)
        f = FilterEdgesPlanes(voxel_filter_resolution=1.0,
                              voxel_filter_decimation=1,
                              planes_capacity=2048, edges_capacity=256,
                              decimated_capacity=2048)
        tgt = f({"raw": from_points(world_pts, capacity=4096)})
        true = se3.from_xyz_ypr(0.25, 0.1, 0.02, 0.02, 0.0, 0.0)
        src_pts = np.array(se3.transform(se3.inverse(true),
                                         jnp.asarray(world_pts)))
        src = f({"raw": from_points(src_pts, capacity=4096)})
        mk = lambda k: ICPParams(
            max_iterations=60, cand_refresh=4,
            matchers=(Matcher(kind="point2plane_normals",
                              src_layer="decimated", tgt_layer="planes",
                              distance_threshold=1.5, cand_k=k),),
            solver=Solver(kind="gauss_newton", max_iterations=10),
            quality=(Quality(threshold_distance=0.3, src_layer="decimated",
                             tgt_layer="decimated"),),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        res_c = align(src, tgt, se3.identity(), mk(4))
        res_f = align(src, tgt, se3.identity(), mk(0))
        etc, erc = pose_error(res_c.pose, true)
        etf, erf = pose_error(res_f.pose, true)
        # cached path lands within the same error envelope as full NN
        assert etc < max(2 * etf, 2e-2), (etc, etf)
        assert erc < max(2 * erf, 4e-3), (erc, erf)

    def test_iteration_budget_respected(self, world, rng):
        true = se3.from_xyz_ypr(0.1, 0.0, 0.0, 0.0, 0.0, 0.0)
        src, tgt = make_maps(world, true, rng)
        p = ICPParams(
            max_iterations=7, cand_refresh=4,  # budget not divisible by R
            min_abs_step_trans=0.0, min_abs_step_rot=0.0,
            matchers=(Matcher(kind="point2point", distance_threshold=2.0,
                              cand_k=4),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        res = align(src, tgt, se3.identity(), p)
        assert int(res.n_iterations) == 7

    def test_motion_conditional_refresh_matches_fixed(self, world, rng):
        """cand_refresh_min_* skips block-head refreshes once the pose
        stops moving; with thresholds well under the point spacing the
        final pose matches the fixed-cadence path to float precision."""
        import dataclasses
        true = se3.from_xyz_ypr(0.4, -0.2, 0.05, 0.03, 0.0, 0.01)
        src, tgt = make_maps(world, true, rng)
        fixed = ICPParams(
            max_iterations=60, cand_refresh=4,
            matchers=(Matcher(kind="point2point", distance_threshold=2.0,
                              cand_k=4),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        cond = dataclasses.replace(fixed, cand_refresh_min_trans=0.02,
                                   cand_refresh_min_rot=0.001)
        rf = align(src, tgt, se3.identity(), fixed)
        rc = align(src, tgt, se3.identity(), cond)
        assert int(rc.n_iterations) <= 60
        np.testing.assert_allclose(np.asarray(rc.pose.t),
                                   np.asarray(rf.pose.t), atol=1e-4)
        np.testing.assert_allclose(np.asarray(rc.pose.R),
                                   np.asarray(rf.pose.R), atol=1e-5)
        etc, erc = pose_error(rc.pose, true)
        assert etc < 5e-3 and erc < 5e-4

    def test_motion_conditional_refresh_vmaps(self, world, rng):
        """Under vmap the lax.cond lowers to select — no savings, but the
        batched align must still compile and match the fixed-cadence
        batched result bit-for-bit (this world's p2p plateau included)."""
        from mola_fe_lidar_tpu.parallel.batch import make_batched_align
        import dataclasses
        true = se3.from_xyz_ypr(0.3, -0.1, 0.0, 0.02, 0.0, 0.0)
        src, tgt = make_maps(world, true, rng)
        fixed = ICPParams(
            max_iterations=60, cand_refresh=4,
            matchers=(Matcher(kind="point2point", distance_threshold=2.0,
                              cand_k=4),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        cond = dataclasses.replace(fixed, cand_refresh_min_trans=0.02,
                                   cand_refresh_min_rot=0.001)
        stack = lambda mm: {k: jax.tree.map(
            lambda a: jnp.stack([a, a]), v) for k, v in mm.items()}
        init = se3.Pose(jnp.stack([se3.identity().R] * 2),
                        jnp.stack([se3.identity().t] * 2))
        rf = make_batched_align(fixed)(stack(src), stack(tgt), init)
        rc = make_batched_align(cond)(stack(src), stack(tgt), init)
        np.testing.assert_array_equal(np.asarray(rc.n_iterations),
                                      np.asarray(rf.n_iterations))
        np.testing.assert_allclose(np.asarray(rc.pose.t),
                                   np.asarray(rf.pose.t), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rc.pose.R),
                                   np.asarray(rf.pose.R), atol=1e-6)


class TestCandidateCacheKNN:
    """kNN-neighborhood matchers (point2plane_knn / point2line_knn) ride the
    candidate cache when cand_k >= knn: exact kNN within the cached top-K is
    the same eigen-fit math over a periodically-refreshed support set."""

    def _params(self, cand_k, kind="point2plane_knn"):
        return ICPParams(
            max_iterations=100, min_abs_step_trans=5e-5, min_abs_step_rot=1e-5,
            cand_refresh=4,
            matchers=(Matcher(kind=kind, distance_threshold=0.9, knn=6,
                              plane_eigen_threshold=0.2, cand_k=cand_k),),
            solver=Solver(kind="gauss_newton", max_iterations=10),
            quality=(Quality(threshold_distance=0.3),),
            weights=PairWeights(use_scale_outlier_detector=False),
        )

    def test_p2plane_knn_cached_matches_full(self, world, rng):
        true = se3.from_xyz_ypr(0.3, -0.2, 0.05, 0.04, 0.0, 0.01)
        src, tgt = make_maps(world, true, rng)
        res_f = align(src, tgt, se3.identity(), self._params(0))
        res_c = align(src, tgt, se3.identity(), self._params(16))
        etf, erf = pose_error(res_f.pose, true)
        etc, erc = pose_error(res_c.pose, true)
        assert etc < max(1.5 * etf, 1e-2), (etc, etf)
        assert erc < max(1.5 * erf, 2e-3), (erc, erf)
        assert abs(float(res_c.quality) - float(res_f.quality)) < 0.05

    def test_cand_k_below_knn_is_ineligible(self):
        from mola_fe_lidar_tpu.models.icp import _cand_eligible, _uses_cands

        p = self._params(4)           # cand_k 4 < knn 6 -> full NN path
        assert not _cand_eligible(p.matchers[0])
        assert not _uses_cands(p)
        assert _uses_cands(self._params(6))

    def test_knn_from_cands_exact_within_candidates(self, rng):
        """kNN restricted to candidates == brute force over that subset."""
        import jax
        from mola_fe_lidar_tpu.models.icp import _knn_from_cands

        pts = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
        tgt = from_points(pts, capacity=256)
        sp = jnp.asarray(rng.uniform(-5, 5, (64, 3)).astype(np.float32))
        cand = jnp.asarray(rng.integers(0, 256, (64, 16)), jnp.int32)
        nn = _knn_from_cands(sp, tgt, cand, 6)
        d_all = np.linalg.norm(
            np.asarray(sp)[:, None, :] - pts[np.asarray(cand)], axis=-1)
        np.testing.assert_allclose(
            np.sort(np.asarray(nn.dist), -1), np.sort(d_all, -1)[:, :6],
            rtol=1e-4, atol=1e-5)


class TestGatedQuality:
    """Multi-evaluator quality combination (models/config.py::Quality
    weight / required_min): weighted mean + conjunctive veto — the
    discriminative-layer loop-closure gate (icp-settings-loop-closure.yaml)."""

    def _two_layer_maps(self, rng, offset=None):
        """'dense' layer pairs regardless; 'sparse' layer only pairs
        when src == tgt (tgt sparse points far away under offset)."""
        dense = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
        sparse = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
        src = {"dense": from_points(dense, capacity=256),
               "sparse": from_points(sparse, capacity=64)}
        tgt_sparse = sparse if offset is None else sparse + offset
        tgt = {"dense": from_points(dense, capacity=256),
               "sparse": from_points(tgt_sparse, capacity=64)}
        return src, tgt

    def _params(self, required_min=0.0, weight=0.0):
        return ICPParams(
            max_iterations=1,
            matchers=(Matcher(kind="point2point", distance_threshold=0.05,
                              src_layer="dense", tgt_layer="dense"),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
            quality=(
                Quality(threshold_distance=0.10, src_layer="dense",
                        tgt_layer="dense"),
                Quality(threshold_distance=0.10, src_layer="sparse",
                        tgt_layer="sparse", weight=weight,
                        required_min=required_min),
            ),
        )

    def test_weight_zero_keeps_dense_scale(self, rng):
        src, tgt = self._two_layer_maps(rng)
        res = align(src, tgt, se3.identity(), self._params())
        assert float(res.quality) > 0.95  # pure dense ratio, sparse ignored

    def test_required_min_vetoes_aliased_layer(self, rng):
        src, tgt = self._two_layer_maps(rng, offset=np.float32([50, 0, 0]))
        # dense layer aligns perfectly, sparse layer pairs nothing:
        # without the veto quality would be ~1.0; the gate forces 0
        res = align(src, tgt, se3.identity(), self._params(required_min=0.10))
        assert float(res.quality) == 0.0
        # and the same geometry passes when the sparse layer pairs
        src2, tgt2 = self._two_layer_maps(rng)
        res2 = align(src2, tgt2, se3.identity(), self._params(required_min=0.10))
        assert float(res2.quality) > 0.95

    def test_weighted_mean(self, rng):
        src, tgt = self._two_layer_maps(rng, offset=np.float32([50, 0, 0]))
        res = align(src, tgt, se3.identity(), self._params(weight=1.0))
        # mean of ~1.0 (dense) and ~0.0 (sparse)
        assert 0.4 < float(res.quality) < 0.6

    def test_symmetric_takes_better_direction(self, rng):
        dense = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
        sp_src = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
        src = {"dense": from_points(dense, capacity=256),
               "sparse": from_points(sp_src, capacity=64)}
        # tgt sparse = half of src's points: src->tgt pairs 0.5,
        # tgt->src pairs 1.0 (occlusion-asymmetric LC analogue)
        tgt = {"dense": from_points(dense, capacity=256),
               "sparse": from_points(sp_src[:32], capacity=64)}
        base = dict(
            max_iterations=1,
            matchers=(Matcher(kind="point2point", distance_threshold=0.05,
                              src_layer="dense", tgt_layer="dense"),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        asym = ICPParams(quality=(
            Quality(threshold_distance=0.10, src_layer="sparse",
                    tgt_layer="sparse"),), **base)
        sym = ICPParams(quality=(
            Quality(threshold_distance=0.10, src_layer="sparse",
                    tgt_layer="sparse", symmetric=True),), **base)
        q_asym = float(align(src, tgt, se3.identity(), asym).quality)
        q_sym = float(align(src, tgt, se3.identity(), sym).quality)
        assert 0.4 < q_asym < 0.6
        assert q_sym > 0.95
