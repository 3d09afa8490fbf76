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
