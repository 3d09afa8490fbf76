"""Production-pipeline device mesh (VERDICT r3 #5).

``mesh_data`` DP-shards the vmapped nearby-KF / loop-closure batches over
the mesh "data" axis; ``mesh_model`` TP-shards the fused map-align target
point axis over "model" (the chip analogue of the reference's worker
fan-out, reference src/LidarOdometry.cpp:94-96, :708-741). Both must
reproduce the single-device trajectory to float tolerance — the mesh is a
throughput lever, never a numerics change. Runs on the 8-device virtual
CPU mesh (conftest.py).
"""

import numpy as np
import pytest

from mola_fe_lidar_tpu.obs.runner import run_replay
from mola_fe_lidar_tpu.obs.synthetic import synthetic_sequence
from tests.test_frontend import odom_test_cfg, small_world  # noqa: F401


def _kf_translations(res):
    return {k: np.asarray(t) for k, (R, t) in res["kf_poses"].items()}


def _mesh_cfg(**over):
    base = {
        "odometry_reference": "local_map",
        "local_map_keyframes": 4,
        "local_map_capacity_mult": 2,
    }
    base.update(over)
    return odom_test_cfg(**base)


class TestMeshProductionParity:
    def test_tp_fused_map_align_matches_single_device(self, small_world):
        """mesh_model=2: the fused scan-to-map step runs under shard_map
        with the map point axis sharded — same trajectory as 1 device."""
        obs, gt = synthetic_sequence(kind="straight", n_scans=10, speed=2.0,
                                     rate_hz=2.0, world=small_world)
        res1 = run_replay(obs, _mesh_cfg(), gt_poses=gt)
        res2 = run_replay(obs, _mesh_cfg(mesh_model=2), gt_poses=gt)
        t1, t2 = _kf_translations(res1), _kf_translations(res2)
        assert set(t1) == set(t2)
        for k in t1:
            np.testing.assert_allclose(t2[k], t1[k], atol=1e-4,
                                       err_msg=f"KF {k} diverged under TP")
        assert res2["module"]._mesh is not None  # the mesh really built

    def test_dp_nearby_batch_matches_single_device(self, small_world):
        """mesh_data=4: the nearby-KF batch align runs with its batch axis
        laid across devices — identical accept decisions and edge poses."""
        obs, gt = synthetic_sequence(kind="straight", n_scans=14, speed=2.0,
                                     rate_hz=2.0, world=small_world)
        # nearby window sized so later KFs check earlier ones
        over = dict(min_dist_to_matching=2.0, max_dist_to_matching=9.0,
                    max_nearby_align_checks=3)
        res1 = run_replay(obs, odom_test_cfg(**over))
        res2 = run_replay(obs, odom_test_cfg(mesh_data=4, **over))
        f1 = {(f.kf_from, f.kf_to): np.asarray(f.rel_pose.t)
              for f in res1["backend"].factors}
        f2 = {(f.kf_from, f.kf_to): np.asarray(f.rel_pose.t)
              for f in res2["backend"].factors}
        # at least one non-consecutive (nearby-batch) edge must exist, or
        # the test exercises nothing
        assert any(abs(a - b) > 1 for a, b in f1), f1.keys()
        assert set(f1) == set(f2)
        for k in f1:
            np.testing.assert_allclose(f2[k], f1[k], atol=1e-4,
                                       err_msg=f"factor {k} diverged")

    def test_insufficient_devices_falls_back(self, small_world):
        """mesh bigger than the process's device count: warn + run 1-dev."""
        obs, gt = synthetic_sequence(kind="straight", n_scans=6, speed=2.0,
                                     rate_hz=2.0, world=small_world)
        res = run_replay(obs, odom_test_cfg(mesh_data=64))
        assert res["module"]._mesh is None
        assert res["n_keyframes"] >= 1
