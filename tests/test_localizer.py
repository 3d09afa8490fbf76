"""Map localization: aggregate keyframes, localize scans in the map frame."""

import jax.numpy as jnp
import numpy as np

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.frontend.localizer import MapLocalizer
from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.obs.runner import estimated_trajectory, run_replay
from mola_fe_lidar_tpu.obs.synthetic import SyntheticWorld, synthetic_sequence
from tests.test_frontend import odom_test_cfg


def world():
    return SyntheticWorld(extent=60.0, n_world_points=60_000,
                          points_per_scan=4096, max_range=35.0, seed=6)


class TestMapLocalizer:
    def test_localize_after_mapping_run(self):
        w = world()
        obs, gt = synthetic_sequence(kind="straight", n_scans=12, speed=2.0,
                                     rate_hz=2.0, world=w)
        res = run_replay(obs, odom_test_cfg(), gt_poses=gt)
        m = res["module"]
        kf_poses = estimated_trajectory(m)
        loc = MapLocalizer(map_capacity=1 << 15, voxel_size=0.5)
        loc.build_from_worldmodel(m.worldmodel, kf_poses)
        assert int(loc.map_cloud.count()) > 1000

        # take a NEW scan from a pose between keyframes, localize it
        R0, t0 = gt[0]
        Rq, tq = gt[5]
        scan = w.scan_at(Rq, tq)
        scan_mm = {"raw": from_points(scan, capacity=4096)}
        # map frame = first keyframe frame (gt[0]); true pose of the scan:
        R_true = R0.T @ Rq
        t_true = R0.T @ (tq - t0)
        # perturbed initial guess
        init = se3.Pose(jnp.asarray(R_true, jnp.float32),
                        jnp.asarray(t_true + np.array([0.5, -0.3, 0.0]), jnp.float32))
        out = loc.localize(scan_mm, init)
        err = np.linalg.norm(np.asarray(out.pose.t) - t_true)
        assert err < 0.25, err
        assert float(out.quality) > 0.5

    def test_build_from_explicit_pairs(self, rng):
        pts = rng.standard_normal((500, 3)).astype(np.float32) * 5
        mm = {"raw": from_points(pts, capacity=512)}
        loc = MapLocalizer(map_capacity=4096, voxel_size=0.4)
        shift = np.array([10.0, 0, 0])
        loc.build([(mm, (np.eye(3), np.zeros(3))), (mm, (np.eye(3), shift))])
        cloud = np.asarray(loc.map_cloud.xyz)
        mask = np.asarray(loc.map_cloud.mask) > 0.5
        assert cloud[mask][:, 0].max() > 9.0  # second copy placed at +10 x

    def test_localize_before_build_raises(self):
        import pytest
        loc = MapLocalizer()
        with pytest.raises(RuntimeError):
            loc.localize({"raw": from_points(np.zeros((4, 3), np.float32))},
                         se3.identity())
