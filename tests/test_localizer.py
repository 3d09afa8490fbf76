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
        # multi_start small: the CPU test mesh pays the full gate batch
        # serially (see localize() cost note); production keeps 8
        loc = MapLocalizer(map_capacity=1 << 14, voxel_size=0.5,
                           multi_start=2, start_sigma_xyz=1.0)
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


class TestLocalizeGate:
    """Multi-start consistency gate (VERDICT r3 #6): paired-ratio quality
    alone scored a 3.56 m wrong-basin query at 0.80 (docs/localize_tp.json
    r2); the gate must flag what quality cannot."""

    def _grid_map(self, period=10.0, n=5):
        """Periodic world: identical L-shaped clusters on an n x n grid —
        maximal self-similarity, the aliasing worst case."""
        rng = np.random.default_rng(3)
        cluster = np.concatenate([
            np.stack([np.linspace(0, 3, 40), np.zeros(40),
                      rng.uniform(0, 2, 40)], -1),
            np.stack([np.zeros(40), np.linspace(0, 3, 40),
                      rng.uniform(0, 2, 40)], -1),
        ]).astype(np.float32)
        tiles = []
        for i in range(n):
            for j in range(n):
                tiles.append(cluster + np.array([i, j, 0]) * period)
        return np.concatenate(tiles).astype(np.float32), cluster

    def test_unique_scene_accepted(self):
        w = world()
        obs, gt = synthetic_sequence(kind="straight", n_scans=12, speed=2.0,
                                     rate_hz=2.0, world=w)
        res = run_replay(obs, odom_test_cfg(), gt_poses=gt)
        m = res["module"]
        loc = MapLocalizer(map_capacity=1 << 14, voxel_size=0.5,
                           multi_start=4, start_sigma_xyz=1.5)
        loc.build_from_worldmodel(m.worldmodel, estimated_trajectory(m))
        R0, t0 = gt[0]
        Rq, tq = gt[5]
        scan = {"raw": from_points(w.scan_at(Rq, tq), capacity=4096)}
        init = se3.Pose(jnp.asarray(R0.T @ Rq, jnp.float32),
                        jnp.asarray(R0.T @ (tq - t0) + np.array([0.5, -0.3, 0.0]),
                                    jnp.float32))
        out = loc.localize(scan, init)
        assert out.accepted, out.reject_reason
        assert out.n_agree >= 3
        err = np.linalg.norm(np.asarray(out.pose.t) - R0.T @ (tq - t0))
        assert err < 0.25, err
        m.shutdown()

    def test_aliased_scene_flagged(self):
        pts, cluster = self._grid_map(period=10.0)
        loc = MapLocalizer(map_capacity=1 << 13, voxel_size=0.25,
                           multi_start=8, start_sigma_xyz=4.0)
        loc.build([({"raw": from_points(pts, capacity=1 << 13)},
                    (np.eye(3), np.zeros(3)))])
        scan = {"raw": from_points(cluster, capacity=256)}
        # true pose: origin tile; init NEAR the identical tile one period
        # over -> the base align snaps to the WRONG tile with high quality
        # (the aliasing failure), and only the probe batch can flag it:
        # probes at sigma=4 hop into the neighboring identical basins
        init = se3.Pose(jnp.eye(3), jnp.asarray([10.3, 0.2, 0.0]))
        out = loc.localize(scan, init)
        assert not out.accepted
        assert out.reject_reason in ("consistency", "quality")

    def test_empty_space_rejected_on_quality(self):
        pts, cluster = self._grid_map()
        loc = MapLocalizer(map_capacity=1 << 13, voxel_size=0.25,
                           multi_start=4, start_sigma_xyz=0.5)
        loc.build([({"raw": from_points(pts, capacity=1 << 13)},
                    (np.eye(3), np.zeros(3)))])
        scan = {"raw": from_points(cluster, capacity=256)}
        init = se3.Pose(jnp.eye(3), jnp.asarray([500.0, 500.0, 0.0]))
        out = loc.localize(scan, init)
        assert not out.accepted
        assert out.reject_reason == "quality"

    def test_raw_path_unchanged(self):
        pts, cluster = self._grid_map()
        loc = MapLocalizer(map_capacity=1 << 13, voxel_size=0.25)
        loc.build([({"raw": from_points(pts, capacity=1 << 13)},
                    (np.eye(3), np.zeros(3)))])
        scan = {"raw": from_points(cluster, capacity=256)}
        raw = loc.localize_raw(scan, se3.identity())
        assert float(raw.quality) > 0.5  # exact init: the basin is correct
