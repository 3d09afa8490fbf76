"""KITTI odometry dataset plumbing, end-to-end on a synthetic KITTI-format
directory (real data isn't shipped; the format is exercised fully)."""

import numpy as np
import pytest

from mola_fe_lidar_tpu.obs.kitti import KittiOdometrySequence, read_velodyne_bin
from mola_fe_lidar_tpu.obs.runner import run_replay
from mola_fe_lidar_tpu.obs.synthetic import SyntheticWorld, synthetic_sequence
from tests.test_frontend import odom_test_cfg


@pytest.fixture
def kitti_dir(tmp_path, rng):
    """Fabricate a KITTI odometry tree from the synthetic world."""
    world = SyntheticWorld(extent=60.0, n_world_points=60_000,
                           points_per_scan=4096, max_range=35.0, seed=3)
    obs, gt = synthetic_sequence(kind="straight", n_scans=10, speed=2.0,
                                 rate_hz=2.0, world=world)
    seq_dir = tmp_path / "sequences" / "04"
    velo = seq_dir / "velodyne"
    velo.mkdir(parents=True)
    times = []
    for i, o in enumerate(obs):
        scan = np.concatenate(
            [o["xyz"], rng.random((len(o["xyz"]), 1)).astype(np.float32)], axis=1)
        scan.astype(np.float32).tofile(str(velo / f"{i:06d}.bin"))
        times.append(o["timestamp"])
    (seq_dir / "times.txt").write_text("\n".join(f"{t:.6f}" for t in times))
    # calib: non-trivial cam<-velo (swap axes like real KITTI)
    Tr = np.array([[0, -1, 0, 0.1], [0, 0, -1, -0.05], [1, 0, 0, 0.2]])
    (seq_dir / "calib.txt").write_text(
        "Tr: " + " ".join(f"{v:.9f}" for v in Tr.flatten()) + "\n")
    # poses: gt in cam frame: T_cam = Tr T_velo Tr^-1
    Tr4 = np.eye(4)
    Tr4[:3, :4] = Tr
    poses_dir = tmp_path / "poses"
    poses_dir.mkdir()
    rows = []
    for R, t in gt:
        Tv = np.eye(4)
        Tv[:3, :3], Tv[:3, 3] = R, t
        Tc = Tr4 @ Tv @ np.linalg.inv(Tr4)
        rows.append(" ".join(f"{v:.9f}" for v in Tc[:3, :4].flatten()))
    (poses_dir / "04.txt").write_text("\n".join(rows))
    return str(tmp_path), gt


class TestKittiFormat:
    def test_reader_roundtrip(self, kitti_dir):
        root, gt = kitti_dir
        seq = KittiOdometrySequence("04", root=root)
        assert len(seq) == 10
        obs = list(seq)
        assert obs[0]["xyz"].shape[1] == 3
        assert "intensity" in obs[0]
        assert obs[1]["timestamp"] > obs[0]["timestamp"]

    def test_gt_poses_converted_to_velo_frame(self, kitti_dir):
        root, gt = kitti_dir
        seq = KittiOdometrySequence("04", root=root)
        assert seq.gt_poses_velo is not None
        for (Re, te), (Rg, tg) in zip(seq.gt_poses_velo, gt):
            np.testing.assert_allclose(Re, Rg, atol=1e-6)
            np.testing.assert_allclose(te, tg, atol=1e-6)

    def test_max_scans(self, kitti_dir):
        root, _ = kitti_dir
        seq = KittiOdometrySequence("04", root=root, max_scans=3)
        assert len(seq) == 3

    def test_missing_sequence_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            KittiOdometrySequence("99", root=str(tmp_path))

    def test_full_replay_on_kitti_format(self, kitti_dir):
        root, gt = kitti_dir
        seq = KittiOdometrySequence("04", root=root)
        res = run_replay(list(seq), odom_test_cfg(), gt_poses=seq.gt_poses_velo)
        assert res["n_keyframes"] >= 2
        assert res.get("ate_rmse", 99) < 0.5


class TestKittiSegmentErrors:
    """The official KITTI devkit drift metric (segment-averaged)."""

    def _traj(self, n, step=1.0, yaw_rate=0.0, drift=0.0):
        import numpy as np
        poses, yaw, t = [], 0.0, np.zeros(3)
        for i in range(n):
            R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                          [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
            poses.append((R, t.copy()))
            t = t + R @ np.array([step * (1.0 + drift), 0, 0])
            yaw += yaw_rate
        return poses

    def test_perfect_trajectory_zero_drift(self):
        import numpy as np
        from mola_fe_lidar_tpu.obs.metrics import kitti_segment_errors

        gt = self._traj(400, yaw_rate=0.01)
        t_rel, r_rel, n = kitti_segment_errors(gt, gt, lengths=(100, 200))
        assert n > 0
        assert abs(t_rel) < 1e-9 and abs(r_rel) < 1e-9

    def test_constant_scale_drift_measured(self):
        import numpy as np
        from mola_fe_lidar_tpu.obs.metrics import kitti_segment_errors

        gt = self._traj(400)            # straight line, 1 m/frame
        est = self._traj(400, drift=0.02)  # 2% over-scale
        t_rel, r_rel, n = kitti_segment_errors(est, gt, lengths=(100, 200))
        assert n > 0
        assert abs(t_rel - 2.0) < 0.1   # percent
        assert r_rel < 1e-9

    def test_too_short_returns_nan(self):
        import numpy as np
        from mola_fe_lidar_tpu.obs.metrics import kitti_segment_errors

        gt = self._traj(50)  # 50 m < min length 100
        t_rel, r_rel, n = kitti_segment_errors(gt, gt, lengths=(100,))
        assert n == 0 and np.isnan(t_rel)
