"""Checkpoint/resume round-trip + viz export tests."""

import numpy as np

from mola_fe_lidar_tpu.frontend.checkpoint import load_checkpoint, save_checkpoint
from mola_fe_lidar_tpu.obs.runner import build_module, run_replay
from mola_fe_lidar_tpu.obs.synthetic import SyntheticWorld, synthetic_sequence
from mola_fe_lidar_tpu.obs.viz import export_metric_map, export_run, write_ply
from tests.test_frontend import odom_test_cfg


def small_world():
    return SyntheticWorld(extent=60.0, n_world_points=60_000,
                          points_per_scan=4096, max_range=35.0, seed=1)


class TestCheckpoint:
    def test_roundtrip_resume(self, tmp_path):
        w = small_world()
        obs, gt = synthetic_sequence(kind="straight", n_scans=12, speed=2.0,
                                     rate_hz=2.0, world=w)
        # run first half, checkpoint
        res1 = run_replay(obs[:6], odom_test_cfg())
        m1 = res1["module"]
        save_checkpoint(m1, str(tmp_path / "ckpt"))

        # fresh module, resume, run second half
        m2 = build_module(odom_test_cfg())
        load_checkpoint(m2, str(tmp_path / "ckpt"))
        assert m2.state.last_kf == m1.state.last_kf
        np.testing.assert_allclose(m2.state.twist, m1.state.twist)
        assert len(m2.state.local_pose_graph) == len(m1.state.local_pose_graph)
        assert m2.state.last_points is not None

        for o in obs[6:]:
            m2.on_new_observation(o)
        m2.drain()
        # resumed run keeps producing keyframes continuing the id sequence
        assert m2.state.last_kf is not None
        assert len(m2.state.local_pose_graph) >= len(m1.state.local_pose_graph)

    def test_worldmodel_clouds_roundtrip(self, tmp_path):
        w = small_world()
        obs, _ = synthetic_sequence(kind="straight", n_scans=8, speed=2.0,
                                    rate_hz=2.0, world=w)
        res = run_replay(obs, odom_test_cfg())
        m1 = res["module"]
        save_checkpoint(m1, str(tmp_path / "c"))
        m2 = build_module(odom_test_cfg())
        load_checkpoint(m2, str(tmp_path / "c"))
        from mola_fe_lidar_tpu.frontend.worldmodel import ANNOTATION_NAME_PC_LAYERS
        for kf in m1.worldmodel.entities():
            a = m1.worldmodel.annotation(kf, ANNOTATION_NAME_PC_LAYERS)
            b = m2.worldmodel.annotation(kf, ANNOTATION_NAME_PC_LAYERS)
            assert b is not None
            np.testing.assert_allclose(np.asarray(a["raw"].xyz),
                                       np.asarray(b["raw"].xyz))
        assert m2.worldmodel.entity_neighbors(0) == m1.worldmodel.entity_neighbors(0)


class TestViz:
    def test_write_ply(self, tmp_path, rng):
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        p = str(tmp_path / "a.ply")
        write_ply(p, pts)
        text = open(p).read()
        assert "element vertex 10" in text
        assert text.count("\n") == 7 + 10  # header + rows

    def test_export_metric_map(self, tmp_path, rng):
        from mola_fe_lidar_tpu.cloud import from_points
        mm = {"raw": from_points(rng.standard_normal((20, 3)), capacity=32),
              "edges": from_points(rng.standard_normal((5, 3)), capacity=8)}
        p = str(tmp_path / "m.ply")
        export_metric_map(p, mm)
        assert "element vertex 25" in open(p).read()

    def test_export_run(self, tmp_path):
        w = small_world()
        obs, _ = synthetic_sequence(kind="straight", n_scans=8, speed=2.0,
                                    rate_hz=2.0, world=w)
        res = run_replay(obs, odom_test_cfg())
        export_run(str(tmp_path / "viz"), res["module"])
        files = list((tmp_path / "viz").glob("*.ply"))
        assert any(f.name == "trajectory.ply" for f in files)
        assert len(files) >= 2  # trajectory + at least one KF cloud
