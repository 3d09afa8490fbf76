"""Scan-to-map odometry: LocalMap aggregation + front-end integration."""

import numpy as np
import pytest

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.frontend.local_map import LocalMap
from mola_fe_lidar_tpu.geometry import se3_np


def _cloud(points, attrs=None, capacity=None):
    return from_points(np.asarray(points, np.float32),
                       capacity=capacity, attrs=attrs)


class TestLocalMap:
    def test_world_transform_and_normal_rotation(self):
        lm = LocalMap(window=4, capacity_mult=2, dedup_voxel=0.05)
        pts = np.array([[1, 0, 0], [0, 2, 0]], np.float32)
        normals = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
        # yaw 90deg: x -> y
        R, t = se3_np.exp(np.array([0, 0, 0, 0, 0, np.pi / 2]))
        lm.add_keyframe({"planes": _cloud(pts, {"normal": normals},
                                          capacity=256)}, (R, t))
        mp = lm.build()
        pc = mp["planes"]
        m = np.asarray(pc.mask) > 0.5
        xyz = np.asarray(pc.xyz)[m]
        n = np.asarray(pc.attrs["normal"])[m]
        got = {tuple(np.round(p, 3)) for p in xyz}
        assert (0.0, 1.0, 0.0) in got and (-2.0, 0.0, 0.0) in got
        gotn = {tuple(np.round(p, 3)) for p in n}
        assert (0.0, 1.0, 0.0) in gotn and (-1.0, 0.0, 0.0) in gotn

    def test_window_and_dedup(self):
        lm = LocalMap(window=2, capacity_mult=4, dedup_voxel=0.5)
        I = (np.eye(3), np.zeros(3))
        a = np.array([[0, 0, 0], [5, 0, 0]], np.float32)
        lm.add_keyframe({"decimated": _cloud(a, capacity=256)}, I)
        lm.add_keyframe({"decimated": _cloud(a + 0.01, capacity=256)}, I)
        mp = lm.build()
        # near-duplicates land in the same 0.5 m voxel: deduped to 2 points
        assert int(np.asarray(mp["decimated"].mask).sum()) == 2
        # window=2 evicts the oldest keyframe
        b = np.array([[9, 9, 9]], np.float32)
        lm.add_keyframe({"decimated": _cloud(b, capacity=256)}, I)
        lm.add_keyframe({"decimated": _cloud(b + 3, capacity=256)}, I)
        mp = lm.build()
        xyz = np.asarray(mp["decimated"].xyz)[np.asarray(mp["decimated"].mask) > 0.5]
        assert not (np.abs(xyz) < 1e-3).all(axis=1).any()  # origin evicted
        assert len(lm) == 2

    def test_keep_layers_filters_unused(self):
        lm = LocalMap(window=2, keep_layers={"decimated"})
        a = np.array([[0, 0, 0]], np.float32)
        lm.add_keyframe({"decimated": _cloud(a, capacity=256),
                         "raw": _cloud(a, capacity=256)},
                        (np.eye(3), np.zeros(3)))
        mp = lm.build()
        assert set(mp) == {"decimated"}

    def test_capacity_overflow_is_uniform(self):
        rng = np.random.default_rng(0)
        lm = LocalMap(window=1, capacity_mult=1, dedup_voxel=0.01)
        pts = rng.uniform(-50, 50, (600, 3)).astype(np.float32)
        lm.add_keyframe({"decimated": _cloud(pts, capacity=256)},
                        (np.eye(3), np.zeros(3)))
        mp = lm.build()
        pc = mp["decimated"]
        assert pc.capacity == 256
        kept = np.asarray(pc.xyz)[np.asarray(pc.mask) > 0.5]
        # hash-uniform subsample, not a spatial slab: kept points span the
        # extent on every axis
        assert (kept.max(0) - kept.min(0) > 60).all()


class TestLocalMapOdometry:
    def test_local_map_mode_tracks_synthetic_run(self):
        """Full front-end in local_map mode on a synthetic sequence: map
        forms, keyframes appear, world pose advances consistently with the
        factor chain (rel factors compose to the world pose at last KF)."""
        from mola_fe_lidar_tpu.obs.runner import build_module
        from mola_fe_lidar_tpu.obs.synthetic import synthetic_sequence

        obs, gt = synthetic_sequence(n_scans=10, kind="straight")
        cfg = {"params": {
            "odometry_reference": "local_map",
            "local_map_keyframes": 5,
            "min_dist_xyz_between_keyframes": 0.5,
            "min_icp_goodness": 0.3,
        }}
        m = build_module(cfg)
        for o in obs:
            m.on_new_observation(o)
        m.drain()
        st = m.state_copy()
        assert st.local_map is not None
        assert st.last_kf is not None and st.last_kf >= 1
        # compose the ODOMETRY factor chain (consecutive KF ids only — the
        # edge log also records nearby-KF extra edges, which would double-
        # count) to the last KF's pose; world estimate at the last
        # processed scan = KF pose + residual accumulation
        Rw, tw = np.eye(3), np.zeros(3)
        for (a, b, R, t) in st.edge_log:
            if b == a + 1:
                Rw, tw = Rw @ R, Rw @ t + tw
        Rw, tw = Rw @ st.accum_since_last_kf_R, Rw @ st.accum_since_last_kf_t + tw
        np.testing.assert_allclose(tw, st.world_t, atol=1e-5)
        m.shutdown()
