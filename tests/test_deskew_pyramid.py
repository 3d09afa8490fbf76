"""Deskew filter + 3-level pyramid preset + spin_once metrics."""

import jax.numpy as jnp
import numpy as np

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.filters import FilterNormals
from mola_fe_lidar_tpu.filters.pipeline import FilterDeskew
from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.models import align_pipeline, icp_pyramid_3level
from mola_fe_lidar_tpu.obs.runner import build_module
from mola_fe_lidar_tpu.obs.synthetic import SyntheticWorld, synthetic_sequence
from tests.test_frontend import odom_test_cfg
from tests.test_icp import structured_world, pose_error


class TestDeskew:
    def test_unwarps_constant_velocity(self, rng):
        # simulate a scan taken while translating: point captured at time t
        # sees the world shifted by -v*(t-1)*T relative to scan end
        n = 500
        world = rng.standard_normal((n, 3)).astype(np.float32) * 10
        v = np.array([2.0, 0, 0])  # m/s
        period = 0.1
        t_frac = rng.random(n).astype(np.float32)
        # point measured at time t in sensor frame of that instant:
        warped = world - v[None, :] * ((t_frac - 1.0) * period)[:, None]
        pc = from_points(warped.astype(np.float32), capacity=512,
                         attrs={"time": t_frac[:, None]})
        f = FilterDeskew(scan_period=period)
        f.set_twist(np.array([2.0, 0, 0, 0, 0, 0]))
        out = f({"raw": pc})["raw"]
        np.testing.assert_allclose(np.asarray(out.xyz[:n]), world, atol=1e-4)

    def test_noop_without_time_attr(self, rng):
        pc = from_points(rng.standard_normal((10, 3)).astype(np.float32), capacity=16)
        f = FilterDeskew()
        f.set_twist(np.array([5.0, 0, 0, 0, 0, 1.0]))
        out = f({"raw": pc})["raw"]
        np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(pc.xyz))


class TestPyramid3:
    def test_rescues_large_offset(self, rng):
        world = structured_world(rng, n=1024)
        true = se3.from_xyz_ypr(4.0, -2.0, 0.1, 0.2, 0, 0)  # far outside fine basin
        src_pts = np.array(se3.transform(se3.inverse(true), jnp.asarray(world)))
        fn = FilterNormals(method="knn", knn=8)
        src = {"raw": from_points(src_pts, capacity=1024)}
        tgt = fn({"raw": from_points(world, capacity=1024)})
        res = align_pipeline(src, tgt, se3.identity(), icp_pyramid_3level())
        et, er = pose_error(res.pose, true)
        assert et < 0.05 and er < 5e-3
        assert float(res.quality) > 0.8


class TestSpinOnce:
    def test_emits_metrics(self):
        w = SyntheticWorld(extent=60.0, n_world_points=30_000,
                           points_per_scan=2048, max_range=35.0, seed=4)
        obs, _ = synthetic_sequence(kind="straight", n_scans=3, world=w)
        m = build_module(odom_test_cfg())
        for o in obs:
            m.on_new_observation(o)
            m.spin_once()
        m.drain()
        st = m.profiler.stats()
        assert "counter:spinOnce.pending_scans" in st
        assert st["spinOnce"]["count"] == 3
