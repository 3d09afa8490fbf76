"""In-loop (two-pass) deskew refinement: delta_redeskew exactness + the
fused-step integration (align -> implied twist -> re-warp -> re-align).

The scenario the feature exists for: the damped EMA deskew twist LAGS the
true motion (worst right after a corner begins), so pass-1 aligns a
mis-warped cloud; pass 2 re-warps with the twist implied by the scan's own
alignment — zero lag, no feedback loop (the twist never leaves the jitted
program)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.filters.pipeline import (FilterDeskew, _deskew,
                                                delta_redeskew)
from mola_fe_lidar_tpu.frontend.odometry import (AlignKind,
                                                 _unpack_icp_result)
from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.obs.runner import build_module
from tests.test_icp import structured_world, pose_error


class TestDeltaRedeskew:
    def test_matches_direct_deskew(self, rng):
        n = 400
        pts = rng.standard_normal((n, 3)).astype(np.float32) * 15
        t_frac = rng.random(n).astype(np.float32)
        pc = from_points(pts, capacity=512, attrs={"time": t_frac[:, None]})
        xi0 = np.array([1.0, -0.5, 0.2, 0.05, -0.02, 0.8], np.float32)
        xi1 = np.array([3.0, 0.5, 0.0, -0.03, 0.04, -1.2], np.float32)
        period = 0.1
        for to_end in (True, False):
            a = _deskew(pc, jnp.asarray(xi0), period, to_end)
            b = delta_redeskew(a, xi0, xi1, period, to_end)
            direct = _deskew(pc, jnp.asarray(xi1), period, to_end)
            np.testing.assert_allclose(np.asarray(b.xyz[:n]),
                                       np.asarray(direct.xyz[:n]), atol=2e-4)

    def test_identity_when_twists_equal(self, rng):
        n = 100
        pts = rng.standard_normal((n, 3)).astype(np.float32) * 5
        t_frac = rng.random(n).astype(np.float32)
        pc = from_points(pts, capacity=128, attrs={"time": t_frac[:, None]})
        xi = np.array([2.0, 0, 0, 0, 0, 0.5], np.float32)
        warped = _deskew(pc, jnp.asarray(xi), 0.1, True)
        out = delta_redeskew(warped, xi, xi, 0.1, True)
        np.testing.assert_allclose(np.asarray(out.xyz[:n]),
                                   np.asarray(warped.xyz[:n]), atol=1e-5)

    def test_rotates_normals(self, rng):
        n = 64
        pts = rng.standard_normal((n, 3)).astype(np.float32)
        t_frac = np.full(n, 1.0, np.float32)  # all points at sweep end
        nrm = np.tile(np.array([1.0, 0, 0], np.float32), (n, 1))
        pc = from_points(pts, capacity=64,
                         attrs={"time": t_frac[:, None], "normal": nrm})
        xi0 = np.zeros(6, np.float32)
        xi1 = np.array([0, 0, 0, 0, 0, np.pi / 2 / 0.1], np.float32)  # 90° yaw
        out = delta_redeskew(pc, xi0, xi1, 0.1, to_end=False)
        np.testing.assert_allclose(np.asarray(out.attrs["normal"][:n]),
                                   np.tile([0, 1, 0], (n, 1)), atol=1e-5)


def _inloop_cfg(enabled: bool):
    icp = {
        "params": {"maxIterations": 40},
        "matchers": [{"class": "Matcher_Point2Plane",
                      "params": {"distanceThreshold": 2.0, "knn": 6,
                                 "planeEigenThreshold": 0.2,
                                 "src_layer": "raw", "tgt_layer": "raw"}}],
        "solvers": [{"class": "Solver_GaussNewton",
                     "params": {"maxIterations": 8}}],
        "quality": [{"class": "QualityEvaluator_PairedRatio",
                     "params": {"thresholdDistance": 0.3,
                                "src_layer": "raw", "tgt_layer": "raw"}}],
    }
    return {"params": {
        "precompile_rare_paths": False,
        "pointcloud_generator": [
            {"class": "GeneratorRawPoints",
             "params": {"capacity": 2048, "keep_time": True}}],
        "pointcloud_filter": [
            {"class": "FilterDeskew",
             "params": {"input_layer": "raw", "scan_period": 0.1,
                        "anchor": "start"}}],
        "icp_settings_with_vel": icp,
        "deskew_in_loop": enabled,
        "deskew_refine_iters": 20,
        "deskew_refine_rounds": 3,
    }}


class TestInLoopRefinement:
    @pytest.fixture(scope="class")
    def skewed_pair(self):
        rng = np.random.default_rng(7)
        world = structured_world(rng, n=2048)
        # true motion over one inter-scan dt: fast + turning (the corner
        # case where the lagged EMA twist is most wrong)
        period = dt = 0.1
        xi_true = np.array([8.0, 0.0, 0.0, 0.0, 0.0, 1.0], np.float32)
        p_start = se3.exp(jnp.asarray(xi_true * dt))
        t_frac = rng.random(world.shape[0]).astype(np.float32)
        # point i measured at sweep fraction tau in the sensor frame of
        # that instant: p = (P_start ∘ exp(tau·T·ξ))⁻¹ x
        taus = jnp.asarray(t_frac[:, None] * period * xi_true[None, :])
        poses_t = se3.compose(p_start, se3.exp(taus))
        inv = se3.inverse(poses_t)
        meas = (jnp.einsum("nij,nj->ni", inv.R, jnp.asarray(world))
                + inv.t)
        src = {"raw": from_points(np.asarray(meas), capacity=2048,
                                  attrs={"time": t_frac[:, None]})}
        tgt = {"raw": from_points(world, capacity=2048)}
        return src, tgt, p_start

    def _run(self, enabled, skewed_pair):
        src, tgt, p_start = skewed_pair
        m = build_module(_inloop_cfg(enabled))
        step = m._get_fused_step(AlignKind.LIDAR_ODOMETRY, False)
        # prior twist ZERO: the lagged-EMA-after-a-corner scenario
        _, flat = step(src, tgt, p_start.R, p_start.t,
                       jnp.zeros(6, jnp.float32),
                       jnp.eye(3, dtype=jnp.float32),
                       jnp.zeros(3, jnp.float32), jnp.float32(0.1))
        out = _unpack_icp_result(np.asarray(flat))
        m.shutdown()
        return pose_error(out.found_pose_to_wrt_from, p_start), out

    def test_two_pass_beats_lagged_prior(self, skewed_pair):
        (et1, er1), _ = self._run(False, skewed_pair)
        (et2, er2), out2 = self._run(True, skewed_pair)
        # pass 1 aligns a cloud warped by a full 5.7° intra-sweep yaw it
        # believes is rigid; pass 2 must cut the rotation error hard
        assert er2 < er1 * 0.5, (er1, er2)
        assert et2 < et1 * 0.8 + 1e-3, (et1, et2)
        assert er2 < 0.01, er2      # <0.6° absolute
        assert out2.goodness > 0.5
