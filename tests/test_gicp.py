"""GICP (plane-to-plane) model family tests."""

import jax.numpy as jnp
import numpy as np

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.filters import FILTER_REGISTRY
from mola_fe_lidar_tpu.filters.pipeline import FilterGICPCovariances
from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.models import ICPParams, Matcher, PairWeights, Quality, Solver, align  # noqa: F401
from tests.test_icp import structured_world, pose_error

GICP = ICPParams(
    max_iterations=30,
    matchers=(Matcher(kind="gicp", distance_threshold=2.0),),
    solver=Solver(kind="gauss_newton", max_iterations=8),
    weights=PairWeights(use_scale_outlier_detector=False),
)


def gicp_maps(rng, true, noise=0.0, cap=2048):
    world = structured_world(rng, n=cap)
    src_pts = np.array(se3.transform(se3.inverse(true), jnp.asarray(world)))
    if noise:
        src_pts = src_pts + rng.normal(0, noise, src_pts.shape).astype(np.float32)
    f = FilterGICPCovariances(knn=10)
    src = f({"raw": from_points(src_pts, capacity=cap)})
    tgt = f({"raw": from_points(world, capacity=cap)})
    return src, tgt


class TestGICP:
    def test_registered(self):
        assert "FilterGICPCovariances" in FILTER_REGISTRY

    def test_cov_structure(self, rng):
        # ground-plane points: covariance must be ~identity in-plane, eps across
        pts = np.stack([rng.uniform(0, 10, 400), rng.uniform(0, 10, 400),
                        rng.normal(0, 0.005, 400)], -1).astype(np.float32)
        out = FilterGICPCovariances(knn=10, epsilon=1e-3)(
            {"raw": from_points(pts, capacity=512)})["raw"]
        C = np.asarray(out.attrs["cov"][:400]).reshape(-1, 3, 3)
        assert np.allclose(C[:, 2, 2], 1e-3, atol=0.05)   # squashed along z
        assert np.allclose(C[:, 0, 0], 1.0, atol=0.05)    # free in plane

    def test_recovers_transform(self, rng):
        true = se3.from_xyz_ypr(0.4, -0.2, 0.05, 0.04, 0.0, 0.01)
        src, tgt = gicp_maps(rng, true)
        res = align(src, tgt, se3.identity(), GICP)
        et, er = pose_error(res.pose, true)
        assert et < 1e-2 and er < 2e-3
        assert float(res.quality) > 0.8

    def test_with_noise(self, rng):
        true = se3.from_xyz_ypr(0.3, 0.1, 0.0, 0.02, 0, 0)
        src, tgt = gicp_maps(rng, true, noise=0.02)
        res = align(src, tgt, se3.identity(), GICP)
        et, er = pose_error(res.pose, true)
        assert et < 0.05 and er < 5e-3


class TestPointToLine:
    def test_pole_scene_constrains_xy(self, rng):
        # vertical poles only: point-to-line on edges constrains x,y,yaw
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.models import ICPParams, Matcher, Solver, align
        poles = []
        for px, py in rng.uniform(-15, 15, (30, 2)):
            z = rng.uniform(0, 6, 40)
            poles.append(np.stack([
                np.full(40, px) + rng.normal(0, 0.01, 40),
                np.full(40, py) + rng.normal(0, 0.01, 40), z], -1))
        world = np.concatenate(poles).astype(np.float32)
        true = se3.from_xyz_ypr(0.4, -0.3, 0.0, 0.05, 0, 0)
        src_pts = np.array(se3.transform(se3.inverse(true), jnp.asarray(world)))
        src = {"edges": from_points(src_pts, capacity=2048)}
        tgt = {"edges": from_points(world, capacity=2048)}
        params = ICPParams(
            max_iterations=30,
            matchers=(Matcher(kind="point2line_knn", src_layer="edges",
                              tgt_layer="edges", distance_threshold=2.0,
                              knn=6, plane_eigen_threshold=0.2),),
            solver=Solver(kind="gauss_newton", max_iterations=8),
            quality=(Quality(src_layer="edges", tgt_layer="edges",
                             threshold_distance=0.3),),
            weights=PairWeights(use_scale_outlier_detector=False),
        )
        res = align(src, tgt, se3.identity(), params)
        # x, y, yaw recovered (z is a gauge freedom along the poles)
        d = np.asarray(se3.log(se3.compose(res.pose, se3.inverse(true))))
        assert abs(d[0]) < 0.02 and abs(d[1]) < 0.02 and abs(d[5]) < 0.005
        assert float(res.quality) > 0.8
