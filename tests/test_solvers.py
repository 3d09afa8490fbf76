"""Kernel tests: rigid solvers recover known transforms (SURVEY §4.2)."""

import jax.numpy as jnp
import numpy as np

from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.solve import (
    covariance_from_normal_matrix,
    paired_ratio,
    point_to_plane_step,
    robust_weights,
    scale_outlier_weights,
    weighted_horn,
)


def random_pose(rng, t_scale=1.0, r_scale=0.3):
    tau = rng.standard_normal(6).astype(np.float32)
    tau[:3] *= t_scale
    tau[3:] *= r_scale
    return se3.exp(jnp.asarray(tau))


class TestHorn:
    def test_exact_recovery(self, rng):
        true = random_pose(rng)
        p = rng.standard_normal((100, 3)).astype(np.float32) * 5
        q = np.asarray(se3.transform(true, jnp.asarray(p)))
        est = weighted_horn(jnp.asarray(p), jnp.asarray(q), jnp.ones(100))
        err = se3.log(se3.compose(est, se3.inverse(true)))
        assert float(jnp.linalg.norm(err)) < 1e-4

    def test_weights_reject_outliers(self, rng):
        true = random_pose(rng)
        p = rng.standard_normal((100, 3)).astype(np.float32) * 5
        q = np.array(se3.transform(true, jnp.asarray(p)))
        q[:10] += 50.0  # gross outliers
        w = np.ones(100, np.float32)
        w[:10] = 0.0
        est = weighted_horn(jnp.asarray(p), jnp.asarray(q), jnp.asarray(w))
        err = se3.log(se3.compose(est, se3.inverse(true)))
        assert float(jnp.linalg.norm(err)) < 1e-4

    def test_degenerate_zero_weights(self, rng):
        p = rng.standard_normal((10, 3)).astype(np.float32)
        est = weighted_horn(jnp.asarray(p), jnp.asarray(p), jnp.zeros(10))
        assert np.all(np.isfinite(np.asarray(est.R)))
        np.testing.assert_allclose(np.asarray(est.t), 0.0)

    def test_reflection_guard(self, rng):
        # Near-planar cloud must still yield a proper rotation (det=+1).
        p = rng.standard_normal((50, 3)).astype(np.float32)
        p[:, 2] *= 1e-4
        true = random_pose(rng)
        q = np.asarray(se3.transform(true, jnp.asarray(p)))
        est = weighted_horn(jnp.asarray(p), jnp.asarray(q), jnp.ones(50))
        assert float(jnp.linalg.det(est.R)) > 0.99


class TestGaussNewton:
    def test_plane_recovery(self, rng):
        # Points on 3 orthogonal planes constrain the full pose.
        true = random_pose(rng, t_scale=0.3, r_scale=0.1)
        pts, normals = [], []
        for axis in range(3):
            x = rng.standard_normal((80, 3)).astype(np.float32) * 3
            x[:, axis] = 0.0
            n = np.zeros((80, 3), np.float32)
            n[:, axis] = 1.0
            pts.append(x)
            normals.append(n)
        q = np.concatenate(pts)
        n = np.concatenate(normals)
        # Source points: inverse-transform targets so that true maps p->q planes
        p = np.asarray(se3.transform(se3.inverse(true), jnp.asarray(q)))
        res = point_to_plane_step(
            se3.identity(), jnp.asarray(p), jnp.asarray(q), jnp.asarray(n),
            jnp.ones(len(q)), inner_iterations=20,
        )
        err = se3.log(se3.compose(res.pose, se3.inverse(true)))
        assert float(jnp.linalg.norm(err)) < 1e-4

    def test_rank_deficient_single_plane(self, rng):
        # One plane constrains only 3 DoF; damping must keep it finite.
        q = rng.standard_normal((50, 3)).astype(np.float32)
        q[:, 2] = 0.0
        n = np.zeros((50, 3), np.float32)
        n[:, 2] = 1.0
        p = q + np.array([0, 0, 0.5], np.float32)
        res = point_to_plane_step(
            se3.identity(), jnp.asarray(p), jnp.asarray(q), jnp.asarray(n),
            jnp.ones(50), inner_iterations=10,
        )
        assert np.all(np.isfinite(np.asarray(res.pose.t)))
        np.testing.assert_allclose(float(res.pose.t[2]), -0.5, atol=1e-3)

    def test_covariance_shape_and_spd(self, rng):
        true = random_pose(rng, 0.1, 0.05)
        p = rng.standard_normal((200, 3)).astype(np.float32) * 4
        q = np.array(se3.transform(true, jnp.asarray(p)))
        q += rng.standard_normal(q.shape).astype(np.float32) * 0.01
        n = rng.standard_normal((200, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        res = point_to_plane_step(
            se3.identity(), jnp.asarray(p), jnp.asarray(q), jnp.asarray(n),
            jnp.ones(200), inner_iterations=15,
        )
        cov = covariance_from_normal_matrix(res.normal_matrix, res.sq_residual_sum, res.weight_sum)
        assert cov.shape == (6, 6)
        evs = np.linalg.eigvalsh(np.asarray(cov))
        assert np.all(evs > -1e-10)


class TestRobust:
    def test_kernels_downweight_outliers(self):
        r = jnp.array([0.01, 0.05, 5.0])
        for k in ("huber", "cauchy", "gemanmcclure", "tukey", "welsch"):
            w = np.asarray(robust_weights(r, k, 0.1))
            assert w[0] > 0.9 * w[1]
            assert w[2] < 0.1

    def test_none_kernel(self):
        w = np.asarray(robust_weights(jnp.array([0.0, 10.0]), "none", 0.1))
        np.testing.assert_allclose(w, 1.0)

    def test_scale_outlier_detector(self, rng):
        true = random_pose(rng)
        p = rng.standard_normal((100, 3)).astype(np.float32) * 5
        q = np.array(se3.transform(true, jnp.asarray(p)))
        q[7] += 30.0  # inconsistent pairing
        w = scale_outlier_weights(jnp.asarray(p), jnp.asarray(q), jnp.ones(100), 1.1)
        w = np.asarray(w)
        assert w[7] == 0.0
        assert w.sum() > 90  # inliers survive


class TestQuality:
    def test_paired_ratio(self):
        d = jnp.array([0.01, 0.05, 0.2, 0.5])
        m = jnp.ones(4)
        assert abs(float(paired_ratio(d, m, 0.10)) - 0.5) < 1e-6

    def test_masked(self):
        d = jnp.array([0.01, 0.05, 0.2, 0.5])
        m = jnp.array([1.0, 0.0, 0.0, 1.0])
        assert abs(float(paired_ratio(d, m, 0.10)) - 0.5) < 1e-6
