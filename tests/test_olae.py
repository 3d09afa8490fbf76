"""OLAE solver tests: the linear CGR attitude estimator must match Horn on
clean data, honor weights, batch under vmap, and drive full ICP through the
reference's ``Solver_OLAE`` config name (mp2p_icp parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.solve import weighted_horn, weighted_olae


def random_pose(rng, rot_scale=0.5):
    tau = np.concatenate([rng.normal(0, 1.0, 3), rng.normal(0, rot_scale, 3)])
    return se3.exp(jnp.asarray(tau, jnp.float32))


class TestOLAE:
    def test_exact_recovery(self, rng):
        pts = jnp.asarray(rng.normal(0, 5, (200, 3)).astype(np.float32))
        true = random_pose(rng)
        tgt = se3.transform(true, pts)
        w = jnp.ones(200)
        est = weighted_olae(pts, tgt, w)
        err = float(se3.translation_norm(se3.compose(est, se3.inverse(true))))
        assert err < 1e-4

    def test_matches_horn(self, rng):
        pts = jnp.asarray(rng.normal(0, 5, (300, 3)).astype(np.float32))
        true = random_pose(rng)
        tgt = se3.transform(true, pts) + 0.01 * jnp.asarray(
            rng.normal(size=(300, 3)).astype(np.float32))
        w = jnp.asarray(rng.uniform(0.2, 1.0, 300).astype(np.float32))
        e_o = weighted_olae(pts, tgt, w)
        e_h = weighted_horn(pts, tgt, w)
        d = float(se3.translation_norm(se3.compose(e_o, se3.inverse(e_h))))
        rot = float(jnp.linalg.norm(se3.log(se3.compose(e_o, se3.inverse(e_h)))[3:]))
        assert d < 5e-3 and rot < 5e-3

    def test_weights_drop_outliers(self, rng):
        pts = jnp.asarray(rng.normal(0, 5, (200, 3)).astype(np.float32))
        true = random_pose(rng)
        tgt = np.array(se3.transform(true, pts))
        tgt[:40] += 20.0  # gross outliers
        w = jnp.asarray(np.concatenate([np.zeros(40), np.ones(160)])
                        .astype(np.float32))
        est = weighted_olae(pts, jnp.asarray(tgt), w)
        err = float(se3.translation_norm(se3.compose(est, se3.inverse(true))))
        assert err < 1e-4

    def test_degenerate_weight_identity(self, rng):
        pts = jnp.asarray(rng.normal(0, 5, (50, 3)).astype(np.float32))
        est = weighted_olae(pts, pts + 3.0, jnp.zeros(50))
        np.testing.assert_allclose(np.asarray(est.R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(est.t), 0.0, atol=1e-6)

    def test_vmap_batches(self, rng):
        B, N = 5, 128
        pts = jnp.asarray(rng.normal(0, 5, (B, N, 3)).astype(np.float32))
        taus = jnp.asarray(rng.normal(0, 0.3, (B, 6)).astype(np.float32))
        trues = jax.vmap(se3.exp)(taus)
        tgts = jax.vmap(se3.transform)(trues, pts)
        est = jax.vmap(weighted_olae)(pts, tgts, jnp.ones((B, N)))
        errs = jax.vmap(lambda a, b: se3.translation_norm(
            se3.compose(a, se3.inverse(b))))(est, trues)
        assert float(jnp.max(errs)) < 1e-3

    def test_large_rotation(self, rng):
        """CGR is singular only at exactly 180°; 120° must still work."""
        pts = jnp.asarray(rng.normal(0, 5, (200, 3)).astype(np.float32))
        tau = jnp.asarray([0.5, -1.0, 0.3, 0, 0, 2.1], jnp.float32)  # 120° yaw
        true = se3.exp(tau)
        est = weighted_olae(pts, se3.transform(true, pts), jnp.ones(200))
        err = float(se3.translation_norm(se3.compose(est, se3.inverse(true))))
        assert err < 1e-3


class TestSolverOLAEInICP:
    def test_reference_config_name(self, rng):
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.frontend.icp_config import icp_params_from_config
        from mola_fe_lidar_tpu.models.icp import align

        cfg = {
            "params": {"maxIterations": 30},
            "matchers": [{"class": "Matcher_Points_DistanceThreshold",
                          "params": {"distanceThreshold": 3.0}}],
            "solvers": [{"class": "Solver_OLAE"}],
            "quality": [{"class": "QualityEvaluator_PairedRatio",
                         "params": {"thresholdDistance": 0.3}}],
        }
        p = icp_params_from_config(cfg)
        assert p.solver.kind == "olae"

        n = 1024
        g = np.stack([rng.uniform(-20, 20, n // 2), rng.uniform(-20, 20, n // 2),
                      rng.normal(0, 0.02, n // 2)], -1)
        w_ = np.stack([rng.uniform(-20, 20, n // 2), np.full(n // 2, 20.0),
                       rng.uniform(0, 5, n // 2)], -1)
        world = np.concatenate([g, w_]).astype(np.float32)
        tau = jnp.asarray(rng.normal(0, 0.05, 6).astype(np.float32))
        true = se3.exp(tau)
        src = np.array(se3.transform(se3.inverse(true), jnp.asarray(world)))
        res = align({"raw": from_points(src, capacity=n)},
                    {"raw": from_points(world, capacity=n)},
                    se3.identity(), p)
        err = float(se3.translation_norm(se3.compose(res.pose, se3.inverse(true))))
        assert err < 0.02 and float(res.quality) > 0.8
