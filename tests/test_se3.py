"""Unit tests for the SE(3) core (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mola_fe_lidar_tpu.geometry import se3, twist as twist_mod


def random_tau(rng, n=None, scale_t=2.0, scale_r=1.5):
    shape = (6,) if n is None else (n, 6)
    tau = rng.standard_normal(shape).astype(np.float32)
    tau[..., :3] *= scale_t
    tau[..., 3:] *= scale_r / np.maximum(1.0, np.linalg.norm(tau[..., 3:], axis=-1, keepdims=True))
    return jnp.asarray(tau)


def assert_pose_close(a, b, atol=1e-4):
    np.testing.assert_allclose(np.asarray(a.R), np.asarray(b.R), atol=atol)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=atol)


class TestExpLog:
    def test_exp_log_roundtrip(self, rng):
        tau = random_tau(rng, 64)
        tau2 = se3.log(se3.exp(tau))
        np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau), atol=2e-3)

    def test_log_exp_roundtrip(self, rng):
        tau = random_tau(rng, 32)
        p = se3.exp(tau)
        assert_pose_close(se3.exp(se3.log(p)), p, atol=2e-4)

    def test_exp_zero_is_identity(self):
        p = se3.exp(jnp.zeros(6))
        assert_pose_close(p, se3.identity())

    def test_small_angle(self):
        tau = jnp.array([0.1, -0.2, 0.3, 1e-6, -1e-6, 1e-7])
        tau2 = se3.log(se3.exp(tau))
        np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau), atol=1e-6)

    def test_near_pi_rotation(self):
        for axis in ([1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0.6, 0.8, 0.0]):
            w = (np.pi - 1e-4) * np.array(axis, dtype=np.float32)
            tau = jnp.concatenate([jnp.array([0.5, -1.0, 2.0]), jnp.asarray(w)])
            p = se3.exp(tau)
            assert_pose_close(se3.exp(se3.log(p)), p, atol=5e-3)

    def test_rotation_is_orthonormal(self, rng):
        p = se3.exp(random_tau(rng, 16))
        RtR = np.einsum("nij,nik->njk", np.asarray(p.R), np.asarray(p.R))
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)

    def test_no_nan_gradients_at_zero(self):
        g = jax.grad(lambda tau: jnp.sum(se3.exp(tau).t))(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))


class TestGroupOps:
    def test_compose_inverse(self, rng):
        a, b = se3.exp(random_tau(rng)), se3.exp(random_tau(rng))
        assert_pose_close(se3.compose(a, se3.inverse(a)), se3.identity())
        # (a∘b)⁻¹ = b⁻¹∘a⁻¹
        assert_pose_close(
            se3.inverse(se3.compose(a, b)),
            se3.compose(se3.inverse(b), se3.inverse(a)),
        )

    def test_relative_to(self, rng):
        a, b = se3.exp(random_tau(rng)), se3.exp(random_tau(rng))
        rel = se3.relative_to(a, b)  # a in frame of b
        assert_pose_close(se3.compose(b, rel), a)

    def test_transform_matches_matrix(self, rng):
        p = se3.exp(random_tau(rng))
        pts = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
        out = se3.transform(p, pts)
        expect = np.asarray(pts) @ np.asarray(p.R).T + np.asarray(p.t)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_matrix_roundtrip(self, rng):
        p = se3.exp(random_tau(rng))
        assert_pose_close(se3.from_matrix(se3.to_matrix(p)), p)

    def test_ypr_roundtrip(self):
        p = se3.from_xyz_ypr(1.0, 2.0, 3.0, 0.4, -0.3, 0.9)
        x, y, z, yaw, pitch, roll = se3.to_xyz_ypr(p)
        np.testing.assert_allclose(
            [x, y, z, yaw, pitch, roll], [1.0, 2.0, 3.0, 0.4, -0.3, 0.9], atol=1e-5
        )

    def test_rotation_angle(self):
        # KF rotation-magnitude predicate (reference src/LidarOdometry.cpp:324-327)
        p = se3.from_xyz_ypr(0, 0, 0, 0.5, 0, 0)
        np.testing.assert_allclose(float(se3.rotation_angle(p)), 0.5, atol=1e-5)

    def test_translation_norm(self):
        p = se3.from_xyz_ypr(3.0, 4.0, 0.0, 0, 0, 0)
        np.testing.assert_allclose(float(se3.translation_norm(p)), 5.0, atol=1e-6)


class TestTwist:
    def test_roundtrip(self, rng):
        tau = random_tau(rng)
        dt = 0.25
        rel = se3.exp(tau * dt)
        tw = twist_mod.twist_from_delta(rel, dt)
        np.testing.assert_allclose(np.asarray(tw), np.asarray(tau), atol=1e-3)
        rel2 = twist_mod.propagate_pose(tw, dt)
        assert_pose_close(rel2, rel, atol=1e-4)

    def test_zero_dt_gives_zero_twist(self, rng):
        tw = twist_mod.twist_from_delta(se3.exp(random_tau(rng)), 0.0)
        np.testing.assert_allclose(np.asarray(tw), 0.0)


class TestJitVmap:
    def test_vmap_exp(self, rng):
        tau = random_tau(rng, 8)
        batched = jax.vmap(se3.exp)(tau)
        single = se3.exp(tau)  # broadcasting path
        assert_pose_close(batched, single)

    def test_jit_compose_transform(self, rng):
        @jax.jit
        def f(tau, pts):
            p = se3.exp(tau)
            return se3.transform(se3.compose(p, se3.inverse(p)), pts)

        pts = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(f(random_tau(rng), pts)), np.asarray(pts), atol=1e-5)


class TestSe3NumpyMirror:
    """geometry.se3_np must match the jax implementation — it runs the
    frontend's per-scan host bookkeeping."""

    def test_exp_matches_jax(self, rng):
        from mola_fe_lidar_tpu.geometry import se3_np
        for _ in range(20):
            tau = rng.standard_normal(6) * 0.5
            Rj = np.asarray(se3.exp(jnp.asarray(tau, jnp.float32)).R)
            tj = np.asarray(se3.exp(jnp.asarray(tau, jnp.float32)).t)
            Rn, tn = se3_np.exp(tau)
            np.testing.assert_allclose(Rn, Rj, atol=1e-5)
            np.testing.assert_allclose(tn, tj, atol=1e-5)

    def test_log_matches_jax(self, rng):
        from mola_fe_lidar_tpu.geometry import se3_np
        for _ in range(20):
            tau = rng.standard_normal(6) * 0.5
            p = se3.exp(jnp.asarray(tau, jnp.float32))
            tau_j = np.asarray(se3.log(p))
            tau_n = se3_np.log(np.asarray(p.R, float), np.asarray(p.t, float))
            np.testing.assert_allclose(tau_n, tau_j, atol=1e-4)

    def test_log_small_angle(self):
        from mola_fe_lidar_tpu.geometry import se3_np
        # the f32 cliff region that bit se3.log (theta ~ 1e-4)
        tau = np.array([0.3, 0.1, 0.0, 0.0, 0.0, 1e-4])
        R, t = se3_np.exp(tau)
        back = se3_np.log(R, t)
        np.testing.assert_allclose(back, tau, atol=1e-8)
        assert np.all(np.isfinite(back))

    def test_compose_inverse(self, rng):
        from mola_fe_lidar_tpu.geometry import se3_np
        a = se3_np.exp(rng.standard_normal(6) * 0.4)
        b = se3_np.exp(rng.standard_normal(6) * 0.4)
        ab = se3_np.compose(a, b)
        ident = se3_np.compose(se3_np.inverse(a), se3_np.compose(a, b))
        np.testing.assert_allclose(ident[0], b[0], atol=1e-12)
        np.testing.assert_allclose(ident[1], b[1], atol=1e-12)

    def test_rotation_angle(self):
        from mola_fe_lidar_tpu.geometry import se3_np
        R, _ = se3_np.exp(np.array([0, 0, 0, 0, 0, 0.7]))
        np.testing.assert_allclose(se3_np.rotation_angle(R), 0.7, atol=1e-10)

    def test_orthonormalize_projects_f32_drift(self, rng):
        """Chaining f32 device rotations drifts det(R) off 1; the SO(3)
        projection at _np_pose must cap the error at one align's level
        (the replay regression: det 0.9985 after 500 scans unchecked)."""
        from mola_fe_lidar_tpu.geometry import se3_np
        def noisy_rot():
            # a device align's rotation: ~1e-5 orthonormality error from
            # up to 100 f32 retraction composes inside the ICP loop
            R, _ = se3_np.exp(rng.standard_normal(6) * 0.02)
            return (R + rng.normal(0, 1e-5, (3, 3))).astype(np.float32)
        noise = [noisy_rot() for _ in range(500)]
        W = np.eye(3)
        for R in noise:
            W = W @ R  # unprojected chain
        drift = abs(np.linalg.det(W) - 1.0)
        assert drift > 1e-6  # the disease is real
        W = np.eye(3)
        for R in noise:
            W = W @ se3_np.orthonormalize(R)
            W = se3_np.orthonormalize(W)
        np.testing.assert_allclose(np.linalg.det(W), 1.0, atol=1e-12)
        np.testing.assert_allclose(W.T @ W, np.eye(3), atol=1e-12)

    def test_orthonormalize_identity_on_clean_rotation(self, rng):
        from mola_fe_lidar_tpu.geometry import se3_np
        R, _ = se3_np.exp(rng.standard_normal(6))
        np.testing.assert_allclose(se3_np.orthonormalize(R), R, atol=1e-13)
