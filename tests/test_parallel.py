"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY §4.5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.models import ICPParams, Matcher, PairWeights, Quality, Solver, align
from mola_fe_lidar_tpu.parallel import (
    batched_align, default_mesh, make_batched_align, make_dp_tp_align,
    make_mesh, make_sharded_align, monte_carlo_guesses, pad_batch, shard_batch,
)
from tests.test_icp import structured_world

P2P = ICPParams(
    max_iterations=25,
    matchers=(Matcher(kind="point2point", distance_threshold=2.0),),
    solver=Solver(kind="horn"),
    weights=PairWeights(use_scale_outlier_detector=False),
)

P2PLANE_KNN = ICPParams(
    max_iterations=15,
    matchers=(Matcher(kind="point2plane_knn", distance_threshold=2.0, knn=6,
                      plane_eigen_threshold=0.1),),
    solver=Solver(kind="gauss_newton", max_iterations=8),
    weights=PairWeights(use_scale_outlier_detector=False),
)


def batch_of_pairs(rng, B=8, cap=512):
    """B independent scan pairs with known true poses."""
    srcs, tgts, trues = [], [], []
    for b in range(B):
        world = structured_world(rng, n=cap)
        tau = rng.normal(0, 0.1, 6).astype(np.float32)
        true = se3.exp(jnp.asarray(tau))
        src_pts = np.array(se3.transform(se3.inverse(true), jnp.asarray(world)))
        srcs.append({"raw": from_points(src_pts, capacity=cap)})
        tgts.append({"raw": from_points(world, capacity=cap)})
        trues.append(true)
    stack = lambda trees: jax.tree.map(lambda *x: jnp.stack(x), *trees)
    return stack(srcs), stack(tgts), stack(trues)


def assert_poses_close(est, true, atol_t=2e-2, atol_r=5e-3):
    d = jax.vmap(lambda a, b: se3.log(se3.compose(a, se3.inverse(b))))(est, true)
    d = np.asarray(d)
    assert np.all(np.linalg.norm(d[:, :3], axis=-1) < atol_t), d
    assert np.all(np.linalg.norm(d[:, 3:], axis=-1) < atol_r), d


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8

    def test_make_mesh_2d(self):
        m = make_mesh({"data": 4, "model": 2})
        assert m.axis_names == ("data", "model")
        assert m.devices.shape == (4, 2)

    def test_pad_batch(self, rng):
        tree = {"x": jnp.zeros((5, 3))}
        padded, b = pad_batch(tree, 8)
        assert padded["x"].shape == (8, 3) and b == 5


class TestDataParallel:
    def test_vmap_matches_loop(self, rng):
        srcs, tgts, trues = batch_of_pairs(rng, B=4)
        res = batched_align(srcs, tgts, se3.identity((4,)), P2P)
        assert_poses_close(res.pose, trues)
        # element 0 equals unbatched align
        one = align(jax.tree.map(lambda x: x[0], srcs),
                    jax.tree.map(lambda x: x[0], tgts), se3.identity(), P2P)
        np.testing.assert_allclose(np.asarray(res.pose.t[0]),
                                   np.asarray(one.pose.t), atol=1e-5)

    def test_sharded_batch_over_mesh(self, rng):
        mesh = default_mesh()
        srcs, tgts, trues = batch_of_pairs(rng, B=8)
        srcs = shard_batch(mesh, srcs)
        tgts = shard_batch(mesh, tgts)
        guesses = shard_batch(mesh, se3.identity((8,)))
        f = make_batched_align(P2P, mesh)
        res = f(srcs, tgts, guesses)
        assert_poses_close(res.pose, trues)
        # result really is sharded over the mesh
        assert len(res.quality.sharding.device_set) == 8

    def test_monte_carlo_guesses(self, rng):
        center = se3.from_xyz_ypr(1.0, 2.0, 0.0, 0.3, 0, 0)
        g = monte_carlo_guesses(jax.random.key(0), center, 10, 3.0, 0.035)
        assert g.t.shape == (10, 3)
        spread = np.std(np.asarray(g.t), axis=0)
        assert np.all(spread > 0.5)  # xyz actually perturbed
        # yaw-only: roll/pitch of delta are ~0
        rel = jax.vmap(lambda p: se3.log(se3.compose(se3.inverse(center), p)))(g)
        rel = np.asarray(rel)
        assert np.allclose(rel[:, 3:5], 0.0, atol=1e-6)
        assert np.std(rel[:, 5]) > 1e-3


class TestTensorParallel:
    def test_tp_align_matches_single(self, rng):
        mesh = make_mesh({"model": 8})
        world = structured_world(rng, n=1024)
        true = se3.exp(jnp.asarray(rng.normal(0, 0.08, 6).astype(np.float32)))
        src_pts = np.array(se3.transform(se3.inverse(true), jnp.asarray(world)))
        src = {"raw": from_points(src_pts, capacity=1024)}
        tgt = {"raw": from_points(world, capacity=1024)}
        tp = make_sharded_align(mesh, P2P)
        res_tp = tp(src, tgt, se3.identity())
        res_1 = align(src, tgt, se3.identity(), P2P)
        np.testing.assert_allclose(np.asarray(res_tp.pose.t),
                                   np.asarray(res_1.pose.t), atol=1e-4)
        np.testing.assert_allclose(float(res_tp.quality), float(res_1.quality), atol=1e-5)

    def test_tp_knn_matcher(self, rng):
        mesh = make_mesh({"model": 4})
        world = structured_world(rng, n=512)
        true = se3.exp(jnp.asarray(rng.normal(0, 0.05, 6).astype(np.float32)))
        src_pts = np.array(se3.transform(se3.inverse(true), jnp.asarray(world)))
        src = {"raw": from_points(src_pts, capacity=512)}
        tgt = {"raw": from_points(world, capacity=512)}
        tp = make_sharded_align(mesh, P2PLANE_KNN)
        res_tp = tp(src, tgt, se3.identity())
        res_1 = align(src, tgt, se3.identity(), P2PLANE_KNN)
        np.testing.assert_allclose(np.asarray(res_tp.pose.t),
                                   np.asarray(res_1.pose.t), atol=2e-3)


class TestDpTp:
    def test_dp_tp_grid(self, rng):
        mesh = make_mesh({"data": 4, "model": 2})
        srcs, tgts, trues = batch_of_pairs(rng, B=4)
        f = make_dp_tp_align(mesh, P2P)
        res = f(srcs, tgts, se3.identity((4,)))
        assert_poses_close(res.pose, trues)
