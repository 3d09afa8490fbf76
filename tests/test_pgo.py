"""Pose-graph optimization (solve/pose_graph_gn.py + OptimizingBackend).

The device LM engine is checked against an independent scipy
least-squares solution of the same objective, for gauge handling,
padding invariance, and end-to-end through the replay runner.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mola_fe_lidar_tpu.geometry import se3_np
from mola_fe_lidar_tpu.solve.pose_graph_gn import optimize_pose_graph

W_T = 1.0 / 0.1 ** 2
W_R = 1.0 / np.deg2rad(1.0) ** 2


def _square_loop(rng, n=8, noise=0.03):
    """Noisy odometry chain around a square + one exact loop closure.

    Returns (init_poses, gt_poses, edges) with edges =
    [(i, j, R, t, w_trans, w_rot), ...] and rel = X_i^-1 X_j.
    """
    gt = [(np.eye(3), np.zeros(3))]
    taus = []
    for k in range(n - 1):
        tau = np.array([2.0, 0, 0, 0, 0, np.pi / 4 if k % 2 else 0.0])
        taus.append(tau)
        gt.append(se3_np.compose(gt[-1], se3_np.exp(tau)))
    init = [(np.eye(3), np.zeros(3))]
    edges = []
    for k, tau in enumerate(taus):
        R, t = se3_np.exp(tau + rng.normal(0, noise, 6))
        edges.append((k, k + 1, R, t, W_T, W_R))
        init.append(se3_np.compose(init[-1], (R, t)))
    Rlc, tlc = se3_np.compose(se3_np.inverse(gt[-1]), gt[0])
    edges.append((n - 1, 0, Rlc, tlc, W_T, W_R))
    return init, gt, edges


def _pack(init, edges, n_cap=None, e_cap=None):
    n = len(init)
    n_cap = n_cap or n
    e_cap = e_cap or len(edges)
    nodes_R = np.tile(np.eye(3, dtype=np.float32), (n_cap, 1, 1))
    nodes_t = np.zeros((n_cap, 3), np.float32)
    for i, (R, t) in enumerate(init):
        nodes_R[i], nodes_t[i] = R, t
    node_mask = np.zeros(n_cap, np.float32)
    node_mask[:n] = 1.0
    e_from = np.zeros(e_cap, np.int32)
    e_to = np.zeros(e_cap, np.int32)
    rel_R = np.tile(np.eye(3, dtype=np.float32), (e_cap, 1, 1))
    rel_t = np.zeros((e_cap, 3), np.float32)
    w_t = np.zeros(e_cap, np.float32)
    w_r = np.zeros(e_cap, np.float32)
    e_mask = np.zeros(e_cap, np.float32)
    for e, (a, b, R, t, wt, wr) in enumerate(edges):
        e_from[e], e_to[e] = a, b
        rel_R[e], rel_t[e] = R, t
        w_t[e], w_r[e] = wt, wr
        e_mask[e] = 1.0
    return tuple(jnp.asarray(x) for x in (
        nodes_R, nodes_t, node_mask, e_from, e_to, rel_R, rel_t,
        w_t, w_r, e_mask))


def _cost_np(poses, edges):
    c = 0.0
    for a, b, R, t, wt, wr in edges:
        err = se3_np.compose(se3_np.inverse((R, t)),
                             se3_np.compose(se3_np.inverse(poses[a]),
                                            poses[b]))
        r = se3_np.log(*err)
        c += wt * float(r[:3] @ r[:3]) + wr * float(r[3:] @ r[3:])
    return c


class TestOptimizer:
    def test_closes_the_loop(self, rng):
        init, gt, edges = _square_loop(rng)
        R, t, cost = optimize_pose_graph(*_pack(init, edges), iters=25)
        R, t = np.asarray(R, float), np.asarray(t, float)
        opt = [(R[i], t[i]) for i in range(len(init))]
        lc = edges[-1]
        def gap(ps):
            pred0 = se3_np.compose(ps[lc[0]], (lc[2], lc[3]))
            return float(np.linalg.norm(pred0[1] - ps[lc[1]][1]))
        assert gap(opt) < 0.3 * gap(init)
        assert _cost_np(opt, edges) < 0.2 * _cost_np(init, edges)

    def test_gauge_node_fixed(self, rng):
        init, _, edges = _square_loop(rng)
        R, t, _ = optimize_pose_graph(*_pack(init, edges), iters=25)
        np.testing.assert_allclose(np.asarray(t)[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)

    def test_matches_scipy_least_squares(self, rng):
        """Independent optimum: scipy on the identical weighted objective
        (nodes 1..N-1 parametrized by right-tangent around init)."""
        from scipy.optimize import least_squares

        init, _, edges = _square_loop(rng, n=5)
        n = len(init)

        def unpack(x):
            poses = [init[0]]
            for i in range(1, n):
                poses.append(se3_np.compose(init[i], se3_np.exp(x[6*(i-1):6*i])))
            return poses

        def resid(x):
            poses = unpack(x)
            out = []
            for a, b, R, t, wt, wr in edges:
                err = se3_np.compose(
                    se3_np.inverse((R, t)),
                    se3_np.compose(se3_np.inverse(poses[a]), poses[b]))
                r = se3_np.log(*err)
                out.extend(np.sqrt(wt) * r[:3])
                out.extend(np.sqrt(wr) * r[3:])
            return np.array(out)

        ref = least_squares(resid, np.zeros(6 * (n - 1)), method="lm")
        ref_cost = 2.0 * ref.cost  # scipy cost = 0.5 * sum r^2
        R, t, cost = optimize_pose_graph(*_pack(init, edges), iters=30)
        opt = [(np.asarray(R, float)[i], np.asarray(t, float)[i])
               for i in range(n)]
        ours = _cost_np(opt, edges)
        # same optimum to f32 tolerance (relative; costs are O(1..10))
        np.testing.assert_allclose(ours, ref_cost, rtol=0.05, atol=1e-3)
        ref_poses = unpack(ref.x)
        for i in range(n):
            np.testing.assert_allclose(opt[i][1], ref_poses[i][1], atol=0.02)

    def test_padding_invariance(self, rng):
        init, _, edges = _square_loop(rng)
        R1, t1, c1 = optimize_pose_graph(*_pack(init, edges), iters=25)
        R2, t2, c2 = optimize_pose_graph(
            *_pack(init, edges, n_cap=64, e_cap=64), iters=25)
        n = len(init)
        np.testing.assert_allclose(np.asarray(t1)[:n], np.asarray(t2)[:n],
                                   atol=1e-5)
        np.testing.assert_allclose(float(c1), float(c2), rtol=1e-4, atol=1e-5)


class TestOptimizingBackend:
    def test_optimized_poses_from_factor_stream(self, rng):
        from mola_fe_lidar_tpu.frontend.backend import (
            FactorRelativePose3, OptimizingBackend)
        from mola_fe_lidar_tpu.geometry import se3

        init, gt, edges = _square_loop(rng)
        be = OptimizingBackend()
        for _ in range(len(init)):
            be.add_keyframe(__import__(
                "mola_fe_lidar_tpu.frontend.backend",
                fromlist=["ProposeKFInput"]).ProposeKFInput(0.0)).result()
        for a, b, R, t, _, _ in edges:
            be.add_factor(FactorRelativePose3(
                kf_from=a, kf_to=b,
                rel_pose=se3.Pose(jnp.asarray(R, jnp.float32),
                                  jnp.asarray(t, jnp.float32)))).result()
        poses = be.optimized_poses()
        assert set(poses) == set(range(len(init)))
        opt = [poses[i] for i in range(len(init))]
        assert _cost_np(opt, edges) < 0.2 * _cost_np(init, edges)
        # orthonormal output
        for R, _t in opt:
            np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-9)
        be.shutdown()

    def test_replay_reports_pgo_rows(self):
        """End-to-end: circle replay with loop closure, pgo=True adds
        ate_rmse_pgo / ate_rmse_scan_pgo rows in the same ballpark as the
        Dijkstra estimate (tiny graph, low noise: no big win expected,
        but the rows must exist and be finite/sane)."""
        from mola_fe_lidar_tpu.obs.runner import run_replay
        from mola_fe_lidar_tpu.obs.synthetic import (
            SyntheticWorld, synthetic_sequence)
        import test_frontend

        world = SyntheticWorld(extent=60.0, n_world_points=60_000,
                               points_per_scan=4096, max_range=35.0, seed=3)
        obs, gt = synthetic_sequence(kind="circle", n_scans=30, speed=2.0,
                                     rate_hz=2.0, world=world)
        res = run_replay(obs, test_frontend.odom_test_cfg(), gt_poses=gt,
                         pgo=True)
        assert "ate_rmse_pgo" in res and "ate_rmse_scan_pgo" in res
        assert np.isfinite(res["ate_rmse_pgo"])
        assert res["ate_rmse_pgo"] < 2.0 * res["ate_rmse"] + 0.05
        # the optimized poses ride the result regardless of gt (the CLI's
        # --out export path reads them)
        assert set(res["kf_poses_pgo"]) == set(res["kf_poses"])
        res["module"].shutdown()


class TestRobustPGO:
    def test_wrong_loop_closure_soft_disabled(self, rng):
        """A FALSE loop closure (identity rel between far-apart nodes) must
        not bend the trajectory under the Huber/Cauchy IRLS kernels, while
        plain L2 visibly distorts it (the gtsam robust-noise-model
        analogue; kernel applies per-edge via e_robust)."""
        init, gt, edges = _square_loop(rng, n=12, noise=0.02)
        n = len(init)
        # the false hypothesis: node 3 and node 9 "coincide" (they don't)
        bad = (3, 9, np.eye(3), np.zeros(3), W_T, W_R)
        all_edges = edges + [bad]
        args = _pack(init, all_edges)
        e_robust = np.zeros(len(all_edges), np.float32)
        e_robust[-2] = 1.0  # the true LC
        e_robust[-1] = 1.0  # the false LC
        ate = lambda t_opt: float(np.sqrt(np.mean(np.sum(
            (np.asarray(t_opt, np.float64)[:n]
             - np.stack([t for _, t in gt])) ** 2, -1))))

        _, t_l2, _ = optimize_pose_graph(*args, iters=40)
        _, t_hub, _ = optimize_pose_graph(
            *args, iters=40, robust="huber",
            e_robust=jnp.asarray(e_robust))
        _, t_cau, _ = optimize_pose_graph(
            *args, iters=40, robust="cauchy",
            e_robust=jnp.asarray(e_robust))
        # reference: the clean graph without the false edge
        _, t_ref, _ = optimize_pose_graph(*_pack(init, edges), iters=40)

        assert ate(t_l2) > 3.0 * ate(t_ref), "L2 should visibly distort"
        # Huber decays only linearly in the residual: a strong gross
        # outlier is attenuated, not eliminated; Cauchy (quadratic decay)
        # effectively disables it
        assert ate(t_hub) < 0.75 * ate(t_l2)
        assert ate(t_cau) < 1.5 * ate(t_ref) + 0.05

    def test_robust_keeps_true_loop_closure_effective(self, rng):
        """The kernel must not ALSO disable the correct loop closure: with
        robust on and no outliers, the result matches plain L2."""
        init, gt, edges = _square_loop(rng, n=10, noise=0.03)
        args = _pack(init, edges)
        e_robust = np.zeros(len(edges), np.float32)
        e_robust[-1] = 1.0
        _, t_l2, c_l2 = optimize_pose_graph(*args, iters=30)
        _, t_hub, c_hub = optimize_pose_graph(
            *args, iters=30, robust="huber",
            e_robust=jnp.asarray(e_robust))
        np.testing.assert_allclose(np.asarray(t_hub), np.asarray(t_l2),
                                   atol=0.02)

    def test_backend_robust_flag(self, rng):
        from mola_fe_lidar_tpu.frontend.backend import (
            FactorRelativePose3, OptimizingBackend, ProposeKFInput)
        from mola_fe_lidar_tpu.geometry import se3

        init, gt, edges = _square_loop(rng, n=8, noise=0.02)
        be = OptimizingBackend()
        for _ in range(len(init)):
            be.add_keyframe(ProposeKFInput(0.0)).result()
        for a, b, R, t, _, _ in edges:
            be.add_factor(FactorRelativePose3(
                kf_from=a, kf_to=b,
                rel_pose=se3.Pose(jnp.asarray(R, jnp.float32),
                                  jnp.asarray(t, jnp.float32)))).result()
        # a false LC factor between distant keyframes
        be.add_factor(FactorRelativePose3(
            kf_from=1, kf_to=6, rel_pose=se3.Pose(
                jnp.eye(3), jnp.zeros(3)))).result()
        plain = be.optimized_poses()
        rob = be.optimized_poses(robust="huber")
        gt_t = np.stack([t for _, t in gt])
        ate = lambda poses: float(np.sqrt(np.mean(np.sum(
            np.stack([poses[i][1] for i in range(len(gt))]) - gt_t, -1) ** 2)))
        assert ate(rob) < ate(plain)
        be.shutdown()
