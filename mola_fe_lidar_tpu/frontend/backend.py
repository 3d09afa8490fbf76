"""SLAM back-end protocol (E8) — future-based async interface.

Rebuild of the mola-kernel BackEndBase contract the reference drives:
``addKeyFrame(ProposeKF_Input) → future<ProposeKF_Output>`` (reference
src/LidarOdometry.cpp:346-368), ``addFactor(Factor) → future`` (:435-455,
:818-830), ``advertiseUpdatedLocalization(...) → future`` (:484-491), and
the ``FactorRelativePose3`` payload with its fixed diagonal noise
(0.10 m / 1°, :444-445).

``InMemoryBackend`` is the recording implementation used by tests and
standalone replay (SURVEY.md §4.4 fake-backend pattern); a real back-end
(factor-graph optimizer) plugs in behind the same protocol.
"""

from __future__ import annotations

import itertools
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


@dataclass
class ProposeKFInput:
    timestamp: float
    observations: Optional[list] = None  # optional raw observations


@dataclass
class ProposeKFOutput:
    success: bool
    new_kf_id: Optional[int] = None


@dataclass
class FactorRelativePose3:
    """SE(3) relative-pose factor between two keyframes."""

    kf_from: int
    kf_to: int
    rel_pose: object  # geometry.se3.Pose (host-side, numpy-backed is fine)
    noise_model_diag_xyz: float = 0.10          # meters (reference :444)
    noise_model_diag_rot: float = np.deg2rad(1.0)  # radians (reference :445)


@dataclass
class AddFactorOutput:
    success: bool
    new_factor_id: Optional[int] = None


@dataclass
class AdvertiseLocalization:
    timestamp: float
    reference_kf: int
    pose: object  # geometry.se3.Pose


class BackEndBase:
    """Protocol: all calls return futures; the back-end runs elsewhere."""

    def add_keyframe(self, kf: ProposeKFInput) -> "Future[ProposeKFOutput]":
        raise NotImplementedError

    def add_factor(self, f: FactorRelativePose3) -> "Future[AddFactorOutput]":
        raise NotImplementedError

    def advertise_updated_localization(
        self, loc: AdvertiseLocalization
    ) -> "Future[None]":
        raise NotImplementedError


class InMemoryBackend(BackEndBase):
    """Thread-backed recording back-end: assigns ids, stores the factor
    stream for assertions, mirrors the reference's future semantics."""

    def __init__(self, max_workers: int = 1):
        self._pool = ThreadPoolExecutor(max_workers=max_workers,
                                        thread_name_prefix="backend")
        self._lock = threading.Lock()
        self._kf_ids = itertools.count(0)
        self._factor_ids = itertools.count(0)
        self.keyframes: Dict[int, ProposeKFInput] = {}
        self.factors: List[FactorRelativePose3] = []
        self.localizations: List[AdvertiseLocalization] = []
        # post-shutdown refusals (see _submit). Nonzero after a replay means
        # work arrived after shutdown and its output was DROPPED — pair with
        # the runner's `jobs_abandoned` metric when auditing a run.
        self.refused_after_shutdown = 0

    def _submit(self, work, refused):
        """Submit to the pool; after shutdown, refuse gracefully.

        THE POST-SHUTDOWN CONTRACT: once ``shutdown()`` has been called,
        every protocol call returns an already-resolved future whose value
        is the op's "not accepted" result (``accepted=False``, id ``-1``)
        and increments ``refused_after_shutdown``; nothing is recorded. A
        straggling front-end worker (e.g. a nearby-KF batch that outlived
        ``drain()``'s bounded wait) may call the protocol after the pool is
        closed. The reference's future-based protocol has no post-shutdown
        contract at all; raising out of the worker only spams the error
        log, so refuse visibly-but-gracefully instead."""
        try:
            return self._pool.submit(work)
        except RuntimeError:  # cannot schedule new futures after shutdown
            with self._lock:
                self.refused_after_shutdown += 1
            fut: Future = Future()
            fut.set_result(refused)
            return fut

    def add_keyframe(self, kf: ProposeKFInput) -> Future:
        def work():
            with self._lock:
                kf_id = next(self._kf_ids)
                self.keyframes[kf_id] = kf
            return ProposeKFOutput(True, kf_id)

        return self._submit(work, ProposeKFOutput(False, -1))

    def add_factor(self, f: FactorRelativePose3) -> Future:
        def work():
            with self._lock:
                fid = next(self._factor_ids)
                self.factors.append(f)
            return AddFactorOutput(True, fid)

        return self._submit(work, AddFactorOutput(False, -1))

    def advertise_updated_localization(self, loc: AdvertiseLocalization) -> Future:
        def work():
            with self._lock:
                self.localizations.append(loc)

        return self._submit(work, None)

    def shutdown(self):
        self._pool.shutdown(wait=True)


class OptimizingBackend(InMemoryBackend):
    """Pose-graph-optimizing back-end — the mola-slam-gtsam analogue.

    Records the factor stream like :class:`InMemoryBackend` and can
    globally optimize all keyframe poses with the device-resident SE(3)
    Levenberg-Marquardt engine (:mod:`..solve.pose_graph_gn`): the whole
    graph rides one jit-compiled dispatch over padded fixed-shape arrays
    (capacity-bucketed, one compile per bucket — the framework's standard
    shape policy).

    ``optimized_poses()`` is pull-based: call it whenever refined poses
    are wanted (e.g. after replay, or after each loop closure). The
    reference's protocol is fire-and-forget factor emission with the
    optimizer running elsewhere (reference src/LidarOdometry.cpp:435-455);
    pull-based optimization keeps that decoupling.
    """

    #: capacity buckets (nodes and edges round up to a multiple of this)
    BUCKET = 64

    def optimized_poses(self, iters: int = 30, robust: str = "none",
                        robust_delta: float = 2.0):
        """Return {kf_id: (R 3x3 f64, t 3 f64)} after global LM.

        Initial values come from composing factors in insertion order
        (odometry factors arrive first for each new node, so every node
        is reachable when its first factor lands).

        ``robust`` ("huber"/"cauchy") applies the IRLS M-estimator to
        NON-consecutive edges only (|kf_to - kf_from| > 1: nearby/loop-
        closure hypotheses) — odometry edges stay trusted, mirroring how
        a gtsam back-end attaches robust noise models to loop closures.
        """
        import numpy as np

        with self._lock:
            factors = list(self.factors)
        if not factors:
            return {}
        init = {}
        edges = []
        for f in factors:
            R = np.asarray(f.rel_pose.R, np.float64)
            t = np.asarray(f.rel_pose.t, np.float64)
            if not init:
                init[f.kf_from] = (np.eye(3), np.zeros(3))
            if f.kf_from in init and f.kf_to not in init:
                Ra, ta = init[f.kf_from]
                init[f.kf_to] = (Ra @ R, Ra @ t + ta)
            elif f.kf_to in init and f.kf_from not in init:
                Rb, tb = init[f.kf_to]
                init[f.kf_from] = (Rb @ R.T, tb - Rb @ R.T @ t)
            elif f.kf_from not in init and f.kf_to not in init:
                # disconnected component: anchor at identity
                init[f.kf_from] = (np.eye(3), np.zeros(3))
                Ra, ta = init[f.kf_from]
                init[f.kf_to] = (Ra @ R, Ra @ t + ta)
            edges.append((f.kf_from, f.kf_to, R, t,
                          1.0 / f.noise_model_diag_xyz ** 2,
                          1.0 / f.noise_model_diag_rot ** 2))

        import jax.numpy as jnp

        from ..solve.pose_graph_gn import optimize_pose_graph

        ids = sorted(init)
        index = {k: i for i, k in enumerate(ids)}
        bucket = self.BUCKET
        n_cap = max(bucket, -(-len(ids) // bucket) * bucket)
        e_cap = max(bucket, -(-len(edges) // bucket) * bucket)
        nodes_R = np.tile(np.eye(3, dtype=np.float32), (n_cap, 1, 1))
        nodes_t = np.zeros((n_cap, 3), np.float32)
        for k, i in index.items():
            nodes_R[i], nodes_t[i] = init[k]
        node_mask = np.zeros(n_cap, np.float32)
        node_mask[: len(ids)] = 1.0
        # padded edges must be finite: point them at node 0 w/ identity rel
        e_from = np.zeros(e_cap, np.int32)
        e_to = np.zeros(e_cap, np.int32)
        rel_R = np.tile(np.eye(3, dtype=np.float32), (e_cap, 1, 1))
        rel_t = np.zeros((e_cap, 3), np.float32)
        w_trans = np.zeros(e_cap, np.float32)
        w_rot = np.zeros(e_cap, np.float32)
        e_mask = np.zeros(e_cap, np.float32)
        e_robust = np.zeros(e_cap, np.float32)
        for e, (a, b, R, t, wt, wr) in enumerate(edges):
            e_from[e], e_to[e] = index[a], index[b]
            rel_R[e], rel_t[e] = R, t
            w_trans[e], w_rot[e] = wt, wr
            e_mask[e] = 1.0
            e_robust[e] = 1.0 if abs(b - a) > 1 else 0.0
        R_opt, t_opt, _ = optimize_pose_graph(
            jnp.asarray(nodes_R), jnp.asarray(nodes_t),
            jnp.asarray(node_mask), jnp.asarray(e_from), jnp.asarray(e_to),
            jnp.asarray(rel_R), jnp.asarray(rel_t), jnp.asarray(w_trans),
            jnp.asarray(w_rot), jnp.asarray(e_mask), iters=iters,
            robust=robust, robust_delta=robust_delta,
            e_robust=jnp.asarray(e_robust))
        R_opt = np.asarray(R_opt, np.float64)
        t_opt = np.asarray(t_opt, np.float64)
        from ..geometry import se3_np
        return {k: (se3_np.orthonormalize(R_opt[i]), t_opt[i])
                for k, i in index.items()}
