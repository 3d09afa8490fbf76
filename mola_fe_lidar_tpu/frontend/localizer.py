"""Map-based localization: align scans against an aggregated keyframe map.

The reference front-end only ever aligns scan pairs; once a map exists the
natural production query is "where am I in the MAP" — which is exactly the
regime the voxel-hash grid index targets (ops/grid_nn.py: build once over a
large cloud, query scan-sized batches). This module aggregates keyframe
clouds from a WorldModel (or any (pose, cloud) list) into one padded map
cloud, downsamples it, and serves `localize(scan, init)` calls through the
standard ICP engine.

Acceptance gating (VERDICT r3 #6): paired-ratio quality is blind to
self-similar aliasing — a query snapped to the WRONG urban block can score
inside the correct-quality band (observed: 3.56 m error at quality 0.80,
docs/localize_tp.json r2). ``localize`` therefore runs a MULTI-START
RIVAL-BASIN probe: one vmapped batch of coarse→fine aligns started from a
deterministic star of displaced copies of the SOLUTION (a single device
dispatch — the TPU-native answer to the reference's TODO'd finite-
difference quality check, reference src/LidarOdometry.cpp:891). The
verdict is a peak-to-second-peak test: a probe counts AGAINST the answer
only when it settles in a DIFFERENT basin with COMPARABLE quality
(≥ ``alias_quality_ratio`` × the solution's). Probes that re-converge to
the solution confirm it; probes that stall in featureless terrain at low
quality are inconclusive and do NOT reject (measured: in a dense unique
world, ICP's capture radius is well under the probe radius — demanding
re-convergence would veto every query; what distinguishes a true alias is
that the rival basin SCORES like the real one, grid-world measurement in
tests/test_localizer.py).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from ..cloud.metric_map import MetricMap, PointCloud, from_points, to_numpy
from ..geometry import se3
from ..models.config import ICPParams, Matcher, PairWeights, Quality, Solver
from ..models.icp import ICPResult, align
from .worldmodel import ANNOTATION_NAME_PC_LAYERS, WorldModel


def default_localize_params(cell: float = 1.0) -> ICPParams:
    """Point-to-point ICP sized for scan-vs-map queries ("auto" NN backend:
    the fused Pallas kernel on TPU — measured faster than the grid index
    even at 131k-point maps, docs/nn_crossover.json). Candidate-cached
    matching (cand_k=4): against a 131k-point map the per-iteration full
    1-NN dominates query latency; a top-4 refresh every 4 iterations +
    O(N*4) re-argmin preserves the same local reassignment (same design
    as the scan-to-map odometry default, measured faster AND slightly
    more accurate there — docs/accuracy.md ablations). Refreshes are
    motion-conditional (cand_refresh_min_*): localize() is unbatched, so
    the lax.cond takes a real branch and the convergence tail skips the
    O(N*M) full-map refresh once the pose settles within 2 cm/1 mrad."""
    return ICPParams(
        max_iterations=30,
        cand_refresh=4,
        # NO motion-conditional refresh: it froze candidate recruiting on
        # map queries exactly as the odometry ablation predicted
        # (docs/accuracy.md) — measured here as 0.1-0.5 m base-query
        # errors that the gate's own probes (which strip the conditional
        # refresh) then out-scored from 1 m away, rejecting every query
        # as "inconsistent". With full block-head refreshes the base
        # align converges like the probes and the verdict is about the
        # MAP's ambiguity again, not the solver's.
        matchers=(Matcher(kind="point2point", distance_threshold=cell,
                          nn_backend="auto", cand_k=4),),
        solver=Solver(kind="horn"),
        quality=(Quality(threshold_distance=0.3),),
        weights=PairWeights(use_scale_outlier_detector=False),
    )


class LocalizeResult(NamedTuple):
    """Gated localization answer: the best-start ICP result plus the
    multi-start consistency verdict. ``accepted=False`` means DO NOT trust
    ``pose`` — ``reject_reason`` says why ("quality" / "consistency" /
    "correction")."""

    pose: se3.Pose
    cov: np.ndarray
    quality: float
    n_iterations: int
    term_reason: int
    accepted: bool
    n_agree: int          # starts that re-converged to the solution basin
    n_compete: int        # probes in a DIFFERENT basin at comparable quality
    n_starts: int
    rival_quality: float  # best quality among non-agreeing probes (0 if none)
    dispersion_m: float   # median translation spread of probes vs solution
    correction_m: float   # |best pose ⊖ init| translation
    reject_reason: str    # "" when accepted


class MapLocalizer:
    """Aggregate keyframe clouds into one map; localize scans against it."""

    def __init__(self, map_capacity: int = 1 << 17, voxel_size: float = 0.5,
                 layer: str = "raw", params: Optional[ICPParams] = None,
                 multi_start: int = 11, start_sigma_xyz: float = 3.0,
                 start_sigma_rot: float = np.deg2rad(5.0),
                 agree_tol_m: float = 1.5,
                 agree_tol_rot: float = np.deg2rad(3.0),
                 alias_quality_ratio: float = 0.7,
                 yaw_probe: float = np.pi / 2,
                 min_quality: float = 0.5,
                 max_correction_m: float = 8.0):
        """``multi_start`` counts the solution itself plus the probes: the
        first 8 probes form the deterministic star {±σ, ±2σ}·{x̂, ŷ} (σ =
        ``start_sigma_xyz``, sized to the caller's init uncertainty /
        plausible alias distance), probes 9–10 are pure-yaw ±``yaw_probe``
        (city-grid 90° rotational aliasing), further probes are Gaussian.
        ``alias_quality_ratio`` is the peak-to-second-peak rejection bar.

        ``agree_tol_m``/``agree_tol_rot`` define "same basin". On a
        voxel-subsampled map the paired-ratio surface is a PLATEAU at the
        sub-meter scale (0.5 m map voxel + 0.3 m pairing threshold ⇒
        re-converged probes scatter ~0.8-1.5 m / 1-2° around the answer
        with comparable quality — measured, docs/localize_tp.json r5), so
        the tolerance must cover that scatter; genuine urban aliases sit
        several meters/90° away. Size ``start_sigma_xyz`` to the CALLER's
        prior uncertainty: the gate answers "is the pose determined by
        the data within the prior's support" — probing far beyond the
        prior asks about basins the prior already excludes, and a sloppy
        prior (large σ) buys correspondingly wider rival coverage."""
        self.map_capacity = int(map_capacity)
        self.voxel_size = float(voxel_size)
        self.layer = layer
        self.params = params or default_localize_params()
        self.multi_start = int(multi_start)
        self.start_sigma_xyz = float(start_sigma_xyz)
        self.start_sigma_rot = float(start_sigma_rot)
        self.agree_tol_m = float(agree_tol_m)
        self.agree_tol_rot = float(agree_tol_rot)
        self.alias_quality_ratio = float(alias_quality_ratio)
        self.yaw_probe = float(yaw_probe)
        self.min_quality = float(min_quality)
        self.max_correction_m = float(max_correction_m)
        self._map: Optional[MetricMap] = None
        self._batched = {}  # (params, scan shapes) -> compiled vmapped align

    # -- map construction --------------------------------------------------
    @staticmethod
    def _voxel_first_np(points: np.ndarray, res: float) -> np.ndarray:
        """Host-side exact "first point per voxel" dedup."""
        if len(points) == 0:
            return points
        from ..cloud.voxel import voxel_first_indices_np
        return points[voxel_first_indices_np(points, res)]

    def build(self, clouds_and_poses: List[Tuple[MetricMap, Tuple[np.ndarray, np.ndarray]]]) -> None:
        """Aggregate (cloud, world_pose) pairs into the map frame.

        Each keyframe cloud is voxel-deduped in the world frame BEFORE
        concatenation, so an over-capacity aggregate never drops whole late
        keyframes (round-1 advisor finding: raw scan-order truncation left a
        spatially biased map). On overflow after the global dedup, the kept
        subset is a hash-uniform subsample and a warning is logged.

        Keyframes carrying an ``edges`` layer additionally aggregate a
        ``map_edges`` layer — the DISCRIMINATIVE quality reference the
        consistency gate needs: on ground+facade geometry the dense-layer
        paired ratio is flat-to-spurious under meter-scale shifts
        (measured: wrong-basin answers score 0.99-1.22x the true pose,
        docs/localize_tp.json r5 diagnostics), while sparse vertical
        structure (poles, corners) pairs ONLY near the true pose — the
        same separation the loop-closure edges veto rides
        (icp-settings-loop-closure.yaml).
        """
        pts, edge_pts = [], []
        for mm, (R, t) in clouds_and_poses:
            layer = mm.get(self.layer) or next(iter(mm.values()))
            local = to_numpy(layer)
            Rf = np.asarray(R, np.float64).T
            world_kf = (local @ Rf + np.asarray(t))
            pts.append(self._voxel_first_np(world_kf.astype(np.float32),
                                            self.voxel_size))
            if "edges" in mm:
                e = to_numpy(mm["edges"]) @ Rf + np.asarray(t)
                edge_pts.append(self._voxel_first_np(
                    e.astype(np.float32), self.voxel_size))
        world = np.concatenate(pts).astype(np.float32) if pts else np.zeros((0, 3), np.float32)
        world = self._voxel_first_np(world, self.voxel_size)
        if len(world) > self.map_capacity:
            import logging
            logging.getLogger(__name__).warning(
                "MapLocalizer: aggregate map has %d voxels > capacity %d; "
                "keeping a uniform subsample", len(world), self.map_capacity)
            # deterministic hash-uniform subsample, not a spatial slab
            from ..cloud.voxel import hash_subsample_np
            world = world[hash_subsample_np(
                np.arange(len(world)), self.map_capacity)]
        self._map = {"map": from_points(world, capacity=self.map_capacity)}
        if edge_pts and len(edge_pts) == len(pts):
            e = self._voxel_first_np(
                np.concatenate(edge_pts).astype(np.float32), self.voxel_size)
            cap = max(256, min(self.map_capacity // 4,
                               -(-len(e) // 256) * 256))
            if len(e) > cap:
                from ..cloud.voxel import hash_subsample_np
                e = e[hash_subsample_np(np.arange(len(e)), cap)]
            self._map["map_edges"] = from_points(e, capacity=cap)

    def build_from_worldmodel(self, wm: WorldModel,
                              kf_poses: Dict[int, Tuple[np.ndarray, np.ndarray]]) -> None:
        """Aggregate every keyframe that has a cloud annotation, placed at
        its pose (e.g. from the local pose graph's Dijkstra estimate)."""
        items = []
        for kf, pose in sorted(kf_poses.items()):
            mm = wm.annotation(kf, ANNOTATION_NAME_PC_LAYERS)
            if mm is not None:
                items.append((mm, pose))
        self.build(items)

    @property
    def map_cloud(self) -> Optional[PointCloud]:
        return None if self._map is None else self._map["map"]

    # -- queries -------------------------------------------------------------
    def _query_params(self, with_edges: bool = False) -> ICPParams:
        import dataclasses
        p = self.params
        matchers = tuple(dataclasses.replace(m, src_layer="scan", tgt_layer="map")
                         for m in p.matchers)
        quality = tuple(dataclasses.replace(q, src_layer="scan", tgt_layer="map")
                        for q in p.quality)
        if with_edges:
            # discriminative vertical-structure term (same separation as
            # the loop-closure edges veto): weight 0.5 against the dense
            # ratio's 1.0 — enough to break the dense plateau's spurious
            # rivals without letting edge sparsity dominate the score
            quality = quality + (Quality(
                kind="paired_ratio", threshold_distance=0.8,
                src_layer="scan_edges", tgt_layer="map_edges", weight=0.5),)
        return dataclasses.replace(p, matchers=matchers, quality=quality)

    def _query_src(self, scan: MetricMap) -> MetricMap:
        """Scan layers routed to the query/probe programs: the dense layer
        always, plus the edges layer when BOTH sides carry one."""
        layer = scan.get(self.layer) or next(iter(scan.values()))
        src = {"scan": layer}
        if (self._map is not None and "map_edges" in self._map
                and "edges" in scan):
            src["scan_edges"] = scan["edges"]
        return src

    def localize_raw(self, scan: MetricMap, init_pose: se3.Pose) -> ICPResult:
        """UNGATED single-start query (the r2 behavior). Exists for
        benchmarking and for callers that do their own vetting — production
        callers should use :meth:`localize`, whose consistency gate catches
        the aliased-basin answers this path returns with high quality."""
        if self._map is None:
            raise RuntimeError("MapLocalizer.build() first")
        src = self._query_src(scan)
        return align(src, self._map, init_pose,
                     self._query_params(with_edges="scan_edges" in src))

    def _probe_stages(self, with_edges: bool = False) -> tuple:
        """Coarse→fine probe pipeline for the consistency gate.

        A probe starts up to ~2σ from the candidate solution, so the first
        stage needs a capture radius of that scale — a wide-threshold
        coarse stage (max(3 m, 1.5σ); the fine query threshold is ~1 voxel
        and CANNOT pull a 2–3 m start home, which would make every probe
        "disagree" even in a perfectly unique scene). The motion-
        conditional candidate refresh is stripped: under vmap its lax.cond
        runs both branches per iteration, so the batched program would pay
        a full-map NN every iteration instead of every block head.
        """
        import dataclasses
        fine = self._query_params(with_edges=with_edges)
        fine = dataclasses.replace(
            fine, max_iterations=25,
            cand_refresh_min_trans=0.0, cand_refresh_min_rot=0.0)
        wide = max(3.0, 1.5 * self.start_sigma_xyz)
        coarse = dataclasses.replace(
            fine, max_iterations=25,
            matchers=tuple(dataclasses.replace(m, distance_threshold=wide)
                           for m in fine.matchers))
        # sharp polish: the mid stage's ~1 m point2point threshold against
        # a 0.5 m-voxel map recruits everything within a meter, smearing
        # the optimum — probes converged only to ~1 m scatter and every
        # query read as "ambiguous". A tight final threshold restores a
        # sharp basin so re-converged probes actually coincide.
        sharp = dataclasses.replace(
            fine, max_iterations=15,
            matchers=tuple(dataclasses.replace(
                m, distance_threshold=max(0.35, 0.7 * self.voxel_size))
                for m in fine.matchers))
        return (coarse, fine, sharp)

    def localize(self, scan: MetricMap, init_pose: se3.Pose,
                 seed: int = 0) -> LocalizeResult:
        """Gated pose of the scan in the map frame, from an initial guess.

        Two device dispatches, each with one readback:

        1. the standard unbatched align from ``init_pose`` (identical to
           :meth:`localize_raw`). Quality below ``min_quality`` or a
           correction beyond ``max_correction_m`` rejects immediately —
           no probe batch is spent on an already-dead answer.
        2. the rival-basin probe: ``multi_start - 1`` displaced copies of
           the *solution* (the deterministic star + yaw probes + Gaussian
           tail, see ``__init__``), re-converged through a coarse→fine
           probe pipeline as ONE vmapped dispatch. Probing around the
           solution rather than the init keeps the test centered on the
           basin whose uniqueness is in question.

        Verdict (peak-to-second-peak): a probe *competes* when it settles
        OUTSIDE (``agree_tol_m``, ``agree_tol_rot``) of the solution with
        quality ≥ ``alias_quality_ratio`` × the solution's — i.e. the scan
        is explained comparably well by a materially different pose (the
        observed production failure: 3.56 m wrong-basin answer at quality
        0.80, docs/localize_tp.json r2 — the true basin is exactly such a
        rival). ANY competitor rejects with reason "consistency". Probes
        that stall at low quality are inconclusive and do not reject:
        in dense unique worlds ICP's capture radius is far smaller than
        the alias distances worth probing, so "all probes must re-converge"
        would veto correct answers (measured, tests/test_localizer.py).
        """
        if self._map is None:
            raise RuntimeError("MapLocalizer.build() first")
        import jax
        import jax.numpy as jnp

        from ..models.icp import align_pipeline

        # the base query runs the SAME coarse→fine pipeline as the probes
        # (localize_raw's single fine stage from a meters-off init is the
        # under-converged answer the probes then rightly out-score — see
        # default_localize_params); one unbatched dispatch
        src0 = self._query_src(scan)
        stages0 = self._probe_stages(with_edges="scan_edges" in src0)
        base = align_pipeline(src0, self._map, init_pose, stages0)
        quality = float(base.quality)
        correction = float(np.linalg.norm(
            np.asarray(base.pose.t) - np.asarray(init_pose.t)))
        k = max(1, self.multi_start)

        def result(reason, n_agree, n_compete, rival_q, dispersion):
            return LocalizeResult(
                pose=se3.Pose(np.asarray(base.pose.R), np.asarray(base.pose.t)),
                cov=np.asarray(base.cov), quality=quality,
                n_iterations=int(base.n_iterations),
                term_reason=int(base.term_reason), accepted=(reason == ""),
                n_agree=n_agree, n_compete=n_compete, n_starts=k,
                rival_quality=rival_q, dispersion_m=dispersion,
                correction_m=correction, reject_reason=reason)

        if quality < self.min_quality:
            return result("quality", 1, 0, 0.0, 0.0)
        if correction > self.max_correction_m:
            return result("correction", 1, 0, 0.0, 0.0)
        if k == 1:
            return result("", 1, 0, 0.0, 0.0)

        src = src0
        stages = stages0
        leaves, treedef = jax.tree.flatten((src, self._map))
        cache_key = (stages, k, treedef, tuple(x.shape for x in leaves))
        fn = self._batched.get(cache_key)
        if fn is None:
            def _run(src_map, tgt_map, gRs, gts):
                def one(gR, gt):
                    r = align_pipeline(src_map, tgt_map, se3.Pose(gR, gt),
                                       stages)
                    return r.pose, r.quality
                return jax.vmap(one)(gRs, gts)

            fn = jax.jit(_run)
            self._batched[cache_key] = fn
        gR, gt = self._probe_starts(
            np.asarray(base.pose.R), np.asarray(base.pose.t), k - 1, seed)
        probes, probe_q = fn(src, self._map, jnp.asarray(gR, jnp.float32),
                             jnp.asarray(gt, jnp.float32))
        # one readback for the whole probe batch
        Rs = np.asarray(probes.R)
        ts = np.asarray(probes.t)
        qs = np.asarray(probe_q)

        Rb = np.asarray(base.pose.R)
        tb = np.asarray(base.pose.t)
        dts = np.linalg.norm(ts - tb[None], axis=-1)
        tr = np.clip((np.einsum("kij,ij->k", Rs, Rb) - 1.0) / 2.0, -1.0, 1.0)
        drot = np.arccos(tr)
        agree = (dts <= self.agree_tol_m) & (drot <= self.agree_tol_rot)
        compete = (~agree) & (qs >= self.alias_quality_ratio * quality)
        n_agree = int(agree.sum()) + 1          # + the solution itself
        n_compete = int(compete.sum())
        rival_q = float(qs[~agree].max()) if (~agree).any() else 0.0
        dispersion = float(np.median(dts))
        reason = "" if n_compete == 0 else "consistency"
        return result(reason, n_agree, n_compete, rival_q, dispersion)

    def _probe_starts(self, Rb: np.ndarray, tb: np.ndarray, n: int,
                      seed: int) -> Tuple[np.ndarray, np.ndarray]:
        """``n`` probe start poses around the solution ``(Rb, tb)``.

        Deterministic first (reproducible verdicts): the {±σ, ±2σ}·{x̂, ŷ}
        translation star (with alternating ±``start_sigma_rot`` yaw so every
        probe also stresses heading), then pure-yaw ±``yaw_probe`` probes
        (city-grid rotational aliasing), then a Gaussian tail for callers
        that ask for more starts. The star lives in the map-frame ground
        plane: LiDAR aliasing is overwhelmingly horizontal (repeated
        facades / blocks), and z is the best-constrained axis (ground)."""
        s = self.start_sigma_xyz
        star = [(s, 0.0), (-s, 0.0), (0.0, s), (0.0, -s),
                (2 * s, 0.0), (-2 * s, 0.0), (0.0, 2 * s), (0.0, -2 * s)]
        offsets, yaws = [], []
        for i in range(min(n, len(star))):
            offsets.append((star[i][0], star[i][1], 0.0))
            yaws.append(self.start_sigma_rot * (1 if i % 2 == 0 else -1))
        for sign in (1.0, -1.0):
            if len(offsets) >= n:
                break
            offsets.append((0.0, 0.0, 0.0))
            yaws.append(sign * self.yaw_probe)
        if len(offsets) < n:
            rng = np.random.default_rng(seed)
            m = n - len(offsets)
            offsets.extend(rng.normal(0.0, s, (m, 3)).tolist())
            yaws.extend(rng.normal(0.0, self.start_sigma_rot, m).tolist())
        offsets = np.asarray(offsets, np.float64)
        yaws = np.asarray(yaws, np.float64)
        c, si = np.cos(yaws), np.sin(yaws)
        Rz = np.zeros((n, 3, 3))
        Rz[:, 0, 0], Rz[:, 0, 1] = c, -si
        Rz[:, 1, 0], Rz[:, 1, 1] = si, c
        Rz[:, 2, 2] = 1.0
        return Rz @ Rb[None], tb[None] + offsets
