"""Map-based localization: align scans against an aggregated keyframe map.

The reference front-end only ever aligns scan pairs; once a map exists the
natural production query is "where am I in the MAP" — which is exactly the
regime the voxel-hash grid index targets (ops/grid_nn.py: build once over a
large cloud, query scan-sized batches). This module aggregates keyframe
clouds from a WorldModel (or any (pose, cloud) list) into one padded map
cloud, downsamples it, and serves `localize(scan, init)` calls through the
standard ICP engine with grid-backend matching.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

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
        cand_refresh_min_trans=0.02,
        cand_refresh_min_rot=0.001,
        matchers=(Matcher(kind="point2point", distance_threshold=cell,
                          nn_backend="auto", cand_k=4),),
        solver=Solver(kind="horn"),
        quality=(Quality(threshold_distance=0.3),),
        weights=PairWeights(use_scale_outlier_detector=False),
    )


class MapLocalizer:
    """Aggregate keyframe clouds into one map; localize scans against it."""

    def __init__(self, map_capacity: int = 1 << 17, voxel_size: float = 0.5,
                 layer: str = "raw", params: Optional[ICPParams] = None):
        self.map_capacity = int(map_capacity)
        self.voxel_size = float(voxel_size)
        self.layer = layer
        self.params = params or default_localize_params()
        self._map: Optional[MetricMap] = None

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
        """
        pts = []
        for mm, (R, t) in clouds_and_poses:
            layer = mm.get(self.layer) or next(iter(mm.values()))
            local = to_numpy(layer)
            world_kf = (local @ np.asarray(R, np.float64).T + np.asarray(t))
            pts.append(self._voxel_first_np(world_kf.astype(np.float32),
                                            self.voxel_size))
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
    def localize(self, scan: MetricMap, init_pose: se3.Pose) -> ICPResult:
        """Pose of the scan in the map frame, from an initial guess."""
        if self._map is None:
            raise RuntimeError("MapLocalizer.build() first")
        layer = scan.get(self.layer) or next(iter(scan.values()))
        src = {"scan": layer}
        # matcher layers: scan layer vs the map layer
        import dataclasses
        p = self.params
        matchers = tuple(dataclasses.replace(m, src_layer="scan", tgt_layer="map")
                         for m in p.matchers)
        quality = tuple(dataclasses.replace(q, src_layer="scan", tgt_layer="map")
                        for q in p.quality)
        p = dataclasses.replace(p, matchers=matchers, quality=quality)
        return align(src, self._map, init_pose, p)
