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

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud.metric_map import MetricMap, PointCloud, from_points, to_numpy
from ..filters.pipeline import FilterVoxelDownsample
from ..geometry import se3
from ..models.config import ICPParams, Matcher, PairWeights, Quality, Solver
from ..models.icp import ICPResult, align
from .worldmodel import ANNOTATION_NAME_PC_LAYERS, WorldModel


def default_localize_params(cell: float = 1.0) -> ICPParams:
    """Point-to-point grid-matched ICP sized for scan-vs-map queries."""
    return ICPParams(
        max_iterations=30,
        matchers=(Matcher(kind="point2point", distance_threshold=cell,
                          nn_backend="grid"),),
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
    def build(self, clouds_and_poses: List[Tuple[MetricMap, Tuple[np.ndarray, np.ndarray]]]) -> None:
        """Aggregate (cloud, world_pose) pairs into the map frame."""
        pts = []
        for mm, (R, t) in clouds_and_poses:
            layer = mm.get(self.layer) or next(iter(mm.values()))
            local = to_numpy(layer)
            pts.append(local @ np.asarray(R, np.float64).T + np.asarray(t))
        world = np.concatenate(pts).astype(np.float32) if pts else np.zeros((0, 3), np.float32)
        raw = from_points(world, capacity=max(256, min(self.map_capacity * 2,
                                                       1 << 18)))
        ds = FilterVoxelDownsample(voxel_size=self.voxel_size, method="first",
                                   output_capacity=self.map_capacity)
        self._map = {"map": ds({"raw": raw})["decimated"]}

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
