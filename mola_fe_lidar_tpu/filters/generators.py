"""Generators: raw observation → MetricMap layers (E6).

Rebuild of ``mp2p_icp_filters::Generator`` / ``apply_generators``
(reference src/LidarOdometry.cpp:215-217). A raw observation is a host dict
(e.g. from the KITTI reader or a live driver):

    {"xyz": np.ndarray[n,3], "intensity": np.ndarray[n] (optional),
     "timestamp": float, "sensor_label": str}

The generator ingests it into a fixed-capacity device cloud, with optional
range gating (ego-return / max-range cull) done on device.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud.metric_map import MetricMap, PointCloud, from_points
from .base import GENERATOR_REGISTRY


@GENERATOR_REGISTRY.register("GeneratorRawPoints")
@GENERATOR_REGISTRY.register("mp2p_icp_filters::Generator")
class GeneratorRawPoints:
    """Observation → ``target_layer`` cloud with range gating."""

    def __init__(self, target_layer="raw", capacity=None,
                 min_range=0.0, max_range=0.0, keep_intensity=False,
                 keep_time=False):
        self.target_layer = target_layer
        self.capacity = capacity
        self.min_range = float(min_range)
        self.max_range = float(max_range)  # 0 = unlimited
        self.keep_intensity = bool(keep_intensity)
        # ingest per-point sweep-time fractions (obs["time"] in [0,1]) as a
        # "time" attr — what FilterDeskew consumes
        self.keep_time = bool(keep_time)

    def __call__(self, obs: Dict[str, Any]) -> MetricMap:
        pts = np.asarray(obs["xyz"], dtype=np.float32)
        attrs = {}
        if self.keep_intensity and "intensity" in obs:
            attrs["intensity"] = np.asarray(obs["intensity"], np.float32)[:, None]
        if self.keep_time and "time" in obs:
            attrs["time"] = np.asarray(obs["time"], np.float32)[:, None]
        pc = from_points(pts, capacity=self.capacity, attrs=attrs)
        if "valid" in obs:
            # sensor-reported no-returns (e.g. the HDL-64 simulator's dropout
            # and max-range misses) — fold into the mask up front
            v = np.asarray(obs["valid"], np.float32)
            pad = pc.mask.shape[0] - v.shape[0]
            if pad >= 0:
                v = np.pad(v, (0, pad))
            else:
                v = v[: pc.mask.shape[0]]
            pc = PointCloud(pc.xyz, pc.mask * jnp.asarray(v), pc.attrs)
        if self.min_range > 0.0 or self.max_range > 0.0:
            pc = _range_gate(pc, self.min_range, self.max_range)
        return {self.target_layer: pc}


@jax.jit
def _range_gate(pc: PointCloud, min_range, max_range) -> PointCloud:
    r = jnp.linalg.norm(pc.xyz, axis=-1)
    keep = r >= min_range
    keep = jnp.where(max_range > 0.0, keep & (r <= max_range), keep)
    m = pc.mask * keep.astype(pc.mask.dtype)
    xyz = jnp.where(m[:, None] > 0.5, pc.xyz, 1e6)
    return PointCloud(xyz, m, pc.attrs)


def apply_generators(generators: Sequence, obs: Dict[str, Any]) -> MetricMap:
    """Run all generators on one observation, merging layer dicts
    (later generators win on name collision — matching the reference's
    sequential GeneratorSet application)."""
    mm: MetricMap = {}
    for g in generators:
        mm.update(g(obs))
    return mm


def generators_from_config(cfg: List[Dict[str, Any]] | None) -> List:
    """``generators_from_yaml`` analogue: list of {class, params} dicts."""
    from .base import make_generator

    gens = []
    for item in cfg or [{"class": "GeneratorRawPoints", "params": {}}]:
        gens.append(make_generator(item["class"], item.get("params", {})))
    return gens
