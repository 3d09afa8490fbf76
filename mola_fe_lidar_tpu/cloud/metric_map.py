"""MetricMap — named layers of fixed-capacity padded point clouds (E1).

TPU-native replacement for ``mp2p_icp::metric_map_t`` (reference call sites:
src/LidarOdometry.cpp:215, :238, :250, :658-666): the container that flows
from the generator/filter pipeline into ICP and is stored per keyframe.

TPU-first design:

* Every layer is a :class:`PointCloud` with a **static capacity** ``N``:
  ``xyz: f32[N,3]`` plus a validity ``mask: f32[N]`` (1.0 = real point,
  0.0 = padding). Static shapes keep every consumer jit-compiled once;
  variable scan sizes are absorbed by padding/truncation at ingest and by
  masked reductions downstream.
* Optional per-point attributes (normals, intensity, timestamps) ride in an
  ``attrs`` dict of ``[N, ...]`` arrays so the whole thing is one pytree —
  it vmaps over a leading batch axis and crosses the host/device boundary
  as a unit.
* A ``MetricMap`` is simply ``dict[str, PointCloud]`` (layer name → cloud),
  mirroring the reference's named-layer semantics.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PointCloud(NamedTuple):
    """Fixed-capacity padded point cloud. Batchable pytree."""

    xyz: jax.Array  # f32[..., N, 3]
    mask: jax.Array  # f32[..., N]  (1.0 valid, 0.0 padding)
    attrs: Dict[str, jax.Array]  # each f32[..., N, ...]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        """Number of valid points (traced value)."""
        return jnp.sum(self.mask, axis=-1).astype(jnp.int32)


MetricMap = Dict[str, PointCloud]


def empty_cloud(capacity: int, attrs: tuple = (), dtype=jnp.float32) -> PointCloud:
    return PointCloud(
        xyz=jnp.zeros((capacity, 3), dtype=dtype),
        mask=jnp.zeros((capacity,), dtype=dtype),
        attrs={k: jnp.zeros((capacity, d), dtype=dtype) for (k, d) in attrs},
    )


def from_points(
    points: np.ndarray | jax.Array,
    capacity: Optional[int] = None,
    attrs: Optional[Dict[str, np.ndarray]] = None,
    pad_far: float = 1e6,
) -> PointCloud:
    """Pad (or uniformly subsample) an ``[n,3]`` array to a fixed-capacity
    cloud.

    Padding points are parked at ``pad_far`` (far from any real geometry) so
    even an unmasked distance computation can't produce spurious matches —
    defense in depth on top of the mask.

    Over-capacity input is hash-uniformly subsampled, NEVER truncated in
    input order: scans arrive azimuth/beam-ordered and a ``[:capacity]``
    slab would keep a spatial wedge and silently bias registration (the
    repo-wide invariant; see ``cloud.voxel.hash_subsample_np``).
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    cap = capacity if capacity is not None else _round_capacity(n)
    out = np.full((cap, 3), pad_far, dtype=np.float32)
    m = np.zeros((cap,), dtype=np.float32)
    k = min(n, cap)
    if n > cap:
        from .voxel import hash_subsample_np
        sel = np.sort(hash_subsample_np(np.arange(n), cap))
    else:
        sel = slice(None)
    out[:k] = points[sel][:k]
    m[:k] = 1.0
    out_attrs = {}
    if attrs:
        for name, a in attrs.items():
            a = np.asarray(a, dtype=np.float32)
            # n=0: reshape(0,-1) raises; keep the trailing dim (or 1)
            a = (a.reshape(n, -1) if n
                 else a.reshape(0, a.shape[-1] if a.ndim >= 2 else 1))
            buf = np.zeros((cap, a.shape[1]), dtype=np.float32)
            buf[:k] = a[sel][:k]
            out_attrs[name] = jnp.asarray(buf)
    return PointCloud(jnp.asarray(out), jnp.asarray(m), out_attrs)


def _round_capacity(n: int, multiple: int = 256) -> int:
    """Round capacity up to a lane-friendly multiple to limit recompilation
    across scans of varying size (bucketing policy; SURVEY.md §7 hard part #3)."""
    return max(multiple, -(-n // multiple) * multiple)


def concat_clouds(a: PointCloud, b: PointCloud) -> PointCloud:
    """Concatenate along the point axis (capacities add; static shapes)."""
    attrs = {}
    for k in a.attrs:
        if k in b.attrs:
            attrs[k] = jnp.concatenate([a.attrs[k], b.attrs[k]], axis=-2)
    return PointCloud(
        xyz=jnp.concatenate([a.xyz, b.xyz], axis=-2),
        mask=jnp.concatenate([a.mask, b.mask], axis=-1),
        attrs=attrs,
    )


def to_numpy(cloud: PointCloud) -> np.ndarray:
    """Extract the valid points as a host ``[n,3]`` array (host-only utility)."""
    xyz = np.asarray(cloud.xyz)
    mask = np.asarray(cloud.mask) > 0.5
    return xyz[mask]


# --- serialization (E1: metric_map_t is serializable / WorldModel-storable) ---

def save_metric_map(path: str, mm: MetricMap) -> None:
    """Serialize a MetricMap to ``.npz`` (layer data + attr names)."""
    payload = {}
    for layer, pc in mm.items():
        payload[f"{layer}/xyz"] = np.asarray(pc.xyz)
        payload[f"{layer}/mask"] = np.asarray(pc.mask)
        for aname, a in pc.attrs.items():
            payload[f"{layer}/attr/{aname}"] = np.asarray(a)
    np.savez_compressed(path, **payload)


def load_metric_map(path: str) -> MetricMap:
    data = np.load(path)
    layers: Dict[str, dict] = {}
    for key in data.files:
        parts = key.split("/")
        layer = parts[0]
        entry = layers.setdefault(layer, {"attrs": {}})
        if parts[1] == "xyz":
            entry["xyz"] = data[key]
        elif parts[1] == "mask":
            entry["mask"] = data[key]
        elif parts[1] == "attr":
            entry["attrs"][parts[2]] = data[key]
    return {
        layer: PointCloud(
            jnp.asarray(e["xyz"]), jnp.asarray(e["mask"]),
            {k: jnp.asarray(v) for k, v in e["attrs"].items()},
        )
        for layer, e in layers.items()
    }
