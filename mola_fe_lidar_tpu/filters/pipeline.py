"""Point-cloud filters (E6): voxel downsample, decimation, bounding box,
edge/plane classification, normal estimation.

Rebuild of the mp2p_icp_filters capability surface the reference drives per
scan (reference src/LidarOdometry.cpp:220-224) plus the KITTI preset's
legacy ``FilterEdgesPlanes`` knobs (reference params/kitti-default.yaml:21-32:
voxel_filter_resolution 1.0 m, full_pointcloud_decimation 10,
voxel_filter_decimation 10, and the four eigen-ratio thresholds).

Everything runs on device with static shapes. "Discarding" points means
compacting flagged points to the front of a fixed-capacity buffer
(stable argsort on the flag — the TPU analogue of an std::vector append).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import voxel
from ..cloud.metric_map import MetricMap, PointCloud
from ..ops import eigen3
from .base import FILTER_REGISTRY


def _compact(flags: jax.Array, capacity: int, *arrays):
    """Gather rows where ``flags > 0.5`` to the front of ``capacity``-row
    buffers (stable order). Returns (mask, gathered arrays...).

    Sort-free: the j-th output slot is the position of the (j+1)-th set
    flag, found by a vectorized binary search over the running count —
    O(capacity · log N) gathers instead of a full O(N log² N) device sort.
    TPU sorts are the dominant cost of every compaction in the filter and
    map-build programs (flags here are always binary keep-masks, for which
    this is output-identical to the former stable argsort(-flags)).
    """
    keep = flags > 0.5
    c = jnp.cumsum(keep.astype(jnp.int32))
    total = c[-1]
    want = 1 + jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    order = jnp.searchsorted(c, want)  # first i with c[i] == j+1 (kept row)
    mask = (want <= total).astype(flags.dtype)
    order = jnp.minimum(order, flags.shape[0] - 1)  # OOB slots: junk row,
    out = [jnp.take(a, order, axis=0) for a in arrays]  # masked out anyway
    return (mask, *out)


@functools.lru_cache(maxsize=None)
def _hash_perm_host(n: int):
    """Host-side fixed pseudo-random permutation of [0, n)."""
    h = (np.arange(n, dtype=np.uint64) * 2654435761) & 0xFFFFFFFF
    return np.argsort(h).astype(np.int32)  # bijective hash: no ties


def _hash_perm(n: int) -> jax.Array:
    """Fixed pseudo-random permutation of [0, n) (Knuth multiplicative).

    Precomputed on host and embedded as a program constant: the former
    in-graph ``argsort(iota * 2654435761)`` re-sorted a compile-time-fixed
    sequence on EVERY filter/map-build dispatch (same values, measured
    ~10 ms per 131k-row sort on v5e)."""
    return jnp.asarray(_hash_perm_host(n))


def _compact_uniform(flags: jax.Array, capacity: int, *arrays):
    """Like :func:`_compact`, but decorrelated from input order first.

    Inputs reaching these filters are voxel-sorted (lexicographic in x) or
    azimuth-ordered; truncating an over-capacity selection in that order
    keeps a spatially biased SLAB of the scene — which round 1/2 showed
    destroys registration (low-x planes layers made ICP systematically
    underestimate +x motion at HDL-64 scale). A fixed hash permutation
    makes the kept subset spatially uniform instead.
    """
    perm = _hash_perm(flags.shape[0])
    return _compact(jnp.take(flags, perm), capacity,
                    *[jnp.take(a, perm, axis=0) for a in arrays])


def _segment_start_positions(first: jax.Array) -> jax.Array:
    """For sorted runs marked by ``first``, the index where each point's
    run starts — used for intra-voxel striding."""
    n = first.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    start_here = jnp.where(first > 0.5, idx, -1)
    return jax.lax.associative_scan(jnp.maximum, start_here)


@FILTER_REGISTRY.register("FilterVoxelDownsample")
@FILTER_REGISTRY.register("mp2p_icp_filters::FilterDecimateVoxels")
class FilterVoxelDownsample:
    """One representative point per voxel.

    method: ``first`` keeps the first point of each voxel; ``mean`` emits
    voxel centroids (mp2p_icp FilterDecimateVoxels' FirstPoint /
    AverageAllPoints decimate methods).
    """

    def __init__(self, input_layer="raw", output_layer="decimated",
                 voxel_size=1.0, method="first", output_capacity=4096):
        self.input_layer = input_layer
        self.output_layer = output_layer
        self.voxel_size = float(voxel_size)
        self.method = method
        self.output_capacity = int(output_capacity)
        if method not in ("first", "mean"):
            raise ValueError(f"unknown voxel downsample method {method!r}")

    def __call__(self, mm: MetricMap) -> MetricMap:
        pc = mm[self.input_layer]
        out = _voxel_downsample(pc.xyz, pc.mask, self.voxel_size,
                                self.method, self.output_capacity)
        mm = dict(mm)
        mm[self.output_layer] = out
        return mm


@functools.partial(jax.jit, static_argnames=("method", "capacity"))
def _voxel_downsample(xyz, mask, res, method, capacity) -> PointCloud:
    vs = voxel.lex_sort_by_voxel(xyz, mask, res)
    if method == "first":
        m, pts = _compact_uniform(vs.first, capacity, vs.xyz)
    else:  # mean
        # stats capacity decoupled from output capacity: occupied voxels
        # never exceed the point count, so num_segments = N guarantees the
        # stats NEVER overflow (overflow drops voxels in low-x-first order);
        # voxels are then compacted uniformly to the output capacity
        st = voxel.voxel_stats(vs, num_segments=xyz.shape[0])
        m, pts = _compact_uniform(st.valid, capacity, st.mean)
    pts = jnp.where(m[:, None] > 0.5, pts, 1e6)
    return PointCloud(pts, m, {})


@FILTER_REGISTRY.register("FilterDecimate")
class FilterDecimate:
    """Keep every ``decimation``-th valid point (full_pointcloud_decimation)."""

    def __init__(self, input_layer="raw", output_layer="decimated",
                 decimation=10, output_capacity: Optional[int] = None):
        self.input_layer = input_layer
        self.output_layer = output_layer
        self.decimation = int(decimation)
        self.output_capacity = output_capacity

    def __call__(self, mm: MetricMap) -> MetricMap:
        pc = mm[self.input_layer]
        cap = self.output_capacity or -(-pc.capacity // self.decimation)
        out = _decimate(pc.xyz, pc.mask, self.decimation, cap)
        mm = dict(mm)
        mm[self.output_layer] = out
        return mm


@functools.partial(jax.jit, static_argnames=("k", "capacity"))
def _decimate(xyz, mask, k, capacity) -> PointCloud:
    # compact valid points to the front, take a static stride, then a
    # UNIFORM compaction: if the strided count still exceeds capacity, a
    # plain [:capacity] would keep a scan-order (azimuth) slab
    m, pts = _compact(mask, xyz.shape[0], xyz)
    pts = pts[::k]
    m = m[::k]
    m, pts = _compact_uniform(m, capacity, pts)
    pts = jnp.where(m[:, None] > 0.5, pts, 1e6)
    return PointCloud(pts, m, {})


@FILTER_REGISTRY.register("FilterBoundingBox")
@FILTER_REGISTRY.register("mp2p_icp_filters::FilterBoundingBox")
class FilterBoundingBox:
    """Keep (or drop) points inside an axis-aligned box — the usual
    ego-vehicle / max-range crop."""

    def __init__(self, input_layer="raw", output_layer="raw",
                 min_corner=(-100.0, -100.0, -100.0),
                 max_corner=(100.0, 100.0, 100.0), keep_inside=True):
        self.input_layer = input_layer
        self.output_layer = output_layer
        self.min_corner = tuple(float(v) for v in min_corner)
        self.max_corner = tuple(float(v) for v in max_corner)
        self.keep_inside = bool(keep_inside)

    def __call__(self, mm: MetricMap) -> MetricMap:
        pc = mm[self.input_layer]
        lo = jnp.array(self.min_corner, pc.xyz.dtype)
        hi = jnp.array(self.max_corner, pc.xyz.dtype)
        inside = jnp.all((pc.xyz >= lo) & (pc.xyz <= hi), axis=-1)
        keep = inside if self.keep_inside else ~inside
        new_mask = pc.mask * keep.astype(pc.mask.dtype)
        xyz = jnp.where(new_mask[:, None] > 0.5, pc.xyz, 1e6)
        mm = dict(mm)
        mm[self.output_layer] = PointCloud(xyz, new_mask, pc.attrs)
        return mm


@FILTER_REGISTRY.register("FilterEdgesPlanes")
@FILTER_REGISTRY.register("mola::lidar_segmentation::FilterEdgesPlanes")
class FilterEdgesPlanes:
    """Voxel eigen-ratio edge/plane segmentation — the KITTI preset filter
    (reference params/kitti-default.yaml:21-32).

    Per voxel of ``voxel_filter_resolution`` with covariance eigenvalues
    e0 ≤ e1 ≤ e2:

    * **plane** voxel: e1 ≥ min_e1_e0·e0  (two spread axes ≫ thickness);
      emitted to layer ``planes`` with the voxel normal + planarity attrs.
    * **edge** voxel: e2 ≥ min_e2_e0·e0 and e1 ≤ max_e1_e0·e0 (one dominant
      axis); emitted to layer ``edges``.
    * everything: decimated copy to ``decimated``
      (every ``full_pointcloud_decimation``-th point).

    Points inside qualifying voxels are strided by
    ``voxel_filter_decimation`` within the voxel. This is the documented
    *behavioral interpretation* of the four legacy eigen-ratio knobs — the
    reference repo only carries their values, the implementing class lives
    in an external package (SURVEY.md §2d notes the YAML is stale).
    """

    def __init__(self, input_layer="raw",
                 voxel_filter_resolution=1.0,
                 full_pointcloud_decimation=10,
                 voxel_filter_decimation=10,
                 voxel_filter_max_e2_e0=30.0, voxel_filter_max_e1_e0=30.0,
                 voxel_filter_min_e2_e0=80.0, voxel_filter_min_e1_e0=80.0,
                 eigen_noise_floor=None,
                 edges_capacity=2048, planes_capacity=4096,
                 decimated_capacity: Optional[int] = None,
                 max_voxels=None, edge_min_verticality=0.6,
                 stats_mode="segment"):
        # max_voxels=None sizes the voxel-stats table to the input point
        # count — occupied voxels can never exceed it, so the table NEVER
        # overflows. A manual cap trades compute for coverage: overflowing
        # drops voxels in sorted (low-x-first) order, and points in
        # overflowed voxels are masked out of edges/planes (never
        # misclassified).
        self.input_layer = input_layer
        self.res = float(voxel_filter_resolution)
        self.full_decim = int(full_pointcloud_decimation)
        self.voxel_decim = int(voxel_filter_decimation)
        self.max_e2_e0 = float(voxel_filter_max_e2_e0)
        self.max_e1_e0 = float(voxel_filter_max_e1_e0)
        self.min_e2_e0 = float(voxel_filter_min_e2_e0)
        self.min_e1_e0 = float(voxel_filter_min_e1_e0)
        # Eigenvalues below sensor-noise variance carry no shape information;
        # flooring e0 keeps noise/noise ratios from faking planarity.
        self.eigen_noise_floor = (
            float(eigen_noise_floor) if eigen_noise_floor is not None
            else (0.01 * self.res) ** 2
        )
        self.edges_capacity = int(edges_capacity)
        self.planes_capacity = int(planes_capacity)
        self.decimated_capacity = decimated_capacity
        self.max_voxels = None if max_voxels is None else int(max_voxels)
        # reject near-horizontal line voxels (ground scan rings); 0 disables
        self.edge_min_verticality = float(edge_min_verticality)
        # "segment" = per-voxel tables via segment_sum (exact legacy path);
        # "scan" = per-point stats via segmented prefix sums
        # (cloud/voxel.py::voxel_stats_scan — ~8 ms cheaper at 131k rows
        # on v5e; covariances agree to f32 roundoff, not bitwise)
        if stats_mode not in ("segment", "scan"):
            raise ValueError(f"unknown stats_mode {stats_mode!r}")
        self.stats_mode = str(stats_mode)

    def __call__(self, mm: MetricMap) -> MetricMap:
        pc = mm[self.input_layer]
        dec_cap = self.decimated_capacity or -(-pc.capacity // self.full_decim)
        max_voxels = self.max_voxels or pc.xyz.shape[-2]
        edges, planes, decimated = _edges_planes(
            pc.xyz, pc.mask, self.res, self.voxel_decim, self.full_decim,
            self.min_e2_e0, self.max_e1_e0, self.min_e1_e0,
            self.eigen_noise_floor,
            self.edges_capacity, self.planes_capacity, dec_cap, max_voxels,
            self.edge_min_verticality,
            pc.attrs.get("time"),
            stats_mode=self.stats_mode,
        )
        mm = dict(mm)
        mm["edges"] = edges
        mm["planes"] = planes
        mm["decimated"] = decimated
        return mm


@functools.partial(jax.jit, static_argnames=(
    "voxel_decim", "full_decim", "edges_cap", "planes_cap", "dec_cap",
    "max_voxels", "stats_mode"))
def _edges_planes(xyz, mask, res, voxel_decim, full_decim,
                  min_e2_e0, max_e1_e0, min_e1_e0, noise_floor,
                  edges_cap, planes_cap, dec_cap, max_voxels,
                  edge_min_verticality, tim=None, stats_mode="segment"):
    vs = voxel.lex_sort_by_voxel(xyz, mask, res)
    # per-point sweep-time fractions ride along (sorted by the same order)
    # so downstream in-loop deskew refinement can re-warp the FILTERED
    # layers without re-running this filter
    tim_s = None if tim is None else jnp.take(tim, vs.order, axis=0)
    if stats_mode == "scan":
        # per-POINT stats via segmented prefix sums: no per-voxel table,
        # no scatter-shaped segment_sum, no gather round-trip (masked
        # tail rows carry garbage stats but vs.mask gates them out)
        stp = voxel.voxel_stats_scan(vs)
        st_count, st_cov, st_valid = (
            stp.count, stp.cov, (stp.count > 0.5).astype(xyz.dtype))
    else:
        st = voxel.voxel_stats(vs, num_segments=max_voxels)
        st_count, st_cov, st_valid = st.count, st.cov, st.valid
    evs = eigen3.sym_eigenvalues_3x3(st_cov)
    e0 = jnp.maximum(evs[..., 0], noise_floor)
    e1, e2 = jnp.maximum(evs[..., 1], noise_floor), jnp.maximum(evs[..., 2], noise_floor)
    enough = st_count >= 5.0
    is_plane = st_valid * enough * (e1 >= min_e1_e0 * e0)
    is_edge = st_valid * enough * (e2 >= min_e2_e0 * e0) * (e1 <= max_e1_e0 * e0) * (1.0 - is_plane)
    # verticality gate: LiDAR scan RINGS on the ground classify as lines,
    # but rings are sensor-centered artifacts that move WITH the sensor —
    # matching them drags registration toward zero motion (measured: a
    # +0.3 m/scan systematic undershoot, 98% of edge points were rings).
    # Real edge features (poles, building corners) are near-vertical.
    line_dir = eigen3.largest_eigenvector_3x3(st_cov, evs)
    is_edge = is_edge * (jnp.abs(line_dir[..., 2]) >= edge_min_verticality)
    normals = eigen3.smallest_eigenvector_3x3(st_cov, evs)
    # planarity score in [0,1]: 1 - e0/e1 (sharp planes → 1)
    planarity = jnp.clip(1.0 - e0 / jnp.maximum(e1, 1e-9), 0.0, 1.0)

    if stats_mode == "scan":
        pt_plane = is_plane * vs.mask
        pt_edge = is_edge * vs.mask
        pt_normal = normals
        pt_planarity = planarity
    else:
        seg = voxel.voxel_segments(vs, max_voxels)
        seg_c = jnp.minimum(seg, max_voxels - 1)
        # points whose voxel overflowed max_voxels must NOT inherit the last
        # real voxel's classification — they carry no stats and are dropped
        # (size max_voxels generously; see the filter's docstring)
        in_stats = (seg < max_voxels).astype(xyz.dtype)
        pt_plane = jnp.take(is_plane, seg_c) * vs.mask * in_stats
        pt_edge = jnp.take(is_edge, seg_c) * vs.mask * in_stats
        pt_normal = jnp.take(normals, seg_c, axis=0)
        pt_planarity = jnp.take(planarity, seg_c)

    # intra-voxel stride: keep every voxel_decim-th point of each voxel
    n = vs.xyz.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    seg_start = _segment_start_positions(vs.first)
    pos_in_voxel = idx - jnp.maximum(seg_start, 0)
    stride_keep = ((pos_in_voxel % voxel_decim) == 0).astype(xyz.dtype)

    # uniform compaction: over-capacity selections keep a spatially uniform
    # subset, never a low-x slab (the voxel sort is lexicographic in x —
    # slab truncation here made full-res odometry underestimate +x motion)
    e_extra = () if tim_s is None else (tim_s,)
    em, e_pts, *e_attrs = _compact_uniform(
        pt_edge * stride_keep, edges_cap, vs.xyz, *e_extra)
    pm, p_pts, p_n, p_pl, *p_attrs = _compact_uniform(
        pt_plane * stride_keep, planes_cap, vs.xyz, pt_normal, pt_planarity,
        *e_extra)

    e_pts = jnp.where(em[:, None] > 0.5, e_pts, 1e6)
    p_pts = jnp.where(pm[:, None] > 0.5, p_pts, 1e6)
    edges = PointCloud(e_pts, em,
                       {} if tim_s is None else {"time": e_attrs[0]})
    planes_attrs = {"normal": p_n, "planarity": p_pl[:, None]}
    if tim_s is not None:
        planes_attrs["time"] = p_attrs[0]
    planes = PointCloud(p_pts, pm, planes_attrs)

    # full-cloud decimation: stride in sorted order (spatially stratified),
    # then a uniform compaction bounds any overflow beyond dec_cap
    stride_flag = ((jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
                    % full_decim) == 0).astype(xyz.dtype)
    dm, d_pts, *d_attrs = _compact_uniform(
        vs.mask * stride_flag, dec_cap, vs.xyz, *e_extra)
    d_pts = jnp.where(dm[:, None] > 0.5, d_pts, 1e6)
    decimated = PointCloud(d_pts, dm,
                           {} if tim_s is None else {"time": d_attrs[0]})
    return edges, planes, decimated


@FILTER_REGISTRY.register("FilterNormals")
class FilterNormals:
    """Attach per-point ``normal``/``planarity`` attrs — the precompute that
    enables the fast ``point2plane_normals`` matcher (1-NN per ICP iteration
    instead of per-iteration kNN + eigen-fit).

    methods:
      * ``knn`` (default): per-point k-neighborhood eigen-fit within the
        cloud itself — one kNN pass per cloud, density-independent;
      * ``voxel``: per-voxel eigenanalysis, points inherit their voxel's
        normal — cheaper, needs ≥4 points per voxel.
    """

    def __init__(self, input_layer="raw", output_layer=None, method="knn",
                 knn=8, voxel_size=1.5, max_voxels=8192):
        self.input_layer = input_layer
        self.output_layer = output_layer or input_layer
        self.method = method
        self.knn = int(knn)
        self.voxel_size = float(voxel_size)
        self.max_voxels = int(max_voxels)
        if method not in ("knn", "voxel"):
            raise ValueError(f"unknown normals method {method!r}")

    def __call__(self, mm: MetricMap) -> MetricMap:
        pc = mm[self.input_layer]
        if self.method == "voxel":
            out = _attach_normals(pc.xyz, pc.mask, self.voxel_size, self.max_voxels)
        else:
            out = _attach_normals_knn(pc.xyz, pc.mask, self.knn)
        mm = dict(mm)
        mm[self.output_layer] = out
        return mm


@functools.partial(jax.jit, static_argnames=("k",))
def _attach_normals_knn(xyz, mask, k) -> PointCloud:
    from ..ops import matching as _matching
    if jax.default_backend() != "cpu":
        nn = _matching.approx_knn(xyz, mask, xyz, mask, k=k)
    else:
        nn = _matching.knn(xyz, mask, xyz, mask, k=k)
    neigh = jnp.take(xyz, nn.idx, axis=-2)             # [N,k,3]
    valid = (nn.dist < 1e9).astype(xyz.dtype)          # [N,k]
    cnt = jnp.maximum(jnp.sum(valid, axis=-1), 1.0)
    centroid = jnp.sum(neigh * valid[..., None], axis=-2) / cnt[..., None]
    d = (neigh - centroid[..., None, :]) * valid[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", d, d, precision="highest") / cnt[..., None, None]
    evs = eigen3.sym_eigenvalues_3x3(cov)
    normals = eigen3.smallest_eigenvector_3x3(cov, evs)
    # collinear neighborhoods (e0=e1=0) have NO defined normal — their
    # planarity must be 0, not the fabricated 1-0/eps=1 (review finding)
    planarity = eigen3.planarity_score_3x3(evs) * (cnt >= 4.0) * mask
    return PointCloud(xyz, mask, {"normal": normals, "planarity": planarity[:, None]})


@functools.partial(jax.jit, static_argnames=("max_voxels",))
def _attach_normals(xyz, mask, res, max_voxels) -> PointCloud:
    vs = voxel.lex_sort_by_voxel(xyz, mask, res)
    st = voxel.voxel_stats(vs, num_segments=max_voxels)
    evs = eigen3.sym_eigenvalues_3x3(st.cov)
    normals = eigen3.smallest_eigenvector_3x3(st.cov, evs)
    planarity = eigen3.planarity_score_3x3(evs) * (st.count >= 4.0)
    seg_c = jnp.minimum(voxel.voxel_segments(vs, max_voxels), max_voxels - 1)
    pt_n = jnp.take(normals, seg_c, axis=0)
    pt_p = jnp.take(planarity, seg_c)
    # restore original point order so the layer aligns with siblings
    inv = jnp.argsort(vs.order)
    return PointCloud(
        xyz, mask,
        {"normal": jnp.take(pt_n, inv, axis=0),
         "planarity": jnp.take(pt_p, inv)[:, None]},
    )


@FILTER_REGISTRY.register("FilterGICPCovariances")
class FilterGICPCovariances:
    """Attach per-point GICP surface covariances (model family: Generalized
    ICP / plane-to-plane). Each point's neighborhood covariance is
    regularized to ``C = I − (1−ε)·n nᵀ`` (unit spread in-plane, ε across) —
    the standard GICP surface model — stored flat as attr ``cov`` [N, 9].
    Apply to BOTH clouds that will be aligned with the ``gicp`` matcher.
    """

    def __init__(self, input_layer="raw", output_layer=None, knn=10,
                 epsilon=1e-3):
        self.input_layer = input_layer
        self.output_layer = output_layer or input_layer
        self.knn = int(knn)
        self.epsilon = float(epsilon)

    def __call__(self, mm: MetricMap) -> MetricMap:
        pc = mm[self.input_layer]
        out = _attach_gicp_covs(pc.xyz, pc.mask, self.knn, self.epsilon)
        mm = dict(mm)
        mm[self.output_layer] = out
        return mm


@functools.partial(jax.jit, static_argnames=("k",))
def _attach_gicp_covs(xyz, mask, k, epsilon) -> PointCloud:
    from ..ops import matching as _matching
    if jax.default_backend() != "cpu":
        nn = _matching.approx_knn(xyz, mask, xyz, mask, k=k)
    else:
        nn = _matching.knn(xyz, mask, xyz, mask, k=k)
    neigh = jnp.take(xyz, nn.idx, axis=-2)
    valid = (nn.dist < 1e9).astype(xyz.dtype)
    cnt = jnp.maximum(jnp.sum(valid, axis=-1), 1.0)
    centroid = jnp.sum(neigh * valid[..., None], axis=-2) / cnt[..., None]
    d = (neigh - centroid[..., None, :]) * valid[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", d, d, precision="highest") / cnt[..., None, None]
    evs = eigen3.sym_eigenvalues_3x3(cov)
    n = eigen3.smallest_eigenvector_3x3(cov, evs)
    I = jnp.eye(3, dtype=xyz.dtype)
    C = I - (1.0 - epsilon) * n[..., :, None] * n[..., None, :]
    attrs = dict()
    attrs["cov"] = C.reshape(*C.shape[:-2], 9)
    # keep normals too — costs nothing and lets mixed matchers share a layer
    attrs["normal"] = n
    attrs["planarity"] = (eigen3.planarity_score_3x3(evs)
                          * (cnt >= 4.0))[..., None]
    return PointCloud(xyz, mask, attrs)


@FILTER_REGISTRY.register("FilterDeskew")
class FilterDeskew:
    """Motion compensation: unwarp points captured while the sensor moved.

    Given the current twist estimate (rad/s, m/s) and a per-point ``time``
    attr in [0, 1] (fraction of the scan period, 0 = scan start), each point
    — captured in the sensor frame at its own fire time — is re-expressed
    in one common frame: ``anchor="end"`` maps to the scan-end pose
    (``p' = exp((t_i − 1)·T·ξ) p``), ``anchor="start"`` to the scan-start
    pose (``p' = exp(t_i·T·ξ) p``). Start anchoring keeps estimated poses
    aligned with scan-start timestamps (the gt convention); end anchoring
    matches "map into the newest frame" pipelines. Implemented as a batched
    se(3) exp over all points (one fused VPU pass; no per-point host work).
    The twist is injected per scan by the front-end via :meth:`set_twist`.
    """

    def __init__(self, input_layer="raw", output_layer=None, scan_period=0.1,
                 anchor="end"):
        self.input_layer = input_layer
        self.output_layer = output_layer or input_layer
        self.scan_period = float(scan_period)
        assert anchor in ("end", "start"), anchor
        self.anchor = anchor
        self._twist = jnp.zeros(6)

    def set_twist(self, twist) -> None:
        self._twist = jnp.asarray(twist, jnp.float32)

    def __call__(self, mm: MetricMap, twist=None) -> MetricMap:
        pc = mm[self.input_layer]
        if "time" not in pc.attrs:
            return mm  # nothing to deskew
        tw = self._twist if twist is None else twist
        out = _deskew(pc, tw, self.scan_period, self.anchor == "end")
        mm = dict(mm)
        mm[self.output_layer] = out
        return mm


@functools.partial(jax.jit, static_argnames=("to_end",))
def _deskew(pc: PointCloud, twist, period, to_end: bool = True) -> PointCloud:
    from ..geometry import se3
    t_frac = pc.attrs["time"][..., 0]                   # [N] in [0,1]
    off = t_frac - 1.0 if to_end else t_frac
    tau = off[:, None] * (twist * period)               # [N,6] per-point delta
    poses = se3.exp(tau)                                # batched exp
    xyz = jnp.einsum("nij,nj->ni", poses.R, pc.xyz, precision="highest") + poses.t
    xyz = jnp.where(pc.mask[:, None] > 0.5, xyz, 1e6)
    attrs = {k: v for k, v in pc.attrs.items()}
    return PointCloud(xyz, pc.mask, attrs)


def delta_redeskew(pc: PointCloud, xi0, xi1, period,
                   to_end: bool = True) -> PointCloud:
    """Re-express a cloud that was deskewed with twist ``xi0`` as if it had
    been deskewed with ``xi1`` instead — WITHOUT the original raw points.

    Exact per point: the pass-1 deskew applied ``exp(off_i·T·ξ0)``, so
    applying ``exp(off_i·T·ξ1) ∘ exp(off_i·T·ξ0)⁻¹`` to the current
    coordinates yields exactly ``exp(off_i·T·ξ1)·p_raw``. Direction attrs
    (``normal``) rotate by the delta rotation; ``cov`` (row-major [...,9])
    gets the congruence transform. This is the enabling op for in-loop
    (two-pass) motion-compensation refinement: align → implied twist →
    re-warp the FILTERED layers → short re-align, all inside one jitted
    program (no re-filtering, no extra dispatch).
    """
    from ..geometry import se3
    t_frac = pc.attrs["time"][..., 0]
    off = t_frac - 1.0 if to_end else t_frac
    tau1 = off[:, None] * (jnp.asarray(xi1, jnp.float32) * period)
    tau0 = off[:, None] * (jnp.asarray(xi0, jnp.float32) * period)
    p1 = se3.exp(tau1)
    p0 = se3.exp(tau0)
    # delta = p1 ∘ p0⁻¹:  R = R1·R0ᵀ,  t = t1 − R·t0
    Rd = jnp.einsum("nij,nkj->nik", p1.R, p0.R, precision="highest")
    td = p1.t - jnp.einsum("nij,nj->ni", Rd, p0.t, precision="highest")
    xyz = jnp.einsum("nij,nj->ni", Rd, pc.xyz, precision="highest") + td
    xyz = jnp.where(pc.mask[:, None] > 0.5, xyz, 1e6)
    attrs = dict(pc.attrs)
    if "normal" in attrs:
        attrs["normal"] = jnp.einsum("nij,nj->ni", Rd, attrs["normal"],
                                     precision="highest")
    if "cov" in attrs:
        C = attrs["cov"].reshape(-1, 3, 3)
        C = jnp.einsum("nij,njk,nlk->nil", Rd, C, Rd, precision="highest")
        attrs["cov"] = C.reshape(-1, 9)
    return PointCloud(xyz, pc.mask, attrs)


@FILTER_REGISTRY.register("FilterDecimateToCount")
class FilterDecimateToCount:
    """Cap a layer at a fixed number of points (deterministic subsample).

    Honors the reference preset's ``decimate_to_point_count`` knob, which is
    declared in params/kitti-default.yaml:10 but dead in the reference code
    (SURVEY.md §2d) — here it is a real filter: a spatially uniform (hash-
    decorrelated) subset of ``count`` valid points (plain scan-order
    truncation would keep an azimuth slab).
    """

    def __init__(self, input_layer="raw", output_layer=None, count=4096):
        self.input_layer = input_layer
        self.output_layer = output_layer or input_layer
        self.count = int(count)

    def __call__(self, mm: MetricMap) -> MetricMap:
        pc = mm[self.input_layer]
        # attrs ride along: this filter often runs FIRST (odometry inserts
        # it at position 0 for decimate_to_point_count) and dropping attrs
        # here would silently disable downstream FilterDeskew ('time') and
        # lose intensities (review finding)
        names = sorted(pc.attrs)
        m, pts, *vals = _compact_uniform(pc.mask, self.count, pc.xyz,
                                         *(pc.attrs[k] for k in names))
        pts = jnp.where(m[:, None] > 0.5, pts, 1e6)
        mm = dict(mm)
        mm[self.output_layer] = PointCloud(pts, m, dict(zip(names, vals)))
        return mm
