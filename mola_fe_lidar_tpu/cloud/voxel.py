"""Voxel-grid machinery on device: sort-based grouping with static shapes.

The reference stack voxelizes clouds on CPU with pointer-chasing hash grids
(mp2p_icp_filters voxel filters; knobs at reference
params/kitti-default.yaml:23-32). Pointer-chasing doesn't map to TPU, so the
TPU-native formulation is **sort-then-segment**:

1. quantize points to integer cells,
2. lexicographically sort points by cell key (``lax.sort`` with two int32
   keys — avoids int64, which JAX keeps disabled by default),
3. mark first-occurrences → contiguous segment ids,
4. compute per-voxel statistics with ``segment_sum`` (count/mean/covariance)
   at a static ``num_segments``.

Everything is fixed-shape and jit-safe; invalid (padding) points sort to the
end and land in a trash segment.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# 15 bits per x/y cell coordinate so key1 = ix*2^15 + iy stays inside int32.
_COORD_BITS = 15
_COORD_MAX = (1 << _COORD_BITS) - 1
_KEY_INVALID = jnp.iinfo(jnp.int32).max


def voxel_coords(xyz: jax.Array, res: float | jax.Array, origin: jax.Array) -> jax.Array:
    """Integer cell coordinates [...,N,3] (int32) of points on a grid of
    pitch ``res`` anchored at ``origin``."""
    return jnp.floor((xyz - origin) / res).astype(jnp.int32)


class VoxelSort(NamedTuple):
    """Result of :func:`lex_sort_by_voxel`."""

    order: jax.Array        # i32[N]  permutation: sorted position -> original index
    xyz: jax.Array          # f32[N,3] points in sorted order
    mask: jax.Array         # f32[N]   mask in sorted order
    first: jax.Array        # f32[N]   1.0 where a new voxel starts (valid points only)
    seg_id: jax.Array       # i32[N]   contiguous voxel index per sorted point
    num_voxels: jax.Array   # i32[]    number of occupied voxels


def lex_sort_by_voxel(xyz: jax.Array, mask: jax.Array, res) -> VoxelSort:
    """Sort a padded cloud by voxel cell (lexicographic over x,y,z cells).

    The grid origin is the masked minimum corner, so cell coordinates are
    non-negative and fit the 15-bit packing for any cloud extent up to
    ``res * 32768`` (e.g. 0.5 m res → 16 km — far beyond one scan).
    """
    big = jnp.asarray(1e9, xyz.dtype)
    masked = jnp.where(mask[..., None] > 0.5, xyz, big)
    origin = jnp.min(masked, axis=-2, keepdims=True) - 0.5 * res
    cells = voxel_coords(xyz, res, origin)
    cells = jnp.clip(cells, 0, _COORD_MAX)

    key1 = cells[..., 0] * (1 << _COORD_BITS) + cells[..., 1]
    key2 = cells[..., 2]
    invalid = mask < 0.5
    key1 = jnp.where(invalid, _KEY_INVALID, key1)
    key2 = jnp.where(invalid, _KEY_INVALID, key2)

    n = xyz.shape[-2]
    idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[..., 0], key1.shape
    )
    k1s, k2s, order = jax.lax.sort((key1, key2, idx), num_keys=2)

    xyz_s = jnp.take_along_axis(xyz, order[..., None], axis=-2)
    mask_s = jnp.take_along_axis(mask, order, axis=-1)

    prev1 = jnp.roll(k1s, 1, axis=-1)
    prev2 = jnp.roll(k2s, 1, axis=-1)
    is_new = (k1s != prev1) | (k2s != prev2)
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[..., 0] == 0
    is_new = is_new | pos0
    first = jnp.where(mask_s > 0.5, is_new.astype(xyz.dtype), 0.0)

    seg_id = jnp.cumsum(first, axis=-1).astype(jnp.int32) - 1
    seg_id = jnp.where(mask_s > 0.5, seg_id, n)  # padding → out-of-range trash id
    num_voxels = jnp.sum(first, axis=-1).astype(jnp.int32)
    return VoxelSort(order, xyz_s, mask_s, first, seg_id, num_voxels)


class VoxelStats(NamedTuple):
    """Per-voxel statistics at static capacity ``S`` (= num_segments)."""

    count: jax.Array  # f32[S]
    mean: jax.Array   # f32[S,3]
    cov: jax.Array    # f32[S,3,3]
    valid: jax.Array  # f32[S]  1.0 for occupied voxels


def voxel_segments(vs: VoxelSort, num_segments: int) -> jax.Array:
    """Segment ids with a dedicated trash slot at ``num_segments`` for both
    padding and capacity-overflow voxels."""
    return jnp.minimum(vs.seg_id, num_segments)


def voxel_stats(vs: VoxelSort, num_segments: int) -> VoxelStats:
    """Count/mean/covariance per voxel via masked segment sums.

    Internally uses ``num_segments + 1`` slots — the extra slot absorbs
    padding points and voxels past capacity — and drops it on return, so no
    real voxel is ever clobbered by the trash segment.

    The covariance uses a two-pass centered form, E[(x−μ)(x−μ)ᵀ]: the
    one-pass E[xxᵀ]−μμᵀ cancels catastrophically in f32 on absolute LiDAR
    coordinates (x² ~ 1e4 at 100 m range vs plane-thickness eigenvalues
    ~1e-4), corrupting edge/plane eigen-ratio classification for distant
    voxels.
    """
    seg = voxel_segments(vs, num_segments)
    total = num_segments + 1
    w = vs.mask
    # seg comes from a cumsum over the voxel-sorted order (then min-capped),
    # so it is monotone non-decreasing — telling XLA unlocks the segmented-
    # reduction lowering instead of a general scatter-add
    srt = dict(indices_are_sorted=True)
    count = jax.ops.segment_sum(w, seg, num_segments=total, **srt)
    sum_x = jax.ops.segment_sum(vs.xyz * w[..., None], seg,
                                num_segments=total, **srt)
    safe_n_all = jnp.maximum(count, 1.0)
    mean_all = sum_x / safe_n_all[..., None]
    # weight each residual outer product by w ONCE (w·r·rᵀ, not (w·r)(w·r)ᵀ
    # = w²·r·rᵀ): for binary masks they coincide, but fractional weights
    # must stay consistent with the w-summed count used as the divisor
    r = vs.xyz - mean_all[seg]
    outer = (r * w[..., None])[..., :, None] * r[..., None, :]
    sum_cc = jax.ops.segment_sum(outer, seg, num_segments=total, **srt)
    count, mean = count[..., :-1], mean_all[..., :-1, :]
    cov = sum_cc[..., :-1, :, :] / jnp.maximum(count, 1.0)[..., None, None]
    valid = (count > 0.5).astype(vs.xyz.dtype)
    return VoxelStats(count, mean, cov, valid)


class PointVoxelStats(NamedTuple):
    """Per-POINT voxel statistics (each sorted point carries its own
    voxel's stats) — the gather-free counterpart of :class:`VoxelStats`."""

    count: jax.Array  # f32[N]
    mean: jax.Array   # f32[N,3]
    cov: jax.Array    # f32[N,3,3]


def voxel_stats_scan(vs: VoxelSort) -> PointVoxelStats:
    """Count/mean/covariance per point via segmented PREFIX SUMS.

    ``voxel_stats`` materializes per-voxel tables with ``segment_sum``
    (a scatter-shaped op: measured ~15 ms at 131k rows on v5e — the
    single largest chunk of the ingest filter's device time) and then
    gathers them back per point. Because the voxel sort makes segments
    CONTIGUOUS, the same sums fall out of an ordinary ``cumsum`` over
    the sorted rows read at each segment's [start-1, end] boundaries —
    log-depth scans the TPU lowers efficiently (~3-4x cheaper than the
    segment_sum path end-to-end). Consumers that want per-point values
    (the edges/planes classifier gathers stats per point anyway) skip
    the table round-trip entirely.

    Same two-pass centered covariance as :func:`voxel_stats` (the
    one-pass form cancels catastrophically in f32 — see its docstring);
    summation ORDER differs (sequential prefix vs segment tree), so
    covariances agree to f32 roundoff, not bitwise.
    """
    n = vs.xyz.shape[-2]
    w = vs.mask
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    # segment boundaries per point: start from the forward max-scan of
    # first-markers; end from the reverse min-scan of last-markers
    start_here = jnp.where(vs.first > 0.5, idx, -1)
    start = jax.lax.associative_scan(jnp.maximum, start_here)
    start = jnp.maximum(start, 0)
    nxt_first = jnp.concatenate(
        [vs.first[1:] > 0.5, jnp.ones((1,), bool)])
    end_here = jnp.where(nxt_first, idx, n)
    end = jax.lax.associative_scan(jnp.minimum, end_here, reverse=True)

    def seg_sum(vals):  # [N, D] -> per-point segment sums via prefix
        P = jnp.cumsum(vals, axis=0)
        lo = jnp.where(start[:, None] > 0,
                       jnp.take(P, jnp.maximum(start - 1, 0), axis=0), 0.0)
        return jnp.take(P, end, axis=0) - lo

    s1 = seg_sum(jnp.concatenate([w[:, None], vs.xyz * w[:, None]], axis=1))
    count = s1[:, 0]
    mean = s1[:, 1:4] / jnp.maximum(count, 1.0)[:, None]
    r = vs.xyz - mean
    outer = ((r * w[:, None])[:, :, None] * r[:, None, :]).reshape(n, 9)
    s2 = seg_sum(outer)
    cov = s2.reshape(n, 3, 3) / jnp.maximum(count, 1.0)[:, None, None]
    return PointVoxelStats(count, mean, cov)


def voxel_first_indices_np(xyz, res: float):
    """Host-side exact "first point per voxel" dedup → sorted int indices.

    Map *assembly* is a rare host-side op (localizer/local-map aggregate
    builds); all per-query compute stays on device. Shared by
    frontend/local_map.py and frontend/localizer.py.
    """
    import numpy as np

    cells = np.floor(np.asarray(xyz) / res).astype(np.int64)
    _, idx = np.unique(cells, axis=0, return_index=True)
    return np.sort(idx)


def hash_subsample_np(idx, cap: int):
    """Deterministic hash-uniform subsample of an index array to ``cap``.

    Host-side counterpart of filters.pipeline._compact_uniform's hash
    decorrelation: voxel-sorted / azimuth-ordered buffers must NEVER be
    truncated in input order (``[:cap]`` keeps a spatial slab and biases
    registration — CLAUDE.md invariant). Knuth multiplicative hash spreads
    the kept entries uniformly over the input regardless of its ordering.
    Shared by frontend/localizer.py, frontend/local_map.py, and the bench
    harnesses."""
    import numpy as np

    idx = np.asarray(idx)
    if len(idx) <= cap:
        return idx
    h = (idx.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    return idx[np.argsort(h)][:cap]
