"""Voxel-hash (grid) nearest-neighbor search — the large-cloud backend (E3).

Brute-force NN is O(N·M); for big clouds the classic accelerator is a
spatial hash. The TPU-native formulation keeps every shape static:

* **build**: quantize target points to cells of pitch ``cell`` (≥ the
  matcher's distance threshold), hash cells into a fixed table of
  ``table_size`` slots × ``bucket`` entries, and scatter point indices by
  (slot, within-slot rank) — rank comes from a sort + segment position, so
  the build is sort-based like everything else in ``cloud.voxel``.
* **query**: each source point gathers the 27 neighbor cells' buckets
  (≤ 27·bucket candidates) and reduces distances on the VPU.

Guarantees: if a source point's true nearest neighbor lies within ``cell``
meters, it is found *unless* that neighbor was dropped by bucket overflow
(hash collisions share slots; overflowing entries are discarded). With
``table_size ≈ 2·M`` and ``bucket ≥ 8`` overflow is rare on LiDAR-density
clouds; since consumers threshold matches at ``distance_threshold ≤ cell``
anyway, a dropped candidate degrades a pairing, never corrupts one (the
distance check filters false positives from collisions).

Performance envelope (measured on v5e, full table in
``docs/nn_crossover.json``): the query is **gather-bound** — TPU random
gathers are slow relative to dense compute — and the grid LOSES to the
brute-force paths at every measured size (e.g. 131k×131k: grid ~1.4 s vs
the fused Pallas 1-NN ~0.31 s; 2k×2k: 13 ms vs <1 ms). It is kept for its
*radius-limited semantics* (matches the matcher's distance threshold
exactly, never pairs beyond ``cell``) and for memory-constrained regimes —
not as a fast path. The engine default is ``nn_backend="auto"`` → on TPU,
the XLA tiled scan at <= 4096 target points and the Pallas kernel above
(models/icp.py::_resolve_backend).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .matching import NNResult

_BIG = 1e30
_P1, _P2, _P3 = 73856093, 19349663, 83492791  # classic spatial-hash primes


class GridIndex(NamedTuple):
    table: jax.Array    # i32[H, K] point indices, -1 = empty
    origin: jax.Array   # f32[3]
    cell: jax.Array     # f32[]
    # static table size lives in table.shape


def _cell_hash(cells: jax.Array, table_size: int) -> jax.Array:
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return jnp.abs(h) % table_size


@functools.partial(jax.jit, static_argnames=("table_size", "bucket"))
def build_grid(
    tgt: jax.Array,       # [M, 3]
    tgt_mask: jax.Array,  # [M]
    cell: float,
    table_size: int = 0,
    bucket: int = 8,
) -> GridIndex:
    m = tgt.shape[-2]
    H = table_size or 1 << max(8, (2 * m - 1).bit_length())
    big = jnp.asarray(1e9, tgt.dtype)
    masked = jnp.where(tgt_mask[:, None] > 0.5, tgt, big)
    origin = jnp.min(masked, axis=0) - cell
    cells = jnp.floor((tgt - origin) / cell).astype(jnp.int32)
    slot = _cell_hash(cells, H)
    slot = jnp.where(tgt_mask > 0.5, slot, H)  # padding → out-of-range

    # rank within slot: sort by slot, positions within runs
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    slot_s, idx_s = jax.lax.sort((slot, iota), num_keys=1)
    first = jnp.concatenate([
        jnp.ones((1,), bool), slot_s[1:] != slot_s[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, iota, -1))
    rank = iota - run_start

    keep = (rank < bucket) & (slot_s < H)
    flat = jnp.where(keep, slot_s * bucket + rank, H * bucket)
    table = jnp.full((H * bucket + 1,), -1, jnp.int32)
    table = table.at[flat].set(idx_s)
    return GridIndex(table[:-1].reshape(H, bucket), origin,
                     jnp.asarray(cell, tgt.dtype))


# numpy, not jnp: this module may first be imported inside a jit trace
# (lazy import in the engine) — a module-level jnp constant would capture a
# tracer and leak it past the trace.
_OFFSETS = np.stack(np.meshgrid(
    np.arange(-1, 2), np.arange(-1, 2), np.arange(-1, 2),
    indexing="ij"), axis=-1).reshape(27, 3).astype(np.int32)


@jax.jit
def grid_nearest_neighbors(
    src: jax.Array,       # [N, 3]
    src_mask: jax.Array,  # [N]
    grid: GridIndex,
    tgt: jax.Array,       # [M, 3] (same cloud the grid was built from)
    tgt_mask: jax.Array,  # [M]
) -> NNResult:
    """1-NN among candidates within ±1 cell; ~`cell`-radius-limited search.

    Points with no candidate in range return the _BIG sentinel distance —
    exactly how downstream thresholded matchers treat "no match".
    """
    H, K = grid.table.shape
    cells = jnp.floor((src - grid.origin) / grid.cell).astype(jnp.int32)
    neigh_cells = cells[:, None, :] + _OFFSETS[None, :, :]       # [N,27,3]
    slots = _cell_hash(neigh_cells, H)                            # [N,27]
    cand = grid.table[slots]                                      # [N,27,K]
    cand = cand.reshape(src.shape[0], 27 * K)
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)
    # gather coordinates per axis: [N, 27K] stays lane-aligned, whereas a
    # [N, 27K, 3] gather pads the 3-lane minor dim to 128 (42x HBM blowup)
    d2 = jnp.zeros(cand.shape, jnp.float32)
    for c in range(3):
        dc = jnp.take(tgt[:, c], safe, axis=0) - src[:, c:c + 1]
        d2 = d2 + dc * dc
    valid = valid & (jnp.take(tgt_mask, safe, axis=0) > 0.5)
    d2 = jnp.where(valid, d2, _BIG)
    best = jnp.argmin(d2, axis=-1)
    dist2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
    idx = jnp.take_along_axis(cand, best[:, None], axis=-1)[:, 0]
    # radius-limited semantics: only within-cell results are guaranteed
    # optimal (hash collisions can surface far candidates) — clamp the rest
    dist2 = jnp.where(dist2 <= grid.cell * grid.cell, dist2, _BIG)
    dist2 = jnp.where(src_mask > 0.5, dist2, _BIG)
    idx = jnp.maximum(idx, 0)
    return NNResult(idx, jnp.sqrt(jnp.maximum(dist2, 0.0)))


@functools.partial(jax.jit, static_argnames=("bucket",))
def grid_nn(src, src_mask, tgt, tgt_mask, cell: float, bucket: int = 8) -> NNResult:
    """Convenience: build + query in one call (cell ≥ matcher threshold)."""
    grid = build_grid(tgt, tgt_mask, cell, bucket=bucket)
    return grid_nearest_neighbors(src, src_mask, grid, tgt, tgt_mask)
