"""Nearest-neighbor correspondence search — the hot kernel of ICP (E3).

The reference finds correspondences with a nanoflann kd-tree per scan
(mp2p_icp ``Matcher_Point2Plane``: kNN=6, distanceThreshold 0.70 m —
reference params/icp-settings-regular.yaml:32-39, built per ``align()`` call
inside mp2p_icp). Tree construction + pointer-chasing traversal is the
antithesis of TPU execution, so the TPU-native formulation is a **tiled
brute-force scan**:

    d²(s, t) = ‖s‖² + ‖t‖² − 2·s·tᵀ

The cross term is an ``[N,3] @ [3,T]`` matmul per target tile (MXU), the
rest is VPU element-wise work, and a running (arg)min is carried across
tiles with ``lax.scan`` so the full ``[N,M]`` distance matrix is never
materialized. Fixed shapes; masking handles padding.

Numerical note: the expansion cancels catastrophically in f32 when points
sit far from the origin (‖s‖² ~ 1e4 swamps d² ~ 1e-2). Both clouds are
therefore shifted by a shared masked centroid before the search — NN
indices are invariant to a common translation.

A Pallas fused kernel (``pallas_knn.py``) implements the same contract for
peak performance; this module is the portable XLA path and the ground truth
for its tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy scalar, NOT jnp: a jnp constant here would execute a device op
# at import time and initialize the jax backend before callers (runner --cpu,
# dryrun_multichip, tests conftest) can force the virtual CPU mesh
_BIG = np.float32(1e30)


class NNResult(NamedTuple):
    idx: jax.Array   # i32[..., N]    index into target cloud
    dist: jax.Array  # f32[..., N]    euclidean distance (inf-like for masked)


def _common_shift(src, src_mask, tgt, tgt_mask):
    w_s = src_mask[..., None]
    w_t = tgt_mask[..., None]
    total = jnp.sum(w_s, axis=-2) + jnp.sum(w_t, axis=-2)
    s = jnp.sum(src * w_s, axis=-2) + jnp.sum(tgt * w_t, axis=-2)
    return s / jnp.maximum(total, 1.0)


def _pad_to_multiple(x, mask, tile):
    m = x.shape[-2]
    pad = (-m) % tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((*x.shape[:-2], pad, 3), x.dtype)], axis=-2
        )
        mask = jnp.concatenate(
            [mask, jnp.zeros((*mask.shape[:-1], pad), mask.dtype)], axis=-1
        )
    return x, mask


@functools.partial(jax.jit, static_argnames=("tile",))
def nearest_neighbors(
    src: jax.Array,
    src_mask: jax.Array,
    tgt: jax.Array,
    tgt_mask: jax.Array,
    tile: int = 512,
) -> NNResult:
    """1-NN of each source point in the target cloud (masked, tiled).

    Args are unbatched ``[N,3]/[N]`` and ``[M,3]/[M]``; vmap for batches.
    Masked target points never win; masked source rows return dist ~1e15.
    """
    shift = _common_shift(src, src_mask, tgt, tgt_mask)
    src_c = src - shift
    tgt_c = tgt - shift
    tgt_c, tgt_mask_p = _pad_to_multiple(tgt_c, tgt_mask, tile)
    m_padded = tgt_c.shape[-2]
    n_tiles = m_padded // tile

    src_sq = jnp.sum(src_c * src_c, axis=-1)  # [N]
    tgt_tiles = tgt_c.reshape(n_tiles, tile, 3)
    tgt_mask_tiles = tgt_mask_p.reshape(n_tiles, tile)

    n = src.shape[-2]
    init = (jnp.full((n,), _BIG), jnp.zeros((n,), jnp.int32))

    def body(carry, inp):
        t_idx, t_xyz, t_mask = inp
        cross = jnp.einsum("nd,td->nt", src_c, t_xyz, precision="highest")
        t_sq = jnp.sum(t_xyz * t_xyz, axis=-1)
        d2 = src_sq[:, None] + t_sq[None, :] - 2.0 * cross
        d2 = jnp.where(t_mask[None, :] > 0.5, d2, _BIG)
        tile_best = jnp.min(d2, axis=-1)
        tile_arg = jnp.argmin(d2, axis=-1).astype(jnp.int32) + t_idx * tile
        best_d, best_i = carry
        better = tile_best < best_d
        return (
            jnp.where(better, tile_best, best_d),
            jnp.where(better, tile_arg, best_i),
        ), None

    tile_ids = jax.lax.iota(jnp.int32, n_tiles)
    (best_d, best_i), _ = jax.lax.scan(body, init, (tile_ids, tgt_tiles, tgt_mask_tiles))
    best_d = jnp.where(src_mask > 0.5, best_d, _BIG)
    return NNResult(best_i, jnp.sqrt(jnp.maximum(best_d, 0.0)))


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def knn(
    src: jax.Array,
    src_mask: jax.Array,
    tgt: jax.Array,
    tgt_mask: jax.Array,
    k: int,
    tile: int = 512,
) -> NNResult:
    """k-NN of each source point in the target cloud.

    Returns ``idx: i32[N,k]`` and ``dist: f32[N,k]`` (ascending). Carries a
    per-point top-k across target tiles via ``lax.top_k`` on the merged
    candidate set — still never materializes ``[N,M]``.
    """
    shift = _common_shift(src, src_mask, tgt, tgt_mask)
    src_c = src - shift
    tgt_c = tgt - shift
    tgt_c, tgt_mask_p = _pad_to_multiple(tgt_c, tgt_mask, tile)
    m_padded = tgt_c.shape[-2]
    n_tiles = m_padded // tile

    src_sq = jnp.sum(src_c * src_c, axis=-1)
    tgt_tiles = tgt_c.reshape(n_tiles, tile, 3)
    tgt_mask_tiles = tgt_mask_p.reshape(n_tiles, tile)

    n = src.shape[-2]
    init = (jnp.full((n, k), _BIG), jnp.zeros((n, k), jnp.int32))

    def body(carry, inp):
        t_idx, t_xyz, t_mask = inp
        cross = jnp.einsum("nd,td->nt", src_c, t_xyz, precision="highest")
        t_sq = jnp.sum(t_xyz * t_xyz, axis=-1)
        d2 = src_sq[:, None] + t_sq[None, :] - 2.0 * cross
        d2 = jnp.where(t_mask[None, :] > 0.5, d2, _BIG)
        ids = jax.lax.broadcasted_iota(jnp.int32, (n, tile), 1) + t_idx * tile
        best_d, best_i = carry
        cand_d = jnp.concatenate([best_d, d2], axis=-1)
        cand_i = jnp.concatenate([best_i, ids], axis=-1)
        neg_top, pos = jax.lax.top_k(-cand_d, k)
        new_i = jnp.take_along_axis(cand_i, pos, axis=-1)
        return (-neg_top, new_i), None

    tile_ids = jax.lax.iota(jnp.int32, n_tiles)
    (best_d, best_i), _ = jax.lax.scan(body, init, (tile_ids, tgt_tiles, tgt_mask_tiles))
    best_d = jnp.where(src_mask[:, None] > 0.5, best_d, _BIG)
    return NNResult(best_i, jnp.sqrt(jnp.maximum(best_d, 0.0)))


# --------------------------------------------------------------------------
# Tensor-parallel variants: target point axis sharded across a mesh axis
# (SURVEY.md §2c TP row: shard the M-axis of one huge cloud's NN search with
# shard_map; the cross-shard argmin-reduction rides ICI collectives).
# Call these inside ``shard_map`` with ``tgt``/``tgt_mask`` sharded on the
# point axis and ``src`` replicated.
# --------------------------------------------------------------------------

def tp_nearest_neighbors(
    src: jax.Array,
    src_mask: jax.Array,
    tgt_shard: jax.Array,
    tgt_mask_shard: jax.Array,
    axis_name: str,
    tile: int = 512,
) -> NNResult:
    """1-NN where each device holds a shard of the target cloud.

    Local streaming argmin per shard, then a tiny ``all_gather`` of the
    per-shard champions (P×N floats+ints) and a replicated final argmin.
    Returned indices are global (shard offset added).
    """
    local = nearest_neighbors(src, src_mask, tgt_shard, tgt_mask_shard, tile=tile)
    shard_size = tgt_shard.shape[-2]
    my = jax.lax.axis_index(axis_name)
    global_idx = local.idx + my * shard_size
    d_all = jax.lax.all_gather(local.dist, axis_name)   # [P, N]
    i_all = jax.lax.all_gather(global_idx, axis_name)   # [P, N]
    best = jnp.argmin(d_all, axis=0)                    # [N]
    dist = jnp.take_along_axis(d_all, best[None, :], axis=0)[0]
    idx = jnp.take_along_axis(i_all, best[None, :], axis=0)[0]
    return NNResult(idx, dist)


def tp_gather_points(
    points_shard: jax.Array, global_idx: jax.Array, axis_name: str
) -> jax.Array:
    """Gather rows of a point-axis-sharded ``[M/P, D]`` array by global
    indices, replicated result ``[N, D]``.

    Each device contributes its local candidates; the owner's row wins via
    a masked ``psum`` (zero elsewhere) — one reduction on ICI.
    """
    shard_size = points_shard.shape[-2]
    my = jax.lax.axis_index(axis_name)
    local_idx = global_idx - my * shard_size
    in_range = (local_idx >= 0) & (local_idx < shard_size)
    safe = jnp.clip(local_idx, 0, shard_size - 1)
    vals = jnp.take(points_shard, safe, axis=-2)
    vals = jnp.where(in_range[..., None], vals, 0.0)
    return jax.lax.psum(vals, axis_name)


def tp_knn(
    src: jax.Array,
    src_mask: jax.Array,
    tgt_shard: jax.Array,
    tgt_mask_shard: jax.Array,
    k: int,
    axis_name: str,
    tile: int = 512,
) -> NNResult:
    """k-NN with the target point axis sharded: local top-k per shard,
    all_gather the P×k candidates, replicated merge to global top-k."""
    local = knn(src, src_mask, tgt_shard, tgt_mask_shard, k=k, tile=tile)
    shard_size = tgt_shard.shape[-2]
    my = jax.lax.axis_index(axis_name)
    global_idx = local.idx + my * shard_size
    d_all = jax.lax.all_gather(local.dist, axis_name)   # [P, N, k]
    i_all = jax.lax.all_gather(global_idx, axis_name)   # [P, N, k]
    P = d_all.shape[0]
    n = src.shape[-2]
    d_cat = jnp.moveaxis(d_all, 0, -2).reshape(n, P * k)
    i_cat = jnp.moveaxis(i_all, 0, -2).reshape(n, P * k)
    neg_top, pos = jax.lax.top_k(-d_cat, k)
    idx = jnp.take_along_axis(i_cat, pos, axis=-1)
    return NNResult(idx, -neg_top)


# --------------------------------------------------------------------------
# MXU fast path: low-precision cross-term candidates + exact f32 rescore
# (VERDICT round-2 item #4). Three measured facts shape this design
# (docs/nn_crossover.json):
#  * the d² expansion's matmul has contraction dim 3, so MXU *passes* are
#    what cost: HIGHEST (f32-faithful) = 6 bf16 passes, HIGH (bf16x3) = 3,
#    DEFAULT (plain bf16) = 1;
#  * single-pass bf16 candidates collapse at large targets (recall 0.64 at
#    32k): the cross term's absolute error is ~|s||t|·2⁻⁸ ≈ 14 m² on a
#    centered 60 m cloud — a ±3.7 m noise ball that holds more points than
#    any reasonable candidate list once clouds are dense. bf16x3's 2⁻¹⁶
#    shrinks the ball to ~0.2 m: recall stays 1.0 through 32k. HIGH it is;
#  * a lax.scan over tiles with a per-tile top_k merge is 5–15× slower
#    than ONE `lax.approx_min_k` over the full row (the TPU-native top-k
#    unit, which XLA fuses with the distance expansion) — and the scan
#    variant crashed the TPU worker outright at 131k.
# So: HIGH-precision expansion + approx_min_k for `cand_k` candidates, then
# exact f32 re-evaluation of those candidates in **difference form** (no
# cancellation) and a true top-k. approx_min_k's ~per-candidate recall
# shortfall applies to the *candidate list*, not the answer: the exact
# rescore only needs the true k inside the top-`cand_k`, which is why the
# measured recall@k lands ≥0.999 where direct approx_min_k@k sits at ~0.95.
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "cand_k", "prec",
                                             "recall_target"))
def knn_mxu(
    src: jax.Array,
    src_mask: jax.Array,
    tgt: jax.Array,
    tgt_mask: jax.Array,
    k: int,
    cand_k: int = 32,
    prec: str = "high",
    recall_target: float = 0.95,
) -> NNResult:
    """k-NN: reduced-precision MXU candidate generation + exact f32 rescore.

    ``prec`` picks the candidate pass ("high" = 3-pass bf16x3, "default" =
    1-pass bf16 — only safe for small/sparse targets, see module note).
    ``recall_target`` tunes approx_min_k's reduction ratio for the
    *candidate* stage. Same contract as ``knn`` (ascending, masked targets
    never win, masked source rows ~1e15). Batched inputs vmap cleanly.
    """
    cand_k = max(cand_k, k)
    precision = (jax.lax.Precision.HIGH if prec == "high"
                 else jax.lax.Precision.DEFAULT)
    shift = _common_shift(src, src_mask, tgt, tgt_mask)
    src_c = jnp.where(src_mask[..., None] > 0.5, src - shift, 0.0)
    tgt_c = jnp.where(tgt_mask[..., None] > 0.5, tgt - shift, 0.0)
    d2 = (
        jnp.sum(src_c * src_c, axis=-1)[..., :, None]
        + jnp.sum(tgt_c * tgt_c, axis=-1)[..., None, :]
        - 2.0 * jnp.einsum("...nd,...md->...nm", src_c, tgt_c,
                           precision=precision)
    )
    d2 = jnp.where(tgt_mask[..., None, :] > 0.5, d2, _BIG)
    _, cand_i = jax.lax.approx_min_k(d2, cand_k,
                                     recall_target=recall_target)

    # exact f32 rescore in difference form — immune to the expansion's
    # cancellation AND to the candidate pass's low precision
    cpts = jnp.take_along_axis(
        tgt[..., None, :, :], cand_i[..., None], axis=-2)  # [..., N, ck, 3]
    diff = cpts - src[..., :, None, :]
    d2x = jnp.sum(diff * diff, axis=-1)
    tm = jnp.take_along_axis(
        tgt_mask[..., None, :], cand_i, axis=-1)
    d2x = jnp.where(tm > 0.5, d2x, _BIG)
    neg, j = jax.lax.top_k(-d2x, k)
    idx = jnp.take_along_axis(cand_i, j, axis=-1)
    d = jnp.where(src_mask[..., :, None] > 0.5, -neg, _BIG)
    return NNResult(idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(d, 0.0)))


@functools.partial(jax.jit, static_argnames=("cand_k", "prec"))
def nearest_neighbors_mxu(
    src: jax.Array,
    src_mask: jax.Array,
    tgt: jax.Array,
    tgt_mask: jax.Array,
    cand_k: int = 16,
    prec: str = "high",
) -> NNResult:
    """1-NN through the MXU-candidates + f32-rescore path (see knn_mxu)."""
    nn = knn_mxu(src, src_mask, tgt, tgt_mask, k=1, cand_k=cand_k, prec=prec)
    return NNResult(nn.idx[..., 0], nn.dist[..., 0])


@functools.partial(jax.jit, static_argnames=("k",))
def approx_knn(
    src: jax.Array,
    src_mask: jax.Array,
    tgt: jax.Array,
    tgt_mask: jax.Array,
    k: int,
) -> NNResult:
    """k-NN via ``jax.lax.approx_min_k`` — the TPU-native top-k unit.

    ~25× faster to compile and far faster to run than the scan-merge exact
    path; per-neighbor recall ≈ 96% on uniform clouds, which is more than
    enough for neighborhood plane fits (the consumers re-weight by distance
    anyway). XLA fuses the distance expansion into the reduction, so the
    [N, M] matrix is never materialized. Falls back to exact top-k on CPU.
    """
    shift = _common_shift(src, src_mask, tgt, tgt_mask)
    src_c = jnp.where(src_mask[..., None] > 0.5, src - shift, 0.0)
    tgt_c = jnp.where(tgt_mask[..., None] > 0.5, tgt - shift, 0.0)
    d2 = (
        jnp.sum(src_c * src_c, axis=-1)[..., :, None]
        + jnp.sum(tgt_c * tgt_c, axis=-1)[..., None, :]
        - 2.0 * jnp.einsum("...nd,...md->...nm", src_c, tgt_c, precision="highest")
    )
    d2 = jnp.where(tgt_mask[..., None, :] > 0.5, d2, _BIG)
    vals, idx = jax.lax.approx_min_k(d2, k)
    vals = jnp.where(src_mask[..., :, None] > 0.5, vals, _BIG)
    return NNResult(idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(vals, 0.0)))
