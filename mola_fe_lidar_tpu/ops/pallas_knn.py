"""Pallas fused k-NN kernel for TPU — the reference-parity hot op.

The reference's matcher is kNN=6 neighborhood eigen-fit point-to-plane
(reference params/icp-settings-regular.yaml:33-39, nanoflann kd-tree inside
mp2p_icp). kd-trees don't map to TPUs; the XLA paths here are either a
scan-merged exact top-k (``matching.knn`` — slow, compile-heavy at ≥8k
points) or ``approx_min_k`` (fast, ~96% recall). This kernel is the exact
AND fast option for scan-sized clouds:

* **difference-form distances on the VPU** (``Σ_c (s_c − t_c)²``): exact
  f32, no cancellation, no [N,M] matrix — per source block the target
  cloud streams through VMEM once (same layout as ``pallas_nn``);
* **lane-resident sorted champion lists**: each of the 128 lanes keeps its
  own ascending k-best (value + column-group id), maintained by an
  unrolled bubble insertion per 128-column candidate group. Per-lane
  k-best provably contains the global k-best (any global winner pruned
  from its lane would need k better candidates *in the same lane* —
  contradiction);
* **in-kernel 128-way merge**: the 128 sorted lane lists merge into the
  global ascending top-k with per-lane head pointers (k extraction steps),
  so the kernel writes k values per point — not 128·k candidates — and no
  XLA top-k pass follows.

Contract matches ``ops.matching.knn``: ``idx i32[N,k]``, ``dist f32[N,k]``
ascending; masked targets never win; masked source rows and empty slots
return the ~1e15 sentinel. Masked targets are parked at ``_PARK`` (3e4 per
axis) and any neighbor farther than ``_VALID_CUTOFF`` is reported at the
sentinel distance — sound while clouds live within ~10 km of their frame
origin (the voxel grid's 15-bit packing binds first anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_SENTINEL = 1e15          # reported distance for invalid slots (XLA parity)
_PARK = 3e4               # parked coordinate for masked targets
_VALID_CUTOFF = 1e4       # any true neighbor is closer than this


def _knn_kernel(src_ref, tgt_ref, val_ref, idx_ref, *, tgt_tile: int, k: int):
    """One source block vs the whole target cloud, exact k-NN.

    src_ref: [BN, 128] source block — x,y,z in lanes 0..2 (VMEM)
    tgt_ref: [8, M]    target cloud — x,y,z in sublanes 0..2 (VMEM)
    val_ref: [BN, 128] out — lanes 0..k-1: ascending champion d²
    idx_ref: [BN, 128] out — lanes 0..k-1: matching global target index
    """
    sx = src_ref[:, 0:1]
    sy = src_ref[:, 1:2]
    sz = src_ref[:, 2:3]
    m = tgt_ref.shape[1]
    n_tiles = m // tgt_tile
    groups_per_tile = tgt_tile // 128
    bn = sx.shape[0]

    init_v = tuple(jnp.full((bn, 128), _BIG, jnp.float32) for _ in range(k))
    init_g = tuple(jnp.zeros((bn, 128), jnp.int32) for _ in range(k))

    def body(t, carry):
        champs_v = list(carry[:k])
        champs_g = list(carry[k:])
        tx = tgt_ref[0:1, pl.ds(t * tgt_tile, tgt_tile)]  # [1, T]
        ty = tgt_ref[1:2, pl.ds(t * tgt_tile, tgt_tile)]
        tz = tgt_ref[2:3, pl.ds(t * tgt_tile, tgt_tile)]
        dx = sx - tx
        dy = sy - ty
        dz = sz - tz
        d2 = dx * dx + dy * dy + dz * dz                  # [BN, T]
        d3 = d2.reshape(bn, groups_per_tile, 128)
        for g in range(groups_per_tile):
            cand_v = d3[:, g, :]
            cand_g = jnp.full((bn, 128), t * groups_per_tile + g, jnp.int32)
            # bubble insertion: keeps each lane's list ascending; the
            # displaced (larger) element sinks to the next level
            for j in range(k):
                better = cand_v < champs_v[j]
                new_v = jnp.where(better, cand_v, champs_v[j])
                disp_v = jnp.where(better, champs_v[j], cand_v)
                new_g = jnp.where(better, cand_g, champs_g[j])
                disp_g = jnp.where(better, champs_g[j], cand_g)
                champs_v[j], champs_g[j] = new_v, new_g
                cand_v, cand_g = disp_v, disp_g
        return (*champs_v, *champs_g)

    carry = jax.lax.fori_loop(0, n_tiles, body, (*init_v, *init_g))
    champs_v, champs_g = carry[:k], carry[k:]

    # 128-way merge of the sorted lane lists -> global ascending top-k.
    lane = jax.lax.broadcasted_iota(jnp.int32, (bn, 128), 1)
    head = jnp.zeros((bn, 128), jnp.int32)
    out_v = jnp.full((bn, 128), _BIG, jnp.float32)
    out_i = jnp.zeros((bn, 128), jnp.int32)
    for s in range(k):
        headval = jnp.full((bn, 128), _BIG, jnp.float32)
        headgrp = jnp.zeros((bn, 128), jnp.int32)
        for j in range(k - 1, -1, -1):
            at_j = head == j
            headval = jnp.where(at_j, champs_v[j], headval)
            headgrp = jnp.where(at_j, champs_g[j], headgrp)
        best = jnp.min(headval, axis=1, keepdims=True)             # [BN,1]
        win_lane = jnp.min(jnp.where(headval == best, lane, 128),
                           axis=1, keepdims=True)                  # [BN,1]
        is_win = lane == win_lane
        win_grp = jnp.sum(jnp.where(is_win, headgrp, 0),
                          axis=1, keepdims=True)                   # [BN,1]
        win_idx = win_grp * 128 + win_lane
        out_v = jnp.where(lane == s, best, out_v)
        out_i = jnp.where(lane == s, win_idx, out_i)
        head = head + is_win.astype(jnp.int32)

    val_ref[:] = out_v
    idx_ref[:] = out_i


@functools.partial(jax.jit, static_argnames=("k", "src_block", "tgt_tile"))
def pallas_knn(
    src: jax.Array,       # [N, 3]
    src_mask: jax.Array,  # [N]
    tgt: jax.Array,       # [M, 3]
    tgt_mask: jax.Array,  # [M]
    k: int,
    src_block: int = 128,   # 256 blows the 16 MB scoped-VMEM limit (k=6)
    tgt_tile: int = 512,
):
    """Exact k-NN via the fused Pallas kernel (``matching.knn`` contract)."""
    assert k <= 128, "champion lists live in lanes; k must be <= 128"
    n, m = src.shape[-2], tgt.shape[-2]
    src_c = jnp.where(src_mask[:, None] > 0.5, src, 0.0)
    tgt_c = jnp.where(tgt_mask[:, None] > 0.5, tgt, _PARK)

    pad_n = (-n) % src_block
    pad_m = (-m) % tgt_tile
    src_p = jnp.pad(src_c, ((0, pad_n), (0, 0)))
    tgt_p = jnp.pad(tgt_c, ((0, pad_m), (0, 0)), constant_values=_PARK)
    n_pad, m_pad = n + pad_n, m + pad_m

    src_lanes = jnp.zeros((n_pad, 128), jnp.float32).at[:, 0:3].set(src_p)
    tgt_rows = jnp.zeros((8, m_pad), jnp.float32).at[0:3, :].set(tgt_p.T)

    grid = (n_pad // src_block,)
    val, idx = pl.pallas_call(
        functools.partial(_knn_kernel, tgt_tile=tgt_tile, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((src_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((src_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((src_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # 8 distance ops + ~5k/128-per-target insertion ops per pair
            flops=(8 + 5 * k * 128 // 128) * n_pad * m_pad,
            bytes_accessed=4 * (128 * n_pad * 2 + (n_pad // src_block) * 8 * m_pad
                                + n_pad * 256),
            transcendentals=0,
        ),
    )(src_lanes, tgt_rows)

    d2 = val[:n, :k]
    idx = idx[:n, :k]
    # parked targets / empty slots -> sentinel (XLA-contract parity); clamp
    # parked indices to the valid range so downstream gathers stay in-bounds
    invalid = d2 > _VALID_CUTOFF**2
    d2 = jnp.where(invalid, _BIG, d2)
    idx = jnp.where(invalid, 0, jnp.minimum(idx, m - 1))
    d2 = jnp.where(src_mask[:, None] > 0.5, d2, _BIG)
    from .matching import NNResult

    return NNResult(idx, jnp.sqrt(d2))
