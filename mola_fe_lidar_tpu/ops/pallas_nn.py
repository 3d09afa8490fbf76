"""Pallas fused nearest-neighbor kernel for TPU.

The XLA path (``ops.matching``) lowers the tiled brute-force NN as a
``lax.scan`` of (matmul → add norms → min/argmin) steps: each step writes
its ``[N, tile]`` distance block to HBM-backed buffers between fusions.
This kernel fuses the whole sweep: for one block of source points held in
VMEM, it loops over all target tiles in-kernel, computing the cross-term on
the MXU and folding the running (min, argmin) in registers/VMEM — the
``[N, M]`` distance matrix never exists anywhere, and HBM traffic is the
theoretical minimum (read each cloud once, write N results).

Grid: one program per source block; batch rides a leading grid axis.
Shapes padded to (8, 128) f32 tiles. Masked targets are +inf'd via the
mask column trick; masked sources handled by the caller (``matching``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _nn_kernel(src_ref, tgt_ref, tmask_ref, dist_ref, idx_ref, *, tgt_tile: int):
    """One source block [BN, 3pad] vs the whole target cloud [M, 3pad]."""
    src = src_ref[:]                      # [BN, 8]  (coords padded to 8)
    src_sq = jnp.sum(src * src, axis=-1, keepdims=True)  # [BN, 1]
    m = tgt_ref.shape[0]
    n_tiles = m // tgt_tile

    bn = src.shape[0]
    best_d = jnp.full((bn, 1), _BIG, jnp.float32)
    best_i = jnp.zeros((bn, 1), jnp.int32)

    def body(t, carry):
        best_d, best_i = carry
        tgt = tgt_ref[pl.ds(t * tgt_tile, tgt_tile), :]        # [T, 8]
        tmask = tmask_ref[pl.ds(t * tgt_tile, tgt_tile), :]    # [T, 1]
        cross = jax.lax.dot_general(
            src, tgt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [BN, T]
        tgt_sq = jnp.sum(tgt * tgt, axis=-1)[None, :]           # [1, T]
        d2 = src_sq + tgt_sq - 2.0 * cross
        d2 = jnp.where(tmask[:, 0][None, :] > 0.5, d2, _BIG)
        tile_min = jnp.min(d2, axis=-1, keepdims=True)          # [BN, 1]
        tile_arg = jnp.argmin(d2, axis=-1).astype(jnp.int32)[:, None] + t * tgt_tile
        better = tile_min < best_d
        return (jnp.where(better, tile_min, best_d),
                jnp.where(better, tile_arg, best_i))

    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, (best_d, best_i))
    dist_ref[:] = best_d
    idx_ref[:] = best_i


def _pad_pts(x, mult_rows):
    """Pad [*, N, 3] → [*, N_pad, 8] (f32 tile-friendly lanes)."""
    n = x.shape[-2]
    pad_n = (-n) % mult_rows
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, pad_n), (0, 5)])
    return x


@functools.partial(jax.jit, static_argnames=("src_block", "tgt_tile"))
def pallas_nearest_neighbors(
    src: jax.Array,       # [N, 3]
    src_mask: jax.Array,  # [N]
    tgt: jax.Array,       # [M, 3]
    tgt_mask: jax.Array,  # [M]
    src_block: int = 1024,
    tgt_tile: int = 1024,
):
    """1-NN (squared-distance argmin) via the fused Pallas kernel.

    Returns (idx i32[N], dist f32[N]) with the same contract as
    ``matching.nearest_neighbors``. Shapes are padded internally.
    """
    n, m = src.shape[-2], tgt.shape[-2]
    # common centroid shift (see matching.py numerical note)
    w_s = src_mask[:, None]
    w_t = tgt_mask[:, None]
    tot = jnp.maximum(jnp.sum(w_s) + jnp.sum(w_t), 1.0)
    shift = (jnp.sum(src * w_s, axis=0) + jnp.sum(tgt * w_t, axis=0)) / tot
    src_c = jnp.where(w_s > 0.5, src - shift, 0.0)
    tgt_c = jnp.where(w_t > 0.5, tgt - shift, 0.0)

    src_p = _pad_pts(src_c, src_block)
    tgt_p = _pad_pts(tgt_c, tgt_tile)
    n_pad, m_pad = src_p.shape[-2], tgt_p.shape[-2]
    tmask_p = jnp.pad(tgt_mask, (0, m_pad - m))[:, None]

    grid = (n_pad // src_block,)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, tgt_tile=tgt_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((src_block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((src_block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((src_block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * 8,
            bytes_accessed=4 * (n_pad * 8 + (n_pad // src_block) * m_pad * 8 + n_pad * 2),
            transcendentals=0,
        ),
    )(src_p, tgt_p, tmask_p)

    d = dist[:n, 0]
    i = idx[:n, 0]
    d = jnp.where(src_mask > 0.5, d, _BIG)
    return i, jnp.sqrt(jnp.maximum(d, 0.0))
