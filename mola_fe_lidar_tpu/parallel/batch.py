"""Batched ICP alignment — the vmap/pjit replacement for the reference's
scan-pair thread pool (E12 / SURVEY.md §2c).

The reference fans nearby-keyframe and loop-closure ICP jobs out to
``worker_pool_past_KFs_`` threads (reference src/LidarOdometry.cpp:708-741)
and runs the loop-closure Monte-Carlo as a host loop of 10 perturbed aligns
(:775-787). Here K scan pairs (or K perturbed guesses) are one
``[K, N, 3]`` batch and a single device dispatch; under a data mesh the
batch axis shards across chips (the "64 pairs on v5e-8" BASELINE config).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cloud.metric_map import MetricMap
from ..geometry import se3
from ..models.config import ICPParams
from ..models.icp import ICPResult, align


def make_batched_align(params: ICPParams, mesh: Optional[Mesh] = None,
                       data_axis: str = "data"):
    """Build a jitted batched align: maps over the leading axis of
    (src_maps, tgt_maps, init_poses). With a mesh, inputs/outputs are
    annotated to shard the batch axis over ``data_axis`` so XLA partitions
    the whole while_loop program across devices (pure DP — no cross-chip
    traffic inside an alignment)."""
    f = jax.vmap(lambda s, t, g: align(s, t, g, params))
    if mesh is None:
        return jax.jit(f)
    shard = NamedSharding(mesh, P(data_axis))
    return jax.jit(f, in_shardings=(shard, shard, shard), out_shardings=shard)


def batched_align(
    src_maps: MetricMap,
    tgt_maps: MetricMap,
    init_poses: se3.Pose,
    params: ICPParams,
    mesh: Optional[Mesh] = None,
) -> ICPResult:
    """One-shot convenience wrapper over :func:`make_batched_align`."""
    return make_batched_align(params, mesh)(src_maps, tgt_maps, init_poses)


def monte_carlo_guesses(
    key: jax.Array,
    center: se3.Pose,
    n_samples: int,
    sigma_xyz: float,
    sigma_rot: float,
    full_rotation: bool = False,
) -> se3.Pose:
    """Batch of Gaussian-perturbed initial guesses for loop closure.

    Rebuild of the reference's Monte-Carlo loop (reference
    src/LidarOdometry.cpp:767-787: 10 samples, σ_xyz = 0.1·max_lc_dist,
    σ_yaw = 2° — yaw-only unless ``full_rotation``), vectorized with
    ``jax.random`` (E17) so all samples align in one batch.
    """
    kt, kr = jax.random.split(key)
    dxyz = sigma_xyz * jax.random.normal(kt, (n_samples, 3), center.t.dtype)
    if full_rotation:
        drot = sigma_rot * jax.random.normal(kr, (n_samples, 3), center.t.dtype)
    else:
        yaw = sigma_rot * jax.random.normal(kr, (n_samples, 1), center.t.dtype)
        drot = jnp.concatenate([jnp.zeros((n_samples, 2), center.t.dtype), yaw], axis=-1)
    tau = jnp.concatenate([dxyz, drot], axis=-1)
    perturb = jax.vmap(se3.exp)(tau)
    center_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_samples, *x.shape)), center)
    return se3.compose(perturb, center_b)


def make_chunked_batched_align(params: ICPParams, chunk: int = 16):
    """Batched align that scans over chunks of ``chunk`` pairs.

    Under one big vmap, a single slow-converging pair stalls the WHOLE
    batch at ``max_iterations`` (the while_loop runs until every element
    converges). Scanning vmapped chunks bounds the blast radius of a
    straggler to its chunk: total time = Σ chunk times, and healthy chunks
    exit after a handful of iterations. Batch size must divide by ``chunk``.

    Measured on the v5e (64 pairs, 2048 pts, reference-parity kNN p2plane):
    84 pairs/s at chunk 16 → 131 (8) → 181 (4) → 236 (2) → 202 (1); per-pair
    convergence variance is large enough that small chunks win decisively
    until the per-chunk dispatch-within-scan overhead flips at chunk 1.
    Pick small chunks when convergence variance is high (poor initial
    guesses), larger when every lane behaves identically.
    """
    inner = jax.vmap(lambda s, t, g: align(s, t, g, params))

    @jax.jit
    def run(src_maps, tgt_maps, init_poses):
        b = jax.tree.leaves(init_poses)[0].shape[0]
        if b % chunk:
            raise ValueError(f"batch {b} not divisible by chunk {chunk}")
        reshape = lambda x: x.reshape(b // chunk, chunk, *x.shape[1:])
        args = jax.tree.map(reshape, (src_maps, tgt_maps, init_poses))

        def step(_, xs):
            s, t, g = xs
            return None, inner(s, t, g)

        _, out = jax.lax.scan(step, None, args)
        return jax.tree.map(lambda x: x.reshape(b, *x.shape[2:]), out)

    return run
