"""The ICP engine (E2) — a device-resident rebuild of ``mp2p_icp::ICP``.

Reference seam: ``icp->align(pcs_from, pcs_to, current_solution, icp_params,
icp_result)`` (reference src/LidarOdometry.cpp:869-871), which internally
loops { match (kd-tree kNN point-to-plane) → Gauss-Newton ≤20 inner iters →
convergence check 5e-5 m / 1e-5 rad } up to 100 outer iterations
(reference params/icp-settings-regular.yaml:10-39).

TPU-native inversion of that architecture:

* the outer iteration is a ``lax.while_loop`` compiled into one XLA
  program — **zero host round-trips per iteration** (the reference pays a
  thread-hop + tree traversal per iteration; we pay nothing);
* matching is the tiled brute-force MXU kernel from ``ops.matching``;
* all stage configuration (matchers/solver/quality/weights) is static, so
  every distinct ``ICPParams`` specializes into branch-free code;
* the whole ``align`` is vmappable over a leading batch axis — odometry,
  nearby-keyframe checks and loop-closure Monte-Carlo perturbations
  (reference src/LidarOdometry.cpp:775-787) become one batched dispatch,
  and ``parallel/`` shards that batch across TPU cores.

Point-to-point pairings are folded into the point-to-plane Gauss-Newton
system as three axis-normal residual rows each (mathematically identical),
so one solver consumes every matcher's output.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud.metric_map import MetricMap
from ..geometry import se3
from ..ops import matching as matching_ops
from ..ops import eigen3
from ..solve import gauss_newton, horn, quality as quality_mod, robust
from .config import ICPParams, Matcher

TERM_CONVERGED = 0
TERM_MAX_ITERS = 1


class ICPResult(NamedTuple):
    """Analogue of ``mp2p_icp::Results`` (quality, optimal_tf PDF,
    nIterations, terminationReason — reference src/LidarOdometry.cpp:873-888)."""

    pose: se3.Pose        # optimal source→target transform
    cov: jax.Array        # f32[..., 6, 6] tangent covariance at the mean
    quality: jax.Array    # f32[...] goodness in [0, 1]
    n_iterations: jax.Array  # i32[...]
    term_reason: jax.Array   # i32[...] (TERM_* code)


class _Pairings(NamedTuple):
    p: jax.Array          # f32[K,3] source points (untransformed)
    q: jax.Array          # f32[K,3] matched target points / plane anchors
    n: jax.Array          # f32[K,3] plane normals (zeros for p2p rows)
    w: jax.Array          # f32[K]   weights (0 drops)
    is_plane: bool        # static


_AXES = np.eye(3, dtype=np.float32)  # numpy: safe under lazy import in a trace


def _resolve_backend(backend: str, tgt_points: int) -> str:
    """Resolve "auto" by measured IN-LOOP crossover (docs/nn_crossover.json
    loop10 columns — round 2 chose from standalone per-call timings, which
    the ~25 ms tunnel round-trip dominated, and picked Pallas at >4k; the
    in-loop truth is that the fused expansion + ``approx_min_k`` path wins
    at EVERY size, 0.4-3 ms/iteration where Pallas pays 1.1-5.5 and both
    Pallas and the XLA tiled scan serialize under vmap: 29 ms vs 155 ms
    for a vmapped 8x2048 10-iteration loop). recall@1 measured 1.0 at 8k
    and 32k; distances carry ~1e-3 m cancellation noise from the expansion
    form (thresholds are >= 0.1 m everywhere). CPU always uses XLA."""
    if backend != "auto":
        return backend
    if jax.default_backend() == "tpu":
        return "fused"
    return "xla"


def _nn_1(sp, src_mask, tgt, tile: int, backend: str):
    """1-NN through the resolved backend (shared by matchers + quality)."""
    backend = _resolve_backend(backend, tgt.xyz.shape[-2])
    if backend == "pallas" and jax.default_backend() == "tpu":
        from ..ops import pallas_nn

        i, d = pallas_nn.pallas_nearest_neighbors(sp, src_mask, tgt.xyz, tgt.mask)
        return matching_ops.NNResult(i, d)
    if backend == "mxu":
        return matching_ops.nearest_neighbors_mxu(
            sp, src_mask, tgt.xyz, tgt.mask)
    if backend == "fused":
        nn = matching_ops.approx_knn(sp, src_mask, tgt.xyz, tgt.mask, k=1)
        return matching_ops.NNResult(nn.idx[..., 0], nn.dist[..., 0])
    return matching_ops.nearest_neighbors(sp, src_mask, tgt.xyz, tgt.mask,
                                          tile=tile)


_CAND_KINDS = ("point2point", "point2plane_normals")
# kNN-neighborhood matchers can also ride the candidate cache when the list
# is at least as wide as the neighborhood (kNN within the cached top-K is the
# same eigen-fit math over a periodically-refreshed support set). Opt-in only
# (cand_k >= knn required) — the frontend's cand_k patching never touches
# these kinds.
_CAND_KNN_KINDS = ("point2plane_knn", "point2line_knn")


def _cand_eligible(m: Matcher) -> bool:
    if m.cand_k <= 0:
        return False
    if m.kind in _CAND_KINDS:
        return True
    return m.kind in _CAND_KNN_KINDS and m.cand_k >= m.knn


def _uses_cands(params: ICPParams) -> bool:
    return params.shard_axis is None and any(
        _cand_eligible(m) for m in params.matchers)


def _refresh_cands(m: Matcher, pose, src, tgt) -> jax.Array:
    """Top-K candidate indices per source point at the current pose (the
    TPU top-k unit; exact on CPU)."""
    sp = se3.transform(pose, src.xyz)
    if m.nn_backend == "mxu":
        # bf16x3 MXU candidates + exact f32 rescore (ops/matching.knn_mxu):
        # ~2x the f32-HIGHEST expansion of approx_knn at 8k+ targets, and
        # the rescore restores exact top-cand_k ordering
        nn = matching_ops.knn_mxu(sp, src.mask, tgt.xyz, tgt.mask,
                                  k=m.cand_k, cand_k=max(16, 2 * m.cand_k))
    else:
        nn = matching_ops.approx_knn(sp, src.mask, tgt.xyz, tgt.mask,
                                     k=m.cand_k)
    return nn.idx


def _knn_from_cands(sp, tgt, cand_idx, k: int) -> matching_ops.NNResult:
    """Exact kNN restricted to the cached candidates — ``[...,N,k]`` idx/dist.

    Masked TARGET candidates get dist ~1e15 (> the 1e9 validity gate), like
    ``matching_ops.knn``. Unlike it, masked SOURCE rows are NOT sentineled:
    they sit at the 1e6 padding position and return finite distances to
    real candidates (~1.7e6, still > any match threshold), so consumers
    must gate on ``src.mask`` — every matcher here already multiplies the
    pairing weight by it — and must not count "valid" rows from distance
    alone."""
    cpts = jnp.take(tgt.xyz, cand_idx, axis=-2)          # [..., N, K, 3]
    diff = cpts - sp[..., None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    tm = jnp.take(tgt.mask, cand_idx, axis=-1)
    d2 = jnp.where(tm > 0.5, d2, 1e30)
    neg, j = jax.lax.top_k(-d2, k)                       # ascending distance
    idx = jnp.take_along_axis(cand_idx, j, axis=-1)
    dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
    return matching_ops.NNResult(idx.astype(jnp.int32), dist)


def _nn_from_cands(sp, tgt, cand_idx) -> matching_ops.NNResult:
    """Exact re-argmin over the K cached candidates: ``_knn_from_cands``
    with k=1, squeezed (same masked-source caveat)."""
    nn = _knn_from_cands(sp, tgt, cand_idx, k=1)
    return matching_ops.NNResult(nn.idx[..., 0], nn.dist[..., 0])


def _matcher_active(m: Matcher, it: jax.Array) -> jax.Array:
    """Iteration-window activation (runFromIteration/runUpToIteration,
    0 = unbounded; reference params/icp-settings-regular.yaml:37-39)."""
    act = it >= m.run_from_iteration
    if m.run_up_to_iteration > 0:
        act = act & (it <= m.run_up_to_iteration)
    return act.astype(jnp.float32)


def _match_one(
    m: Matcher, pose, it, src_map: MetricMap, tgt_map: MetricMap,
    tile: int, shard_axis: str | None, aux=None, cand_idx=None,
) -> _Pairings:
    src = src_map[m.src_layer]
    tgt = tgt_map[m.tgt_layer]
    sp = se3.transform(pose, src.xyz)
    act = _matcher_active(m, it)

    if cand_idx is not None and m.kind in _CAND_KINDS:
        nn = _nn_from_cands(sp, tgt, cand_idx)
        if m.kind == "point2point":
            q = jnp.take(tgt.xyz, nn.idx, axis=-2)
            w = src.mask * (nn.dist < m.distance_threshold) * act
            return _Pairings(src.xyz, q, jnp.zeros_like(q), w, False)
        q = jnp.take(tgt.xyz, nn.idx, axis=-2)
        normals = jnp.take(tgt.attrs["normal"], nn.idx, axis=-2)
        gate = (
            jnp.take(tgt.attrs["planarity"], nn.idx, axis=-2)[..., 0]
            if "planarity" in tgt.attrs
            else jnp.ones_like(nn.dist)
        )
        w = src.mask * (nn.dist < m.distance_threshold) * gate * act
        return _Pairings(src.xyz, q, normals, w, True)

    # Dispatch single-device vs tensor-parallel (target point axis sharded)
    backend = _resolve_backend(m.nn_backend, tgt.xyz.shape[-2])
    if shard_axis is None:
        if backend == "grid":
            from ..ops import grid_nn as grid_ops

            def nn1():
                # cell = the matcher's own acceptance radius: every match the
                # threshold would keep is found exactly. The grid index is
                # built ONCE per align (the target is loop-invariant) and
                # closed over by the while_loop body via `aux`.
                if aux is not None:
                    return grid_ops.grid_nearest_neighbors(
                        sp, src.mask, aux, tgt.xyz, tgt.mask)
                return grid_ops.grid_nn(sp, src.mask, tgt.xyz, tgt.mask,
                                        cell=float(m.distance_threshold))
        else:
            nn1 = lambda: _nn_1(sp, src.mask, tgt, tile, backend)
        # kNN backend choice (crossover data: docs/nn_crossover.json):
        # approx_min_k rides the TPU top-k unit — fastest at every size,
        # ~95% recall, the default. Exact kNN on TPU = the fused Pallas
        # kernel (recall 1.0, compiles in seconds at any size; the
        # scan-merge XLA path takes minutes to compile at >=8k points).
        # CPU always uses the exact tiled-scan path.
        if cand_idx is not None and m.kind in _CAND_KNN_KINDS:
            nnk = lambda: _knn_from_cands(sp, tgt, cand_idx, m.knn)
        elif backend == "mxu":
            nnk = lambda: matching_ops.knn_mxu(
                sp, src.mask, tgt.xyz, tgt.mask, k=m.knn,
                cand_k=max(32, 4 * m.knn))
        elif backend == "fused" and jax.default_backend() != "cpu":
            nnk = lambda: matching_ops.approx_knn(
                sp, src.mask, tgt.xyz, tgt.mask, k=m.knn)
        elif m.approx_knn and jax.default_backend() != "cpu":
            nnk = lambda: matching_ops.approx_knn(sp, src.mask, tgt.xyz, tgt.mask, k=m.knn)
        elif backend == "pallas" and jax.default_backend() == "tpu":
            from ..ops import pallas_knn as pallas_knn_mod

            nnk = lambda: pallas_knn_mod.pallas_knn(
                sp, src.mask, tgt.xyz, tgt.mask, k=m.knn)
        else:
            nnk = lambda: matching_ops.knn(sp, src.mask, tgt.xyz, tgt.mask, k=m.knn, tile=tile)
        gather = lambda arr, idx: jnp.take(arr, idx, axis=-2)
    else:
        nn1 = lambda: matching_ops.tp_nearest_neighbors(
            sp, src.mask, tgt.xyz, tgt.mask, shard_axis, tile=tile)
        nnk = lambda: matching_ops.tp_knn(
            sp, src.mask, tgt.xyz, tgt.mask, m.knn, shard_axis, tile=tile)
        gather = lambda arr, idx: matching_ops.tp_gather_points(arr, idx, shard_axis)

    if m.kind == "point2point":
        nn = nn1()
        q = gather(tgt.xyz, nn.idx)
        w = src.mask * (nn.dist < m.distance_threshold) * act
        return _Pairings(src.xyz, q, jnp.zeros_like(q), w, False)

    if m.kind == "point2plane_normals":
        nn = nn1()
        q = gather(tgt.xyz, nn.idx)
        normals = gather(tgt.attrs["normal"], nn.idx)
        gate = (
            gather(tgt.attrs["planarity"], nn.idx)[..., 0]
            if "planarity" in tgt.attrs
            else jnp.ones_like(nn.dist)
        )
        w = src.mask * (nn.dist < m.distance_threshold) * gate * act
        return _Pairings(src.xyz, q, normals, w, True)

    if m.kind == "gicp":
        # Generalized ICP (plane-to-plane): residual whitened by the combined
        # surface covariance S = C_q + R C_p Rᵀ. With M = chol(S), the rows
        # of M⁻¹ are whitening directions: Σₖ lₖlₖᵀ = S⁻¹, so each pairing
        # contributes 3 "plane" rows with non-unit normals lₖ whose magnitude
        # carries the information weight — the existing GN consumes them
        # unchanged. Both layers need FilterGICPCovariances 'cov' attrs.
        nn = nn1()
        q = gather(tgt.xyz, nn.idx)
        Cq = gather(tgt.attrs["cov"], nn.idx).reshape(*q.shape[:-1], 3, 3)
        Cp = src.attrs["cov"].reshape(*src.xyz.shape[:-1], 3, 3)
        Cp_rot = jnp.einsum("ij,...jk,lk->...il", pose.R, Cp, pose.R,
                            precision="highest")
        S = Cq + Cp_rot
        Minv = eigen3.invert_lower_3x3(eigen3.cholesky_3x3(S))
        w1 = src.mask * (nn.dist < m.distance_threshold) * act
        n3 = Minv.reshape(-1, 3)                       # rows of M⁻¹, [3N,3]
        p3 = jnp.repeat(src.xyz, 3, axis=-2)
        q3 = jnp.repeat(q, 3, axis=-2)
        w3 = jnp.repeat(w1, 3, axis=-1)
        return _Pairings(p3, q3, n3, w3, True)

    if m.kind == "point2line_knn":
        # LOAM-style edge matching: fit a line to the kNN neighborhood
        # (largest-eigenvalue direction), gate on linearity, and emit TWO
        # plane rows per pairing with normals spanning the plane
        # perpendicular to the line — the exact point-to-line residual.
        nn = nnk()
        neigh = gather(tgt.xyz, nn.idx)
        valid = (nn.dist < 1e9).astype(sp.dtype)
        cnt = jnp.maximum(jnp.sum(valid, axis=-1), 1.0)
        centroid = jnp.sum(neigh * valid[..., None], axis=-2) / cnt[..., None]
        d = (neigh - centroid[..., None, :]) * valid[..., None]
        cov = jnp.einsum("...ki,...kj->...ij", d, d, precision="highest") / cnt[..., None, None]
        evs = eigen3.sym_eigenvalues_3x3(cov)
        dirv = eigen3.largest_eigenvector_3x3(cov, evs)
        # linearity gate: dominant direction ≫ second moment
        linear = evs[..., 2] >= (1.0 / jnp.maximum(m.plane_eigen_threshold, 1e-3)) *             jnp.maximum(evs[..., 1], 1e-9)
        # orthonormal pair perpendicular to the line
        a = jnp.where(jnp.abs(dirv[..., 0:1]) < 0.9,
                      jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], sp.dtype), dirv.shape),
                      jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], sp.dtype), dirv.shape))
        n1 = jnp.cross(dirv, a)
        n1 = n1 / jnp.maximum(jnp.linalg.norm(n1, axis=-1, keepdims=True), 1e-9)
        n2 = jnp.cross(dirv, n1)
        w1 = (src.mask * (nn.dist[..., 0] < m.distance_threshold)
              * linear.astype(sp.dtype)
              * (jnp.sum(valid, axis=-1) >= 3.0).astype(sp.dtype) * act)
        n_rows = jnp.stack([n1, n2], axis=-2).reshape(-1, 3)
        p2 = jnp.repeat(src.xyz, 2, axis=-2)
        q2 = jnp.repeat(centroid, 2, axis=-2)
        w2 = jnp.repeat(w1, 2, axis=-1)
        return _Pairings(p2, q2, n_rows, w2, True)

    if m.kind == "point2plane_knn":
        nn = nnk()
        neigh = gather(tgt.xyz, nn.idx)  # [N,k,3]
        valid = (nn.dist < 1e9).astype(sp.dtype)  # [N,k]
        cnt = jnp.maximum(jnp.sum(valid, axis=-1), 1.0)
        centroid = jnp.sum(neigh * valid[..., None], axis=-2) / cnt[..., None]
        d = (neigh - centroid[..., None, :]) * valid[..., None]
        cov = jnp.einsum("...ki,...kj->...ij", d, d, precision="highest") / cnt[..., None, None]
        evs = eigen3.sym_eigenvalues_3x3(cov)
        # an EXACTLY collinear neighborhood (pole/edge: e0=e1=0) passes the
        # planar gate but has no defined normal — ungated, the extraction's
        # +z fallback would inject a fabricated full-weight constraint
        # ALONG the line (review finding). Noise-driven near-degenerate
        # normals are kept: reference parity (their Eigen solve of the same
        # noisy covariance behaves identically).
        normal, well = eigen3.smallest_eigenvector_3x3(cov, evs,
                                                       return_valid=True)
        planar = (evs[..., 0] <= m.plane_eigen_threshold * jnp.maximum(evs[..., 2], 1e-12))
        enough = jnp.sum(valid, axis=-1) >= 3.0
        w = (
            src.mask
            * (nn.dist[..., 0] < m.distance_threshold)
            * planar.astype(sp.dtype)
            * well.astype(sp.dtype)
            * enough.astype(sp.dtype)
            * act
        )
        return _Pairings(src.xyz, centroid, normal, w, True)

    raise ValueError(f"unknown matcher kind {m.kind!r}")


def _expand_p2p(pr: _Pairings) -> _Pairings:
    """Fold a point-to-point pairing into 3 axis-normal plane rows."""
    k = pr.p.shape[-2]
    p = jnp.repeat(pr.p, 3, axis=-2)
    q = jnp.repeat(pr.q, 3, axis=-2)
    n = jnp.tile(_AXES, (k, 1))
    w = jnp.repeat(pr.w, 3, axis=-1)
    return _Pairings(p, q, n, w, True)


def _apply_pair_weights(pr: _Pairings, pose, params: ICPParams) -> _Pairings:
    w = pr.w
    if params.weights.use_scale_outlier_detector:
        w = robust.scale_outlier_weights(
            pr.p, pr.q, w, params.weights.scale_outlier_threshold
        )
    if params.weights.use_robust_kernel:
        rp = se3.transform(pose, pr.p)
        if pr.is_plane:
            r = jnp.abs(jnp.sum((rp - pr.q) * pr.n, axis=-1))
        else:
            r = jnp.linalg.norm(rp - pr.q, axis=-1)
        w = w * robust.robust_weights(
            r, params.weights.robust_kernel, params.weights.robust_kernel_param,
            params.weights.robust_kernel_scale,
        )
    return pr._replace(w=w)


def _prebuild_matcher_aux(src_map, tgt_map, params: ICPParams):
    """Loop-invariant per-matcher resources (currently: grid indices)."""
    from ..ops import grid_nn as grid_ops

    aux = []
    for m in params.matchers:
        if m.nn_backend == "grid" and params.shard_axis is None:
            tgt = tgt_map[m.tgt_layer]
            aux.append(grid_ops.build_grid(
                tgt.xyz, tgt.mask, float(m.distance_threshold)))
        else:
            aux.append(None)
    return tuple(aux)


def _gather(pose, it, src_map, tgt_map, params: ICPParams, aux=None,
            cands=None):
    """Run all matchers; return (plane-row system, raw p2p pairings)."""
    plane_rows = []
    p2p_rows = []
    for i, m in enumerate(params.matchers):
        pr = _apply_pair_weights(
            _match_one(m, pose, it, src_map, tgt_map, params.nn_tile,
                       params.shard_axis,
                       aux[i] if aux is not None else None,
                       cands[i] if cands is not None else None),
            pose, params,
        )
        if pr.is_plane:
            plane_rows.append(pr)
        else:
            p2p_rows.append(pr)
            plane_rows.append(_expand_p2p(pr))
    cat = lambda xs, ax: jnp.concatenate(xs, axis=ax)
    plane = _Pairings(
        cat([r.p for r in plane_rows], -2),
        cat([r.q for r in plane_rows], -2),
        cat([r.n for r in plane_rows], -2),
        cat([r.w for r in plane_rows], -1),
        True,
    )
    return plane, p2p_rows


def _solve(pose, plane: _Pairings, p2p_rows, params: ICPParams,
           init_pose: se3.Pose = None):
    s = params.solver
    if s.kind == "gauss_newton":
        prior_pose, prior_w = None, None
        # enable the prior when EITHER sigma is set; an unset (<=0) sigma
        # means "unconstrained on that block" = weight 0, not "disable the
        # whole prior"
        if ((s.prior_sigma_trans > 0 or s.prior_sigma_rot > 0)
                and init_pose is not None):
            prior_pose = init_pose
            wt = 1.0 / s.prior_sigma_trans**2 if s.prior_sigma_trans > 0 else 0.0
            wr = 1.0 / s.prior_sigma_rot**2 if s.prior_sigma_rot > 0 else 0.0
            prior_w = jnp.asarray([wt] * 3 + [wr] * 3, jnp.float32)
        res = gauss_newton.point_to_plane_step(
            pose, plane.p, plane.q, plane.n, plane.w,
            inner_iterations=s.max_iterations, damping=s.damping,
            prior_pose=prior_pose, prior_w=prior_w,
        )
        return res.pose
    if s.kind in ("horn", "olae"):
        if not p2p_rows:
            raise ValueError(f"{s.kind} solver needs at least one point2point matcher")
        p = jnp.concatenate([r.p for r in p2p_rows], axis=-2)
        q = jnp.concatenate([r.q for r in p2p_rows], axis=-2)
        w = jnp.concatenate([r.w for r in p2p_rows], axis=-1)
        if s.kind == "olae":
            from ..solve.olae import weighted_olae

            return weighted_olae(p, q, w)
        return horn.weighted_horn(p, q, w)
    raise ValueError(f"unknown solver kind {s.kind!r}")


def _quality(pose, src_map, tgt_map, params: ICPParams, tile: int) -> jax.Array:
    """Weighted mean over the configured evaluators, with conjunctive
    ``required_min`` gates (models/config.py::Quality): any evaluator
    scoring below its required_min forces the overall quality to 0.
    The gate is what lets a sparse discriminative layer (edges) veto
    street-lattice-aliased loop-closure alignments that the dense-layer
    paired ratio scores well (see icp-settings-loop-closure.yaml)."""
    if not params.quality:
        return jnp.ones(())  # no evaluator configured = unconditionally good
    vals = []
    gate = jnp.ones(())
    for qc in params.quality:
        if qc.kind != "paired_ratio":
            raise ValueError(f"unknown quality kind {qc.kind!r}")
        src = src_map[qc.src_layer]
        tgt = tgt_map[qc.tgt_layer]
        sxyz, smask = src.xyz, src.mask
        n = sxyz.shape[-2]
        if qc.max_points and n > qc.max_points:
            # static hash-decorrelated subsample (see Quality.max_points);
            # numpy at trace time — one gather, no data-dependent shapes.
            # Masked slots sampled in contribute weight 0 to the ratio.
            sel = jnp.asarray(np.sort(np.random.default_rng(
                0xC0FFEE).permutation(n)[:qc.max_points]))
            sxyz = jnp.take(sxyz, sel, axis=-2)
            smask = jnp.take(smask, sel, axis=-1)
        src = src._replace(xyz=sxyz, mask=smask)
        sp = se3.transform(pose, src.xyz)
        if params.shard_axis is None:
            nn = _nn_1(sp, src.mask, tgt, tile, "auto")
        else:
            nn = matching_ops.tp_nearest_neighbors(
                sp, src.mask, tgt.xyz, tgt.mask, params.shard_axis, tile=tile)
        ratio = quality_mod.paired_ratio(nn.dist, src.mask,
                                         qc.threshold_distance)
        if qc.symmetric:
            # reverse direction: tgt layer points into the src layer under
            # pose⁻¹; keep the better of the two (Quality.symmetric —
            # occlusion-asymmetric LC viewpoint pairs)
            tsrc = src_map[qc.src_layer]
            rp = se3.transform(se3.inverse(pose), tgt.xyz)
            if params.shard_axis is None:
                nn_r = _nn_1(rp, tgt.mask, tsrc, tile, "auto")
            else:
                nn_r = matching_ops.tp_nearest_neighbors(
                    rp, tgt.mask, tsrc.xyz, tsrc.mask, params.shard_axis,
                    tile=tile)
            ratio = jnp.maximum(ratio, quality_mod.paired_ratio(
                nn_r.dist, tgt.mask, qc.threshold_distance))
        if qc.weight > 0.0:
            vals.append(qc.weight * ratio)
        if qc.required_min > 0.0:
            gate = gate * (ratio >= qc.required_min).astype(ratio.dtype)
    total_w = sum(qc.weight for qc in params.quality if qc.weight > 0.0)
    if not vals:  # all evaluators are pure gates: quality is the gate
        return gate
    return gate * functools.reduce(jnp.add, vals) / total_w


@functools.partial(jax.jit, static_argnames=("params",))
def align(
    src_map: MetricMap,
    tgt_map: MetricMap,
    init_pose: se3.Pose,
    params: ICPParams,
) -> ICPResult:
    """Register ``src_map`` onto ``tgt_map`` starting from ``init_pose``.

    The returned pose maps source-frame points into the target frame.
    Unbatched; wrap in ``vmap`` (see ``parallel.batch``) for scan-pair
    batches — the while_loop then iterates until every batch element
    converges, with converged elements masked.
    """

    def cond(state):
        pose, it, done = state
        return jnp.logical_and(it < params.max_iterations, jnp.logical_not(done))

    aux = _prebuild_matcher_aux(src_map, tgt_map, params)

    def _step(pose, it, src_map, tgt_map, cands=None):
        """One match→solve→convergence-check iteration (shared by both
        loop shapes below)."""
        plane, p2p_rows = _gather(pose, it, src_map, tgt_map, params, aux,
                                  cands)
        new_pose = _solve(pose, plane, p2p_rows, params, init_pose)
        # Too few effective pairings → the system is unconstrained; stall at
        # the current pose (terminates via zero step) instead of trusting a
        # degenerate solve.
        w_ok = jnp.sum(plane.w, axis=-1) >= 6.0
        new_pose = se3.Pose(
            jnp.where(w_ok[..., None, None], new_pose.R, pose.R),
            jnp.where(w_ok[..., None], new_pose.t, pose.t),
        )
        delta = se3.log(se3.compose(new_pose, se3.inverse(pose)))
        d_trans = jnp.linalg.norm(delta[..., :3], axis=-1)
        d_rot = jnp.linalg.norm(delta[..., 3:], axis=-1)
        converged = jnp.logical_and(
            d_trans < params.min_abs_step_trans, d_rot < params.min_abs_step_rot
        )
        return new_pose, converged

    def body(state):
        pose, it, done = state
        new_pose, converged = _step(pose, it, src_map, tgt_map)
        return (new_pose, it + 1, converged)

    m_aa = params.anderson_m

    def body_anderson(state):
        """Picard step + type-II Anderson extrapolation (AA-ICP,
        arXiv:1709.05479) on the SE(3) tangent chart at ``init_pose``.

        The history lives in shift registers ``Fh``/``Gh`` (last row =
        newest); ``cnt`` counts valid entries so a freshly-reset history
        contributes zero difference columns. Safeguard (the AA-ICP paper's,
        not a step-length cap — a length cap of O(fnorm) structurally
        forbids acceleration on slow contractions where the distance to the
        fixed point is fnorm/(1-ρ) ≫ fnorm): every accelerated iterate is
        accepted *provisionally*; if its Picard residual blows past
        ``anderson_reset_ratio``× the best seen (or goes non-finite, which
        a diverging solve can produce), the iterate is discarded, the pose
        reverts to the stored plain Picard fallback, and the history
        resets. A blow-up on a *plain* iterate is genuine map behavior
        (matches reassign discretely) and only resets the history. AA is
        additionally disabled outside the rotation basin of the chart
        (‖log‖_rot > π/2): se3.log is discontinuous near angle π and the
        history differences would cross the chart cut."""
        pose, it, done, Fh, Gh, cnt, best, g_fb, was_aa = state
        active = jnp.logical_not(done)
        new_pose, converged = _step(pose, it, src_map, tgt_map)
        x = se3.log(se3.compose(pose, se3.inverse(init_pose)))
        g = se3.log(se3.compose(new_pose, se3.inverse(init_pose)))
        f = g - x
        fnorm = jnp.linalg.norm(f)
        blown = jnp.logical_and(
            cnt > 0,
            jnp.logical_or(fnorm > params.anderson_reset_ratio * best,
                           jnp.logical_not(jnp.isfinite(fnorm))))
        # Revert only iterates the accelerator produced; a plain step that
        # blew up is the map itself and reverting would bounce forever.
        revert = jnp.logical_and(blown, was_aa)
        cnt = jnp.where(blown, 0, cnt)
        best = jnp.where(blown, jnp.inf, jnp.minimum(best, fnorm))
        # A reverted iterate's f/g describe the REJECTED point — keep them
        # out of the history (cnt=0 above already marks the rows stale, but
        # the shift register must not hold them either or the first
        # difference after the reset would span the garbage row).
        Fh = jnp.where(revert, Fh,
                       jnp.concatenate([Fh[1:], f[None]], axis=0))
        Gh = jnp.where(revert, Gh,
                       jnp.concatenate([Gh[1:], g[None]], axis=0))
        cnt = jnp.minimum(cnt + jnp.where(revert, 0, 1), m_aa + 1)
        dF = Fh[1:] - Fh[:-1]                       # [m, 6]
        dG = Gh[1:] - Gh[:-1]
        valid = (jnp.arange(m_aa) >= (m_aa - (cnt - 1))).astype(f.dtype)
        A = dF * valid[:, None]                     # stale rows zeroed
        M = jnp.matmul(A, A.T, precision="highest")
        lam = 1e-10 + 1e-8 * jnp.trace(M) / m_aa
        M = M + lam * jnp.eye(m_aa, dtype=f.dtype)  # zero rows → gamma 0
        gamma = jnp.linalg.solve(M, jnp.matmul(A, f, precision="highest"))
        x_acc = g - jnp.matmul(gamma, dG * valid[:, None],
                               precision="highest")
        in_basin = jnp.linalg.norm(x[3:]) < (jnp.pi / 2)
        use_aa = (jnp.logical_and(cnt >= 2, jnp.isfinite(x_acc).all())
                  & in_basin & jnp.logical_not(converged)
                  & jnp.logical_not(revert))
        new_x = jnp.where(revert, g_fb, jnp.where(use_aa, x_acc, g))
        converged = jnp.logical_and(converged, jnp.logical_not(revert))
        accel_pose = se3.compose(se3.exp(new_x), init_pose)
        # Frozen-lane semantics for vmap: a converged lane keeps its pose
        # and iteration count while the batch loop drains other lanes.
        out_pose = se3.Pose(
            jnp.where(active, accel_pose.R, pose.R),
            jnp.where(active, accel_pose.t, pose.t),
        )
        done = jnp.logical_or(done, converged)
        return (out_pose, it + active.astype(jnp.int32), done, Fh, Gh, cnt,
                best, jnp.where(revert, g_fb, g), use_aa)

    elig = tuple(i for i, m in enumerate(params.matchers) if _cand_eligible(m))

    def _refresh_all(pose):
        """Top-K lists for every cache-eligible matcher (tuple over elig)."""
        return tuple(
            _refresh_cands(params.matchers[i], pose,
                           src_map[params.matchers[i].src_layer],
                           tgt_map[params.matchers[i].tgt_layer])
            for i in elig)

    def _as_per_matcher(cands):
        full = [None] * len(params.matchers)
        for j, i in enumerate(elig):
            full[i] = cands[j]
        return tuple(full)

    def _cand_block(pose, it, done, cands):
        """cand_refresh cheap O(N*K) re-argmin iterations off the given
        candidate lists. Converged/over-budget lanes freeze."""

        def inner(_, st):
            pose, it, done = st
            active = jnp.logical_and(jnp.logical_not(done),
                                     it < params.max_iterations)
            new_pose, converged = _step(pose, it, src_map, tgt_map, cands)
            new_pose = se3.Pose(
                jnp.where(active[..., None, None], new_pose.R, pose.R),
                jnp.where(active[..., None], new_pose.t, pose.t),
            )
            done = jnp.logical_or(done, jnp.logical_and(active, converged))
            it = it + active.astype(jnp.int32)
            return (new_pose, it, done)

        return jax.lax.fori_loop(0, max(1, params.cand_refresh), inner,
                                 (pose, it, done))

    def body_cands(state):
        """Two-level shape for candidate-cached matchers: refresh the
        top-K lists at the block head, then a block of cheap iterations."""
        pose, it, done = state
        return _cand_block(pose, it, done, _as_per_matcher(_refresh_all(pose)))

    def body_cands_cond(state):
        """Motion-conditional variant: the block-head refresh only fires
        when the pose moved past cand_refresh_min_* since the last refresh
        — the late sub-mm crawl re-argmins over its existing lists and
        never pays the O(N*M) refresh pass. Unbatched aligns only (under
        vmap the cond lowers to select and both branches execute)."""
        pose, it, done, cands, ref = state
        delta = se3.log(se3.compose(pose, se3.inverse(ref)))
        moved_terms = []
        if params.cand_refresh_min_trans > 0:
            moved_terms.append(jnp.linalg.norm(delta[..., :3], axis=-1)
                               >= params.cand_refresh_min_trans)
        if params.cand_refresh_min_rot > 0:
            moved_terms.append(jnp.linalg.norm(delta[..., 3:], axis=-1)
                               >= params.cand_refresh_min_rot)
        moved = functools.reduce(jnp.logical_or, moved_terms)
        cands, ref = jax.lax.cond(
            moved,
            lambda: (_refresh_all(pose), pose),
            lambda: (cands, ref),
        )
        pose, it, done = _cand_block(pose, it, done, _as_per_matcher(cands))
        return (pose, it, done, cands, ref)

    it0 = jnp.zeros((), jnp.int32)
    done0 = jnp.zeros((), bool)
    if params.anderson_m > 0 and _uses_cands(params):
        raise ValueError(
            "anderson_m is incompatible with candidate-cached matchers "
            "(cand_k > 0): the cache's block loop already amortizes the "
            "per-iteration cost AA would skip")
    if params.anderson_m > 0:
        state0 = (init_pose, it0, done0,
                  jnp.zeros((m_aa + 1, 6), jnp.float32),
                  jnp.zeros((m_aa + 1, 6), jnp.float32),
                  jnp.zeros((), jnp.int32),
                  jnp.full((), jnp.inf, jnp.float32),
                  jnp.zeros((6,), jnp.float32),
                  jnp.zeros((), bool))
        final_state = jax.lax.while_loop(
            lambda s: cond(s[:3]), body_anderson, state0)
        pose, n_iter, converged = final_state[:3]
    elif _uses_cands(params) and (params.cand_refresh_min_trans > 0
                                  or params.cand_refresh_min_rot > 0):
        state0 = (init_pose, it0, done0, _refresh_all(init_pose), init_pose)
        final_state = jax.lax.while_loop(
            lambda s: cond(s[:3]), body_cands_cond, state0)
        pose, n_iter, converged = final_state[:3]
    else:
        state0 = (init_pose, it0, done0)
        pose, n_iter, converged = jax.lax.while_loop(
            cond, body_cands if _uses_cands(params) else body, state0)

    # Final system at the converged pose → covariance (CPose3DPDFGaussian).
    plane, _ = _gather(pose, n_iter, src_map, tgt_map, params, aux)
    final = gauss_newton.point_to_plane_step(
        pose, plane.p, plane.q, plane.n, plane.w, inner_iterations=0
    )
    cov = gauss_newton.covariance_from_normal_matrix(
        final.normal_matrix, final.sq_residual_sum, final.weight_sum
    )
    q = _quality(pose, src_map, tgt_map, params, params.nn_tile)
    term = jnp.where(converged, TERM_CONVERGED, TERM_MAX_ITERS).astype(jnp.int32)
    return ICPResult(pose, cov, q, n_iter, term)


def align_pipeline(
    src_map: MetricMap,
    tgt_map: MetricMap,
    init_pose: se3.Pose,
    stages: Tuple[ICPParams, ...],
) -> ICPResult:
    """Coarse-to-fine multi-stage ICP: run each stage from the previous
    stage's solution (the decimation-pyramid pattern; BASELINE config #3).
    Returns the last stage's result."""
    if not stages:
        raise ValueError("align_pipeline needs at least one stage")
    pose = init_pose
    result = None
    for st in stages:
        result = align(src_map, tgt_map, pose, st)
        pose = result.pose
    return result


def align_with_normal_precompute(
    src_map: MetricMap,
    tgt_map: MetricMap,
    init_pose: se3.Pose,
    params: ICPParams,
    normals_k: int = 8,
) -> ICPResult:
    """``align`` with target normals computed inside the same jitted program.

    For every ``point2plane_normals`` matcher whose target layer lacks a
    ``normal`` attr, a kNN eigen-fit normal precompute runs on device first —
    fusing what would otherwise be two dispatches (filter + align) into one.
    This is the production odometry fast path: per new scan, normals are
    computed once and the scan is aligned against the previous one.
    """
    from ..filters.pipeline import _attach_normals_knn

    tgt_map = dict(tgt_map)
    for m in params.matchers:
        if m.kind == "point2plane_normals":
            layer = tgt_map[m.tgt_layer]
            if "normal" not in layer.attrs:
                tgt_map[m.tgt_layer] = _attach_normals_knn(
                    layer.xyz, layer.mask, normals_k)
    return align(src_map, tgt_map, init_pose, params)
