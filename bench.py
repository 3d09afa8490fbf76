#!/usr/bin/env python
"""Benchmark: all five BASELINE.json configs + scaling + robustness stress.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
     "configs": {...}, "scaling": [...], "stress": {...}}

Headline (value/vs_baseline) stays BASELINE config #5 — "64 scan pairs
vmapped in parallel" — measured with a readback per call (CLAUDE.md timing
rule). ``vs_baseline`` divides by an MRPT-style CPU ICP (scipy cKDTree kNN
+ numpy point-to-plane Gauss-Newton: the same algorithm the reference stack
runs on CPU), timed on ≥10 pairs on this host. The ``configs`` block covers
BASELINE configs #1–#4; ``scaling`` sweeps cloud size and batch width;
``stress`` exercises partial overlap, dynamic-object outliers, and
degenerate corridor geometry (VERDICT.md round-1 items #3/#5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

B = 64          # scan pairs per batch (BASELINE config #5)
CAP = 2048      # points per cloud after voxel filtering
ITERS_TIMED = 20
CPU_PAIRS = 10  # pairs timed for the CPU baseline
SEED = 7


def make_world(rng, n, extent=30.0):
    g = np.stack([rng.uniform(-extent, extent, n // 2),
                  rng.uniform(-extent, extent, n // 2),
                  rng.normal(0, 0.02, n // 2)], -1)
    w1 = np.stack([rng.uniform(-extent, extent, n // 4),
                   np.full(n // 4, extent),
                   rng.uniform(0, 6, n // 4)], -1)
    w2 = np.stack([np.full(n // 4, -extent),
                   rng.uniform(-extent, extent, n // 4),
                   rng.uniform(0, 6, n // 4)], -1)
    return np.concatenate([g, w1, w2]).astype(np.float32)


def make_pairs(rng, b, cap, tau_sigma=0.08):
    return [(make_world(rng, cap), rng.normal(0, tau_sigma, 6).astype(np.float32))
            for _ in range(b)]


# ---------------------------------------------------------------------------
# CPU baseline: cKDTree kNN point-to-plane ICP (the MRPT/mp2p_icp recipe)
# ---------------------------------------------------------------------------

def _cpu_se3_exp(tau):
    v, w = tau[:3], tau[3:]
    th = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-8:
        R = np.eye(3) + W
        V = np.eye(3) + 0.5 * W
    else:
        A, Bc, C = np.sin(th) / th, (1 - np.cos(th)) / th**2, (th - np.sin(th)) / th**3
        R = np.eye(3) + A * W + Bc * W @ W
        V = np.eye(3) + Bc * W + C * W @ W
    return R, V @ v


def cpu_icp_p2plane(src, tgt, max_iters=100, knn=6, dist_thresh=0.7,
                    inner=20, tol_t=5e-5, tol_r=1e-5):
    from scipy.spatial import cKDTree
    tree = cKDTree(tgt)
    R, t = np.eye(3), np.zeros(3)
    for _ in range(max_iters):
        sp = src @ R.T + t
        d, idx = tree.query(sp, k=knn)
        neigh = tgt[idx]
        centroid = neigh.mean(1)
        dd = neigh - centroid[:, None, :]
        cov = np.einsum("nki,nkj->nij", dd, dd) / knn
        evs, vecs = np.linalg.eigh(cov)
        normals = vecs[:, :, 0]
        wgt = (d[:, 0] < dist_thresh).astype(np.float64)
        Rk, tk = R.copy(), t.copy()
        for _ in range(inner):
            spk = src @ Rk.T + tk
            r = np.einsum("nd,nd->n", spk - centroid, normals)
            cr = np.cross(spk, normals)
            J = np.concatenate([normals, cr], 1)
            A = (J * wgt[:, None]).T @ J + 1e-6 * np.eye(6)
            b = -(J * wgt[:, None]).T @ r
            delta = np.linalg.solve(A, b)
            Rd, td = _cpu_se3_exp(delta)
            Rk, tk = Rd @ Rk, Rd @ tk + td
        dR = Rk @ R.T
        step_t = np.linalg.norm(tk - t)
        step_r = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        R, t = Rk, tk
        if step_t < tol_t and step_r < tol_r:
            break
    return R, t


def bench_cpu(pairs):
    total = 0.0
    for world, tau in pairs[:CPU_PAIRS]:
        R0, t0 = _cpu_se3_exp(-tau)
        src = (world @ R0.T + t0).astype(np.float64)
        t1 = time.perf_counter()
        cpu_icp_p2plane(src, world.astype(np.float64))
        total += time.perf_counter() - t1
    return CPU_PAIRS / total  # pairs/sec


# ---------------------------------------------------------------------------
# device harness helpers
# ---------------------------------------------------------------------------

def _stack_pairs(pairs, cap, layer="raw"):
    import jax
    import jax.numpy as jnp
    from mola_fe_lidar_tpu.cloud import from_points
    from mola_fe_lidar_tpu.geometry import se3

    srcs, tgts, taus = [], [], []
    for world, tau in pairs:
        # `world` may be a (src_world, tgt_world) tuple so src and tgt can
        # differ by more than the rigid transform (outlier injection)
        src_world, tgt_world = world if isinstance(world, tuple) else (world, world)
        R0, t0 = _cpu_se3_exp(-tau)
        src_pts = (src_world @ R0.T + t0).astype(np.float32)
        srcs.append({layer: from_points(src_pts, capacity=cap)})
        tgts.append({layer: from_points(tgt_world, capacity=cap)})
        taus.append(tau)
    stack = lambda ts: jax.tree.map(lambda *x: jnp.stack(x), *ts)
    return stack(srcs), stack(tgts), taus


def _settle(res):
    """Force a device->host readback so the timing spans real execution
    (block_until_ready does not reliably await queued dispatches on the
    tunneled TPU — see CLAUDE.md)."""
    if hasattr(res, "quality"):
        np.asarray(res.quality)
    else:
        import jax
        np.asarray(jax.tree.leaves(res)[-1])


def _timed(fn, iters=ITERS_TIMED):
    """Median pairs-batch wall time, one readback per call."""
    res = fn()
    _settle(res)  # compile + settle
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        res = fn()
        _settle(res)
        times.append(time.perf_counter() - t0)
    return res, float(np.median(times))


def _pose_errors(res, taus):
    import jax
    import jax.numpy as jnp
    from mola_fe_lidar_tpu.geometry import se3

    errs = []
    for i, tau in enumerate(taus):
        true = se3.exp(jnp.asarray(tau))
        p = jax.tree.map(lambda x: x[i], res.pose)
        errs.append(float(se3.translation_norm(se3.compose(p, se3.inverse(true)))))
    return errs


# ---------------------------------------------------------------------------
# BASELINE configs #1-#5
# ---------------------------------------------------------------------------

def bench_configs(rng):
    import jax
    import jax.numpy as jnp
    from mola_fe_lidar_tpu.geometry import se3
    from mola_fe_lidar_tpu.models import (
        ICPParams, Matcher, PairWeights, Quality, Solver, align_pipeline,
        icp_pyramid_3level,
    )
    from mola_fe_lidar_tpu.models.icp import align
    from mola_fe_lidar_tpu.filters.pipeline import _attach_normals_knn
    from mola_fe_lidar_tpu.parallel import make_chunked_batched_align
    from mola_fe_lidar_tpu.parallel.batch import monte_carlo_guesses

    out = {}
    bsmall = 16
    pairs = make_pairs(rng, bsmall, CAP)
    srcs, tgts, taus = _stack_pairs(pairs, CAP)
    init = se3.identity((bsmall,))

    # #1 point-to-point (KITTI-00 style p2p ICP)
    p2p = ICPParams(
        max_iterations=40,
        matchers=(Matcher(kind="point2point", distance_threshold=2.0),),
        solver=Solver(kind="horn"),
        weights=PairWeights(use_scale_outlier_detector=False),
    )
    f = make_chunked_batched_align(p2p, chunk=bsmall)
    res, dt = _timed(lambda: f(srcs, tgts, init))
    # report the way the front-end consumes ICP: quality-gated. Single-stage
    # p2p from identity legitimately fails on large rotations (the production
    # path runs coarse-to-fine); the evaluator must FLAG those (q << 0.5)
    errs = np.asarray(_pose_errors(res, taus))
    q = np.asarray(res.quality)
    acc = q > 0.5
    out["p2p_horn"] = {
        "pairs_per_sec": round(bsmall / dt, 1),
        "accept_frac": round(float(acc.mean()), 3),
        "max_err_accepted_m": round(float(errs[acc].max()), 5) if acc.any() else None,
        "rejected_flagged_correctly": bool(np.all(errs[~acc] > errs[acc].max()))
        if acc.any() and (~acc).any() else True,
    }

    # #2 robust-Cauchy point-to-plane on outlier-injected pairs.
    # The TARGET has 20% of its points replaced by an off-pose cluster (a
    # "dynamic object" present only in the target); the source stays clean.
    # Those points rigidly DISAGREE with the true transform on both sides:
    # src's last-k points lose their counterpart and tgt gains a spurious
    # cluster that attracts false matches.
    out_pairs = []
    for world, tau in pairs:
        w = world.copy()
        k = len(w) // 5                      # 20% dynamic-object outliers
        c = rng.uniform(-20, 20, 3).astype(np.float32)
        c[2] = 1.0
        w[-k:] = c + rng.normal(0, 1.0, (k, 3)).astype(np.float32)
        out_pairs.append(((world, w), tau))
    srcs_o, tgts_o, taus_o = _stack_pairs(out_pairs, CAP)
    robust = ICPParams(
        max_iterations=40,
        matchers=(Matcher(kind="point2plane_knn", distance_threshold=1.0,
                          knn=6, plane_eigen_threshold=0.2),),
        solver=Solver(kind="gauss_newton", max_iterations=10),
        quality=(Quality(threshold_distance=0.3),),
        weights=PairWeights(use_scale_outlier_detector=False,
                            use_robust_kernel=True, robust_kernel="cauchy",
                            robust_kernel_param=0.2),
    )
    import dataclasses
    plain = dataclasses.replace(
        robust, weights=PairWeights(use_scale_outlier_detector=False))
    f_r = make_chunked_batched_align(robust, chunk=bsmall)
    f_p = make_chunked_batched_align(plain, chunk=bsmall)
    res_r, dt_r = _timed(lambda: f_r(srcs_o, tgts_o, init))
    res_p, _ = _timed(lambda: f_p(srcs_o, tgts_o, init), iters=3)
    out["robust_cauchy_p2plane"] = {
        "pairs_per_sec": round(bsmall / dt_r, 1),
        "mean_err_robust_m": round(float(np.mean(_pose_errors(res_r, taus_o))), 5),
        "mean_err_plain_m": round(float(np.mean(_pose_errors(res_p, taus_o))), 5),
        "outlier_frac": 0.2,
    }

    # #3 three-level decimation-pyramid from bad initializations
    big_pairs = make_pairs(rng, bsmall, CAP, tau_sigma=0.25)
    srcs_b, tgts_b, taus_b = _stack_pairs(big_pairs, CAP)
    stages = icp_pyramid_3level()

    @jax.jit
    def run_pyr(s, t, g):
        tn = {"raw": jax.vmap(lambda pc: _attach_normals_knn(pc.xyz, pc.mask, 8))(
            t["raw"])}
        return jax.vmap(lambda a, b, c: align_pipeline(a, b, c, stages))(s, tn, g)

    res, dt = _timed(lambda: run_pyr(srcs_b, tgts_b, init))
    out["pyramid_3level"] = {"pairs_per_sec": round(bsmall / dt, 1),
                             "init_tau_sigma": 0.25,
                             "max_err_m": round(max(_pose_errors(res, taus_b)), 5)}

    # #4 loop-closure Monte-Carlo wide search (one vmapped batch of 10)
    world = make_world(rng, CAP)
    true_tau = np.array([6.0, 4.0, 0.0, 0, 0, 0.15], np.float32)
    R0, t0 = _cpu_se3_exp(-true_tau)
    src_pts = (world @ R0.T + t0).astype(np.float32)
    from mola_fe_lidar_tpu.cloud import from_points
    src1 = {"raw": from_points(src_pts, capacity=CAP)}
    tgt1 = {"raw": from_points(world, capacity=CAP)}
    n_mc = 10
    sigma_xyz = 3.0                           # 0.1 * max_dist_to_loop_closure
    lc = ICPParams(
        max_iterations=60,
        matchers=(Matcher(kind="point2plane_knn", distance_threshold=2.0,
                          knn=6, plane_eigen_threshold=0.2),),
        solver=Solver(kind="gauss_newton", max_iterations=10),
        quality=(Quality(threshold_distance=0.3),),
        weights=PairWeights(use_scale_outlier_detector=False),
    )

    @jax.jit
    def run_lc(key):
        guesses = monte_carlo_guesses(key, se3.identity(), n_mc,
                                      sigma_xyz, np.deg2rad(2.0))
        bsrc = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_mc, *x.shape)), src1)
        btgt = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_mc, *x.shape)), tgt1)
        return jax.vmap(lambda s, t, g: align(s, t, g, lc))(bsrc, btgt, guesses)

    keys = [jax.random.key(i) for i in range(ITERS_TIMED + 1)]
    res = run_lc(keys[0])
    np.asarray(res.quality)
    times = []
    for k in keys[1:]:
        t1 = time.perf_counter()
        res = run_lc(k)
        q = np.asarray(res.quality)
        times.append(time.perf_counter() - t1)
    best = int(np.argmax(q))
    import jax as _jax
    from mola_fe_lidar_tpu.geometry import se3 as _se3
    bp = _jax.tree.map(lambda x: x[best], res.pose)
    err = float(_se3.translation_norm(_se3.compose(
        bp, _se3.inverse(_se3.exp(jnp.asarray(true_tau))))))
    out["lc_montecarlo"] = {
        "searches_per_sec": round(1.0 / float(np.median(times)), 2),
        "mc_samples": n_mc, "true_offset_m": 7.2, "sigma_xyz_m": sigma_xyz,
        "best_quality": round(float(q[best]), 3),
        "best_err_m": round(err, 4),
    }
    return out


# ---------------------------------------------------------------------------
# headline: BASELINE config #5 (64-pair batch) — unchanged algorithm
# ---------------------------------------------------------------------------

def bench_headline(pairs):
    import jax
    import jax.numpy as jnp
    from mola_fe_lidar_tpu.filters.pipeline import _attach_normals_knn
    from mola_fe_lidar_tpu.geometry import se3
    from mola_fe_lidar_tpu.models import (
        ICPParams, Matcher, PairWeights, Quality, Solver, align_pipeline,
        icp_coarse_to_fine,
    )
    from mola_fe_lidar_tpu.parallel import make_chunked_batched_align

    b = len(pairs)
    srcs, tgts, taus = _stack_pairs(pairs, CAP)
    tgt_xyz = tgts["raw"].xyz
    tgt_mask = tgts["raw"].mask
    init = se3.identity((b,))
    stages = icp_coarse_to_fine()

    parity = ICPParams(
        max_iterations=100, min_abs_step_trans=5e-5, min_abs_step_rot=1e-5,
        matchers=(Matcher(kind="point2plane_knn", distance_threshold=0.70,
                          knn=6, plane_eigen_threshold=0.07),),
        solver=Solver(kind="gauss_newton", max_iterations=20),
        quality=(Quality(threshold_distance=0.10),),
        weights=PairWeights(use_scale_outlier_detector=False),
    )
    # chunk=2: the while_loop inside each chunk runs to its slowest lane,
    # so small chunks bound stragglers — measured 84 (chunk 16) -> 131 (8)
    # -> 181 (4) -> 236 (2) -> 202 (1) pairs/s on the v5e chip
    f_parity = make_chunked_batched_align(parity, chunk=2)

    @jax.jit
    def run_fast_impl(tgt_xyz_, tgt_mask_, srcs_, init_):
        tgts_ = {"raw": jax.vmap(lambda x, m: _attach_normals_knn(x, m, 8))(
            tgt_xyz_, tgt_mask_)}
        chunk = 8  # uniform convergence here; 500->515 pairs/s vs chunk 16
        bb = init_.t.shape[0]
        rs = lambda x: x.reshape(bb // chunk, chunk, *x.shape[1:])
        args = jax.tree.map(rs, (srcs_, tgts_, init_))
        inner = jax.vmap(lambda s, t, g: align_pipeline(s, t, g, stages))
        _, out = jax.lax.scan(lambda _, xs: (None, inner(*xs)), None, args)
        return jax.tree.map(lambda x: x.reshape(bb, *x.shape[2:]), out)

    res, dt = _timed(lambda: run_fast_impl(tgt_xyz, tgt_mask, srcs, init))
    rate_fast = b / dt
    errs = _pose_errors(res, taus)
    min_q = float(jnp.min(res.quality))

    from mola_fe_lidar_tpu.cloud.metric_map import PointCloud
    tgts_plain = {"raw": PointCloud(tgt_xyz, tgt_mask, {})}
    res_p, dt_p = _timed(lambda: f_parity(srcs, tgts_plain, init), iters=5)
    rate_parity = b / dt_p
    # parity accuracy, quality-gated the way the front-end consumes ICP:
    # single-stage reference params from identity legitimately lose the
    # odd pair (~1/64 at tau_sigma=0.08); the evaluator must FLAG those
    errs_p = np.asarray(_pose_errors(res_p, taus))
    q_p = np.asarray(res_p.quality)
    acc_p = q_p > 0.5
    parity_acc = {
        "accept_frac": round(float(acc_p.mean()), 3),
        "max_err_accepted_m": round(float(errs_p[acc_p].max()), 5)
        if acc_p.any() else None,
        "rejected_flagged_correctly": bool(
            np.all(errs_p[~acc_p] > errs_p[acc_p].max()))
        if acc_p.any() and (~acc_p).any() else True,
    }

    # Exact-NN parity variant (VERDICT r3 #4): the SAME single-stage kNN=6
    # point-to-plane algorithm with the per-iteration kNN going through
    # ops/matching.knn_mxu — bf16x3 cross-term candidates on the MXU +
    # exact f32 rescore of the top-32 (recall >= 0.999 vs exact, see
    # docs/nn_crossover.json). Measured ~2-6x slower in-loop than the
    # fused-approx default (the rescore gathers): this row exists to
    # price exactness, not to win. chunk=2 like the parity row.
    import dataclasses
    parity_mxu = dataclasses.replace(parity, matchers=(
        dataclasses.replace(parity.matchers[0], nn_backend="mxu"),))
    f_parity_mxu = make_chunked_batched_align(parity_mxu, chunk=2)
    res_m, dt_m = _timed(lambda: f_parity_mxu(srcs, tgts_plain, init), iters=5)
    rate_parity_mxu = b / dt_m
    errs_m = np.asarray(_pose_errors(res_m, taus))
    q_m = np.asarray(res_m.quality)
    acc_m = q_m > 0.5
    parity_acc_mxu = {
        "accept_frac": round(float(acc_m.mean()), 3),
        "max_err_accepted_m": round(float(errs_m[acc_m].max()), 5)
        if acc_m.any() else None,
    }

    # Two MXU accountings for the parity path, both reported (nothing
    # hidden). Its per-iteration kNN is the HIGHEST-precision distance
    # expansion fused into approx_min_k — the MXU executes that cross term
    # as 6 bf16 passes over K zero-padded 3 -> 128.
    #  * useful-FLOP fraction — 2·N·M·3 madds per d² evaluation per outer
    #    iteration, ÷ the ~f32 ceiling (45 TFLOP/s). STRUCTURAL note: the
    #    contraction dim is K=3, so at most 3/128 of each 128×128 MXU tile
    #    does non-padding work — this number cannot exceed ~0.023 for ANY
    #    NN distance matrix regardless of kernel quality.
    #  * MXU-busy fraction (the TPU-profiler meaning of "utilization"):
    #    physically ISSUED MACs — K zero-padded to the 128-lane tile, 6
    #    bf16 passes for HIGHEST — ÷ the v5e bf16 peak (197 TFLOP/s). This
    #    is the fraction of the systolic array's issue capacity the parity
    #    path keeps busy, the number a hardware profiler would show.
    mean_iters = float(jnp.mean(res_p.n_iterations))
    useful_per_pair = 2 * CAP * CAP * 3 * max(mean_iters, 1.0)
    useful_frac = useful_per_pair * rate_parity / 45e12
    issued_per_pair = 2 * CAP * CAP * 128 * 6 * max(mean_iters, 1.0)
    busy_frac = issued_per_pair * rate_parity / 197e12
    mean_iters_m = float(jnp.mean(res_m.n_iterations))
    return {"rate_fast": rate_fast, "rate_parity": rate_parity,
            "rate_parity_mxu": rate_parity_mxu,
            "parity_accuracy": parity_acc,
            "parity_accuracy_mxu": parity_acc_mxu,
            "mean_iters_parity": round(mean_iters, 1),
            "mean_iters_parity_mxu": round(mean_iters_m, 1),
            "min_quality": min_q, "max_err": max(errs),
            "est_useful_flop_frac": round(useful_frac, 4),
            "est_mxu_busy_frac": round(busy_frac, 4)}


# ---------------------------------------------------------------------------
# scaling: cloud size + batch width
# ---------------------------------------------------------------------------

def bench_scaling(rng):
    import jax
    import jax.numpy as jnp
    from mola_fe_lidar_tpu.filters.pipeline import _attach_normals_knn
    from mola_fe_lidar_tpu.geometry import se3
    from mola_fe_lidar_tpu.models import align_pipeline, icp_coarse_to_fine

    import dataclasses

    rows = []
    stages = icp_coarse_to_fine()
    # "default" rides nn_backend="auto" = the fused approx_min_k path
    # (VERDICT r3 #4; see Matcher.nn_backend). "pallas" pins round 2's
    # auto choice at 8k+ to document the in-loop cliff the fused path
    # removes (Pallas kernels serialize under vmap). Normals attachment
    # stays inside the timed region in both (comparable to the r2 rows;
    # production precomputes map normals once per rebuild, so these rows
    # UNDERSTATE production align throughput at 8k+).
    stages_pallas = tuple(
        dataclasses.replace(s, matchers=tuple(
            dataclasses.replace(m, nn_backend="pallas", approx_knn=False)
            for m in s.matchers))
        for s in stages)

    def make_run(stg):
        def run_one(src, tgt, g):
            tn = {"raw": _attach_normals_knn(
                tgt["raw"].xyz, tgt["raw"].mask, 8)}
            return align_pipeline(src, tn, g, stg)
        return run_one

    # "prod" = the production map-align operating point at the same shapes
    # (VERDICT r4 #7): target normals PRECOMPUTED outside the timed region
    # (production attaches them once per map rebuild, not per align) and
    # the candidate cache on (cand_k as the realtime preset runs it). The
    # plain rows keep normals attachment in-loop for r2/r3 continuity —
    # they deliberately UNDERSTATE production throughput at 8k+.
    from mola_fe_lidar_tpu.models.icp import _CAND_KINDS, _CAND_KNN_KINDS
    stages_prod = tuple(
        dataclasses.replace(
            s,
            matchers=tuple(
                dataclasses.replace(
                    m, cand_k=(4 if m.kind in _CAND_KINDS
                               else max(4, m.knn + 3)
                               if m.kind in _CAND_KNN_KINDS else 0))
                for m in s.matchers),
            quality=tuple(dataclasses.replace(q, max_points=8192)
                          for q in s.quality))
        for s in stages)

    def run_prod(src, tn, g):
        # tn already carries precomputed normals (outside the timing)
        return align_pipeline(src, tn, g, stages_prod)

    # ONE jit dispatcher per stage set caches all shape specializations
    fns = {"default": jax.jit(jax.vmap(make_run(stages))),
           "pallas": jax.jit(jax.vmap(make_run(stages_pallas))),
           "prod": jax.jit(jax.vmap(run_prod))}
    attach = jax.jit(jax.vmap(
        lambda t: {"raw": _attach_normals_knn(t["raw"].xyz, t["raw"].mask, 8)}))
    grid = [("default", 2048, 16), ("default", 2048, 64),
            ("default", 2048, 256), ("default", 8192, 16),
            ("default", 32768, 4),
            ("prod", 8192, 16), ("prod", 32768, 4),
            ("pallas", 8192, 16), ("pallas", 32768, 4)]
    for backend, n, batch in grid:
        pairs = make_pairs(rng, batch, n, tau_sigma=0.05)
        srcs, tgts, taus = _stack_pairs(pairs, n)
        init = se3.identity((batch,))
        try:
            if backend == "prod":
                tn = attach(tgts)
                jax.block_until_ready(tn)
                res, dt = _timed(lambda: fns["prod"](srcs, tn, init), iters=5)
            else:
                res, dt = _timed(lambda: fns[backend](srcs, tgts, init),
                                 iters=5)
            rows.append({"cloud": n, "batch": batch, "backend": backend,
                         "pairs_per_sec": round(batch / dt, 1),
                         "max_err_m": round(max(_pose_errors(res, taus)), 4)})
        except Exception as e:  # noqa: BLE001
            rows.append({"cloud": n, "batch": batch, "backend": backend,
                         "error": f"{type(e).__name__}: {e}"[:120]})
    return rows


# ---------------------------------------------------------------------------
# stress: overlap / outliers / degenerate corridor / quality separation
# ---------------------------------------------------------------------------

def bench_stress(rng):
    import jax.numpy as jnp
    from mola_fe_lidar_tpu.cloud import from_points
    from mola_fe_lidar_tpu.geometry import se3
    from mola_fe_lidar_tpu.models import (
        ICPParams, Matcher, PairWeights, Quality, Solver,
    )
    from mola_fe_lidar_tpu.models.icp import align

    out = {}
    p = ICPParams(
        max_iterations=60,
        matchers=(Matcher(kind="point2plane_knn", distance_threshold=1.0,
                          knn=6, plane_eigen_threshold=0.2),),
        solver=Solver(kind="gauss_newton", max_iterations=10),
        quality=(Quality(threshold_distance=0.3),),
        weights=PairWeights(use_scale_outlier_detector=True,
                            use_robust_kernel=True, robust_kernel="cauchy",
                            robust_kernel_param=0.2),
    )

    def run(src_pts, tgt_pts, tau, params=p):
        true = se3.exp(jnp.asarray(tau))
        res = align({"raw": from_points(src_pts, capacity=CAP)},
                    {"raw": from_points(tgt_pts, capacity=CAP)},
                    se3.identity(), params)
        err = float(se3.translation_norm(se3.compose(
            res.pose, se3.inverse(true))))
        return res, err

    # (a) partial overlap ~50%: source sees x in [-30, 10], target [-10, 30].
    # THREE independent instances (dedicated seeds, decoupled from every
    # other section's rng consumption — round 3 learned that adding scaling
    # rows upstream silently swapped this scenario's draw and flipped its
    # outcome): partial overlap from identity init is genuinely bimodal
    # (the non-overlap half can capture the pose), so one draw is not a
    # result. Each row reports err + quality; a failed instance must be
    # FLAGGED by quality (that is the contract the front-end relies on).
    from mola_fe_lidar_tpu.cloud.voxel import hash_subsample_np
    _cap_sel = lambda a: a[np.sort(hash_subsample_np(np.arange(len(a)), CAP))]
    rows = []
    for seed_off in range(3):
        r2 = np.random.default_rng(SEED + 17 + seed_off)
        world = make_world(r2, 2 * CAP, extent=30.0)
        tau = r2.normal(0, 0.05, 6).astype(np.float32)
        R0, t0 = _cpu_se3_exp(-tau)
        # hash-uniform down-selection: make_world emits block-ordered
        # structure (ground, y-wall, x-wall) and a [:CAP] slab would drop
        # the x-wall entirely, degenerating the scenario (CLAUDE.md)
        src_w = _cap_sel(world[world[:, 0] < 10.0])
        tgt_w = _cap_sel(world[world[:, 0] > -10.0])
        res, err = run((src_w @ R0.T + t0).astype(np.float32), tgt_w, tau)
        rows.append({"err_m": round(err, 4),
                     "quality": round(float(res.quality), 3)})
    ok = [r for r in rows if r["err_m"] < 0.3]
    out["overlap50"] = {
        "instances": rows,
        "converged": len(ok),
        # every non-converged instance must sit below every converged
        # instance's quality — the flag the pipeline acts on
        "failures_flagged": bool(
            all(f["quality"] < min((r["quality"] for r in ok), default=1.0)
                for r in rows if r["err_m"] >= 0.3)),
    }

    # (b) 15% dynamic outliers: a moved cluster between the two captures
    world = make_world(rng, CAP)
    mv = world.copy()
    k = int(0.15 * CAP)
    mv[-k:] += np.array([4.0, 2.0, 0.0], np.float32)
    tau = rng.normal(0, 0.05, 6).astype(np.float32)
    R0, t0 = _cpu_se3_exp(-tau)
    src = (world @ R0.T + t0).astype(np.float32)
    res_r, err_r = run(src, mv, tau)
    import dataclasses
    plain = dataclasses.replace(
        p, weights=PairWeights(use_scale_outlier_detector=False))
    res_p, err_p = run(src, mv, tau, plain)
    out["dynamic_outliers15"] = {
        "err_robust_m": round(err_r, 4), "err_plain_m": round(err_p, 4),
        "quality": round(float(res_r.quality), 3)}

    # (c) corridor (degenerate along x): two walls + ground, no structure in x
    n4 = CAP // 4
    corridor = np.concatenate([
        np.stack([rng.uniform(-30, 30, 2 * n4), rng.uniform(-4, 4, 2 * n4),
                  rng.normal(0, 0.02, 2 * n4)], -1),
        np.stack([rng.uniform(-30, 30, n4), np.full(n4, 4.0),
                  rng.uniform(0, 4, n4)], -1),
        np.stack([rng.uniform(-30, 30, n4), np.full(n4, -4.0),
                  rng.uniform(0, 4, n4)], -1)]).astype(np.float32)
    tau = np.array([0.5, 0.02, 0.0, 0, 0, 0.01], np.float32)
    R0, t0 = _cpu_se3_exp(-tau)
    res, err = run((corridor @ R0.T + t0).astype(np.float32), corridor, tau)
    cov = np.asarray(res.cov)
    out["corridor_degenerate"] = {
        "err_m": round(err, 4), "quality": round(float(res.quality), 3),
        # the solver should KNOW x is unconstrained: σ_x ≫ σ_y
        "cov_sigma_x": float(np.sqrt(max(cov[0, 0], 0))),
        "cov_sigma_y": float(np.sqrt(max(cov[1, 1], 0))),
    }

    # (d) quality separation: same pair, correct vs 2 m-misaligned pose
    world = make_world(rng, CAP)
    src1 = {"raw": from_points(world, capacity=CAP)}
    gshort = dataclasses.replace(
        p, max_iterations=1,
        weights=PairWeights(use_scale_outlier_detector=False))
    res_good = align(src1, src1, se3.identity(), gshort)
    bad_pose = se3.exp(jnp.asarray(np.array([2.0, 0, 0, 0, 0, 0], np.float32)))
    res_bad = align(src1, src1, bad_pose, gshort)
    out["quality_separation"] = {
        "aligned": round(float(res_good.quality), 3),
        "misaligned_2m": round(float(res_bad.quality), 3)}
    return out


def bench_scan_to_map(rng):
    """Production scan-to-map operating point: one 8k-pt filtered scan vs a
    32k-pt map layer, candidate-cached point-to-plane (cand_k=4, refresh 4),
    forced to the full 100-outer-iteration crawl (min_abs_step=0) — the
    worst-case per-scan align the odometry front-end dispatches
    (frontend/local_map.py; docs/accuracy.md profile)."""
    import jax.numpy as jnp
    from mola_fe_lidar_tpu.cloud import from_points
    from mola_fe_lidar_tpu.filters.pipeline import _attach_normals_knn
    from mola_fe_lidar_tpu.geometry import se3
    from mola_fe_lidar_tpu.models import (
        ICPParams, Matcher, PairWeights, Quality, Solver,
    )
    from mola_fe_lidar_tpu.models.icp import align

    map_pts = make_world(rng, 32768, extent=60.0)
    tgt = {"planes": _attach_normals_knn(
        jnp.asarray(map_pts), jnp.ones(len(map_pts), jnp.float32), 8)}
    sel = rng.choice(len(map_pts), 8192, replace=False)
    tau = np.array([0.35, -0.15, 0.02, 0, 0, 0.02], np.float32)
    R0, t0 = _cpu_se3_exp(-tau)
    src_pts = (map_pts[sel] @ R0.T + t0).astype(np.float32)
    src_pts += rng.normal(0, 0.02, src_pts.shape).astype(np.float32)
    src = {"planes": from_points(src_pts, capacity=8192)}
    p = ICPParams(
        max_iterations=100, cand_refresh=4,
        min_abs_step_trans=0.0, min_abs_step_rot=0.0,
        matchers=(Matcher(kind="point2plane_normals", src_layer="planes",
                          tgt_layer="planes", distance_threshold=1.5,
                          cand_k=4),),
        solver=Solver(kind="gauss_newton", max_iterations=20,
                      prior_sigma_trans=0.5, prior_sigma_rot=0.2),
        quality=(Quality(threshold_distance=0.3, src_layer="planes",
                         tgt_layer="planes"),),
        weights=PairWeights(use_scale_outlier_detector=False),
    )
    res, dt = _timed(lambda: align(src, tgt, se3.identity(), p), iters=10)
    # compare against the true pose translation exp(tau).t, not the raw
    # twist v (with nonzero omega, exp(tau).t = V(w) v != v)
    _, t_true = _cpu_se3_exp(tau)
    err = float(np.linalg.norm(np.asarray(res.pose.t) - t_true))
    return {"align_ms_100iter_crawl": round(dt * 1e3, 1),
            "src_points": 8192, "map_points": 32768,
            "trans_err_m": round(err, 5),
            "quality": round(float(np.asarray(res.quality)), 3)}


def bench_pgo(rng):
    """Whole-graph pose-graph optimization (solve/pose_graph_gn.py): a
    256-keyframe trajectory (odometry chain at the front-end's factor
    noise, sigma 0.10 m / 1 deg) with 32 loop-closure edges, optimized by
    the device LM in one dispatch. Reports ms per 30-iteration solve
    (readback-timed) and the cost reduction."""
    import jax.numpy as jnp
    from mola_fe_lidar_tpu.solve.pose_graph_gn import optimize_pose_graph

    n, n_lc = 256, 32
    w_t, w_r = 1.0 / 0.10 ** 2, 1.0 / np.deg2rad(1.0) ** 2
    # ground-truth poses on a wandering 2.5-D path
    yaw = np.cumsum(rng.normal(0, 0.06, n)); yaw[0] = 0.0
    gt_R = np.stack([np.array([[np.cos(a), -np.sin(a), 0],
                               [np.sin(a), np.cos(a), 0], [0, 0, 1]])
                     for a in yaw]).astype(np.float64)
    steps = np.stack([2.5 * np.cos(yaw[:-1]), 2.5 * np.sin(yaw[:-1]),
                      rng.normal(0, 0.05, n - 1)], -1)
    gt_t = np.concatenate([[np.zeros(3)], np.cumsum(steps, 0)])
    edges = []
    for i in range(n - 1):  # odometry chain, noise at the factor sigmas
        dR = gt_R[i].T @ gt_R[i + 1]
        dt_ = gt_R[i].T @ (gt_t[i + 1] - gt_t[i])
        ang = rng.normal(0, np.deg2rad(1.0))
        Rn = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        edges.append((i, i + 1, dR @ Rn, dt_ + rng.normal(0, 0.10, 3)))
    for _ in range(n_lc):  # exact loop closures between distant nodes
        i = int(rng.integers(0, n - 40)); j = int(rng.integers(i + 20, n))
        edges.append((i, j, gt_R[i].T @ gt_R[j],
                      gt_R[i].T @ (gt_t[j] - gt_t[i])))
    # initial values: compose the noisy chain
    init_R, init_t = [np.eye(3)], [np.zeros(3)]
    for (_, _, R, t) in edges[: n - 1]:
        init_R.append(init_R[-1] @ R)
        init_t.append(init_R[-2] @ t + init_t[-1])
    e_cap = len(edges)
    e_from = np.array([e[0] for e in edges], np.int32)
    e_to = np.array([e[1] for e in edges], np.int32)
    rel_R = np.stack([e[2] for e in edges]).astype(np.float32)
    rel_t = np.stack([e[3] for e in edges]).astype(np.float32)
    args = (jnp.asarray(np.stack(init_R), jnp.float32),
            jnp.asarray(np.stack(init_t), jnp.float32),
            jnp.ones(n, jnp.float32), jnp.asarray(e_from), jnp.asarray(e_to),
            jnp.asarray(rel_R), jnp.asarray(rel_t),
            jnp.full(e_cap, w_t, jnp.float32), jnp.full(e_cap, w_r, jnp.float32),
            jnp.ones(e_cap, jnp.float32))
    (R_o, t_o, cost), dt = _timed(
        lambda: optimize_pose_graph(*args, iters=30), iters=10)
    ate0 = float(np.sqrt(np.mean(
        np.sum((np.stack(init_t) - gt_t) ** 2, -1))))
    ate1 = float(np.sqrt(np.mean(
        np.sum((np.asarray(t_o, np.float64) - gt_t) ** 2, -1))))
    return {"nodes": n, "edges": e_cap, "lm_iters": 30,
            "solve_ms": round(dt * 1e3, 1),
            "final_cost": round(float(np.asarray(cost)), 1),
            "ate_init_m": round(ate0, 3), "ate_opt_m": round(ate1, 3)}


def main():
    rng = np.random.default_rng(SEED)
    pairs = make_pairs(rng, B, CAP)
    head = bench_headline(pairs)
    cfgs = bench_configs(rng)
    cfgs["scan_to_map"] = bench_scan_to_map(rng)
    cfgs["pose_graph_lm"] = bench_pgo(rng)
    scaling = bench_scaling(rng)
    stress = bench_stress(rng)
    cpu_rate = bench_cpu(pairs)
    out = {
        "metric": "ICP scan pairs/sec (64-pair batch, 2048-pt clouds, point-to-plane)",
        "value": round(head["rate_fast"], 2),
        "unit": "pairs/sec",
        "vs_baseline": round(head["rate_fast"] / cpu_rate, 2),
        "baseline_cpu_pairs_per_sec": round(cpu_rate, 3),
        "cpu_pairs_timed": CPU_PAIRS,
        "iters_timed": ITERS_TIMED,
        "parity_same_algorithm_pairs_per_sec": round(head["rate_parity"], 2),
        "vs_baseline_same_algorithm": round(head["rate_parity"] / cpu_rate, 2),
        "parity_mxu_pairs_per_sec": round(head["rate_parity_mxu"], 2),
        "vs_baseline_mxu": round(head["rate_parity_mxu"] / cpu_rate, 2),
        "parity_accuracy": head["parity_accuracy"],
        "parity_accuracy_mxu": head["parity_accuracy_mxu"],
        # MXU-busy fraction of the MXU-routed parity path (profiler-style:
        # issued MACs / bf16 peak); the useful-FLOP structural model is
        # reported alongside — see bench_headline for both definitions
        "est_mxu_utilization_parity": head["est_mxu_busy_frac"],
        "est_useful_flop_frac_parity": head["est_useful_flop_frac"],
        "mean_iters_parity": head["mean_iters_parity"],
        "mean_iters_parity_mxu": head["mean_iters_parity_mxu"],
        "min_quality": round(head["min_quality"], 3),
        "max_trans_err_m": round(head["max_err"], 5),
        "configs": cfgs,
        "scaling": scaling,
        "stress": stress,
        "device": __import__("jax").devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
