#!/usr/bin/env python
"""Benchmark: batched ICP scan-pair alignment rate on TPU vs CPU baseline.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline config is BASELINE.json's "64 scan pairs vmapped in parallel":
point-to-plane ICP (kNN=6 plane fit, Gauss-Newton, convergence thresholds
from the reference's icp-settings-regular.yaml) on 2048-point voxel-filtered
clouds. ``vs_baseline`` is the measured speedup over an MRPT-style CPU ICP
(scipy cKDTree kNN + numpy point-to-plane Gauss-Newton — the same algorithm
the reference stack runs on CPU), measured on this host.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

B = 64          # scan pairs per batch (BASELINE config)
CAP = 2048      # points per cloud after voxel filtering
ITERS_TIMED = 5
CPU_PAIRS = 3   # pairs to time for the CPU baseline (then extrapolated)
SEED = 7


def make_world(rng, n):
    g = np.stack([rng.uniform(-30, 30, n // 2), rng.uniform(-30, 30, n // 2),
                  rng.normal(0, 0.02, n // 2)], -1)
    w1 = np.stack([rng.uniform(-30, 30, n // 4), np.full(n // 4, 30.0),
                   rng.uniform(0, 6, n // 4)], -1)
    w2 = np.stack([np.full(n // 4, -30.0), rng.uniform(-30, 30, n // 4),
                   rng.uniform(0, 6, n // 4)], -1)
    return np.concatenate([g, w1, w2]).astype(np.float32)


def make_pairs(rng, b, cap):
    """b scan pairs with known SE(3) offsets (numpy side)."""
    pairs = []
    for _ in range(b):
        world = make_world(rng, cap)
        tau = rng.normal(0, 0.08, 6).astype(np.float32)
        pairs.append((world, tau))
    return pairs


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
        neigh = tgt[idx]                      # [N,k,3]
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
        # step size between outer iterations
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
# TPU path
# ---------------------------------------------------------------------------

def bench_tpu(pairs):
    """Returns (headline_rate, parity_rate, min_quality, max_err_m).

    Headline: production fast path — one kNN-normals precompute per target
    cloud (timed, amortized) + 1-NN point-to-plane ICP. Parity: the
    reference's own algorithm shape (kNN=6 neighborhood eigen-fit every
    iteration, Gauss-Newton <=20 inner, 100 outer max).
    """
    import jax
    import jax.numpy as jnp
    from mola_fe_lidar_tpu.cloud import from_points
    from mola_fe_lidar_tpu.filters.pipeline import _attach_normals_knn
    from mola_fe_lidar_tpu.geometry import se3
    from mola_fe_lidar_tpu.models import ICPParams, Matcher, PairWeights, Quality, Solver
    from mola_fe_lidar_tpu.parallel import make_batched_align

    b = len(pairs)
    srcs, tgt_worlds, taus = [], [], []
    for world, tau in pairs:
        R0, t0 = _cpu_se3_exp(-tau)
        src_pts = (world @ R0.T + t0).astype(np.float32)
        srcs.append({"raw": from_points(src_pts, capacity=CAP)})
        tgt_worlds.append(jnp.asarray(world))
        taus.append(tau)
    stack = lambda ts: jax.tree.map(lambda *x: jnp.stack(x), *ts)
    srcs = stack(srcs)
    tgt_xyz = jnp.stack(tgt_worlds)
    tgt_mask = jnp.ones((b, CAP), jnp.float32)
    init = se3.identity((b,))

    from mola_fe_lidar_tpu.models import align_pipeline, icp_coarse_to_fine
    stages = icp_coarse_to_fine()

    parity = ICPParams(
        max_iterations=100, min_abs_step_trans=5e-5, min_abs_step_rot=1e-5,
        matchers=(Matcher(kind="point2plane_knn", distance_threshold=0.70,
                          knn=6, plane_eigen_threshold=0.07),),
        solver=Solver(kind="gauss_newton", max_iterations=20),
        quality=(Quality(threshold_distance=0.10),),
        weights=PairWeights(use_scale_outlier_detector=False),
    )

    from mola_fe_lidar_tpu.parallel import make_chunked_batched_align
    f_parity = make_chunked_batched_align(parity, chunk=16)

    # Production fast path: fused normals precompute + 2-stage coarse-to-fine
    # pipeline, scanned in 16-pair chunks so one slow pair cannot stall the
    # whole batch at max_iterations.
    @jax.jit
    def run_fast_impl(tgt_xyz_, tgt_mask_, srcs_, init_):
        tgts_ = {"raw": jax.vmap(lambda x, m: _attach_normals_knn(x, m, 8))(
            tgt_xyz_, tgt_mask_)}
        chunk = 16
        bb = init_.t.shape[0]
        rs = lambda x: x.reshape(bb // chunk, chunk, *x.shape[1:])
        args = jax.tree.map(rs, (srcs_, tgts_, init_))
        inner = jax.vmap(lambda s, t, g: align_pipeline(s, t, g, stages))
        _, out = jax.lax.scan(lambda _, xs: (None, inner(*xs)), None, args)
        return jax.tree.map(lambda x: x.reshape(bb, *x.shape[2:]), out)

    def run_fast():
        return run_fast_impl(tgt_xyz, tgt_mask, srcs, init)

    # warm/compile; then honest per-call timing (readback each iteration —
    # block_until_ready does not reliably await queued dispatches on
    # tunneled backends, so each timed call fetches a small result)
    res = run_fast()
    np.asarray(res.quality)
    times = []
    for _ in range(ITERS_TIMED):
        t0 = time.perf_counter()
        res = run_fast()
        np.asarray(res.quality)
        times.append(time.perf_counter() - t0)
    rate_fast = b / float(np.median(times))

    # accuracy of the headline path vs ground truth
    errs = []
    for i in range(b):
        true = se3.exp(jnp.asarray(taus[i]))
        p = jax.tree.map(lambda x: x[i], res.pose)
        errs.append(float(se3.translation_norm(se3.compose(p, se3.inverse(true)))))
    max_err = max(errs)
    min_q = float(jnp.min(res.quality))

    from mola_fe_lidar_tpu.cloud.metric_map import PointCloud
    tgts_plain = {"raw": PointCloud(tgt_xyz, tgt_mask, {})}
    res_p = f_parity(srcs, tgts_plain, init)
    np.asarray(res_p.quality)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        res_p = f_parity(srcs, tgts_plain, init)
        np.asarray(res_p.quality)
        times.append(time.perf_counter() - t0)
    rate_parity = b / float(np.median(times))

    return rate_fast, rate_parity, min_q, max_err


def main():
    rng = np.random.default_rng(SEED)
    pairs = make_pairs(rng, B, CAP)
    rate_fast, rate_parity, min_quality, max_err = bench_tpu(pairs)
    cpu_rate = bench_cpu(pairs)
    out = {
        "metric": "ICP scan pairs/sec (64-pair batch, 2048-pt clouds, point-to-plane)",
        "value": round(rate_fast, 2),
        "unit": "pairs/sec",
        "vs_baseline": round(rate_fast / cpu_rate, 2),
        "baseline_cpu_pairs_per_sec": round(cpu_rate, 3),
        "parity_same_algorithm_pairs_per_sec": round(rate_parity, 2),
        "vs_baseline_same_algorithm": round(rate_parity / cpu_rate, 2),
        "min_quality": round(min_quality, 3),
        "max_trans_err_m": round(max_err, 5),
        "device": __import__("jax").devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
