"""NN-backend crossover benchmark on the real TPU chip.

Times every nearest-neighbor backend (the ICP hot op, E3) across cloud
sizes and checks each against a scipy cKDTree ground truth, then writes
``docs/nn_crossover.json``. The engine's default ``nn_backend``/
``approx_knn`` settings are chosen from this table (VERDICT.md round-1
item #4).

Timing follows the axon-tunnel rule (CLAUDE.md): one readback
(``np.asarray`` of a small slice) per call — ``block_until_ready`` does not
reliably await queued dispatches here. Reported per-call times therefore
include a ~25 ms tunnel round trip; the relative ranking is unaffected.

Run: ``python scripts/bench_nn_backends.py [--sizes 2048,8192,...]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

K = 6
REPS = 20


def make_cloud(n, rng, extent=60.0):
    """LiDAR-ish scene: ground plane + structures, ~5% padding."""
    n_valid = int(n * 0.95)
    ground = np.stack([
        rng.uniform(-extent, extent, n_valid // 2),
        rng.uniform(-extent, extent, n_valid // 2),
        rng.normal(0, 0.05, n_valid // 2)], -1)
    walls = np.stack([
        rng.uniform(-extent, extent, n_valid - n_valid // 2),
        rng.uniform(-extent, extent, n_valid - n_valid // 2),
        rng.uniform(0, 6, n_valid - n_valid // 2)], -1)
    pts = np.concatenate([ground, walls]).astype(np.float32)
    xyz = np.zeros((n, 3), np.float32)
    xyz[:n_valid] = pts
    mask = np.zeros(n, np.float32)
    mask[:n_valid] = 1.0
    return xyz, mask


def time_call(fn, src, reps=REPS, chain=8):
    """(compile_s, per-call wall ms, amortized device ms).

    Per-call time includes one readback (the honest end-to-end number on
    this tunnel). The amortized number chains ``chain`` data-dependent
    calls inside ONE jitted program and reads back once — that isolates
    kernel cost from the ~25 ms round trip, which otherwise drowns all
    backends at scan sizes.
    """
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    out = fn(src)
    _ = np.asarray(out.dist)[:8]
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(src)
        _ = np.asarray(out.dist)[:8]
        times.append(time.perf_counter() - t0)
    per_call = float(np.median(times))

    @jax.jit
    def chained(s):
        def body(i, carry):
            r = fn(carry)
            # fold a result scalar back in: a true data dependency, so the
            # scheduler cannot overlap or elide iterations
            eps = jnp.min(r.dist) * 0.0
            return carry + eps
        return fn(jax.lax.fori_loop(0, chain - 1, body, s))

    out = chained(src)
    _ = np.asarray(out.dist)[:8]  # compile
    ctimes = []
    for _ in range(max(3, reps // 2)):
        t0 = time.perf_counter()
        out = chained(src)
        _ = np.asarray(out.dist)[:8]
        ctimes.append(time.perf_counter() - t0)
    amortized = (float(np.median(ctimes)) - per_call) / (chain - 1)
    return compile_s, per_call, max(amortized, 0.0)


def _as_nn(out):
    """Adapt (idx, dist) tuples to the NNResult duck type."""
    from mola_fe_lidar_tpu.ops.matching import NNResult

    return out if hasattr(out, "idx") else NNResult(*out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,8192,32768,131072")
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import jax
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from mola_fe_lidar_tpu.ops import grid_nn, matching, pallas_nn, pallas_knn

    device = jax.default_backend()
    print(f"backend: {device}", file=sys.stderr)
    rng = np.random.default_rng(0)
    rows = []

    for n in sizes:
        src, smask = make_cloud(n, rng)
        tgt, tmask = make_cloud(n, rng)
        jsrc, jsmask = jnp.asarray(src), jnp.asarray(smask)
        jtgt, jtmask = jnp.asarray(tgt), jnp.asarray(tmask)

        tree = cKDTree(tgt[tmask > 0.5])
        dk_ref, ik_ref = tree.query(src, k=K)
        d1_ref = dk_ref[:, 0]
        i1_ref = ik_ref[:, 0]

        def bench(name, kind, fn, ref, radius=None, idx_ref=None):
            try:
                compile_s, per_call, amort = time_call(fn, jsrc, args.reps)
                out = fn(jsrc)
                dist = np.asarray(out.dist)
                ok = smask > 0.5
                if radius is not None:
                    # radius-limited backend: judge only pairs the matcher
                    # threshold would keep
                    ok = ok & ((ref if ref.ndim == 1 else ref[:, 0]) < radius)
                rec = float(np.mean(np.abs(dist[ok] - ref[ok]) < 1e-3))
                row = {"backend": name, "kind": kind, "n": n,
                       "compile_s": round(compile_s, 3),
                       "per_call_ms": round(per_call * 1e3, 3),
                       "device_ms": round(amort * 1e3, 3),
                       "recall": round(rec, 4)}
                if idx_ref is not None:
                    # index-level recall: immune to the expansion form's
                    # ~1e-3 m distance noise (which the distance-match
                    # recall above counts as a miss)
                    idx = np.asarray(out.idx)
                    row["recall_idx"] = round(
                        float(np.mean(idx[ok] == idx_ref[ok])), 4)
            except Exception as e:  # noqa: BLE001
                row = {"backend": name, "kind": kind, "n": n,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            rows.append(row)
            print(json.dumps(row), file=sys.stderr)

        # ---- kNN (k=6) backends: the reference-parity op ----
        bench("pallas_knn", "knn", lambda s: pallas_knn.pallas_knn(
            s, jsmask, jtgt, jtmask, k=K), dk_ref)
        bench("approx_min_k", "knn", lambda s: matching.approx_knn(
            s, jsmask, jtgt, jtmask, k=K), dk_ref)
        # MXU candidates (approx_min_k) + exact f32 rescore (VERDICT r2
        # item #4). "mxu_knn" = the production bf16x3 pass; "mxu_knn_bf16"
        # documents WHY single-pass bf16 is not the default (the ~14 m²
        # cross-term noise ball collapses recall on dense targets).
        bench("mxu_knn", "knn", lambda s: matching.knn_mxu(
            s, jsmask, jtgt, jtmask, k=K, cand_k=32), dk_ref)
        bench("mxu_knn_bf16", "knn", lambda s: matching.knn_mxu(
            s, jsmask, jtgt, jtmask, k=K, cand_k=32, prec="default"), dk_ref)
        if n <= 2048:
            # the scan-merged exact path takes minutes in the remote XLA
            # compiler at >=8192 points (CLAUDE.md gotcha) — bench at scan
            # odometry size only
            bench("xla_scan_knn", "knn", lambda s: matching.knn(
                s, jsmask, jtgt, jtmask, k=K), dk_ref)

        # ---- 1-NN backends ----
        # the engine's auto default on TPU (models/icp.py::_resolve_backend):
        # distance expansion fused into approx_min_k(k=1) — never
        # materializes [N, M], vmaps efficiently (Pallas/XLA scans
        # serialize under vmap: 29 vs 155 ms for a vmapped 8x2048
        # 10-iteration loop)
        def _fused1(s):
            nn = matching.approx_knn(s, jsmask, jtgt, jtmask, k=1)
            return matching.NNResult(nn.idx[..., 0], nn.dist[..., 0])
        bench("fused_1nn", "1nn", _fused1, d1_ref, idx_ref=i1_ref)
        bench("pallas_1nn", "1nn", lambda s: _as_nn(
            pallas_nn.pallas_nearest_neighbors(s, jsmask, jtgt, jtmask)), d1_ref)
        bench("mxu_1nn", "1nn", lambda s: _as_nn(
            matching.nearest_neighbors_mxu(s, jsmask, jtgt, jtmask)), d1_ref)
        if n <= 2048:
            bench("xla_scan_1nn", "1nn", lambda s: matching.nearest_neighbors(
                s, jsmask, jtgt, jtmask), d1_ref)
        bench("grid_1nn", "1nn", lambda s: grid_nn.grid_nn(
            s, jsmask, jtgt, jtmask, cell=1.0), d1_ref, radius=0.9)
        gi = grid_nn.build_grid(jtgt, jtmask, 1.0)
        bench("grid_query_1nn", "1nn", lambda s: grid_nn.grid_nearest_neighbors(
            s, jsmask, gi, jtgt, jtmask), d1_ref, radius=0.9)

    out = {"device": device, "k": K, "reps": args.reps, "rows": rows,
           "note": ("per-call times include one host readback (~25 ms axon "
                    "tunnel round trip); xla_scan paths only benched at 2048 "
                    "(remote compile takes minutes at >=8192)")}
    path = Path(__file__).resolve().parent.parent / "docs" / "nn_crossover.json"
    path.parent.mkdir(exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({"wrote": str(path), "n_rows": len(rows)}))


if __name__ == "__main__":
    main()
