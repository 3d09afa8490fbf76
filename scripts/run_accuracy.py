"""Accuracy north-star harness: HDL-64 replay at the KITTI operating point.

No KITTI data exists on this host (no network), so the run uses the honest
HDL-64 simulator (``obs.hdl64``: 64-beam ring geometry, azimuth-ordered
points, per-point timestamps, occlusion, motion skew) at the reference's
KITTI operating point — 131072-pt raw clouds, voxel 1.0 m, KF 3 m
(reference params/kitti-default.yaml). Evaluates BOTH the keyframe
trajectory and the per-scan trajectory (KITTI convention; VERDICT.md
round-1 items #2/#7) and records the per-stage device profile (item #8).

Run (real TPU): ``python scripts/run_accuracy.py --scans 500``
Smoke (CPU):    ``python scripts/run_accuracy.py --scans 40 --azimuth 512 --cpu``

Writes ``docs/accuracy.json`` (+ prints a summary line per config).
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def build_cfg(deskew: bool, scale: float = 1.0, local_map: bool = False,
              overrides=()):
    from mola_fe_lidar_tpu.utils.config import load_yaml

    cfg = load_yaml(str(REPO / "mola_fe_lidar_tpu/params/kitti-default.yaml"))
    cfg = copy.deepcopy(cfg)
    p = cfg["params"]
    if scale < 1.0:
        # smoke runs at reduced azimuth: shrink all static capacities
        # proportionally (256-multiple buckets) so CPU compiles stay sane
        bucket = lambda v: max(256, int(v * scale) // 256 * 256)
        p["pointcloud_generator"][0]["params"]["capacity"] = bucket(131072)
        for f in p["pointcloud_filter"]:
            for key in ("edges_capacity", "planes_capacity",
                        "decimated_capacity"):
                if key in f.get("params", {}):
                    f["params"][key] = bucket(f["params"][key])
    if deskew:
        p["pointcloud_generator"][0]["params"]["keep_time"] = True
        # anchor=start keeps estimated poses aligned with scan-start
        # timestamps — the gt association convention
        p["pointcloud_filter"] = (
            [{"class": "FilterDeskew",
              "params": {"input_layer": "raw", "scan_period": 0.1,
                         "anchor": "start"}}]
            + p["pointcloud_filter"])
    if local_map:
        p["odometry_reference"] = "local_map"
    for kv in overrides:
        key, _, val = kv.partition("=")
        try:
            parsed = json.loads(val)
        except json.JSONDecodeError:
            parsed = val
        # integer path segments index into YAML lists (e.g.
        # pointcloud_filter.0.params.voxel_size=0.5)
        parts = [int(x) if x.lstrip("-").isdigit() else x
                 for x in key.split(".")]
        node = p
        for part in parts[:-1]:
            node = node[part]
        node[parts[-1]] = parsed
    return cfg


def eval_scan_ate(backend, kf_poses, observations, gt_poses):
    """Scan-rate ATE for an arbitrary keyframe-pose dict (the runner's
    association convention: gt index = scan index)."""
    from mola_fe_lidar_tpu.obs.metrics import ate_rmse
    from mola_fe_lidar_tpu.obs.runner import per_scan_trajectory

    dt = (observations[1]["timestamp"] - observations[0]["timestamp"]
          if len(observations) > 1 else 1.0)
    t0 = observations[0]["timestamp"]
    gt_sel, est_sel = [], []
    for ts, pose in per_scan_trajectory(backend, kf_poses):
        idx = int(round((ts - t0) / dt))
        if 0 <= idx < len(gt_poses):
            gt_sel.append(gt_poses[idx])
            est_sel.append(pose)
    return ate_rmse(est_sel, gt_sel)


def false_lc_study(res, obs, gt, robust: str) -> dict:
    """Inject ONE false loop closure into the recorded factor stream and
    optimize three ways: clean+robust, poisoned+plain LM, poisoned+robust.

    The robust (IRLS, non-consecutive-edges-only) kernel must soft-disable
    the poison: ate(poisoned, robust) ≈ ate(clean, robust) while the plain
    LM is dragged off. This is the "beat the reference" half of its LC
    acceptance gate (reference src/LidarOdometry.cpp:809-816 accepts on ICP
    goodness alone and delegates trust to gtsam's robust noise models)."""
    from mola_fe_lidar_tpu.frontend.backend import FactorRelativePose3
    from mola_fe_lidar_tpu.geometry import se3

    backend = res["backend"]
    kf_ids = sorted(backend.keyframes)
    a, b = kf_ids[0], kf_ids[len(kf_ids) // 2]
    # a wildly wrong hypothesis: 20 m lateral + 40 deg yaw
    cy, sy = np.cos(0.7), np.sin(0.7)
    Rbad = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    bad = FactorRelativePose3(
        kf_from=a, kf_to=b,
        rel_pose=se3.Pose(R=Rbad, t=np.array([20.0, -15.0, 0.0])))
    out = {"ate_clean_robust": eval_scan_ate(
        backend, backend.optimized_poses(robust=robust), obs, gt)}
    backend.factors.append(bad)
    try:
        out["ate_poisoned_plain"] = eval_scan_ate(
            backend, backend.optimized_poses(robust="none"), obs, gt)
        out["ate_poisoned_robust"] = eval_scan_ate(
            backend, backend.optimized_poses(robust=robust), obs, gt)
    finally:
        backend.factors.pop()
    out["injected_pair"] = [int(a), int(b)]
    return out


def lc_ablation_study(res, obs, gt, robust: str) -> dict:
    """PGO with vs without the accepted loop-closure factors.

    The end-to-end LC demonstration (VERDICT r3 #2): on a revisiting route
    the accepted LC factors must CUT the optimized-trajectory ATE relative
    to optimizing the same graph with those factors removed. ``lc_pairs``
    come from the module's MethodState (recorded at acceptance time)."""
    backend = res["backend"]
    pairs = {tuple(sorted(p)) for p in res["module"].state.lc_pairs}
    all_factors = list(backend.factors)
    ate_with = eval_scan_ate(
        backend, backend.optimized_poses(robust=robust), obs, gt)
    try:
        backend.factors[:] = [
            f for f in all_factors
            if tuple(sorted((f.kf_from, f.kf_to))) not in pairs]
        ate_without = eval_scan_ate(
            backend, backend.optimized_poses(robust=robust), obs, gt)
    finally:
        backend.factors[:] = all_factors
    n_lc = sum(1 for f in all_factors
               if tuple(sorted((f.kf_from, f.kf_to))) in pairs)
    return {"n_lc_factors": n_lc,
            "ate_pgo_with_lc": ate_with,
            "ate_pgo_without_lc": ate_without}


# the 10 Hz online operating point (VERDICT r3 #3): local_map + deskew
# with the recruiting crawl REMOVED at its source (tight match distance
# against the dense map) so the iteration cap + convergence floor stop
# real descent, not the crawl; the kNN edge matcher rides the candidate
# cache; full-map NN goes through the MXU bf16x3+rescore path. The
# truncating levers (distance cap, iteration cap) bind only on scans
# WITH a validated velocity prior (local_map_tight_requires_prior,
# default on): cold-start/post-outage scans keep the wide recruiting
# stages. Each value re-ablated on TPU — see docs/accuracy.md.
# The nearby-KF batch rides the same regime: those 5-candidate vmapped
# aligns are the scan pipeline's main chip-queue rival (profile:
# 1131 ms/batch at 100 iterations vs a 242 ms scan step), and capping
# them at 25 iterations + extending the candidate cache to the kNN
# matchers was measured ATE-neutral (docs/accuracy.json).
REALTIME = (
    "local_map_max_match_distance=0.75",
    "local_map_min_abs_step_trans=0.001",
    "local_map_min_abs_step_rot=0.0002",
    "local_map_max_iterations=15",
    "local_map_cand_knn=true",
    "local_map_nn_backend=mxu",
    "nearby_cand_knn=true",
    # round-5 levers (per-program profile, scripts/profile_step.py):
    # quality subsample 8192->2048 cut the align step 85->61 ms (the
    # paired-ratio stays an unbiased mean, +-~0.02 noise vs gates at
    # 0.50 with map goodness ~0.83); the sort-free hash map build cut
    # the per-KF rebuild 209->~90 ms; nearby batches at 15 outer
    # iterations + 1/2-density SOURCE support (target density kept:
    # the goodness scale rides on it) cut the scan pipeline's main
    # chip-queue rival 183->119 ms.
    # nearby_decimate=2 was TRIED and reverted: the reshaped half-density
    # batch was measurably slower end-to-end AND cost 0.05 pp t_rel
    # (500-scan A/B, this file's r5 sweep).
    # The 0.99->1.04 % block-route t_rel shift that came with the r5
    # levers is NOT from the two numerics-adjacent knobs: a 500-scan A/B
    # with quality_max_points=2048 + stats_mode=segment reproduced
    # t_rel 1.064 % (recorded row in accuracy.json) - if anything
    # slightly worse. Replays are bit-deterministic (three re-records,
    # identical ATE/t_rel digits). local_map_build_mode=sort is ALSO
    # exonerated (A/B row: 1.051 %, PGO 0.897 %) - every r5 preset knob
    # reproduces ~1.04-1.06 %, so the 0.99->1.04 shift rode in with the
    # r5 CODE (fused-step/nearby restructuring), not these overrides.
    # The KITTI-regime snake route sits at 0.300 % either way; the block
    # circuit's all-corner segments amplify what is a ~5 cm/100 m delta.
    "local_map_quality_max_points=1024",
    "local_map_build_mode=hash",
    "nearby_max_iterations=10",
    # segmented prefix-sum voxel stats in the ingest filter (index 1 —
    # FilterDeskew is prepended at 0 in deskew configs): the segment_sum
    # tables were the filter's largest device cost (~15 ms of the ~40 ms
    # program at 131k rows; cloud/voxel.py::voxel_stats_scan)
    "pointcloud_filter.1.params.stats_mode=scan",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=500)
    ap.add_argument("--azimuth", type=int, default=2048)
    ap.add_argument("--moving-cars", type=int, default=0)
    ap.add_argument("--parked-cars", type=int, default=0,
                    help="static near-field cars lining the streets "
                         "(obs.hdl64.add_parked_cars); raises the LC "
                         "paired-ratio ceiling on revisit routes")
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU mesh")
    ap.add_argument("--configs", default="local_map,deskew,no_deskew",
                    help="comma list of: local_map (scan-to-map + deskew), "
                         "local_map_nodeskew, deskew, no_deskew (both "
                         "scan-to-scan)")
    ap.add_argument("--route", default="block",
                    choices=["block", "snake", "outback", "relap"],
                    help="trajectory (obs.hdl64.make_route): 'snake' is the "
                         "1.74 km loop-closing route with KITTI-length "
                         "straights; 'outback' the CPU-smoke out-and-back")
    ap.add_argument("--speed", type=float, default=8.0,
                    help="cruise speed m/s (corners are lat-accel limited)")
    ap.add_argument("--sim-cache", action="store_true",
                    help="cache the simulated sequence in /tmp (ablations)")
    ap.add_argument("--override", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="set a module param in every config (JSON value)")
    ap.add_argument("--warm-start", action="store_true",
                    help="compile the primary per-scan programs on the "
                         "first observation BEFORE the replay clock starts "
                         "(the online-deployment startup pattern); the "
                         "time is recorded separately as warm_s")
    ap.add_argument("--pgo", action="store_true",
                    help="also run the device pose-graph optimizer over the "
                         "factor stream and record *_pgo metric rows")
    ap.add_argument("--pgo-robust", default="none",
                    choices=["none", "huber", "cauchy"],
                    help="robust kernel for the *_pgo rows")
    ap.add_argument("--inject-false-lc", action="store_true",
                    help="after replay, inject one false loop-closure "
                         "factor and record the clean/poisoned/robust "
                         "PGO ATE triplet (requires --pgo)")
    ap.add_argument("--out", default=str(REPO / "docs" / "accuracy.json"))
    ap.add_argument("--dump-traj", default="",
                    help="directory for per-config est/gt trajectory npz")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        # smokes on the 1-core host are compile-dominated (the fused map
        # program alone is ~8 min); the persistent cache makes config
        # A/B comparisons pay it once
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    else:
        # persistent compile cache: the remote TPU compiler occasionally
        # stalls for minutes on a program it has compiled before in
        # another process (observed: one 752 s outlier in a 500-scan
        # replay); the on-disk cache removes the re-roll entirely
        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from mola_fe_lidar_tpu.obs.hdl64 import hdl64_sequence
    from mola_fe_lidar_tpu.obs.runner import run_replay

    import jax
    device = jax.default_backend()

    # host<->device round-trip floor of THIS testbed (the axon tunnel is
    # ~25-30 ms; a local PCIe TPU would be <1 ms). Each scan pays exactly
    # one readback on the pipelined path, so the tunnel-adjusted steady
    # rate (1/(1/steady - rtt)) estimates what the same pipeline does on
    # production-attached hardware. Both raw and adjusted are recorded.
    import jax.numpy as jnp
    _tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(_tiny(jnp.zeros(1)))  # compile outside the timing
    _rtts = []
    for _ in range(30):
        _t0 = time.perf_counter()
        np.asarray(_tiny(jnp.zeros(1)))
        _rtts.append(time.perf_counter() - _t0)
    rtt_s = min(_rtts)
    print(f"device round-trip floor: {rtt_s * 1e3:.1f} ms", file=sys.stderr)

    t0 = time.perf_counter()
    cache = (Path("/tmp") / f"hdl64_{args.scans}_{args.azimuth}_"
             f"{args.moving_cars}_{args.route}_{args.speed:g}"
             f"{'_p%d' % args.parked_cars if args.parked_cars else ''}.pkl"
             if args.sim_cache else None)
    if cache is not None and cache.exists():
        import pickle
        with open(cache, "rb") as fh:
            obs, gt = pickle.load(fh)
        print(f"loaded cached sim {cache}", file=sys.stderr)
    else:
        obs, gt = hdl64_sequence(n_scans=args.scans, n_azimuth=args.azimuth,
                                 moving_cars=args.moving_cars,
                                 parked_cars=args.parked_cars,
                                 route_kind=args.route, speed=args.speed)
        if cache is not None:
            import pickle
            with open(cache, "wb") as fh:
                pickle.dump((obs, gt), fh, protocol=4)
    sim_s = time.perf_counter() - t0
    print(f"simulated {args.scans} scans ({args.azimuth * 64} rays each) "
          f"in {sim_s:.0f}s", file=sys.stderr)

    known = ("deskew", "no_deskew", "local_map", "local_map_nodeskew",
             "realtime")
    for name in args.configs.split(","):
        if name not in known:
            raise SystemExit(
                f"unknown config {name!r}; choose from {known} "
                "(a typo would silently run scan-to-scan without deskew "
                "and record a bogus row)")
    results = {}
    for name in args.configs.split(","):
        over = tuple(args.override)
        if name == "realtime":
            # explicit --override wins over the preset (appended later)
            over = REALTIME + over
        cfg = build_cfg(deskew=(name in ("deskew", "local_map", "realtime")),
                        scale=args.azimuth / 2048,
                        local_map=name in ("local_map", "local_map_nodeskew",
                                           "realtime"),
                        overrides=over)
        res = run_replay(obs, cfg, gt_poses=gt, pgo=args.pgo,
                         pgo_robust=args.pgo_robust,
                         warm_start=args.warm_start)
        row = {k: res[k] for k in (
            "n_scans", "n_keyframes", "n_factors", "wall_s", "n_scan_poses",
            "jobs_abandoned", "wall_to_steady_s", "warm_s",
            "ate_rmse", "rpe_trans", "rpe_rot",
            "ate_rmse_scan", "rpe_trans_scan", "rpe_rot_scan",
            "kitti_t_rel_pct", "kitti_r_rel_deg_per_m", "kitti_segments",
            "ate_rmse_pgo", "ate_rmse_scan_pgo",
            "kitti_t_rel_pct_pgo") if k in res}
        row["scans_per_sec"] = res["n_scans"] / max(res["wall_s"], 1e-9)
        if res.get("scans_per_sec_steady"):
            row["scans_per_sec_steady"] = res["scans_per_sec_steady"]
            row["tunnel_rtt_ms"] = round(rtt_s * 1e3, 2)
            per_scan = 1.0 / res["scans_per_sec_steady"]
            if per_scan > rtt_s:
                row["scans_per_sec_steady_tunnel_adj"] = 1.0 / (
                    per_scan - rtt_s)
        # loop-closure audit (VERDICT r3 #2): count = checks, total = accepts
        pstats = res["module"].profiler.stats()
        for kind in ("lc", "nearby"):
            c = pstats.get(f"counter:checkNonAdjacent.{kind}.accepted")
            row[f"n_{kind}_checked"] = int(c["count"]) if c else 0
            row[f"n_{kind}_accepted"] = int(c["total"]) if c else 0
        if args.inject_false_lc and args.pgo:
            row["false_lc_study"] = false_lc_study(
                res, obs, gt, args.pgo_robust
                if args.pgo_robust != "none" else "cauchy")
        if args.pgo and row.get("n_lc_accepted", 0) > 0:
            row["lc_ablation"] = lc_ablation_study(
                res, obs, gt, args.pgo_robust
                if args.pgo_robust != "none" else "cauchy")
        # trajectory length for percentage-style drift numbers
        length = sum(float(np.linalg.norm(gt[i + 1][1] - gt[i][1]))
                     for i in range(len(gt) - 1))
        row["trajectory_m"] = round(length, 1)
        if "ate_rmse_scan" in row:
            row["ate_pct_of_traj"] = round(
                100.0 * row["ate_rmse_scan"] / length, 4)
        mod = res["module"]
        row["profile"] = mod.profiler.stats()
        # an overridden or re-routed run is a different experiment: key BOTH
        # the row and the trajectory dump so neither silently replaces a
        # default-config artifact
        if args.override:
            row["overrides"] = list(args.override)
            name = name + "+" + ",".join(args.override)
        if args.route != "block":
            row["route"] = args.route
            row["scans"] = args.scans
            name = f"{args.route}:{name}"
        if args.parked_cars:
            row["parked_cars"] = args.parked_cars
            name = f"{name}+parked{args.parked_cars}"
        if args.dump_traj:
            d = Path(args.dump_traj)
            d.mkdir(parents=True, exist_ok=True)
            sp = res.get("scan_poses", [])
            if sp:
                np.savez(d / f"{name}.npz",
                         t=np.array([x[0] for x in sp]),
                         est_t=np.stack([x[1][1] for x in sp]),
                         est_R=np.stack([x[1][0] for x in sp]),
                         gt_t=np.stack([p for _, p in gt]),
                         gt_R=np.stack([R for R, _ in gt]))
        results[name] = row
        print(json.dumps({k: v for k, v in row.items() if k != "profile"},
                         default=float))
        mod.shutdown()

    out = {"device": device, "scans": args.scans, "azimuth": args.azimuth,
           "rays_per_scan": args.azimuth * 64,
           "moving_cars": args.moving_cars,
           "route": args.route, "speed": args.speed,
           "operating_point": "kitti-default.yaml (voxel 1.0 m, KF 3 m)",
           "results": results}
    # merge: a partial rerun (--configs local_map) or another-route run
    # keeps the other recorded rows as long as the sensor operating point
    # matches (non-default routes key their rows "route:config" and carry
    # their own route/scans fields, so rows never collide across routes;
    # top-level scans/route describe the LAST run only)
    prev_path = Path(args.out)
    if prev_path.exists():
        try:
            prev = json.loads(prev_path.read_text())
            if all(prev.get(k) == out[k] for k in
                   ("device", "azimuth", "moving_cars")):
                merged = dict(prev.get("results", {}))
                merged.update(results)
                out["results"] = merged
        except (json.JSONDecodeError, KeyError):
            pass
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1, default=float))
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
