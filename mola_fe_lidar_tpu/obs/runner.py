"""Dataset replay runner — the ``mola-cli`` analogue (L5 of SURVEY.md §1).

Loads a module config (YAML with $include), instantiates the front-end by
registry name, wires a back-end + WorldModel, replays a dataset
(synthetic or KITTI), and reports the estimated trajectory + metrics.

CLI:
    python -m mola_fe_lidar_tpu.obs.runner --dataset synthetic --scans 40
    python -m mola_fe_lidar_tpu.obs.runner --dataset kitti --sequence 00 \
        --config mola_fe_lidar_tpu/params/kitti-default.yaml --out traj.txt
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Dict, Optional, Tuple

import numpy as np

from ..frontend import InMemoryBackend, LidarOdometry, OptimizingBackend, WorldModel
from ..frontend.module_base import MODULE_REGISTRY
from ..utils.config import load_yaml
from ..utils.logging import get_logger
from .metrics import ate_rmse, kitti_segment_errors, rpe_rmse

log = get_logger("runner")

# Default module config for dataset replay when no --config is given:
# voxel-downsample + point-to-plane, thresholds sized for ~1 m/scan motion.
DEFAULT_CFG = {"params": {
    "min_time_between_scans": 0.01,
    "min_dist_xyz_between_keyframes": 3.0,
    "min_icp_goodness": 0.30,
    "min_icp_goodness_lc": 0.40,
    "min_dist_to_matching": 4.0,
    "max_dist_to_matching": 10.0,
    "max_dist_to_loop_closure": 14.0,
    "min_topo_dist_to_consider_loopclosure": 8,
    "loop_closure_montecarlo_samples": 6,
    "pointcloud_generator": [
        {"class": "GeneratorRawPoints", "params": {"capacity": 8192}}],
    "pointcloud_filter": [
        {"class": "FilterVoxelDownsample",
         "params": {"voxel_size": 0.7, "output_capacity": 8192}}],
    # coarse-to-fine stage vector: the wide point-to-point stage captures
    # large per-scan motion/rotation before the fine point-to-plane polish
    "icp_settings_with_vel": [
        {
            "params": {"maxIterations": 10},
            "matchers": [{"class": "Matcher_Points_DistanceThreshold",
                          "params": {"distanceThreshold": 6.0,
                                     "src_layer": "decimated",
                                     "tgt_layer": "decimated"}}],
            "solvers": [{"class": "Solver_Horn"}],
            "quality": [{"class": "QualityEvaluator_PairedRatio",
                         "params": {"thresholdDistance": 0.3,
                                    "src_layer": "raw", "tgt_layer": "raw"}}],
        },
        {
            "params": {"maxIterations": 30},
            "matchers": [{"class": "Matcher_Point2Plane",
                          "params": {"distanceThreshold": 2.0, "knn": 6,
                                     "planeEigenThreshold": 0.2,
                                     "src_layer": "decimated",
                                     "tgt_layer": "decimated"}}],
            "solvers": [{"class": "Solver_GaussNewton",
                         "params": {"maxIterations": 8}}],
            "quality": [{"class": "QualityEvaluator_PairedRatio",
                         "params": {"thresholdDistance": 0.3,
                                    "src_layer": "raw", "tgt_layer": "raw"}}],
        },
    ],
}}


def build_module(cfg: Optional[dict], backend=None, worldmodel=None):
    # AOT-compilation parity with the reference's C++ (VERDICT r4 #6):
    # every runner-built module gets the persistent compile cache unless
    # the application configured its own (see utils/compile_cache.py)
    from ..utils.compile_cache import enable_default_compile_cache
    enable_default_compile_cache()
    cfg = cfg or {}
    cls_name = cfg.get("module", "LidarOdometry")
    module = MODULE_REGISTRY.get(cls_name)()
    module.slam_backend = backend if backend is not None else InMemoryBackend()
    module.worldmodel = worldmodel if worldmodel is not None else WorldModel()
    module.initialize(cfg)
    return module


def estimated_trajectory(module: LidarOdometry) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """KF poses in the first-KF frame from the module's local pose graph."""
    # hold the lock for the WHOLE Dijkstra: a straggler nearby/LC worker
    # (drain()'s wait is bounded) may insert_edge concurrently, and the
    # native graph's edge vector can reallocate mid-traversal
    with module._state_lock:
        graph = module.state.local_pose_graph
        poses, _ = graph.dijkstra_nodes_estimate(graph.root)
    return poses


def per_scan_trajectory(backend, kf_poses):
    """Per-SCAN poses: KF pose ∘ advertised accumulated odometry.

    The KITTI convention evaluates every frame, not just keyframes (with
    3 m KF spacing, KF-only ATE under-samples drift — round-1 VERDICT weak
    #7). The front-end advertises (reference_kf, accum) every scan
    (reference src/LidarOdometry.cpp:484-490), so composing each advert
    onto its keyframe's graph pose yields the full-rate trajectory.
    """
    out = []
    for loc in backend.localizations:
        if loc.reference_kf not in kf_poses:
            continue
        Rk, tk = kf_poses[loc.reference_kf]
        Ra = np.asarray(loc.pose.R, np.float64)
        ta = np.asarray(loc.pose.t, np.float64)
        out.append((loc.timestamp, (Rk @ Ra, Rk @ ta + tk)))
    out.sort(key=lambda x: x[0])
    return out


def run_replay(observations, cfg: Optional[dict] = None,
               gt_poses=None, realtime: bool = False, pgo: bool = False,
               pgo_robust: str = "none", warm_start: bool = False):
    """Replay ``observations`` through the front-end.

    ``pgo=True`` additionally runs the device-resident pose-graph
    optimizer over the recorded factor stream (frontend/backend.py
    ``OptimizingBackend`` — the mola-slam-gtsam analogue) and reports
    ``*_pgo`` metric rows computed from the globally optimized keyframe
    poses instead of the Dijkstra spanning-tree estimate.

    ``warm_start=True`` compiles the primary per-scan programs on the
    first observation BEFORE the replay clock starts (the online
    deployment pattern: warm at startup from the first sensor packet);
    the time spent is reported separately as ``warm_s``.
    """
    backend = OptimizingBackend()
    module = build_module(cfg, backend=backend)
    warm_s = None
    if warm_start and hasattr(observations, "__len__") and observations:
        warm_s = module.warm_start(observations[0])
    # steady-state online rate: drain the pipeline once after the first few
    # scans (where the jit compiles land) and time the remainder separately.
    # scans_per_sec (wall incl. compiles) answers "how long did the replay
    # take"; scans_per_sec_steady answers the reference's admission-rate
    # question (online sensor-rate operation, params/kitti-default.yaml:5)
    n_total = len(observations) if hasattr(observations, "__len__") else 0
    warmup = min(25, n_total // 5)
    t0 = time.perf_counter()
    t_steady, n_fed = None, 0
    for obs in observations:
        if not realtime:
            # replay is lossless: throttle the feed instead of tripping the
            # live-mode overload drop (reference :171-179 drops on >10 queued)
            while True:
                with module._pending_lock:
                    if module._pending <= module.params.max_queue_length // 2:
                        break
                time.sleep(0.002)
        if n_fed == warmup and warmup > 0:
            while True:  # barrier: let the warmup scans finish entirely
                with module._pending_lock:
                    if module._pending == 0:
                        break
                time.sleep(0.002)
            t_steady = time.perf_counter()
        module.on_new_observation(obs)
        n_fed += 1
        if realtime:
            time.sleep(0.01)
    jobs_abandoned = module.drain()
    t_end = time.perf_counter()
    wall = t_end - t0
    steady = ((n_total - warmup) / max(t_end - t_steady, 1e-9)
              if t_steady is not None and n_total > warmup else None)
    # time-to-steady: replay start -> the warmup barrier clearing (first
    # `warmup` scans fully processed, all primary compiles landed); with
    # warm_start the cold-start story is warm_s + wall_to_steady_s
    wall_to_steady = (t_steady - t0) if t_steady is not None else None

    kf_poses = estimated_trajectory(module)
    kf_pgo = (backend.optimized_poses(robust=pgo_robust)
              if pgo and backend.factors else None)
    result = {
        "n_scans": len(observations) if hasattr(observations, "__len__") else None,
        "n_keyframes": len(backend.keyframes),
        "n_factors": len(backend.factors),
        "wall_s": wall,
        # nonzero = the drain timed out with jobs in flight; their factors
        # were LOST. Harnesses assert this is 0 (VERDICT r2 #8).
        "jobs_abandoned": jobs_abandoned,
        # post-warmup throughput (first-compile cost excluded); None when
        # the replay is too short to split
        "scans_per_sec_steady": steady,
        "wall_to_steady_s": wall_to_steady,
        "warm_s": warm_s,
        "kf_poses": kf_poses,
        "backend": backend,
        "module": module,
    }
    if kf_pgo:
        result["kf_poses_pgo"] = kf_pgo
    if gt_poses is not None and backend.keyframes and kf_poses:
        # associate KFs with gt by timestamp index order
        kf_ids = sorted(kf_poses)
        ts_kf = [backend.keyframes[k].timestamp for k in kf_ids]
        # gt index = scan index (timestamps are scan-indexed by the datasets)
        dt = observations[1]["timestamp"] - observations[0]["timestamp"] if len(observations) > 1 else 1.0
        gt_sel, est_sel = [], []
        for k, t in zip(kf_ids, ts_kf):
            idx = int(round((t - observations[0]["timestamp"]) / dt))
            if 0 <= idx < len(gt_poses):
                gt_sel.append(gt_poses[idx])
                est_sel.append(kf_poses[k])
        if len(gt_sel) >= 3:
            result["ate_rmse"] = ate_rmse(est_sel, gt_sel)
            rpe_t, rpe_r = rpe_rmse(est_sel, gt_sel)
            result["rpe_trans"] = rpe_t
            result["rpe_rot"] = rpe_r
        # full-rate (per-scan) trajectory — the KITTI-convention evaluation
        scan_traj = per_scan_trajectory(backend, kf_poses)
        gt_sel, est_sel = [], []
        t0 = observations[0]["timestamp"]
        for ts, pose in scan_traj:
            idx = int(round((ts - t0) / dt))
            if 0 <= idx < len(gt_poses):
                gt_sel.append(gt_poses[idx])
                est_sel.append(pose)
        if len(gt_sel) >= 3:
            result["n_scan_poses"] = len(est_sel)
            result["ate_rmse_scan"] = ate_rmse(est_sel, gt_sel)
            rpe_t, rpe_r = rpe_rmse(est_sel, gt_sel)
            result["rpe_trans_scan"] = rpe_t
            result["rpe_rot_scan"] = rpe_r
            # the official KITTI drift metric (segment-averaged), the
            # number published KITTI leaderboard entries mean by "drift"
            t_rel, r_rel, nseg = kitti_segment_errors(est_sel, gt_sel)
            if nseg:
                result["kitti_t_rel_pct"] = t_rel
                result["kitti_r_rel_deg_per_m"] = r_rel
                result["kitti_segments"] = nseg
        result["scan_poses"] = scan_traj

        if kf_pgo:
            # the same two evaluations over the globally optimized poses
            gt_sel, est_sel = [], []
            for k, t in zip(kf_ids, ts_kf):
                idx = int(round((t - observations[0]["timestamp"]) / dt))
                if 0 <= idx < len(gt_poses) and k in kf_pgo:
                    gt_sel.append(gt_poses[idx])
                    est_sel.append(kf_pgo[k])
            if len(gt_sel) >= 3:
                result["ate_rmse_pgo"] = ate_rmse(est_sel, gt_sel)
            scan_traj_pgo = per_scan_trajectory(backend, kf_pgo)
            gt_sel, est_sel = [], []
            for ts, pose in scan_traj_pgo:
                idx = int(round((ts - t0) / dt))
                if 0 <= idx < len(gt_poses):
                    gt_sel.append(gt_poses[idx])
                    est_sel.append(pose)
            if len(gt_sel) >= 3:
                result["ate_rmse_scan_pgo"] = ate_rmse(est_sel, gt_sel)
                t_rel, _, nseg = kitti_segment_errors(est_sel, gt_sel)
                if nseg:
                    result["kitti_t_rel_pct_pgo"] = t_rel
    return result


def save_trajectory_tum(path: str, kf_poses, backend) -> None:
    """TUM format: timestamp tx ty tz qx qy qz qw."""
    def rot_to_quat(R):
        # Shepperd's method (largest diagonal pivot): stable at ~180 deg,
        # where the naive trace form degenerates to the zero quaternion
        # (any out-and-back trajectory has such keyframes; review finding)
        t = R[0, 0] + R[1, 1] + R[2, 2]
        if t > max(R[0, 0], R[1, 1], R[2, 2]):
            s = 2.0 * np.sqrt(1.0 + t)
            w = 0.25 * s
            x = (R[2, 1] - R[1, 2]) / s
            y = (R[0, 2] - R[2, 0]) / s
            z = (R[1, 0] - R[0, 1]) / s
        elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
            s = 2.0 * np.sqrt(max(0.0, 1.0 + R[0, 0] - R[1, 1] - R[2, 2]))
            w = (R[2, 1] - R[1, 2]) / s
            x = 0.25 * s
            y = (R[0, 1] + R[1, 0]) / s
            z = (R[0, 2] + R[2, 0]) / s
        elif R[1, 1] >= R[2, 2]:
            s = 2.0 * np.sqrt(max(0.0, 1.0 + R[1, 1] - R[0, 0] - R[2, 2]))
            w = (R[0, 2] - R[2, 0]) / s
            x = (R[0, 1] + R[1, 0]) / s
            y = 0.25 * s
            z = (R[1, 2] + R[2, 1]) / s
        else:
            s = 2.0 * np.sqrt(max(0.0, 1.0 + R[2, 2] - R[0, 0] - R[1, 1]))
            w = (R[1, 0] - R[0, 1]) / s
            x = (R[0, 2] + R[2, 0]) / s
            y = (R[1, 2] + R[2, 1]) / s
            z = 0.25 * s
        return x, y, z, w

    with open(path, "w") as f:
        for k in sorted(kf_poses):
            R, t = kf_poses[k]
            ts = backend.keyframes[k].timestamp if k in backend.keyframes else float(k)
            qx, qy, qz, qw = rot_to_quat(R)
            f.write(f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="mola_fe_lidar_tpu dataset replay")
    ap.add_argument("--config", type=str, default=None, help="module YAML")
    ap.add_argument("--dataset", choices=["synthetic", "kitti"], default="synthetic")
    ap.add_argument("--sequence", type=str, default="00")
    ap.add_argument("--kitti-root", type=str, default=None)
    ap.add_argument("--scans", type=int, default=40)
    ap.add_argument("--kind", type=str, default="circle", help="synthetic trajectory kind")
    ap.add_argument("--loop-side", type=float, default=0.0,
                    help="loop/circle size; 0 = auto-size so step ~= speed/rate")
    ap.add_argument("--out", type=str, default=None, help="TUM trajectory output")
    ap.add_argument("--profile", action="store_true",
                    help="print the hierarchical profiler report after replay")
    ap.add_argument("--viz-out", type=str, default=None,
                    help="export trajectory + keyframe clouds as PLY to this dir")
    ap.add_argument("--pgo", action="store_true",
                    help="globally optimize the keyframe pose graph "
                         "(device LM over the factor stream) and report "
                         "*_pgo metrics")
    ap.add_argument("--pgo-robust", choices=["none", "huber", "cauchy"],
                    default="none",
                    help="IRLS M-estimator on non-odometry edges during "
                         "--pgo (the gtsam robust-noise-model analogue; "
                         "cauchy effectively disables false loop closures)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU mesh (smokes; "
                         "same dance as tests/conftest.py)")
    ap.add_argument("--mesh", type=str, default=None,
                    help="production device mesh, e.g. 'data=4' or "
                         "'data=2,model=2' (VERDICT r3 #5): DP-shards the "
                         "nearby-KF / loop-closure batches over 'data' and "
                         "TP-shards the map-align target point axis over "
                         "'model'. Falls back to single-device (with a "
                         "warning) when the process exposes fewer devices.")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    cfg = load_yaml(args.config) if args.config else DEFAULT_CFG
    if args.mesh:
        import copy
        cfg = copy.deepcopy(cfg)
        params = cfg.setdefault("params", {})
        for part in args.mesh.split(","):
            axis, _, n = part.partition("=")
            if axis.strip() not in ("data", "model") or not n.strip().isdigit():
                ap.error(f"bad --mesh component {part!r} "
                         "(want data=N[,model=M])")
            params[f"mesh_{axis.strip()}"] = int(n)

    if args.dataset == "synthetic":
        from .synthetic import synthetic_sequence
        import math as _math
        side = args.loop_side or args.scans * 1.0 / _math.pi  # step ~1 m
        observations, gt = synthetic_sequence(
            kind=args.kind, n_scans=args.scans, loop_side=side)
    else:
        from .kitti import KittiOdometrySequence
        seq = KittiOdometrySequence(args.sequence, root=args.kitti_root,
                                    max_scans=args.scans or None)
        observations = list(seq)
        gt = seq.gt_poses_velo

    res = run_replay(observations, cfg, gt_poses=gt, pgo=args.pgo,
                 pgo_robust=args.pgo_robust)
    summary = {k: v for k, v in res.items()
               if k in ("n_scans", "n_keyframes", "n_factors", "wall_s",
                        "ate_rmse", "rpe_trans", "rpe_rot",
                        "ate_rmse_pgo", "ate_rmse_scan_pgo")}
    summary["scans_per_sec"] = (res["n_scans"] or 0) / max(res["wall_s"], 1e-9)
    print(json.dumps(summary, indent=2, default=float))
    if args.out:
        # with --pgo the exported trajectory is the globally optimized one
        poses = res.get("kf_poses_pgo") or res["kf_poses"]
        save_trajectory_tum(args.out, poses, res["backend"])
        print(f"trajectory written to {args.out}")
    if args.viz_out:
        from .viz import export_run
        export_run(args.viz_out, res["module"])
        print(f"PLY exports written to {args.viz_out}")
    if args.profile:
        print(res["module"].profiler.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
