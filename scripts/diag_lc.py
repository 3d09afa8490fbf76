"""Diagnose loop-closure align quality offline.

Picks true revisit pairs (metric window, large scan separation) from a
cached HDL-64 sim by GROUND TRUTH, runs the production filter on both
scans, and aligns them with the LOOP_CLOSURE ICP case three ways:

  gt       init = exact ground-truth relative pose (upper bound: what the
           stage machinery can score when handed the answer)
  gt+mc    Monte-Carlo batch around the gt init (the production search,
           centered on truth)
  drift+mc Monte-Carlo batch around a drifted init (~production: graph
           estimate carries accumulated odometry drift)

Separates "the MC search cannot find the basin" from "the quality metric
cannot score a correct LC alignment" — the two causes of an LC acceptance
drought (docs/accuracy.json outback:realtime n_lc_accepted=0).

Run: python scripts/diag_lc.py [--cache /tmp/hdl64_260_2048_0_outback_16.pkl]
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/hdl64_260_2048_0_outback_16.pkl")
    ap.add_argument("--azimuth", type=int, default=2048,
                    help="with --fresh-sim: sim resolution (512 for CPU "
                         "smokes; capacities scale along, as in run_accuracy)")
    ap.add_argument("--fresh-sim", action="store_true",
                    help="ignore --cache; simulate a --route sequence at "
                         "--azimuth (CPU-sized diagnosis of the same geometry)")
    ap.add_argument("--route", default="outback")
    ap.add_argument("--speed", type=float, default=16.0)
    ap.add_argument("--parked-cars", type=int, default=0)
    ap.add_argument("--scans", type=int, default=260)
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--min-sep-scans", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache" if not args.cpu else "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from run_accuracy import REALTIME, build_cfg
    from mola_fe_lidar_tpu.filters.generators import apply_generators
    from mola_fe_lidar_tpu.frontend.odometry import (
        AlignKind, _get_packed_batch_align, _unpack_icp_result)
    from mola_fe_lidar_tpu.frontend.backend import InMemoryBackend
    from mola_fe_lidar_tpu.obs.runner import build_module
    from mola_fe_lidar_tpu.parallel.batch import monte_carlo_guesses
    from mola_fe_lidar_tpu.geometry import se3_np
    from mola_fe_lidar_tpu.geometry.se3 import Pose

    if args.fresh_sim:
        from mola_fe_lidar_tpu.obs.hdl64 import hdl64_sequence
        obs, gt = hdl64_sequence(n_scans=args.scans, n_azimuth=args.azimuth,
                                 route_kind=args.route, speed=args.speed,
                                 parked_cars=args.parked_cars)
        scale = args.azimuth / 2048
    else:
        obs, gt = pickle.load(open(args.cache, "rb"))
        scale = 1.0
    t = np.stack([p for _, p in gt])
    R = np.stack([Rm for Rm, _ in gt])

    # true revisit pairs: in the LC metric window, far apart in time
    pairs = []
    for i in range(0, len(obs), 10):
        d = np.linalg.norm(t - t[i], axis=1)
        js = np.nonzero((d > 5.0) & (d < 15.0)
                        & (np.abs(np.arange(len(obs)) - i)
                           > args.min_sep_scans))[0]
        if len(js):
            pairs.append((i, int(js[len(js) // 2])))
        if len(pairs) >= args.pairs:
            break
    if not pairs:
        raise SystemExit("no revisit pairs in this cache")

    cfg = build_cfg(deskew=True, scale=scale, local_map=True,
                    overrides=REALTIME)
    module = build_module(cfg, backend=InMemoryBackend())
    fs = module._get_filter_step()
    lc_stages = module.icp_cases[AlignKind.LOOP_CLOSURE]
    ba = _get_packed_batch_align(lc_stages)

    def true_twist(k):
        """Sensor-frame twist from gt — the diag must deskew like
        production does (KF clouds are stored deskewed): at 16 m/s an
        undeskewed sweep smears 1.6 m along travel, and the two outback
        passes smear in OPPOSITE directions — a ±1.6 m artifact basin."""
        k2 = min(k + 1, len(gt) - 1)
        Ri_, ti_ = se3_np.inverse((R[k], t[k]))
        rel = se3_np.compose((Ri_, ti_), (R[k2], t[k2]))
        return jnp.asarray(se3_np.log(*rel) / 0.1, jnp.float32)

    for i, j in pairs:
        mm_i, _ = fs(apply_generators(module.generators, obs[i]), true_twist(i))
        mm_j, _ = fs(apply_generators(module.generators, obs[j]), true_twist(j))
        # pose of scan j (other/to) in frame of scan i (current/from):
        # T_i^w⁻¹ ∘ T_j^w
        Ri_inv, ti_inv = se3_np.inverse((R[i], t[i]))
        Rrel, trel = se3_np.compose((Ri_inv, ti_inv), (R[j], t[j]))

        def run(gR, gt_, n):
            to_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n, *x.shape)), mm_j)
            flats = np.asarray(ba(to_b, mm_i,
                                  jnp.asarray(gR, jnp.float32).reshape(n, 3, 3),
                                  jnp.asarray(gt_, jnp.float32).reshape(n, 3)))
            best = int(np.argmax(flats[:, 48]))
            out = _unpack_icp_result(flats[best])
            Rf, tf = np.asarray(out.found_pose_to_wrt_from.R), np.asarray(
                out.found_pose_to_wrt_from.t)
            terr = float(np.linalg.norm(tf - trel))
            rerr = float(np.degrees(np.arccos(np.clip(
                (np.trace(Rrel.T @ Rf) - 1) / 2, -1, 1))))
            return {"goodness": round(float(out.goodness), 3),
                    "trans_err_m": round(terr, 3),
                    "rot_err_deg": round(rerr, 2)}

        row = {"pair": [i, j],
               "metric_dist_m": round(float(np.linalg.norm(t[j] - t[i])), 1)}
        # quality ceiling at the TRUE pose (no ICP): paired ratio of the
        # quality layer at threshold 0.30 with to-cloud mapped by gt — if
        # THIS is < the 0.70 gate, no optimizer can ever pass it here
        from mola_fe_lidar_tpu.ops.matching import nearest_neighbors
        from mola_fe_lidar_tpu.solve.quality import paired_ratio
        dec_i, dec_j = mm_i["decimated"], mm_j["decimated"]
        moved = dec_j.xyz @ jnp.asarray(Rrel, jnp.float32).T + jnp.asarray(
            trel, jnp.float32)
        nn = nearest_neighbors(dec_i.xyz, dec_i.mask, moved, dec_j.mask)
        row["gt_quality_ceiling"] = round(float(paired_ratio(
            nn.dist, dec_i.mask, 0.30)), 3)
        row["gt"] = run(Rrel[None], trel[None], 1)
        key = jax.random.key(1000 + i)
        n_mc = module.params.loop_closure_montecarlo_samples
        sig = 0.1 * module.params.max_dist_to_loop_closure
        g = monte_carlo_guesses(
            key, Pose(R=jnp.asarray(Rrel, jnp.float32),
                      t=jnp.asarray(trel, jnp.float32)),
            n_mc, sig, np.radians(2.0))
        row["gt+mc"] = run(np.asarray(g.R), np.asarray(g.t), n_mc)
        # drifted init: 1.5 m lateral + 1 deg yaw off truth
        cy, sy = np.cos(np.radians(1.0)), np.sin(np.radians(1.0))
        Rd = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]]) @ Rrel
        td = trel + np.array([0.9, 1.2, 0.0])
        gd = monte_carlo_guesses(
            jax.random.key(2000 + i),
            Pose(R=jnp.asarray(Rd, jnp.float32),
                 t=jnp.asarray(td, jnp.float32)),
            n_mc, sig, np.radians(2.0))
        row["drift+mc"] = run(np.asarray(gd.R), np.asarray(gd.t), n_mc)
        # wrong-basin margin: run the SAME LC align from street-lattice
        # shifted inits and report the best goodness any far-from-truth
        # convergence achieves. The acceptance gate must sit between this
        # and the true-pose goodness — that separation is what calibrates
        # min_icp_goodness_lc for a given scene pairing density (the
        # reference's 0.70 is the same knob calibrated for real KITTI
        # density, reference params/kitti-default.yaml:14).
        shifts = np.array([[8, 0, 0], [-8, 0, 0], [0, 8, 0], [0, -8, 0],
                           [4, 0, 0], [0, 4, 0], [12, 0, 0], [0, 12, 0]],
                          float)
        n_w = len(shifts)
        to_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_w, *x.shape)), mm_j)
        flats = np.asarray(ba(
            to_b, mm_i,
            jnp.broadcast_to(jnp.asarray(Rrel, jnp.float32), (n_w, 3, 3)),
            jnp.asarray(trel[None] + shifts, jnp.float32)))
        def layer_ratios(Rm, tm):
            """Per-layer paired ratios at a given pose of j in i's frame —
            the discriminative-layer study: ground-dominated 'decimated'
            pairs under any street-lattice shift, sparse vertical 'edges'
            (poles, car/building corners) only pair at the true pose."""
            out = {}
            for layer, thrs in (("decimated", (0.30,)),
                                ("edges", (0.50, 0.80, 1.20))):
                li, lj = mm_i[layer], mm_j[layer]
                mv = lj.xyz @ jnp.asarray(Rm, jnp.float32).T + jnp.asarray(
                    tm, jnp.float32)
                nnr = nearest_neighbors(li.xyz, li.mask, mv, lj.mask)
                for thr in thrs:
                    key = layer if len(thrs) == 1 else f"{layer}@{thr:g}"
                    out[key] = round(float(paired_ratio(
                        nnr.dist, li.mask, thr)), 3)
            return out

        wrong_best, n_far, wrong_pose = 0.0, 0, None
        for f in flats:
            out = _unpack_icp_result(f)
            tf = np.asarray(out.found_pose_to_wrt_from.t)
            if np.linalg.norm(tf - trel) > 1.5:
                n_far += 1
                if float(out.goodness) > wrong_best:
                    wrong_best = float(out.goodness)
                    wrong_pose = (np.asarray(out.found_pose_to_wrt_from.R),
                                  tf)
        row["wrong_basin"] = {"best_goodness": round(wrong_best, 3),
                              "n_stayed_far": n_far, "n_inits": n_w}
        row["layers_true"] = layer_ratios(Rrel, trel)
        if wrong_pose is not None:
            row["layers_wrong"] = layer_ratios(*wrong_pose)
        print(json.dumps(row))
    module.shutdown()


if __name__ == "__main__":
    main()
