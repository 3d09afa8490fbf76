"""Per-program device-time profile of the production scan step.

The replay profiler's spans conflate device time with chip-queue wait
(every program shares the one chip), so optimization targets need a
clean table: each production program timed ALONE, warm, with a readback
per call (CLAUDE.md: `block_until_ready` does not reliably await queued
dispatches through the axon tunnel).

Programs timed (realtime operating point unless --config says otherwise):
  ingest_host    apply_generators host time (numpy, no device)
  filter         dispatch #1 of the pipelined scan step (131k-ray ingest
                 filter: deskew + voxel + edges/planes/decimate + sanity)
  align_map      dispatch #2: scan-to-map align at the operating point
  map_build      DeviceLocalMap aggregate rebuild (per keyframe)
  nearby_batch   the vmapped 5-candidate nearby-KF align batch (per KF)

Run:  python scripts/profile_step.py [--scans 60] [--reps 10] [--cpu]
      (wants the cached sim from a prior run_accuracy --sim-cache run)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np


def timed(fn, reps, readback):
    """Median wall of fn() with a per-call readback barrier."""
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        np.asarray(readback(r))
        out.append(time.perf_counter() - t0)
    return {"median_ms": round(1e3 * sorted(out)[len(out) // 2], 2),
            "min_ms": round(1e3 * min(out), 2), "reps": reps}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=60)
    ap.add_argument("--azimuth", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--config", default="realtime")
    ap.add_argument("--override", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="extra module param overrides on top of --config "
                         "(same syntax as run_accuracy)")
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

    from mola_fe_lidar_tpu.frontend.odometry import AlignKind
    from mola_fe_lidar_tpu.frontend.worldmodel import ANNOTATION_NAME_PC_LAYERS
    from mola_fe_lidar_tpu.filters.generators import apply_generators
    from mola_fe_lidar_tpu.obs.hdl64 import hdl64_sequence
    from mola_fe_lidar_tpu.obs.runner import build_module
    from mola_fe_lidar_tpu.frontend.backend import InMemoryBackend

    cache = Path(f"/tmp/hdl64_500_{args.azimuth}_0_block_8.pkl")
    if cache.exists():
        import pickle
        obs, gt = pickle.load(open(cache, "rb"))
        obs = obs[: args.scans]
    else:
        obs, gt = hdl64_sequence(n_scans=args.scans, n_azimuth=args.azimuth)

    over = REALTIME if args.config == "realtime" else ()
    cfg = build_cfg(deskew=True, scale=args.azimuth / 2048,
                    local_map=args.config != "s2s",
                    overrides=tuple(over) + tuple(args.override))
    module = build_module(cfg, backend=InMemoryBackend())

    # warm replay: compiles land, the rolling map + twist state build up
    t0 = time.perf_counter()
    for o in obs:
        module.on_new_observation(o)
    module.drain()
    warm_s = time.perf_counter() - t0
    st = module.state

    table = {"device": jax.default_backend(), "config": args.config,
             "warm_replay_scans": len(obs),
             "warm_scans_per_sec": round(len(obs) / warm_s, 2)}

    nxt = obs[-1]
    table["ingest_host"] = timed(
        lambda: apply_generators(module.generators, nxt), args.reps,
        lambda r: 0)
    raw = apply_generators(module.generators, nxt)
    tw = jnp.asarray(st.twist_smooth, jnp.float32)

    fs = module._get_filter_step()
    table["filter"] = timed(lambda: fs(raw, tw), args.reps,
                            lambda r: r[1])  # sanity vector readback

    mm_f, sanity = fs(raw, tw)
    guess_R = jnp.asarray(st.world_R, jnp.float32)
    guess_t = jnp.asarray(st.world_t, jnp.float32)
    dt = jnp.float32(0.1)
    if st.local_map is not None:
        al = module._get_align_step(AlignKind.LIDAR_ODOMETRY, True)
        targs = (st.local_map, guess_R, guess_t, tw,
                 guess_R, guess_t, dt)
        table["align_map"] = timed(lambda: al(mm_f, *targs, sanity),
                                   args.reps, lambda r: r[1])

        builder = module._local_map_builder
        if builder is not None:
            table["map_build"] = timed(
                lambda: builder.build(), args.reps,
                lambda r: next(iter(r.values())).mask.sum())

    # nearby batch: replicate _check_nearby_batch's program on the last KF
    wm = module.worldmodel
    kfs = sorted(getattr(module.slam_backend, "keyframes", {})) or None
    if kfs and len(kfs) >= 2 and wm is not None:
        from mola_fe_lidar_tpu.frontend.odometry import (
            _get_packed_batch_align)
        cur = wm.annotation(kfs[-1], ANNOTATION_NAME_PC_LAYERS)
        oth = wm.annotation(kfs[-2], ANNOTATION_NAME_PC_LAYERS)
        if cur is not None and oth is not None:
            k = max(1, module.params.max_nearby_align_checks)
            to_pcs = jax.tree.map(lambda *x: jnp.stack(x), *([oth] * k))
            gRs = jnp.stack([jnp.eye(3, dtype=jnp.float32)] * k)
            gts = jnp.stack([jnp.ones(3, jnp.float32) * 3.0] * k)
            stages = module._nearby_stages()
            ba = _get_packed_batch_align(stages)
            table["nearby_batch"] = dict(timed(
                lambda: ba(to_pcs, cur, gRs, gts), args.reps, lambda r: r),
                batch=k,
                max_iterations=max(s.max_iterations for s in stages))

    module.shutdown()
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
