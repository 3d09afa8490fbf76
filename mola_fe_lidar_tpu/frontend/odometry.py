"""LidarOdometry — the front-end module (the rebuild of the reference's
single class, reference src/LidarOdometry.cpp / LidarOdometry.h).

Host orchestration only: every FLOP lives in the device engine
(``models.align``). Architecture inversion vs the reference (SURVEY.md §7):

* the reference fans scan-pair ICP jobs out to threads; here nearby-keyframe
  checks are ONE batched device dispatch and the loop-closure Monte-Carlo
  perturbations are a vmapped axis (reference src/LidarOdometry.cpp:708-741,
  :767-787);
* state is owned by the single pipeline worker (the reference's unprotected
  ``state_`` races — SURVEY.md §2c — don't exist here by construction);
* the reference's edge-dedup bug (``edge_already_exists = false`` at
  :620-627) is fixed: an existing factor/edge suppresses re-checking.

Pipeline parity map (reference line refs in comments):

  on_new_observation  → sensor gate :169, back-pressure drop :171-179,
                        1-worker FIFO enqueue :184
  _process            → time gate :202-212, generators :215-217,
                        filters :220-224, twist prior :264-275, ICP :299,
                        twist update :305-311, KF decision :321-337,
                        KF + factor emission :342-475, localization
                        advertise :484-490, nearby-KF trigger :496-508
  check_for_nearby_kfs→ Dijkstra + windowing + dedup + classify :516-744
  _check_non_adjacent → nearby-align / MC loop closure + acceptance gate
                        :746-849
"""

from __future__ import annotations

import dataclasses
import functools
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud.metric_map import MetricMap
from ..filters.base import FilterPipeline
from ..filters.generators import apply_generators, generators_from_config
from ..geometry import se3
from ..geometry import se3_np
from ..models.config import AlignKind, ICPParams
from ..models.icp import ICPResult, align
from ..parallel.batch import monte_carlo_guesses
from ..utils.config import DEG2RAD, yaml_get
from ..utils.profiler import ProfilerEntry as ProfilerEntryCtx
from .backend import (
    AdvertiseLocalization, FactorRelativePose3, ProposeKFInput,
)
from .icp_config import icp_params_from_config, icp_stages_from_config
from .module_base import FrontEndBase, MODULE_REGISTRY, RawObservation
from .pose_graph import PoseGraph, make_pose_graph
from .worldmodel import (
    ANNOTATION_NAME_PC_LAYERS, ANNOTATION_NAME_RENDER_DECORATION, WorldModel,
)


# Errors that mean "this configuration cannot run as one fused jit program"
# (trace/compile failures) — anything else is a real bug and must propagate.
_FUSED_FALLBACK_ERRORS = (
    jax.errors.JAXTypeError,       # Tracer*/Concretization errors
    jax.errors.JAXIndexError,
    jax.errors.JaxRuntimeError,    # XLA compile/runtime failures
)

# Global jit-product caches keyed by *configuration*, not module instance —
# a fresh LidarOdometry with the same filters/params reuses compiled programs.
_FUSED_STEP_CACHE: Dict[tuple, Any] = {}
_PACKED_ALIGN_CACHE: Dict[ICPParams, Any] = {}


def _filters_cache_key(filters) -> tuple:
    key = []
    for f in filters:
        items = tuple(sorted(
            (k, v) for k, v in vars(f).items()
            if isinstance(v, (int, float, str, bool, tuple))))
        key.append((type(f).__name__, items))
    return tuple(key)


def _pack_icp_result(res: ICPResult) -> jax.Array:
    """Flatten an ICPResult into one f32 vector so the host needs a single
    readback per scan (each fetch pays a full round trip on remote TPUs)."""
    return jnp.concatenate([
        res.pose.R.reshape(9), res.pose.t.reshape(3), res.cov.reshape(36),
        jnp.stack([res.quality,
                   res.n_iterations.astype(jnp.float32),
                   res.term_reason.astype(jnp.float32)]),
    ])


def _unpack_icp_result(flat: np.ndarray) -> "ICPOutput":
    R = np.asarray(flat[:9], np.float64).reshape(3, 3)
    t = np.asarray(flat[9:12], np.float64)
    cov = np.asarray(flat[12:48], np.float64).reshape(6, 6)
    quality = float(flat[48])
    return ICPOutput(
        success=bool(np.isfinite(quality)),
        goodness=quality if np.isfinite(quality) else 0.0,
        found_pose_to_wrt_from=se3.Pose(R.astype(np.float32), t.astype(np.float32)),
        cov=cov, n_iterations=int(flat[49]))


_PACKED_BATCH_ALIGN_CACHE: Dict[ICPParams, Any] = {}


def _get_packed_batch_align(stages: tuple):
    """vmapped packed align with a shared 'from' cloud: one dispatch + one
    readback covers every nearby-keyframe candidate of a scan (the reference
    fans these out to threads; reference src/LidarOdometry.cpp:708-722)."""
    if stages not in _PACKED_BATCH_ALIGN_CACHE:
        from ..models.icp import align_pipeline as _align_pipeline

        @jax.jit
        def f(to_pcs, from_pc, guess_Rs, guess_ts):
            def one(to_pc, gR, gt_):
                res = _align_pipeline(to_pc, from_pc, se3.Pose(gR, gt_), stages)
                return _pack_icp_result(res)
            return jax.vmap(one)(to_pcs, guess_Rs, guess_ts)

        _PACKED_BATCH_ALIGN_CACHE[stages] = f
    return _PACKED_BATCH_ALIGN_CACHE[stages]


def _get_packed_align(stages: tuple):
    if stages not in _PACKED_ALIGN_CACHE:
        from ..models.icp import align_pipeline as _align_pipeline

        @jax.jit
        def f(to_pc, from_pc, guess_R, guess_t):
            res = _align_pipeline(to_pc, from_pc, se3.Pose(guess_R, guess_t),
                                  stages)
            return _pack_icp_result(res)

        _PACKED_ALIGN_CACHE[stages] = f
    return _PACKED_ALIGN_CACHE[stages]


# -- host-side pose helpers (numpy; graph bookkeeping stays off-device) ----

@functools.lru_cache(maxsize=None)
def _decim_sel(n: int, keep: int) -> np.ndarray:
    """Fixed hash-decorrelated subsample indices (sorted for gather
    locality). A permutation SLICE, never ``[:keep]`` of the input order
    — layer buffers are voxel/azimuth-sorted and an order slab is a
    spatial slab (CLAUDE.md invariant)."""
    return np.sort(np.random.default_rng(0xD15CA7E).permutation(n)[:keep])


def _decimate_layers(mm: MetricMap, k: int) -> MetricMap:
    """1/k hash-stratified subsample of every layer (unbatched clouds).

    Capacities stay 256-bucketed; layers at/below 256 are kept whole.
    Masked slots sampled in contribute weight 0 downstream — the mask
    rides along, so the subsample is unbiased for paired-ratio stats."""
    if k <= 1:
        return mm
    out = {}
    for name, pc in mm.items():
        n = pc.capacity
        keep = max(256, (n // k) // 256 * 256)
        if keep >= n:
            out[name] = pc
            continue
        sel = jnp.asarray(_decim_sel(n, keep))
        out[name] = pc._replace(
            xyz=jnp.take(pc.xyz, sel, axis=-2),
            mask=jnp.take(pc.mask, sel, axis=-1),
            attrs={a: (jnp.take(v, sel, axis=-1) if v.ndim == pc.mask.ndim
                       else jnp.take(v, sel, axis=-2))
                   for a, v in pc.attrs.items()})
    return out


def _np_pose(p: se3.Pose) -> Tuple[np.ndarray, np.ndarray]:
    # Project the device f32 rotation (~1e-5 orthonormality error from up
    # to 100 f32 retraction composes inside the ICP loop) back onto SO(3):
    # these poses chain into world/accum state and graph edges (composed
    # again by Dijkstra), where the error compounds to det(R) ~ 1e-3 per
    # 500 scans — enough to shear the rolling map and inflate rotation RPE.
    return (se3_np.orthonormalize(np.asarray(p.R, np.float64)),
            np.asarray(p.t, np.float64))


def _jx_pose(R: np.ndarray, t: np.ndarray) -> se3.Pose:
    return se3.Pose(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))


@dataclass
class LidarOdometryParameters:
    """All tunables — defaults match reference LidarOdometry.h:52-107."""

    min_time_between_scans: float = 0.2
    min_dist_xyz_between_keyframes: float = 1.0
    min_rotation_between_keyframes: float = 30.0 * DEG2RAD
    min_icp_goodness: float = 0.4
    min_icp_goodness_lc: float = 0.6
    # Auto-calibrate the loop-closure goodness gate from OBSERVED data
    # (YAML: `min_icp_goodness_lc: auto`). The absolute paired-ratio a
    # correct alignment reaches depends on scene pairing density (sensor,
    # environment, filter caps): the reference's fixed 0.70 is calibrated
    # for real-KITTI density and accepts zero true closures at the HDL-64
    # simulator's density (true-LC band 0.57-0.61 on the relap route),
    # while a fixed sim value would be wrong on denser data. Nearby-KF
    # aligns run in the SAME single-pair pairing-density regime on the
    # same map, so the distribution of ACCEPTED nearby goodness is an
    # online estimate of "what a correct non-adjacent alignment scores
    # here"; the gate tracks its lower quartile (x0.9 margin, clipped to
    # [0.40, 0.75], needing >= 8 samples — below that the numeric value
    # applies). False-accept safety does NOT ride on this scalar: the
    # discriminative edges-layer requiredMin veto (icp-settings-loop-
    # closure.yaml) is the mechanism that rejects aliased basins.
    min_icp_goodness_lc_auto: bool = False
    # Scan-vs-SUBMAP loop closure (beyond reference parity; the reference
    # aligns single KF pairs only, reference src/LidarOdometry.cpp:645-669,
    # :746-849). K > 0 aligns the CURRENT keyframe against an aggregate of
    # the CANDIDATE keyframe and its <=K-topo-distance graph neighbors
    # (built with the DeviceLocalMap machinery, in the candidate's frame).
    # Reverse-direction revisits are where this matters: a single scan
    # pair caps at ~0.3 paired ratio (each viewpoint sees facade sides the
    # other doesn't), but keyframes BEYOND the candidate along its pass
    # saw the back sides the reverse-direction current scan sees — the
    # multi-view aggregate contains both, lifting the pairing ceiling.
    # 0 = reference-parity single-pair LC.
    lc_submap_keyframes: int = 0
    lc_submap_capacity_mult: int = 2
    min_dist_to_matching: float = 6.0
    max_dist_to_matching: float = 12.0
    max_dist_to_loop_closure: float = 30.0
    loop_closure_montecarlo_samples: int = 10
    max_nearby_align_checks: int = 2
    min_topo_dist_to_consider_loopclosure: int = 20
    max_KFs_local_graph: int = 50000
    viz_decor_decimation: int = 5
    viz_decor_pointsize: float = 2.0
    max_queue_length: int = 10  # drop threshold (reference :173)
    # non-LC acceptance: correction must be < this fraction of the initial
    # guess norm (reference gate at :809-816)
    max_correction_ratio: float = 0.2
    # fuse filter pipeline + odometry ICP into ONE device dispatch per scan
    # (big win when every dispatch pays host<->device latency)
    fused_scan_step: bool = True
    # Software-pipeline the scan step across the host<->device boundary:
    # the fused program splits into a FILTER dispatch and an ALIGN dispatch,
    # and while the host blocks on scan N's align readback (a full tunnel
    # round-trip, ~25-30 ms on the axon testbed) the device is already
    # running scan N+1's filter, whose generators (host->device ingest)
    # were overlapped with scan N's align. Steady-state throughput becomes
    # device-bound instead of (device + round-trip + ingest)-bound. Cost:
    # the prefetched filter deskews with a twist that is one scan staler
    # (the damped EMA twist already lags by design; measured-neutral on the
    # 500-scan replay). The align itself — guess composition, gates, KF
    # logic — still sees scan N's readback before scan N+1 dispatches, so
    # keyframe map updates are never stale. Default on wherever the fused
    # step is on; disable to restore the strict one-dispatch-per-scan form.
    pipelined_scan_step: bool = True
    # Background-compile the RARE production programs right after the
    # first scan lands (one thread, one throwaway dispatch per program):
    # the without-velocity-prior align kind, the scan-to-scan fallback
    # retry, the nearby-KF batch, and the loop-closure Monte-Carlo batch.
    # Without this each rare path JIT-compiles on FIRST USE, and through
    # the remote TPU compiler a single such compile was measured to stall
    # the ONLINE scan pipeline ~28 s mid-replay (the s2s fallback firing
    # at the first weak corner). The reference has no analogue problem —
    # C++ is compiled ahead of time; this restores that property.
    precompile_rare_paths: bool = True
    # Deskew-twist conditioning. Feeding the raw per-pair twist straight
    # back into motion compensation is a one-scan-lag feedback loop with
    # gain ~1 for the yaw component (a yaw-rate warp of a 360-degree sweep
    # is nearly absorbed as a global yaw by ICP), i.e. marginally stable:
    # measured on the HDL-64 simulator it oscillates (est yaw alternating
    # +-3..5 deg/scan on a straight) and wrecks the trajectory. The deskew
    # twist is therefore a SEPARATE, damped state: EMA over validated
    # estimates plus a physical acceleration clamp. The raw twist (and the
    # reference-parity velocity-model prior, reference :264-275, :305-311)
    # is untouched.
    deskew_twist_smoothing: float = 0.5  # EMA weight of the newest estimate
    deskew_max_accel: float = 10.0       # m/s^2 per-scan velocity-change clamp
    deskew_max_rot_accel: float = 5.0    # rad/s^2 per-scan rate-change clamp
    deskew_twist_max_age: int = 5        # scans a smoothed twist stays usable
    # In-loop (two-pass) deskew refinement inside the fused step. The damped
    # EMA twist above lags the true motion by construction — on the HDL-64
    # sim circuit the per-scan rotation error is corner-concentrated
    # (corr 0.58 with yaw rate; corner RMS 3-10x straights) and each corner
    # leaves a permanent heading kick, the dominant t_rel driver. Undamping
    # (smoothing=1.0) diverges (ATE 6.0 vs 1.8 m: marginal feedback loop,
    # see above). The fix that breaks the lag WITHOUT the feedback loop:
    # after the first align, take the twist IMPLIED by the current scan's
    # own alignment (log(rel_pose)/dt), re-warp the filtered layers in
    # place (filters.pipeline.delta_redeskew — exact, no re-filtering),
    # and re-align briefly from the pass-1 pose — all inside the one
    # jitted program, still ONE dispatch + ONE readback per scan.
    deskew_in_loop: bool = False
    deskew_refine_iters: int = 10        # pass-2 align iteration cap
    deskew_refine_min_quality: float = 0.3  # pass-1 quality gate
    # refinement rounds (unrolled in the jitted program). The implied twist
    # from a pass aligned on a mis-warped cloud is itself biased; iterating
    # converges to the joint (pose, twist) fixed point. Measured on the
    # skewed-pair unit test (8 m/s + 1 rad/s, zero prior): rot error
    # one-pass 2.9°, 1 round 1.4°, 2 rounds well under 0.6°.
    deskew_refine_rounds: int = 2
    # Odometry ICP target. "last_scan" = reference behavior (register
    # against the previous scan, reference :231-311). "local_map" =
    # scan-to-map: register against a rolling aggregate of the last
    # ``local_map_keyframes`` keyframe clouds (frontend/local_map.py) —
    # per-pair noise averages out instead of integrating into drift
    # (~5x lower ATE on the HDL-64 sim, docs/accuracy.json). Keyframe
    # decisions, factors, nearby-KF and loop-closure logic are unchanged.
    odometry_reference: str = "last_scan"
    local_map_keyframes: int = 10
    # map layer cap = scan cap x this; an int applies uniformly, a
    # {layer: mult} dict sizes layers independently (unlisted layers get
    # mult 1). The matcher target layers (planes/edges) want the full
    # aggregate density; a layer only used as the quality reference can
    # ride lower IF min_icp_goodness is recalibrated to the thinner
    # target (the paired-ratio scale tracks target density — see
    # nearby_decimate docs for the measured failure).
    local_map_capacity_mult: Any = 4
    local_map_dedup_voxel: float = 0.25  # [m] dedup pitch; keep BELOW the
    # quality thresholdDistance or the paired-ratio KF gate deflates
    local_map_reseed_after: int = 10     # consecutive weak map aligns before
    # dropping the map (next keyframe reseeds it fresh)
    # Scan-to-map convergence floor, applied as max() with the stage's
    # configured minAbsStep on map-align stages only. Defaults KEEP the
    # reference values (a no-op): the 500-scan HDL-64 ablation showed map
    # aligns descend in sub-mm steps for ~90 of 100 iterations (the wide
    # 1.5 m matcher threshold against a dense map keeps recruiting
    # better planes each re-match), and early-stopping that crawl with a
    # 1 mm floor cost +0.39 m ATE (1.12 -> 1.51). Raise only together
    # with local_map_max_match_distance, which removes the crawl itself.
    local_map_min_abs_step_trans: float = 5e-5   # [m]
    local_map_min_abs_step_rot: float = 1e-5     # [rad]
    # Rebuild the map aggregate off-thread (pipeline keeps scanning
    # against a map at most one keyframe stale). Default False: the
    # newest keyframe covers exactly the territory the next scans enter,
    # and aligning them against a map missing it cost +0.65 m ATE
    # (1.12 -> 1.77) in the ablation — while the builds it moves off the
    # pipeline thread are only ~6% of scan latency.
    local_map_async_build: bool = False
    # Cap matcher distance thresholds for map-align stages (0 = keep the
    # stage values). Scan-to-scan thresholds (1.5 m p2plane) are sized
    # for consecutive-scan displacement; against a dense aggregated map
    # with a world-pose prior the residuals are ~cm and a wide threshold
    # recruits many equally-near candidate planes, so correspondences
    # flap and the align crawls instead of converging.
    local_map_max_match_distance: float = 0.0
    # Candidate-cached matching for map-align stages (models/config.py
    # Matcher.cand_k): K > 0 swaps the per-iteration full 1-NN against the
    # 32k-point map layers for a top-K refresh every ICPParams.cand_refresh
    # iterations + O(N*K) re-argmin in between. 0 = off. Default 4: on the
    # 500-scan HDL-64 ablation it cut the fused map-align step 968 -> 605
    # ms AND improved ATE 1.12 -> 1.00 m (local candidate reassignment
    # preserves the late-iteration descent while suppressing wild
    # reassignments to distant planes inside the 1.5 m threshold).
    local_map_cand_k: int = 4
    # Extend the candidate cache to the kNN-neighborhood matchers on map
    # stages (point2line/point2plane_knn, which otherwise re-run a full kNN
    # against the map layer EVERY iteration — the per-iteration cost the
    # point-matchers already shed). cand_k = max(local_map_cand_k, knn).
    # Default off pending the accuracy ablation (realtime operating point).
    local_map_cand_knn: bool = False
    # Cap outer ICP iterations on map-align stages (0 = keep stage values).
    # Only meaningful with local_map_max_match_distance > 0: capping while
    # the wide-threshold recruiting crawl is active truncates real descent
    # (same failure as the min_abs_step floor, docs/accuracy.md ablation).
    local_map_max_iterations: int = 0
    # Override matcher nn_backend on map-align stages ("" = keep). "mxu"
    # routes full-map NN through the bf16x3 candidates + exact-f32-rescore
    # path (ops/matching.py::knn_mxu) — the MXU fast path at 8k+ targets.
    local_map_nn_backend: str = ""
    # Subsample the paired-ratio quality source on map-align stages
    # (Quality.max_points — unbiased mean estimator, ±~0.01 at 8192
    # samples): the full-layer quality 1-NN is the align's single most
    # expensive fixed op at 32k map capacities. 0 = evaluate every point.
    local_map_quality_max_points: int = 8192
    # Cap outer iterations of the nearby-keyframe batch aligns (0 = keep
    # stage values, reference maxIterations 100). Nearby aligns start from
    # graph-estimated relative guesses that are already within the final
    # basin; their vmapped while_loop otherwise runs every lane to the
    # slowest straggler's 100-iteration budget behind the scan pipeline.
    nearby_max_iterations: int = 0
    # Extend the candidate cache to the kNN-neighborhood matchers in the
    # nearby batch (same trade as local_map_cand_knn; requires
    # nearby_cand_k > 0).
    nearby_cand_knn: bool = False
    # Run nearby-KF checks on 1/k hash-stratified subsamples of the
    # SOURCE-side layers only (capacities stay 256-bucketed; the
    # subsample is a fixed permutation slice, NEVER an input-order slab —
    # CLAUDE.md invariant). The nearby edge only needs a relative pose +
    # goodness for a σ=0.10 m factor: 1/k source support raises its
    # cm-level noise by ~√k while the batch's NN row count drops ~k.
    # The TARGET side (the current KF's cloud) keeps FULL density: the
    # paired-ratio quality scale depends on target density — squeezing a
    # quality target to scan density deflated goodness 0.82 -> 0.63 and
    # misfired the weak-align gate on 133/500 scans (measured on the map
    # target; same mechanism) — so decimating the target would silently
    # shift every goodness below an uncalibrated min_icp_goodness. Loop
    # closures keep full density on both sides (the MC wide-basin search
    # wants the whole support). 1 = off.
    nearby_decimate: int = 1
    # Apply the truncating levers (max_match_distance, max_iterations) only
    # to the WITH-velocity-prior align case (AlignKind.LIDAR_ODOMETRY).
    # Cold-start / post-outage scans dispatch the without-vel case
    # (reference src/LidarOdometry.cpp:287-290) with a raw world-pose
    # guess that can sit a full scan displacement off the map — the tight
    # threshold then starves correspondences and the odometry never locks
    # on (observed: 11 consecutive failed map aligns from a cold start).
    # Those rare scans keep the wide recruiting stages; the steady state
    # (validated twist => prior within cm of truth) runs tight and fast.
    local_map_tight_requires_prior: bool = True
    # Motion-conditional candidate refresh for the (unbatched) scan-to-map
    # align (ICPParams.cand_refresh_min_*): a block-head refresh is skipped
    # unless the pose moved past these thresholds since the LAST refresh.
    # Default OFF: the 500-scan ablation (docs/accuracy.md) showed the
    # block-head refreshes are the candidate-RECRUITING step of the crawl —
    # 2 cm/1 mrad cost 80 % ATE, even 2 mm/0.1 mrad cost 47 % for <=5 %
    # fused-step savings. The knob exists because the same mechanism is a
    # clean ~20 % win for sharp-prior map queries (frontend/localizer.py).
    local_map_cand_motion_trans: float = 0.0   # [m]
    local_map_cand_motion_rot: float = 0.0     # [rad]
    # GN solver inner iterations for map-align stages (0 = keep the stage's
    # configured value, reference 20). Default OFF after a 3-run 500-scan
    # ablation (docs/accuracy.md): a forced-100-outer probe shows identical
    # pose at inner 2 with 24 % less loop time, but under real convergence
    # thresholds the smaller per-outer step either trips minAbsStep early
    # (ATE 1.0 -> 1.59 m) or — with thresholds rescaled ×inner/20 — extends
    # the crawl until the savings vanish (ATE 1.14 m at the same step
    # latency). The reference's 20-inner operating point is on the
    # accuracy-latency frontier.
    local_map_gn_inner: int = 0
    # DeviceLocalMap build algorithm: "sort" = exact lex-sort voxel dedup;
    # "hash" = sort-free scatter-min dedup (~7x cheaper on TPU, loses a
    # few % of points to hash collisions — see local_map._device_build_hash)
    local_map_build_mode: str = "sort"
    # Build the rolling-map aggregate ON DEVICE (local_map.DeviceLocalMap):
    # keyframe layers stay as the fixed-capacity device arrays the fused
    # step produced, and the transform→dedup→compact build is one jitted
    # dispatch (~10 ms) instead of ~250 ms of np.unique on the pipeline
    # thread — required for the 10 Hz online operating point. Falls back
    # to the host builder when local_map_min_views > 1 (the multi-view
    # transient filter is host-only).
    local_map_device_build: bool = True
    # Transient (dynamic-object) suppression in the rolling map: a world
    # voxel must be seen by >= this many distinct keyframes to stay in the
    # map (newest `protect_recent` keyframes exempt — fresh territory).
    # 1 = off. See LocalMap.transient_min_views; characterized on the
    # moving-cars HDL-64 replay (docs/accuracy.md, docs/accuracy_dynamic.json).
    local_map_min_views: int = 1
    # consistency-vote voxel pitch (m); 0 = auto (2x dedup pitch)
    local_map_transient_voxel: float = 0.0
    local_map_protect_recent: int = 2
    # Candidate cache for the vmapped nearby-keyframe batch align (the
    # two-level loop vmaps cleanly — every lane refreshes at block
    # heads). Those batches share the single chip with the scan pipeline,
    # so their device time is pure queue-wait for the next scan. Loop-
    # closure Monte-Carlo keeps full NN (wide-basin search needs the
    # unrestricted pull). 0 = off.
    nearby_cand_k: int = 4
    # Physical speed gate: per-scan translation beyond this * dt is
    # rejected as a teleport (self-similar-geometry aliasing basins keep
    # HIGH ICP quality, so only physics can catch them)
    max_sensor_speed: float = 30.0       # [m/s]
    max_sensor_rot_rate: float = 2.0     # [rad/s] (90-deg block symmetry
    # makes rotational aliasing just as real as translational)
    # Device mesh for the PRODUCTION pipeline (VERDICT r3 #5; the analogue
    # of the reference's worker fan-out, reference LidarOdometry.cpp:94-96,
    # :708-741 — but over chips, not threads). ``mesh_data`` > 1 DP-shards
    # the vmapped nearby-keyframe batch and the loop-closure Monte-Carlo
    # batch over a "data" mesh axis (batches pad up to a multiple of the
    # axis). ``mesh_model`` > 1 TP-shards the map-align TARGET point axis
    # over a "model" axis inside the fused scan step (XLA collectives over
    # ICI; ops/matching.py tp_* paths). 1/1 = single-device (default). If
    # the process exposes fewer than data*model devices the module logs a
    # warning and falls back to single-device.
    mesh_data: int = 1
    mesh_model: int = 1


@dataclass
class ICPInput:
    """run_one_icp input (reference LidarOdometry.h:114-124)."""

    align_kind: AlignKind
    to_id: int
    from_id: int
    to_pc: MetricMap
    from_pc: MetricMap
    init_guess_to_wrt_from: se3.Pose
    debug_str: str = ""


@dataclass
class ICPOutput:
    """run_one_icp output (reference LidarOdometry.h:126-132)."""

    success: bool
    goodness: float
    found_pose_to_wrt_from: se3.Pose
    cov: np.ndarray
    n_iterations: int = 0


@dataclass
class MethodState:
    """Algorithm state (reference LidarOdometry.h:136-160) — owned by the
    single pipeline worker; only the local graph is shared (mutex)."""

    last_obs_tim: Optional[float] = None
    last_points: Optional[MetricMap] = None
    twist: np.ndarray = field(default_factory=lambda: np.zeros(6))
    twist_is_good: bool = False
    # damped deskew twist (EMA + accel clamp; see LidarOdometryParameters).
    # age counts scans since the last validated update; a large age means
    # "never seeded / stale — do not motion-compensate".
    twist_smooth: np.ndarray = field(default_factory=lambda: np.zeros(6))
    twist_smooth_age: int = 10**9
    # scan-to-map odometry state: current world-frame pose estimate (the
    # odometry frame anchored at the first keyframe) and the device-side
    # aggregated local-map target (None = fall back to last-scan mode)
    world_R: np.ndarray = field(default_factory=lambda: np.eye(3))
    world_t: np.ndarray = field(default_factory=lambda: np.zeros(3))
    local_map: Optional[MetricMap] = None
    last_kf: Optional[int] = None
    accum_since_last_kf_R: np.ndarray = field(default_factory=lambda: np.eye(3))
    accum_since_last_kf_t: np.ndarray = field(default_factory=lambda: np.zeros(3))
    kf_decor_counter: int = 0
    local_pose_graph: PoseGraph = field(default_factory=make_pose_graph)
    checked_KF_pairs: Set[Tuple[int, int]] = field(default_factory=set)
    mc_seed: int = 0
    # append-only mirror of graph edges (a, b, R, t) — checkpointing works
    # with either graph backend without exposing its internals
    edge_log: list = field(default_factory=list)
    # accepted loop-closure KF pairs — lets harnesses ablate the LC factors
    # out of the recorded stream (PGO with/without LC; VERDICT r3 #2)
    lc_pairs: list = field(default_factory=list)


@MODULE_REGISTRY.register("LidarOdometry")
@MODULE_REGISTRY.register("mola::LidarOdometry")
class LidarOdometry(FrontEndBase):
    """LiDAR odometry front-end: scans in → keyframes + SE(3) factors out."""

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.params = LidarOdometryParameters()
        self.icp_cases: Dict[AlignKind, tuple] = {}  # AlignKind -> stage tuple
        self.generators: List = []
        self.filter_pipeline: FilterPipeline = FilterPipeline()
        self.worldmodel: Optional[WorldModel] = None
        self.state = MethodState()
        self._state_lock = threading.Lock()  # guards local graph + checked pairs
        self._pipeline_pool = ThreadPoolExecutor(1, thread_name_prefix="scan")
        self._nearby_pool = ThreadPoolExecutor(2, thread_name_prefix="pastkf")
        self._pending = 0
        self._pending_lock = threading.Lock()
        self._nearby_inflight = 0
        self._drops = 0
        # per-AlignKind fused-path health: one kind failing to trace must not
        # degrade the others, and non-trace errors (config typos surfacing as
        # KeyError/AttributeError/...) propagate instead of silently slowing
        # every subsequent scan
        # keyed by (kind, use_map): the fused step is compiled per target
        # mode too, and a trace failure in one mode must not disable the
        # other (default True = try the fused path once per key)
        self._fused_ok: Dict[Tuple[AlignKind, bool], bool] = {}
        self._last_positive_dt: Optional[float] = None
        self._mesh = None               # device mesh (set in initialize())
        # pipelined scan step: intake-order mirror of the pipeline queue
        # (for one-obs lookahead) + the prefetched (timestamp, mm, sanity)
        from collections import deque as _deque
        self._lookahead = _deque()
        # accepted nearby-align goodness history — the observable the
        # auto loop-closure gate calibrates against (same single-pair
        # pairing-density regime; see min_icp_goodness_lc_auto docs)
        self._nearby_goodness = _deque(maxlen=64)
        self._prefetched = None
        self._pipelined_ok = True       # trace-failure kill switch
        self._warm_started = False      # rare-path precompile ran once
        self._shutting_down = False
        self._local_map_builder = None  # created on first KF in local_map mode
        self._map_fail_streak = 0       # consecutive weak scan-to-map aligns
        self._map_build_lock = threading.Lock()
        self._map_build_inflight = False
        self._map_build_dirty = False

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    def initialize(self, cfg: Dict[str, Any]) -> None:
        """Parse the module's ``params`` block (reference
        src/LidarOdometry.cpp:90-149)."""
        c = cfg.get("params", cfg)
        p = self.params
        g = lambda k, d, **kw: yaml_get(c, k, default=d, **kw)
        p.min_time_between_scans = float(g("min_time_between_scans", p.min_time_between_scans))
        p.min_dist_xyz_between_keyframes = float(
            g("min_dist_xyz_between_keyframes", p.min_dist_xyz_between_keyframes))
        if "min_rotation_between_keyframes" in c:
            p.min_rotation_between_keyframes = yaml_get(
                c, "min_rotation_between_keyframes", deg_to_rad=True)
        p.min_icp_goodness = float(g("min_icp_goodness", p.min_icp_goodness))
        lc_gate = g("min_icp_goodness_lc", p.min_icp_goodness_lc)
        if isinstance(lc_gate, str) and lc_gate.strip().lower() == "auto":
            p.min_icp_goodness_lc_auto = True  # numeric default = fallback
        else:
            p.min_icp_goodness_lc = float(lc_gate)
        p.min_icp_goodness_lc_auto = bool(
            g("min_icp_goodness_lc_auto", p.min_icp_goodness_lc_auto))
        p.lc_submap_keyframes = int(
            g("lc_submap_keyframes", p.lc_submap_keyframes))
        p.lc_submap_capacity_mult = int(
            g("lc_submap_capacity_mult", p.lc_submap_capacity_mult))
        p.min_dist_to_matching = float(g("min_dist_to_matching", p.min_dist_to_matching))
        p.max_dist_to_matching = float(g("max_dist_to_matching", p.max_dist_to_matching))
        p.max_dist_to_loop_closure = float(
            g("max_dist_to_loop_closure", p.max_dist_to_loop_closure))
        p.loop_closure_montecarlo_samples = int(
            g("loop_closure_montecarlo_samples", p.loop_closure_montecarlo_samples))
        p.max_nearby_align_checks = int(
            g("max_nearby_align_checks", p.max_nearby_align_checks))
        p.min_topo_dist_to_consider_loopclosure = int(
            g("min_topo_dist_to_consider_loopclosure",
              p.min_topo_dist_to_consider_loopclosure))
        p.max_KFs_local_graph = int(g("max_KFs_local_graph", p.max_KFs_local_graph))
        p.viz_decor_decimation = int(g("viz_decor_decimation", p.viz_decor_decimation))
        p.viz_decor_pointsize = float(g("viz_decor_pointsize", p.viz_decor_pointsize))
        p.max_queue_length = int(g("max_queue_length", p.max_queue_length))
        p.max_correction_ratio = float(g("max_correction_ratio", p.max_correction_ratio))
        p.deskew_twist_smoothing = float(
            g("deskew_twist_smoothing", p.deskew_twist_smoothing))
        p.deskew_max_accel = float(g("deskew_max_accel", p.deskew_max_accel))
        p.deskew_max_rot_accel = float(
            g("deskew_max_rot_accel", p.deskew_max_rot_accel))
        p.deskew_twist_max_age = int(
            g("deskew_twist_max_age", p.deskew_twist_max_age))
        p.deskew_in_loop = bool(g("deskew_in_loop", p.deskew_in_loop))
        p.deskew_refine_iters = int(
            g("deskew_refine_iters", p.deskew_refine_iters))
        p.deskew_refine_min_quality = float(
            g("deskew_refine_min_quality", p.deskew_refine_min_quality))
        p.deskew_refine_rounds = int(
            g("deskew_refine_rounds", p.deskew_refine_rounds))
        p.odometry_reference = str(
            g("odometry_reference", p.odometry_reference))
        if p.odometry_reference not in ("last_scan", "local_map"):
            raise ValueError(
                f"odometry_reference must be last_scan|local_map, "
                f"got {p.odometry_reference!r}")
        p.local_map_keyframes = int(
            g("local_map_keyframes", p.local_map_keyframes))
        cm = g("local_map_capacity_mult", p.local_map_capacity_mult)
        p.local_map_capacity_mult = (
            {str(k): int(v) for k, v in cm.items()} if isinstance(cm, dict)
            else int(cm))
        p.local_map_dedup_voxel = float(
            g("local_map_dedup_voxel", p.local_map_dedup_voxel))
        p.local_map_reseed_after = int(
            g("local_map_reseed_after", p.local_map_reseed_after))
        p.local_map_min_abs_step_trans = float(
            g("local_map_min_abs_step_trans", p.local_map_min_abs_step_trans))
        p.local_map_min_abs_step_rot = float(
            g("local_map_min_abs_step_rot", p.local_map_min_abs_step_rot))
        p.local_map_async_build = bool(
            g("local_map_async_build", p.local_map_async_build))
        p.local_map_max_match_distance = float(
            g("local_map_max_match_distance", p.local_map_max_match_distance))
        p.local_map_cand_k = int(g("local_map_cand_k", p.local_map_cand_k))
        p.local_map_cand_knn = bool(
            g("local_map_cand_knn", p.local_map_cand_knn))
        p.local_map_max_iterations = int(
            g("local_map_max_iterations", p.local_map_max_iterations))
        p.local_map_nn_backend = str(
            g("local_map_nn_backend", p.local_map_nn_backend))
        p.local_map_tight_requires_prior = bool(
            g("local_map_tight_requires_prior",
              p.local_map_tight_requires_prior))
        p.local_map_quality_max_points = int(
            g("local_map_quality_max_points", p.local_map_quality_max_points))
        p.nearby_max_iterations = int(
            g("nearby_max_iterations", p.nearby_max_iterations))
        p.nearby_cand_knn = bool(g("nearby_cand_knn", p.nearby_cand_knn))
        p.nearby_decimate = int(g("nearby_decimate", p.nearby_decimate))
        p.local_map_cand_motion_trans = float(
            g("local_map_cand_motion_trans", p.local_map_cand_motion_trans))
        p.local_map_cand_motion_rot = float(
            g("local_map_cand_motion_rot", p.local_map_cand_motion_rot))
        p.local_map_gn_inner = int(g("local_map_gn_inner", p.local_map_gn_inner))
        p.local_map_device_build = bool(
            g("local_map_device_build", p.local_map_device_build))
        p.local_map_build_mode = str(
            g("local_map_build_mode", p.local_map_build_mode))
        if p.local_map_build_mode not in ("sort", "hash"):
            raise ValueError(
                f"local_map_build_mode must be sort|hash, "
                f"got {p.local_map_build_mode!r}")
        p.local_map_min_views = int(
            g("local_map_min_views", p.local_map_min_views))
        p.local_map_transient_voxel = float(
            g("local_map_transient_voxel", p.local_map_transient_voxel))
        p.local_map_protect_recent = int(
            g("local_map_protect_recent", p.local_map_protect_recent))
        p.nearby_cand_k = int(g("nearby_cand_k", p.nearby_cand_k))
        p.max_sensor_speed = float(g("max_sensor_speed", p.max_sensor_speed))
        p.max_sensor_rot_rate = float(
            g("max_sensor_rot_rate", p.max_sensor_rot_rate))
        p.mesh_data = int(g("mesh_data", p.mesh_data))
        p.mesh_model = int(g("mesh_model", p.mesh_model))
        p.fused_scan_step = bool(g("fused_scan_step", p.fused_scan_step))
        p.pipelined_scan_step = bool(
            g("pipelined_scan_step", p.pipelined_scan_step))
        p.precompile_rare_paths = bool(
            g("precompile_rare_paths", p.precompile_rare_paths))

        # The three ICP cases (reference :122-128). Each case is a tuple of
        # coarse-to-fine stages (the reference documents ICP_case as a
        # stage vector; a single stage is the common case).
        self.icp_cases = {}
        for key, kind in (
            ("icp_settings_with_vel", AlignKind.LIDAR_ODOMETRY),
            ("icp_settings_without_vel", AlignKind.NEARBY_ALIGN),
            ("icp_settings_loop_closure", AlignKind.LOOP_CLOSURE),
        ):
            if key in c and c[key]:
                self.icp_cases[kind] = icp_stages_from_config(c[key])
        if not self.icp_cases:
            from ..models.presets import icp_cases_kitti
            self.icp_cases = {k: (v,) for k, v in icp_cases_kitti().items()}
        for kind in AlignKind:
            self.icp_cases.setdefault(
                kind, next(iter(self.icp_cases.values())))

        # Generators + filter pipeline (reference :135-140), incl. the
        # legacy single-filter keys of the stale KITTI preset (SURVEY §2d)
        self.generators = generators_from_config(c.get("pointcloud_generator"))
        filt_cfg = c.get("pointcloud_filter")
        if filt_cfg is None and "pointcloud_filter_class" in c:
            filt_cfg = [{
                "class": c["pointcloud_filter_class"],
                "params": c.get("pointcloud_filter_params", {}),
            }]
        filt_cfg = list(filt_cfg) if filt_cfg else []
        # reference preset key (dead in the reference code, SURVEY §2d);
        # honored here as a real cap on the raw layer
        cap_count = int(g("decimate_to_point_count", 0) or 0)
        if cap_count > 0:
            filt_cfg.insert(0, {"class": "FilterDecimateToCount",
                                "params": {"count": cap_count}})
        self.filter_pipeline = FilterPipeline.from_config(filt_cfg)

        if self.worldmodel is None:
            self.worldmodel = self.find_service(WorldModel) or WorldModel()

        # production device mesh (VERDICT r3 #5). Built once here; the
        # packed-batch and fused-step caches key on its axis sizes.
        self._mesh = None
        if p.mesh_data > 1 or p.mesh_model > 1:
            need = p.mesh_data * p.mesh_model
            if len(jax.devices()) >= need:
                from ..parallel import make_mesh
                self._mesh = make_mesh(
                    {"data": p.mesh_data, "model": p.mesh_model})
                self.log.info("device mesh: data=%d model=%d",
                              p.mesh_data, p.mesh_model)
            else:
                self.log.warning(
                    "mesh data=%d model=%d needs %d devices, found %d — "
                    "falling back to single-device",
                    p.mesh_data, p.mesh_model, need, len(jax.devices()))

    def reset(self) -> None:
        """Reinitialize state (reference :160)."""
        with self._state_lock:
            self.state = MethodState()
            self._local_map_builder = None
            self._map_fail_streak = 0
            self._last_positive_dt = None
            self._prefetched = None

    def state_copy(self) -> MethodState:
        """Deep snapshot accessor (reference stateCopy(), LidarOdometry.h:163).

        Unlike the reference — whose stateCopy() shares the live containers
        and can race (SURVEY.md §2c) — the snapshot owns its own pose graph,
        edge log, and checked-pair set: a caller can iterate it while the
        pipeline keeps mutating the live state.
        """
        with self._state_lock:
            st = self.state
            g = make_pose_graph()
            live = set(st.local_pose_graph.nodes)
            if st.local_pose_graph.root is not None:
                g.insert_node(st.local_pose_graph.root)
            for n in sorted(live):
                g.insert_node(n)
            for a, b, R, t in st.edge_log:
                # edge_log is append-only; skip edges of pruned nodes
                if a in live and b in live:
                    g.insert_edge(a, b, R, t)
            return dataclasses.replace(
                st,
                twist=np.array(st.twist),
                twist_smooth=np.array(st.twist_smooth),
                world_R=np.array(st.world_R),
                world_t=np.array(st.world_t),
                accum_since_last_kf_R=np.array(st.accum_since_last_kf_R),
                accum_since_last_kf_t=np.array(st.accum_since_last_kf_t),
                local_pose_graph=g,
                checked_KF_pairs=set(st.checked_KF_pairs),
                edge_log=list(st.edge_log),
                lc_pairs=list(st.lc_pairs),
            )

    def spin_once(self) -> None:
        """Periodic heartbeat (reference src/LidarOdometry.cpp:150-158 keeps
        this empty; here it flushes queue-depth metrics)."""
        with ProfilerEntryCtx(self.profiler, "spinOnce"):
            with self._pending_lock:
                self.profiler.register_user_measure(
                    "spinOnce.pending_scans", self._pending)
                self.profiler.register_user_measure(
                    "spinOnce.nearby_inflight", self._nearby_inflight)

    # ------------------------------------------------------------------
    # observation intake (reference :162-187)
    # ------------------------------------------------------------------
    def on_new_observation(self, obs: RawObservation):
        if self.raw_sensor_label and obs.get("sensor_label") != self.raw_sensor_label:
            return None
        with self._pending_lock:
            queued = self._pending
            self.profiler.register_user_measure("onNewObservation.queue_length", queued)
            if queued > self.params.max_queue_length:
                self._drops += 1
                self.profiler.register_user_measure("onNewObservation.drop_observation", 1)
                self.log.error_throttle(
                    1.0, "Dropping observation due to pipeline overload (%d queued)",
                    queued)
                return None
            self._pending += 1
            self._lookahead.append(obs)
        self.profiler.enter("delay_onNewObs_to_process")
        return self._pipeline_pool.submit(self._process_safe, obs)

    def _process_safe(self, obs: RawObservation) -> None:
        # per-scan error isolation (reference :194, :510-513)
        try:
            self._process(obs)
        except Exception:  # noqa: BLE001
            self.log.exception("exception processing scan")
        finally:
            with self._pending_lock:
                self._pending -= 1

    # ------------------------------------------------------------------
    # the main pipeline (reference doProcessNewObservation :190-514)
    # ------------------------------------------------------------------
    def _process(self, obs: RawObservation) -> None:
        prof = self.profiler
        prof.leave("delay_onNewObs_to_process")
        prof.enter("doProcessNewObservation")
        try:
            tim = float(obs.get("timestamp", 0.0))
            st = self.state

            # pipelined lookahead bookkeeping: this obs leaves the mirror
            # queue (direct _process calls in tests bypass intake — then
            # the mirror is simply not used for this scan)
            with self._pending_lock:
                if self._lookahead and self._lookahead[0] is obs:
                    self._lookahead.popleft()

            # time gate (reference :202-212)
            if st.last_obs_tim is not None:
                dt = tim - st.last_obs_tim
                if dt < self.params.min_time_between_scans:
                    prof.register_user_measure("doProcess.skip_too_soon", 1)
                    return

            # prefetched filter output (pipelined mode): scan N's align
            # dispatch overlapped THIS scan's ingest + filter — skip the
            # generators entirely and use the in-flight device values
            pf = self._prefetched
            self._prefetched = None
            if pf is not None and pf[0] != tim:
                pf = None  # time-gated / reordered: discard

            raw_map = None
            if pf is None:
                # generators (host->device ingest, reference :215-217)
                prof.enter("doProcess.generators")
                raw_map = apply_generators(self.generators, obs)
                prof.leave("doProcess.generators")

            last_points = st.last_points
            last_tim = st.last_obs_tim

            icp_out = None
            this_points = None
            if last_points is not None:
                # NOT `last_tim or tim`: a legitimate previous timestamp of
                # 0.0 is falsy (0-based sequences) and would zero dt, silently
                # skipping the velocity prior and twist update on scan #2
                dt = tim - last_tim if last_tim is not None else 0.0
                if dt > 1e-3:
                    self._last_positive_dt = dt
                # velocity-model prior (reference :264-275; full se(3) twist)
                # — host-side numpy exp: no device dispatch for a 6-vector
                if st.twist_is_good and dt > 0:
                    gR, gt_ = se3_np.exp(st.twist * dt)
                    kind = AlignKind.LIDAR_ODOMETRY
                else:
                    gR, gt_ = np.eye(3), np.zeros(3)
                    kind = AlignKind.NEARBY_ALIGN  # without-vel set (ref :287-290)
                # scan-to-map: the ICP target is the rolling local map in
                # the world frame, so the guess composes the world pose
                # with the velocity prior and ICP returns a WORLD pose
                use_map = (self.params.odometry_reference == "local_map"
                           and st.local_map is not None)
                if use_map:
                    gR, gt_ = se3_np.compose((st.world_R, st.world_t),
                                             (gR, gt_))
                    icp_target = st.local_map
                else:
                    icp_target = last_points
                guess_R = jnp.asarray(gR, jnp.float32)
                guess_t = jnp.asarray(gt_, jnp.float32)

                # Deskew only with the DAMPED twist (EMA + accel clamp):
                # the raw per-pair estimate fed straight back into motion
                # compensation is a one-scan-lag feedback loop that
                # oscillates/diverges on skewed scans (see parameter docs).
                deskew_twist = (
                    st.twist_smooth
                    if st.twist_smooth_age <= self.params.deskew_twist_max_age
                    else np.zeros(6))
                for _f in self.filter_pipeline.filters:
                    if hasattr(_f, "set_twist"):
                        _f.set_twist(deskew_twist)

                if (self.params.fused_scan_step
                        and self._fused_ok.get((kind, use_map), True)):
                    # ONE dispatch + ONE readback (see _get_fused_step)
                    # two-pass deskew refinement inputs: previous world pose
                    # (to strip from a map-align WORLD result) and dt (to
                    # turn the rel pose into an implied twist)
                    prev_wR = np.asarray(
                        st.world_R if use_map else np.eye(3), np.float32)
                    prev_wt = np.asarray(
                        st.world_t if use_map else np.zeros(3), np.float32)
                    pipelined = (self.params.pipelined_scan_step
                                 and self._pipelined_ok)
                    try:
                        prof.enter("doProcess.fused_step")
                        tw_arr = jnp.asarray(deskew_twist, jnp.float32)
                        targs = (icp_target, guess_R, guess_t, tw_arr,
                                 jnp.asarray(prev_wR), jnp.asarray(prev_wt),
                                 jnp.float32(max(dt, 0.0)))
                        if pipelined:
                            # split dispatches: filter (possibly already in
                            # flight from the previous scan's prefetch) then
                            # align; the next scan's ingest+filter overlaps
                            # this align's device time + readback round-trip
                            if pf is not None:
                                mm_f, sanity = pf[1], pf[2]
                            else:
                                mm_f, sanity = self._get_filter_step()(
                                    raw_map, tw_arr)
                            prof.enter("doProcess.align_dispatch")
                            mm, flat = self._get_align_step(kind, use_map)(
                                mm_f, *targs, sanity)
                            prof.leave("doProcess.align_dispatch")
                            self._prefetch_next()
                        else:
                            if raw_map is None:  # prefetched, mode now off
                                raw_map = apply_generators(
                                    self.generators, obs)
                            mm, flat = self._get_fused_step(kind, use_map)(
                                raw_map, *targs)
                        prof.enter("doProcess.readback_wait")
                        flat = np.asarray(flat)  # the single readback
                        prof.leave("doProcess.readback_wait")
                        prof.leave("doProcess.fused_step")
                        total, finite = float(flat[51]), float(flat[52])
                        if finite < 0.5 or total < 10.0:
                            prof.register_user_measure("doProcess.drop_insane_scan", 1)
                            self.log.error_throttle(
                                1.0, "Dropping degenerate scan (empty/non-finite)")
                            return
                        this_points = mm
                        icp_out = _unpack_icp_result(flat)
                    except _FUSED_FALLBACK_ERRORS:
                        # jit trace/compile failure for THIS kind only: fall
                        # back to the unfused path once, permanently
                        prof.leave("doProcess.fused_step")
                        self._fused_ok[(kind, use_map)] = False
                        self.log.warning(
                            "fused scan step failed to trace for %s; "
                            "using unfused path", kind, exc_info=True)
                    except Exception:
                        # genuine errors (bad config, missing layers, ...)
                        # must surface, not silently degrade every scan
                        prof.leave("doProcess.fused_step")
                        raise

                if icp_out is None:  # unfused fallback
                    if raw_map is None:  # scan arrived via the prefetch path
                        raw_map = apply_generators(self.generators, obs)
                    prof.enter("doProcess.filter")
                    this_points = self.filter_pipeline(raw_map)
                    prof.leave("doProcess.filter")
                    if not self._cloud_is_sane(this_points):
                        prof.register_user_measure("doProcess.drop_insane_scan", 1)
                        self.log.error_throttle(
                            1.0, "Dropping degenerate scan (empty/non-finite)")
                        return
                    icp_out = self.run_one_icp(ICPInput(
                        align_kind=kind, to_id=-1, from_id=-1,
                        to_pc=this_points, from_pc=icp_target,
                        init_guess_to_wrt_from=se3.Pose(guess_R, guess_t),
                        debug_str="icp_latest",
                    ), stages=self._stages_for(kind, use_map))

                # Resilience gates. Two distinct failure modes observed on
                # the HDL-64 sim city:
                #  * weak map align (corner ghosting, stale map) — retry
                #    scan-to-scan, keep the better result, reseed a
                #    persistently failing map;
                #  * UNPHYSICAL rel motion — self-similar geometry (city
                #    blocks repeat every ~14 m) has genuine wrong basins:
                #    ICP can teleport a block backward with HIGH quality,
                #    and the velocity prior then anchors a runaway (-5
                #    m/scan sustained, measured). Quality cannot catch
                #    this; a physical speed gate can (the reference's
                #    analogous gate is correction<20% for nearby aligns,
                #    reference :809-816). On gate failure hold the motion
                #    model and report goodness 0.
                result_is_world = use_map
                # dt<=0 (duplicate/non-monotonic timestamps) gives no motion
                # bound; fall back to the last positive inter-scan dt (or one
                # nominal sweep) rather than a 1 ms bound that would reject
                # every correct alignment as a "teleport"
                dt_gate = dt if dt > 1e-3 else (self._last_positive_dt or 0.1)
                max_step = self.params.max_sensor_speed * dt_gate
                max_rot_step = self.params.max_sensor_rot_rate * dt_gate

                def _rel_norm(out, is_world):
                    Rp, tp = _np_pose(out.found_pose_to_wrt_from)
                    if is_world:
                        tp = st.world_R.T @ (tp - st.world_t)
                        Rp = st.world_R.T @ Rp
                    return float(np.linalg.norm(tp)), se3_np.rotation_angle(Rp)

                def _jump(out, is_world):
                    tn, ra = _rel_norm(out, is_world)
                    return tn > max_step or ra > max_rot_step

                def _motion_model_output():
                    pR, pt = (se3_np.exp(st.twist * dt)
                              if (st.twist_is_good and dt > 0)
                              else (np.eye(3), np.zeros(3)))
                    return ICPOutput(
                        success=False, goodness=0.0,
                        found_pose_to_wrt_from=_jx_pose(pR, pt),
                        cov=np.eye(6) * 1e6)

                def _s2s_align():
                    fgR, fgt = (se3_np.exp(st.twist * dt)
                                if (st.twist_is_good and dt > 0)
                                else (np.eye(3), np.zeros(3)))
                    return self.run_one_icp(ICPInput(
                        align_kind=kind, to_id=-1, from_id=-1,
                        to_pc=this_points, from_pc=last_points,
                        init_guess_to_wrt_from=se3.Pose(
                            jnp.asarray(fgR, jnp.float32),
                            jnp.asarray(fgt, jnp.float32)),
                        debug_str="icp_latest_s2s_fallback",
                    ))

                if use_map:
                    map_jump = _jump(icp_out, True)
                    map_bad = (map_jump or
                               icp_out.goodness < self.params.min_icp_goodness)
                    if map_bad:
                        self._map_fail_streak += 1
                        prof.register_user_measure("doProcess.map_align_weak", 1)
                        if map_jump:
                            self.log.warning(
                                "map align rejected: unphysical step "
                                "%.1fm/%.2frad (max %.1fm/%.2frad)",
                                *_rel_norm(icp_out, True), max_step, max_rot_step)
                        fb = _s2s_align()
                        fb_jump = _jump(fb, False)
                        if not fb_jump and (map_jump
                                            or fb.goodness > icp_out.goodness):
                            icp_out = fb
                            result_is_world = False
                        elif map_jump:
                            # both unphysical: hold the motion model
                            prof.register_user_measure(
                                "doProcess.reject_unphysical", 1)
                            icp_out = _motion_model_output()
                            result_is_world = False
                        if self._map_fail_streak > self.params.local_map_reseed_after:
                            self.log.warning(
                                "local map failing for %d scans; reseeding at "
                                "next keyframe", self._map_fail_streak)
                            with self._state_lock:
                                self._local_map_builder = None
                                st.local_map = None
                            self._map_fail_streak = 0
                    else:
                        self._map_fail_streak = 0
                elif _jump(icp_out, False):
                    # scan-to-scan teleport (same aliasing hazard)
                    prof.register_user_measure("doProcess.reject_unphysical", 1)
                    self.log.warning(
                        "odometry align rejected: unphysical step "
                        "%.1fm/%.2frad (max %.1fm/%.2frad)",
                        *_rel_norm(icp_out, False), max_step, max_rot_step)
                    icp_out = _motion_model_output()
            else:
                prof.enter("doProcess.filter")
                this_points = self.filter_pipeline(raw_map)
                prof.leave("doProcess.filter")
                if not self._cloud_is_sane(this_points):
                    prof.register_user_measure("doProcess.drop_insane_scan", 1)
                    self.log.error_throttle(
                        1.0, "Dropping degenerate scan (empty/non-finite)")
                    return

            st.last_points = this_points
            st.last_obs_tim = tim

            if (self.params.precompile_rare_paths and not self._warm_started
                    and this_points is not None):
                self._warm_started = True
                self._warm_thread = threading.Thread(
                    target=self._warm_rare_paths, args=(this_points,),
                    name="warm_rare_paths", daemon=True)
                self._warm_thread.start()

            create_keyframe = False

            if last_points is None:
                create_keyframe = True  # first scan (reference :250-257)
            else:

                R, t = _np_pose(icp_out.found_pose_to_wrt_from)
                if result_is_world:
                    # ICP returned the WORLD pose; downstream bookkeeping
                    # (twist, accum, factors) works on the scan-to-scan
                    # relative pose rel = world_prev^-1 * world_new
                    world_new = (R, np.asarray(t, float))
                    R = st.world_R.T @ world_new[0]
                    t = st.world_R.T @ (world_new[1] - st.world_t)
                    st.world_R, st.world_t = world_new
                else:
                    st.world_R, st.world_t = se3_np.compose(
                        (st.world_R, st.world_t), (R, t))
                # twist update (reference :305-311; omega part included) —
                # numpy log: no device dispatch for host bookkeeping
                if dt > 0 and icp_out.success:
                    st.twist = se3_np.log(R, t) / dt
                st.twist_is_good = (
                    icp_out.success and icp_out.goodness >= self.params.min_icp_goodness
                )
                self._update_deskew_twist(dt)

                # accumulate odometry since last KF (reference :319-331)
                st.accum_since_last_kf_R, st.accum_since_last_kf_t = (
                    st.accum_since_last_kf_R @ R,
                    st.accum_since_last_kf_R @ t + st.accum_since_last_kf_t,
                )
                dist = float(np.linalg.norm(st.accum_since_last_kf_t))
                rot = se3_np.rotation_angle(st.accum_since_last_kf_R)
                # KF decision (reference :333-337)
                create_keyframe = icp_out.goodness > self.params.min_icp_goodness and (
                    dist > self.params.min_dist_xyz_between_keyframes
                    or rot > self.params.min_rotation_between_keyframes
                )
                prof.register_user_measure("icp_latest.goodness", icp_out.goodness)
                prof.register_user_measure("icp_latest.n_iter",
                                           icp_out.n_iterations)

            if create_keyframe:
                self._create_keyframe(tim, this_points)

            # advertise localization every scan (reference :484-490,
            # fire-and-forget)
            if self.slam_backend is not None and st.last_kf is not None:
                self.slam_backend.advertise_updated_localization(
                    AdvertiseLocalization(
                        timestamp=tim, reference_kf=st.last_kf,
                        pose=se3.Pose(
                            st.accum_since_last_kf_R.astype(np.float32),
                            st.accum_since_last_kf_t.astype(np.float32))))

            # search for extra edges (reference :496-508)
            with self._state_lock:
                graph_nonempty = len(st.local_pose_graph) > 0
            if graph_nonempty:
                self.check_for_nearby_kfs()
        finally:
            prof.leave("doProcessNewObservation")

    def _warm_rare_paths(self, mm: MetricMap) -> None:
        """Background-compile the rare production programs on throwaway
        inputs shaped exactly like production (``precompile_rare_paths``).

        Runs once, off the scan pipeline, right after the first scan: by
        the time a weak corner triggers the s2s fallback retry, a gate
        failure switches to the without-vel align kind, or the first
        nearby/LC batch fires, their programs are already compiled (in
        process AND in the persistent cache). Each warm call dispatches
        once on garbage data and discards the result; a few hundred ms
        of early chip time instead of a measured ~28 s online stall per
        rare path (remote TPU compiler)."""
        try:
            eyeR = jnp.eye(3, dtype=jnp.float32)
            zt = jnp.zeros(3, jnp.float32)
            use_map = self.params.odometry_reference == "local_map"

            def batch(stages, k, tag, src=None, tgt=None):
                if self._shutting_down:
                    return
                src = mm if src is None else src
                tgt = mm if tgt is None else tgt
                to_b = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (k, *x.shape)), src)
                gRs = jnp.broadcast_to(eyeR, (k, 3, 3))
                gts = jnp.zeros((k, 3), jnp.float32)
                (to_b, gRs, gts), from_d = self._dp_shard(
                    (to_b, gRs, gts), tgt)
                np.asarray(_get_packed_batch_align(stages)(
                    to_b, from_d, gRs, gts))
                self.log.debug("warmed %s", tag)

            # s2s fallback retry (packed align, unpatched stages)
            for kind in (AlignKind.LIDAR_ODOMETRY, AlignKind.NEARBY_ALIGN):
                if self._shutting_down:
                    return
                np.asarray(_get_packed_align(self.icp_cases[kind])(
                    mm, mm, eyeR, zt))
            # per-pair nearby fallback: _check_non_adjacent dispatches the
            # cand_k-patched _nearby_stages() on a DECIMATED src against
            # the full-density target — a different static key than the
            # unpatched program above, so it needs its own warm dispatch
            dec_mm = _decimate_layers(mm, self.params.nearby_decimate)
            if not self._shutting_down:
                np.asarray(_get_packed_align(self._nearby_stages())(
                    dec_mm, mm, eyeR, zt))
            # nearby-KF batch (decimated src vs full target, as production
            # dispatches it) + loop-closure Monte-Carlo batch
            batch(self._nearby_stages(),
                  self._dp_pad(max(1, self.params.max_nearby_align_checks)),
                  "nearby_batch", src=dec_mm, tgt=mm)
            batch(self.icp_cases[AlignKind.LOOP_CLOSURE],
                  self._dp_pad(self.params.loop_closure_montecarlo_samples),
                  "lc_montecarlo")
            # scan-vs-submap LC: both the submap build program and the
            # larger-target MC align are distinct static shapes
            if self.params.lc_submap_keyframes > 0 and not self._shutting_down:
                b = self._lc_submap_builder()
                b.add_keyframe(mm, (np.eye(3), np.zeros(3)))
                batch(self.icp_cases[AlignKind.LOOP_CLOSURE],
                      self._dp_pad(self.params.loop_closure_montecarlo_samples),
                      "lc_submap", tgt=b.build())
            # without-vel pipelined align (fires on the scan after any
            # gate failure); for map mode, wait for the map to exist
            if self.params.pipelined_scan_step:
                tgt = mm
                if use_map:
                    import time as _time
                    for _ in range(240):
                        if (self.state.local_map is not None
                                or self._shutting_down):
                            break
                        _time.sleep(0.25)
                    tgt = self.state.local_map
                if tgt is not None:
                    step = self._get_align_step(AlignKind.NEARBY_ALIGN,
                                                use_map)
                    _, flat = step(mm, tgt, eyeR, zt,
                                   jnp.zeros(6, jnp.float32),
                                   eyeR, zt, jnp.float32(0.1),
                                   jnp.zeros(2, jnp.float32))
                    np.asarray(flat)
            self.log.info("rare-path programs precompiled")
        except Exception:  # noqa: BLE001 — warmup must never hurt the run
            self.log.warning("rare-path precompile failed", exc_info=True)

    def _prefetch_next(self) -> None:
        """Dispatch the NEXT queued scan's generators + filter while the
        current scan's align runs on device (pipelined_scan_step).

        Speculative by design: the prefetched filter deskews with the
        damped twist as of NOW (one scan staler than the serial path —
        the EMA already lags by construction), and a scan later dropped
        by the time gate simply discards its prefetch. Any error here
        disables pipelining and lets the scan take the serial path, where
        real errors surface with their normal handling."""
        if not (self.params.pipelined_scan_step and self._pipelined_ok
                and self.params.fused_scan_step):
            return
        with self._pending_lock:
            nxt = self._lookahead[0] if self._lookahead else None
        if nxt is None:
            return
        tim2 = float(nxt.get("timestamp", 0.0))
        st = self.state
        try:
            prof = self.profiler
            prof.enter("doProcess.prefetch_ingest")
            raw2 = apply_generators(self.generators, nxt)
            tw = (st.twist_smooth
                  if st.twist_smooth_age <= self.params.deskew_twist_max_age
                  else np.zeros(6))
            mm2, s2 = self._get_filter_step()(
                raw2, jnp.asarray(tw, jnp.float32))
            prof.leave("doProcess.prefetch_ingest")
            self._prefetched = (tim2, mm2, s2)
        except Exception:  # noqa: BLE001 — speculative work only
            self.profiler.leave("doProcess.prefetch_ingest")
            self._pipelined_ok = False
            self._prefetched = None
            self.log.warning(
                "prefetch filter failed; disabling pipelined scan step",
                exc_info=True)

    def _schedule_map_build(self) -> None:
        """Rebuild the local-map aggregate off the pipeline thread.

        One build in flight at a time; a keyframe arriving mid-build marks
        the result dirty and triggers one follow-up build with a fresh
        snapshot. The swap is a single reference assignment; a build whose
        builder was reseeded/reset meanwhile is discarded.
        """
        with self._map_build_lock:
            if self._map_build_inflight:
                self._map_build_dirty = True
                return
            self._map_build_inflight = True
        self._nearby_pool.submit(self._map_build_worker,
                                 self._local_map_builder)

    def _map_build_worker(self, builder) -> None:
        prof = self.profiler
        while True:
            try:
                prof.enter("doProcess.local_map_build_async")
                mm = builder.build(builder.entries())
                prof.leave("doProcess.local_map_build_async")
                # check+swap must be one atomic step under the same lock the
                # reseed/reset paths take, or a stale build can resurrect a
                # map that was just deliberately dropped
                with self._state_lock:
                    if self._local_map_builder is builder:
                        self.state.local_map = mm
            except Exception:
                prof.leave("doProcess.local_map_build_async")
                self.log.warning("async local-map build failed",
                                 exc_info=True)
            handoff = None
            with self._map_build_lock:
                if self._map_build_dirty:
                    self._map_build_dirty = False
                    cur = self._local_map_builder
                    if cur is builder:
                        continue  # one more pass with a fresh snapshot
                    # the rebuild was requested for a builder that replaced
                    # this one mid-build (reseed): hand the in-flight slot
                    # to a worker for the current builder instead of
                    # silently dropping the request
                    handoff = cur
                if handoff is None:
                    self._map_build_inflight = False
            if handoff is not None:  # submit outside the lock
                self._nearby_pool.submit(self._map_build_worker, handoff)
            return

    def _update_deskew_twist(self, dt: float) -> None:
        """Damped deskew twist: EMA over VALIDATED raw estimates plus a
        physical acceleration clamp (see LidarOdometryParameters docs for
        why the raw per-pair twist must not drive motion compensation)."""
        st, pp = self.state, self.params
        if dt > 0 and st.twist_is_good:
            if st.twist_smooth_age > pp.deskew_twist_max_age:
                st.twist_smooth = np.array(st.twist, np.float64)
            else:
                dv = np.array(st.twist, np.float64) - st.twist_smooth
                # the smoothed twist may be several scans stale (age counts
                # consecutive unvalidated estimates); the physically
                # admissible velocity change spans that whole window, so
                # clamping to one dt would over-damp the catch-up step
                # (e.g. real braking during a brief twist outage)
                span = dt * (1 + st.twist_smooth_age)
                np.clip(dv[:3], -pp.deskew_max_accel * span,
                        pp.deskew_max_accel * span, out=dv[:3])
                np.clip(dv[3:], -pp.deskew_max_rot_accel * span,
                        pp.deskew_max_rot_accel * span, out=dv[3:])
                st.twist_smooth = (st.twist_smooth
                                   + pp.deskew_twist_smoothing * dv)
            st.twist_smooth_age = 0
        else:
            st.twist_smooth_age += 1

    def _stages_for(self, kind: AlignKind, for_map: bool):
        """Stage params for an align; map targets get the convergence
        floor (see ``local_map_min_abs_step_trans`` parameter docs)."""
        stages = self.icp_cases[kind]
        if not for_map:
            return stages
        p = self.params
        # the truncating levers only bind when the velocity prior backs
        # them up (see local_map_tight_requires_prior parameter docs);
        # `kind` is already the with/without-vel case split, and is part
        # of the fused-step cache key, so this costs no extra compiles
        tight = (kind == AlignKind.LIDAR_ODOMETRY
                 or not p.local_map_tight_requires_prior)
        out = []
        for s in stages:
            matchers = s.matchers
            if tight and p.local_map_max_match_distance > 0:
                matchers = tuple(dataclasses.replace(
                    m, distance_threshold=min(
                        m.distance_threshold, p.local_map_max_match_distance))
                    for m in matchers)
            if p.local_map_cand_k > 0:
                from ..models.icp import _CAND_KINDS
                matchers = tuple(
                    dataclasses.replace(m, cand_k=p.local_map_cand_k)
                    if m.kind in _CAND_KINDS else m
                    for m in matchers)
            if p.local_map_cand_knn and p.local_map_cand_k > 0:
                from ..models.icp import _CAND_KNN_KINDS
                # knn+3 slack so the between-refresh re-argmin can actually
                # reassign the neighborhood as the pose moves (cand_k == knn
                # would freeze the support set between block heads)
                matchers = tuple(
                    dataclasses.replace(
                        m, cand_k=max(p.local_map_cand_k, m.knn + 3))
                    if m.kind in _CAND_KNN_KINDS else m
                    for m in matchers)
            if p.local_map_nn_backend:
                matchers = tuple(dataclasses.replace(
                    m, nn_backend=p.local_map_nn_backend) for m in matchers)
            solver = s.solver
            step_t = max(s.min_abs_step_trans, p.local_map_min_abs_step_trans)
            step_r = max(s.min_abs_step_rot, p.local_map_min_abs_step_rot)
            if p.local_map_gn_inner > 0 and solver.kind == "gauss_newton":
                # Fewer inner linearizations shrink the per-OUTER step near
                # convergence (each outer step is ~inner/20 of the full GN
                # fixed-point move), so an unscaled min_abs_step terminates
                # the recruiting crawl early (measured: ATE 1.0 -> 1.59 m).
                # Scaling the (floored) thresholds by the same ratio
                # preserves the termination semantics ("the GN fixed point
                # stopped moving") and the outer re-match count.
                ratio = p.local_map_gn_inner / max(solver.max_iterations, 1)
                step_t, step_r = step_t * ratio, step_r * ratio
                solver = dataclasses.replace(
                    solver, max_iterations=p.local_map_gn_inner)
            # module-level cand-motion knobs override only when SET (> 0):
            # 0.0 means "no conditional refresh configured here", and a
            # stage's own YAML candidateCacheMinMotion* must survive it
            repl = dict(
                matchers=matchers,
                solver=solver,
                min_abs_step_trans=step_t,
                min_abs_step_rot=step_r)
            if p.local_map_quality_max_points > 0:
                # statistics, not truncation: applied to BOTH align kinds.
                # A stage's own (tighter) max_points survives the module
                # knob — min of the two, with 0 meaning "unlimited".
                repl["quality"] = tuple(
                    dataclasses.replace(
                        q, max_points=(p.local_map_quality_max_points
                                       if q.max_points == 0 else
                                       min(q.max_points,
                                           p.local_map_quality_max_points)))
                    for q in s.quality)
            if tight and p.local_map_max_iterations > 0:
                repl["max_iterations"] = min(
                    s.max_iterations, p.local_map_max_iterations)
            if p.local_map_cand_motion_trans > 0:
                repl["cand_refresh_min_trans"] = p.local_map_cand_motion_trans
            if p.local_map_cand_motion_rot > 0:
                repl["cand_refresh_min_rot"] = p.local_map_cand_motion_rot
            out.append(dataclasses.replace(s, **repl))
        return tuple(out)

    def _align_core(self, kind: AlignKind, for_map: bool):
        """Traceable align body shared by the one-dispatch fused step and
        the pipelined align step: coarse-to-fine align (optionally TP-
        sharded over the mesh "model" axis) plus the in-loop two-pass
        deskew refinement. Returns (core_fn, cache_key); ``core_fn(mm,
        last_map, guess_R, guess_t, twist, prev_R, prev_t, dt) -> (mm,
        ICPResult)``."""
        stages = self._stages_for(kind, for_map)
        pp = self.params
        # TP over the mesh "model" axis (VERDICT r3 #5): the map-align
        # TARGET (the 32k-cap rolling local map) is sharded on its point
        # axis; matching runs the tp_* collective paths (ops/matching.py)
        # over ICI inside the SAME fused one-dispatch program.
        tp_mesh = (self._mesh if for_map and self._mesh is not None
                   and pp.mesh_model > 1 else None)
        two_pass_cfg = (pp.deskew_in_loop, pp.deskew_refine_iters,
                        pp.deskew_refine_min_quality, for_map,
                        pp.max_sensor_speed, pp.max_sensor_rot_rate,
                        pp.deskew_refine_rounds)
        from ..filters.pipeline import FilterDeskew, delta_redeskew
        from ..models.icp import align_pipeline as _align_pipeline
        filters = tuple(self.filter_pipeline.filters)
        dsk = next((f for f in filters if isinstance(f, FilterDeskew)), None)
        two_pass = pp.deskew_in_loop and dsk is not None
        dsk_cfg = (None if dsk is None
                   else (dsk.scan_period, dsk.anchor == "end"))
        key = (stages, two_pass_cfg, dsk_cfg,
               None if tp_mesh is None else
               (tuple(tp_mesh.axis_names), tp_mesh.devices.shape,
                tuple(d.id for d in tp_mesh.devices.flat)))
        if two_pass:
            refine_stages = (dataclasses.replace(
                stages[-1], max_iterations=pp.deskew_refine_iters),)
        min_q = pp.deskew_refine_min_quality
        max_v, max_w = pp.max_sensor_speed, pp.max_sensor_rot_rate

        if tp_mesh is None:
            _run_align = _align_pipeline
        else:
            from jax.sharding import PartitionSpec as _P
            stages = tuple(dataclasses.replace(s, shard_axis="model")
                           for s in stages)
            if two_pass:
                refine_stages = tuple(dataclasses.replace(
                    s, shard_axis="model") for s in refine_stages)

            def _point_spec(x):
                if x.ndim == 0:
                    return _P()
                return _P(*(["model"] + [None] * (x.ndim - 1)))

            def _run_align(src_mm, tgt_mm, pose, sts):
                in_specs = (jax.tree.map(lambda x: _P(), src_mm),
                            jax.tree.map(_point_spec, tgt_mm),
                            jax.tree.map(lambda x: _P(), pose))
                return jax.shard_map(
                    lambda s, t, g: _align_pipeline(s, t, g, sts),
                    mesh=tp_mesh, in_specs=in_specs, out_specs=_P(),
                    check_vma=False)(src_mm, tgt_mm, pose)

        def core(mm, last_map, guess_R, guess_t, twist, prev_R, prev_t, dt):
            res = _run_align(mm, last_map, se3.Pose(guess_R, guess_t),
                             stages)
            if two_pass:
                # twist IMPLIED by this scan's own alignment (zero lag):
                # rel motion over dt, through log, physically clamped.
                # Iterated: the implied twist from a pass aligned on a
                # mis-warped cloud is itself biased; a couple of unrolled
                # rounds converge to the joint (pose, twist) fixed point.
                xi_cur = twist
                for _round in range(pp.deskew_refine_rounds):
                    rel = res.pose
                    if for_map:  # res is a WORLD pose; rel = prev⁻¹ ∘ res
                        rel = se3.compose(
                            se3.inverse(se3.Pose(prev_R, prev_t)), res.pose)
                    xi = se3.log(rel) / jnp.maximum(dt, 1e-3)
                    xi = jnp.concatenate([jnp.clip(xi[:3], -max_v, max_v),
                                          jnp.clip(xi[3:], -max_w, max_w)])
                    ok = ((res.quality >= min_q) & (dt > 1e-3)
                          & jnp.all(jnp.isfinite(xi)))
                    # gated to the current twist: delta_redeskew(ξ→ξ) is
                    # the identity warp and the re-align converges in ~1
                    # iter, so a gated round costs little
                    xi_new = jnp.where(ok, xi, xi_cur)
                    mm = {name: (delta_redeskew(pc, xi_cur, xi_new,
                                                dsk.scan_period,
                                                dsk.anchor == "end")
                                 if "time" in pc.attrs else pc)
                          for name, pc in mm.items()}
                    res = _run_align(mm, last_map, res.pose, refine_stages)
                    xi_cur = xi_new
            return mm, res

        return core, key

    def _filter_core(self):
        """Traceable filter body: raw layers -> filtered layers + the
        (total, finite) sanity reduction."""
        from ..filters.pipeline import FilterDeskew
        filters = tuple(self.filter_pipeline.filters)

        def core(raw_map, twist):
            mm = raw_map
            for f in filters:
                if isinstance(f, FilterDeskew):
                    mm = f(mm, twist=twist)
                else:
                    mm = f(mm)
            # sanity reduction (finite + populated), packed with the result
            total = jnp.zeros((), jnp.float32)
            finite = jnp.ones((), jnp.float32)
            for pc in mm.values():
                total = total + jnp.sum(pc.mask)
                finite = finite * jnp.isfinite(
                    jnp.sum(jnp.where(pc.mask[..., None] > 0.5, pc.xyz, 0.0))
                ).astype(jnp.float32)
            return mm, jnp.stack([total, finite])

        return core

    def _get_fused_step(self, kind: AlignKind, for_map: bool = False):
        """One jitted program per (filters, params): filter pipeline + ICP +
        sanity reduction + result packing — ONE device dispatch and ONE
        readback per scan. Cached globally by configuration so fresh module
        instances never recompile."""
        align_core, align_key = self._align_core(kind, for_map)
        key = ("fused", _filters_cache_key(self.filter_pipeline.filters),
               align_key)
        if key in _FUSED_STEP_CACHE:
            return _FUSED_STEP_CACHE[key]
        filter_core = self._filter_core()

        @jax.jit
        def step(raw_map, last_map, guess_R, guess_t, twist,
                 prev_R, prev_t, dt):
            mm, sanity = filter_core(raw_map, twist)
            mm, res = align_core(mm, last_map, guess_R, guess_t, twist,
                                 prev_R, prev_t, dt)
            flat = jnp.concatenate([_pack_icp_result(res), sanity])
            return mm, flat

        _FUSED_STEP_CACHE[key] = step
        return step

    def _get_filter_step(self):
        """Pipelined mode, dispatch #1: filter pipeline + sanity, jitted.
        Kind-independent (the filters don't depend on the align case), so
        one program serves every scan."""
        key = ("filter", _filters_cache_key(self.filter_pipeline.filters))
        if key in _FUSED_STEP_CACHE:
            return _FUSED_STEP_CACHE[key]
        filter_core = self._filter_core()
        step = jax.jit(filter_core)
        _FUSED_STEP_CACHE[key] = step
        return step

    def _get_align_step(self, kind: AlignKind, for_map: bool = False):
        """Pipelined mode, dispatch #2: align a PRE-FILTERED cloud (the
        prefetched output of :meth:`_get_filter_step`) and pack the result
        with the passed-through sanity reduction — the readback-bearing
        half of the split scan step."""
        align_core, align_key = self._align_core(kind, for_map)
        key = ("align", align_key)
        if key in _FUSED_STEP_CACHE:
            return _FUSED_STEP_CACHE[key]

        @jax.jit
        def step(mm, last_map, guess_R, guess_t, twist,
                 prev_R, prev_t, dt, sanity):
            mm, res = align_core(mm, last_map, guess_R, guess_t, twist,
                                 prev_R, prev_t, dt)
            flat = jnp.concatenate([_pack_icp_result(res), sanity])
            return mm, flat

        _FUSED_STEP_CACHE[key] = step
        return step

    @staticmethod
    def _cloud_is_sane(mm: MetricMap, min_points: int = 10) -> bool:
        total = 0
        for pc in mm.values():
            masked_sum = float(jnp.sum(jnp.where(pc.mask[..., None] > 0.5,
                                                 pc.xyz, 0.0)))
            if not np.isfinite(masked_sum):
                return False
            total += int(pc.count())
        return total >= min_points

    # ------------------------------------------------------------------
    def _create_keyframe(self, tim: float, points: MetricMap) -> None:
        """KF proposal + annotations + odometry factor (reference :342-475)."""
        st = self.state
        prof = self.profiler
        kf_id = None
        if self.slam_backend is not None:
            prof.enter("doProcess.addKeyFrame")
            out = self.slam_backend.add_keyframe(
                ProposeKFInput(timestamp=tim)).result()  # blocking .get() (ref :362)
            prof.leave("doProcess.addKeyFrame")
            if not out.success:
                self.log.error("addKeyFrame failed")
                return
            kf_id = out.new_kf_id
        else:
            kf_id = (st.last_kf + 1) if st.last_kf is not None else 0

        wm = self.worldmodel
        if wm is not None:
            with wm.lock_for_write():
                wm.add_entity(kf_id)
                # store the filtered layered cloud (reference :384-388;
                # raw obs intentionally NOT attached, ref :349-354)
                wm.annotate(kf_id, ANNOTATION_NAME_PC_LAYERS, points)
                # render decoration every Nth KF (reference :390-426)
                if st.kf_decor_counter % self.params.viz_decor_decimation == 0:
                    decor_layer = points.get("decimated") or next(iter(points.values()))
                    wm.annotate(kf_id, ANNOTATION_NAME_RENDER_DECORATION, {
                        "points": np.asarray(decor_layer.xyz),
                        "mask": np.asarray(decor_layer.mask),
                        "point_size": self.params.viz_decor_pointsize,
                    })
                st.kf_decor_counter += 1

        if st.last_kf is not None:
            rel = _jx_pose(st.accum_since_last_kf_R, st.accum_since_last_kf_t)
            f = FactorRelativePose3(kf_from=st.last_kf, kf_to=kf_id, rel_pose=rel)
            if self.slam_backend is not None:
                self.slam_backend.add_factor(f).result()  # blocking (ref :451)
            if wm is not None:
                wm.add_neighbors(st.last_kf, kf_id)
            with self._state_lock:
                st.local_pose_graph.insert_edge(
                    st.last_kf, kf_id,
                    st.accum_since_last_kf_R, st.accum_since_last_kf_t)
                st.edge_log.append((st.last_kf, kf_id,
                                    st.accum_since_last_kf_R.copy(),
                                    st.accum_since_last_kf_t.copy()))
        else:
            with self._state_lock:
                st.local_pose_graph.insert_node(kf_id)

        self.log.info("New KF #%s (dist=%.2fm)", kf_id,
                      float(np.linalg.norm(st.accum_since_last_kf_t)))
        st.accum_since_last_kf_R = np.eye(3)
        st.accum_since_last_kf_t = np.zeros(3)
        st.last_kf = kf_id

        if self.params.odometry_reference == "local_map":
            # fold this keyframe into the rolling map target. The ADD is a
            # cheap host copy; the aggregate REBUILD (~0.5 s of np.unique
            # at full scale) runs on the nearby pool and atomically swaps
            # st.local_map when done — scanning continues against the
            # previous map (at most one keyframe stale, window >= 10).
            if self._local_map_builder is None:
                self._local_map_builder = self._make_map_builder()
            self._local_map_builder.add_keyframe(
                points, (st.world_R, st.world_t))
            if st.local_map is None or not self.params.local_map_async_build:
                # first map must exist before the next scan: build inline
                prof.enter("doProcess.local_map_build")
                st.local_map = self._local_map_builder.build()
                prof.leave("doProcess.local_map_build")
            else:
                self._schedule_map_build()

    # ------------------------------------------------------------------
    # nearby-KF / loop-closure search (reference checkForNearbyKFs :516-744)
    # ------------------------------------------------------------------
    def check_for_nearby_kfs(self) -> None:
        st = self.state
        p = self.params
        prof = self.profiler
        prof.enter("checkForNearbyKFs")
        try:
            with self._state_lock:
                if st.last_kf is None:
                    return
                poses, topo = st.local_pose_graph.dijkstra_nodes_estimate(st.last_kf)
                # prune local graph (reference :557-569)
                if len(st.local_pose_graph) > p.max_KFs_local_graph:
                    by_dist = sorted(
                        ((np.linalg.norm(t_), n) for n, (R_, t_) in poses.items()),
                        reverse=True)
                    for _, victim in by_dist[: len(st.local_pose_graph)
                                             - p.max_KFs_local_graph]:
                        st.local_pose_graph.remove_node(victim)

            d_max = max(p.max_dist_to_loop_closure, p.max_dist_to_matching)
            nearby: List[Tuple[float, int, np.ndarray, np.ndarray]] = []
            lc_best: Optional[Tuple[float, int, np.ndarray, np.ndarray]] = None
            wm = self.worldmodel

            for node, (R_, t_) in poses.items():
                if node == st.last_kf:
                    continue
                d = float(np.linalg.norm(t_))
                if d < p.min_dist_to_matching or d > d_max:
                    continue  # window (reference :574-576)
                is_lc = topo.get(node, 0) >= p.min_topo_dist_to_consider_loopclosure
                if not is_lc and d > p.max_dist_to_matching:
                    continue  # (reference :592-594)
                pair = (min(node, st.last_kf), max(node, st.last_kf))
                with self._state_lock:
                    if pair in st.checked_KF_pairs:
                        continue
                    # dedup on existing edge — the reference intended this
                    # but its flag was inverted (:620-627); fixed here
                    if st.local_pose_graph.has_edge(*pair):
                        continue
                if wm is not None and node in wm.entity_neighbors(st.last_kf):
                    continue
                if wm is None or not wm.has_annotation(node, ANNOTATION_NAME_PC_LAYERS):
                    continue
                if is_lc:
                    if lc_best is None or d < lc_best[0]:
                        lc_best = (d, node, R_, t_)
                else:
                    nearby.append((d, node, R_, t_))

            # decimate nearby checks (reference :704-722)
            nearby.sort()
            if len(nearby) > p.max_nearby_align_checks:
                stride = max(1, len(nearby) // p.max_nearby_align_checks)
                nearby = nearby[::stride][: p.max_nearby_align_checks]

            jobs = []
            with self._state_lock:
                for d, node, R_, t_ in nearby:
                    st.checked_KF_pairs.add((min(node, st.last_kf),
                                             max(node, st.last_kf)))
                    jobs.append(("nearby", d, node, R_, t_))
                if lc_best is not None:
                    d, node, R_, t_ = lc_best
                    st.checked_KF_pairs.add((min(node, st.last_kf),
                                             max(node, st.last_kf)))
                    jobs.append(("lc", d, node, R_, t_))

            current_kf = st.last_kf
            nearby_jobs = [(n, R_, t_) for k, d, n, R_, t_ in jobs if k == "nearby"]
            lc_jobs = [(n, R_, t_) for k, d, n, R_, t_ in jobs if k == "lc"]
            if nearby_jobs:
                self.log.info("nearby batch: KF %s vs %s",
                              current_kf, [n for n, *_ in nearby_jobs])
                with self._pending_lock:
                    self._nearby_inflight += 1
                self._nearby_pool.submit(
                    self._check_nearby_batch_safe, current_kf, nearby_jobs)
            for node, R_, t_ in lc_jobs:
                self.log.info("LC check: KF %s <-> %s", current_kf, node)
                with self._pending_lock:
                    self._nearby_inflight += 1
                self._nearby_pool.submit(
                    self._check_non_adjacent_safe, "lc", current_kf, node, R_, t_)
        finally:
            prof.leave("checkForNearbyKFs")

    def _check_nearby_batch_safe(self, cur_kf, jobs):
        try:
            self._check_nearby_batch(cur_kf, jobs)
        except Exception:  # noqa: BLE001
            self.log.exception("exception in nearby batch check")
        finally:
            with self._pending_lock:
                self._nearby_inflight -= 1

    def _dp_shard(self, batched_tree, replicated_tree):
        """DP-shard a batch over the mesh "data" axis (VERDICT r3 #5).

        With an active mesh this lays the leading batch axis of
        ``batched_tree`` across the "data" axis and replicates
        ``replicated_tree``; jit adopts the input shardings, so the SAME
        cached vmapped program runs one batch lane per device (the chip
        analogue of the reference's thread fan-out, reference
        src/LidarOdometry.cpp:94-96, :708-741). No mesh = no-op.
        """
        if self._mesh is None or self.params.mesh_data <= 1:
            return batched_tree, replicated_tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_sh = NamedSharding(self._mesh, P("data"))
        repl_sh = NamedSharding(self._mesh, P())
        return (jax.device_put(batched_tree, data_sh),
                jax.device_put(replicated_tree, repl_sh))

    def _dp_pad(self, n: int) -> int:
        """Round a batch size up to a multiple of the data-axis size."""
        d = self.params.mesh_data if self._mesh is not None else 1
        return -(-n // max(d, 1)) * max(d, 1)

    def _check_nearby_batch(self, cur_kf, jobs):
        """All nearby-align candidates of one scan as ONE vmapped dispatch.
        Pads the batch to ``max_nearby_align_checks`` so a single program
        shape serves every scan."""
        wm = self.worldmodel
        cur_pc = wm.annotation(cur_kf, ANNOTATION_NAME_PC_LAYERS)
        if cur_pc is None:
            return
        clouds, keep = [], []
        for node, R_, t_ in jobs:
            pc = wm.annotation(node, ANNOTATION_NAME_PC_LAYERS)
            if pc is not None:
                clouds.append(pc)
                keep.append((node, R_, t_))
        if not clouds:
            return
        k_real = len(clouds)
        dec = self.params.nearby_decimate
        # src side only — the target (cur_pc) keeps full density so the
        # paired-ratio goodness scale matches the min_icp_goodness
        # calibration (see the nearby_decimate parameter docs)
        clouds = [_decimate_layers(c, dec) for c in clouds]
        k_pad = self._dp_pad(max(1, self.params.max_nearby_align_checks))
        while len(clouds) < k_pad:
            clouds.append(clouds[0])
        clouds = clouds[:k_pad]
        keep = keep[:k_pad]
        try:
            to_pcs = jax.tree.map(lambda *x: jnp.stack(x), *clouds)
        except (ValueError, TypeError):
            # heterogeneous layer structure: fall back to per-pair checks
            for node, R_, t_ in keep[:k_real]:
                self._check_non_adjacent("nearby", cur_kf, node, R_, t_)
            return
        gRs = jnp.stack([jnp.asarray(R_, jnp.float32) for _, R_, _ in keep]
                        + [jnp.eye(3)] * (k_pad - len(keep)))
        gts = jnp.stack([jnp.asarray(t_, jnp.float32) for _, _, t_ in keep]
                        + [jnp.zeros(3)] * (k_pad - len(keep)))
        stages = self._nearby_stages()
        (to_pcs, gRs, gts), cur_pc_d = self._dp_shard(
            (to_pcs, gRs, gts), cur_pc)
        prof = self.profiler
        prof.enter("checkNonAdjacent.nearby_batch_align")
        try:
            flats = np.asarray(_get_packed_batch_align(stages)(
                to_pcs, cur_pc_d, gRs, gts))  # one readback for the whole batch
        finally:
            prof.leave("checkNonAdjacent.nearby_batch_align")
        for i in range(k_real):
            node, R_, t_ = keep[i]
            out = _unpack_icp_result(flats[i])
            self._accept_non_adjacent("nearby", cur_kf, node, R_, t_, out.goodness,
                                      out.found_pose_to_wrt_from)

    def _nearby_stages(self):
        """NEARBY_ALIGN stages with the candidate cache applied.

        ``nearby_cand_k > 0`` patches ``cand_k`` onto the matcher kinds that
        support it (bit-identical edge decisions on the 500-scan HDL-64
        replay; the batches otherwise queue behind the scan pipeline on the
        single chip). Loop-closure stages are never patched — the MC wide-
        basin search needs the unrestricted NN pull.
        """
        stages = self.icp_cases[AlignKind.NEARBY_ALIGN]
        p = self.params
        if p.nearby_cand_k > 0:
            from ..models.icp import _CAND_KINDS
            stages = tuple(dataclasses.replace(s, matchers=tuple(
                dataclasses.replace(mm, cand_k=p.nearby_cand_k)
                if mm.kind in _CAND_KINDS else mm for mm in s.matchers))
                for s in stages)
        if p.nearby_cand_knn and p.nearby_cand_k > 0:
            from ..models.icp import _CAND_KNN_KINDS
            stages = tuple(dataclasses.replace(s, matchers=tuple(
                dataclasses.replace(
                    mm, cand_k=max(p.nearby_cand_k, mm.knn + 3))
                if mm.kind in _CAND_KNN_KINDS else mm for mm in s.matchers))
                for s in stages)
        if p.nearby_max_iterations > 0:
            stages = tuple(dataclasses.replace(
                s, max_iterations=min(s.max_iterations,
                                      p.nearby_max_iterations))
                for s in stages)
        return stages

    def _lc_gate(self) -> float:
        """Loop-closure goodness gate — fixed, or auto-calibrated from the
        accepted nearby-align goodness distribution on the same map (see
        ``min_icp_goodness_lc_auto`` parameter docs)."""
        p = self.params
        if not p.min_icp_goodness_lc_auto:
            return p.min_icp_goodness_lc
        vals = list(self._nearby_goodness)
        if len(vals) < 8:
            return p.min_icp_goodness_lc  # not enough evidence yet
        gate = float(np.clip(0.9 * np.quantile(vals, 0.25), 0.40, 0.75))
        self.log.debug("auto LC gate: %.3f (from %d nearby accepts)",
                       gate, len(vals))
        return gate

    def _make_map_builder(self):
        """A fresh rolling-map builder at the module's configuration.

        Every targeted layer gets the full map density — matcher targets
        because sparse targets misregister, and quality targets because
        the paired-ratio scale depends on target density: squeezing the
        quality layer to scan density deflated goodness 0.82 -> 0.63 and
        misfired the weak-align gate on 133/500 scans (measured). Quality
        costs ONE NN pass per align (models/icp.py evaluates it once,
        post-loop), so density there is nearly free."""
        from .local_map import DeviceLocalMap, LocalMap

        keep = set()
        for kind in (AlignKind.LIDAR_ODOMETRY, AlignKind.NEARBY_ALIGN):
            for stage in self.icp_cases.get(kind, ()):
                for mt in stage.matchers:
                    keep.add(mt.tgt_layer)
                for q in stage.quality:
                    keep.add(q.tgt_layer)
        if (self.params.local_map_device_build
                and self.params.local_map_min_views <= 1):
            return DeviceLocalMap(
                window=self.params.local_map_keyframes,
                capacity_mult=self.params.local_map_capacity_mult,
                dedup_voxel=self.params.local_map_dedup_voxel,
                keep_layers=keep or None,
                mode=self.params.local_map_build_mode)
        return LocalMap(
            window=self.params.local_map_keyframes,
            capacity_mult=self.params.local_map_capacity_mult,
            dedup_voxel=self.params.local_map_dedup_voxel,
            keep_layers=keep or None,
            transient_min_views=self.params.local_map_min_views,
            transient_protect_recent=self.params.local_map_protect_recent,
            transient_voxel=(self.params.local_map_transient_voxel
                             or None))

    def warm_start(self, obs: RawObservation) -> float:
        """Compile/load every PRIMARY per-scan program before the online
        pipeline starts, shaped by a sample observation (VERDICT r4 #6).

        The reference front-end is ahead-of-time-compiled C++ — its first
        scan runs at full speed. Through the remote TPU compiler our
        primary programs (filter, the four align kinds x target modes, the
        map build) otherwise compile at FIRST USE, stalling the online
        pipeline for minutes of time-to-first-good-pose. This method runs
        each of them once on the sample scan (values are irrelevant,
        static shapes are what compile) and discards all results; with the
        persistent compile cache (utils/compile_cache.py, on by default in
        the runner) a warm disk cache turns every compile into a load and
        the whole call takes seconds. Returns the wall seconds spent.

        Rare-path programs (s2s fallback, nearby/LC batches) stay on the
        background ``precompile_rare_paths`` thread — they are not needed
        for the first scans.
        """
        import time as _time

        t0 = _time.monotonic()
        raw = apply_generators(self.generators, obs)
        tw = jnp.zeros(6, jnp.float32)
        eyeR = jnp.eye(3, dtype=jnp.float32)
        zt = jnp.zeros(3, jnp.float32)
        use_map = self.params.odometry_reference == "local_map"
        mm, sanity = self._get_filter_step()(raw, tw)
        np.asarray(sanity)
        targets = [(False, mm)]
        if use_map:
            b = self._make_map_builder()
            b.add_keyframe(mm, (np.eye(3), np.zeros(3)))
            tgt = b.build()  # warms the map-build program too
            np.asarray(next(iter(tgt.values())).mask.sum())
            targets.append((True, tgt))
        for for_map, tgt in targets:
            for kind in (AlignKind.LIDAR_ODOMETRY, AlignKind.NEARBY_ALIGN):
                args = (tgt, eyeR, zt, tw, eyeR, zt, jnp.float32(0.1))
                if self.params.pipelined_scan_step:
                    _, flat = self._get_align_step(kind, for_map)(
                        mm, *args, sanity)
                else:
                    _, flat = self._get_fused_step(kind, for_map)(
                        raw, *args)
                np.asarray(flat)
        dt = _time.monotonic() - t0
        self.log.info("warm_start: primary programs ready in %.1f s", dt)
        return dt

    def _lc_submap_builder(self):
        """A fresh DeviceLocalMap configured for the LC submap target —
        shared by the production build and the warm-up (the keep-layer set
        and window must match exactly or the warmed program shape differs
        from the production one)."""
        from .local_map import DeviceLocalMap

        p = self.params
        keep = set()
        for stage in self.icp_cases[AlignKind.LOOP_CLOSURE]:
            for mt in stage.matchers:
                keep.add(mt.tgt_layer)
            for q in stage.quality:
                keep.add(q.tgt_layer)
        return DeviceLocalMap(
            window=2 * p.lc_submap_keyframes + 1,  # fixed slots: one shape
            capacity_mult=p.lc_submap_capacity_mult,
            dedup_voxel=p.local_map_dedup_voxel,
            keep_layers=keep or None,
            mode=p.local_map_build_mode)

    def _build_lc_submap(self, center_kf: int) -> Optional[MetricMap]:
        """Multi-keyframe loop-closure target: aggregate the candidate
        keyframe and its ``lc_submap_keyframes``-topo-distance graph
        neighbors in the candidate's frame (``lc_submap_keyframes`` docs;
        beyond reference parity — the reference fetches single stored KF
        clouds only, reference src/LidarOdometry.cpp:645-669)."""
        p = self.params
        st = self.state
        wm = self.worldmodel
        if wm is None:
            return None
        K = p.lc_submap_keyframes
        with self._state_lock:
            try:
                poses, topo = st.local_pose_graph.dijkstra_nodes_estimate(
                    center_kf)
            except Exception:  # noqa: BLE001 — detached node etc.
                return None
        picks = [center_kf]
        for d, n in sorted((topo.get(n, 10**9), n) for n in poses
                           if n != center_kf):
            if d > K or len(picks) >= 2 * K + 1:
                break
            picks.append(n)
        builder = self._lc_submap_builder()
        n_added = 0
        for n in picks:
            pc = wm.annotation(n, ANNOTATION_NAME_PC_LAYERS)
            if pc is None:
                continue
            R, t = ((np.eye(3), np.zeros(3)) if n == center_kf
                    else poses[n])  # pose of n in the candidate's frame
            builder.add_keyframe(pc, (R, t))
            n_added += 1
        if n_added == 0:
            return None
        return builder.build()

    def _check_non_adjacent_safe(self, kind, cur_kf, other_kf, R_, t_):
        try:
            self._check_non_adjacent(kind, cur_kf, other_kf, R_, t_)
        except Exception:  # noqa: BLE001
            self.log.exception("exception in non-adjacent KF check")
        finally:
            with self._pending_lock:
                self._nearby_inflight -= 1

    def _check_non_adjacent(self, kind: str, cur_kf: int, other_kf: int,
                            R_: np.ndarray, t_: np.ndarray) -> None:
        """Nearby-align / loop-closure worker (reference
        doCheckForNonAdjacentKFs :746-849)."""
        st = self.state
        p = self.params
        wm = self.worldmodel
        cur_pc = wm.annotation(cur_kf, ANNOTATION_NAME_PC_LAYERS)
        oth_pc = wm.annotation(other_kf, ANNOTATION_NAME_PC_LAYERS)
        if cur_pc is None or oth_pc is None:
            return
        init = _jx_pose(R_, t_)  # pose of other in frame of current

        if kind == "lc":
            # Monte-Carlo perturbations — ONE vmapped batch (+ one packed
            # readback) instead of the reference's sequential 10 aligns
            # (:767-787)
            sigma_xyz = 0.1 * p.max_dist_to_loop_closure
            sigma_rot = 2.0 * DEG2RAD
            # read-modify-write under the lock: two concurrent LC checks on
            # the 2-worker nearby pool must not reuse a seed
            with self._state_lock:
                st.mc_seed += 1
                mc_seed = st.mc_seed
            # on a data mesh the sample count rounds UP to fill every
            # device lane — extra Monte-Carlo coverage, not padding waste
            n_mc = self._dp_pad(p.loop_closure_montecarlo_samples)
            lc_stages = self.icp_cases[AlignKind.LOOP_CLOSURE]
            submap = (self._build_lc_submap(other_kf)
                      if p.lc_submap_keyframes > 0 else None)
            if submap is not None:
                # scan-vs-submap: align the CURRENT scan (src, one lane
                # per MC guess) onto the multi-keyframe aggregate around
                # the candidate (tgt, candidate frame); the guess is the
                # pose of current in the candidate's frame
                Ri, ti = se3_np.inverse((np.asarray(R_, float),
                                         np.asarray(t_, float)))
                center = _jx_pose(Ri, ti)
                src_pc, tgt_pc = cur_pc, submap
            else:
                center, src_pc, tgt_pc = init, oth_pc, cur_pc
            guesses = monte_carlo_guesses(
                jax.random.key(mc_seed), center, n_mc, sigma_xyz, sigma_rot)
            to_batch = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n_mc, *x.shape)), src_pc)
            (to_batch, gR, gt_), tgt_d = self._dp_shard(
                (to_batch, guesses.R, guesses.t), tgt_pc)
            flats = np.asarray(_get_packed_batch_align(lc_stages)(
                to_batch, tgt_d, gR, gt_))
            best = int(np.argmax(flats[:, 48]))
            out = _unpack_icp_result(flats[best])
            goodness, pose = out.goodness, out.found_pose_to_wrt_from
            if submap is not None:
                # result maps current -> candidate; the factor/edge wants
                # the pose of the candidate in the current KF's frame
                Rn, tn = se3_np.inverse(_np_pose(pose))
                pose = _jx_pose(Rn, tn)
            min_goodness = self._lc_gate()
        else:
            # same patched stages + decimation as the batch path
            # (_nearby_stages applies the candidate cache) so the per-pair
            # fallback makes identical edge decisions (review finding)
            dec = self.params.nearby_decimate
            out = self.run_one_icp(ICPInput(
                align_kind=AlignKind.NEARBY_ALIGN, to_id=other_kf, from_id=cur_kf,
                to_pc=_decimate_layers(oth_pc, dec),
                from_pc=cur_pc,  # target keeps full density (goodness scale)
                init_guess_to_wrt_from=init,
                debug_str="nearby"), stages=self._nearby_stages())
            goodness, pose = out.goodness, out.found_pose_to_wrt_from
            min_goodness = p.min_icp_goodness

        self._accept_non_adjacent(kind, cur_kf, other_kf, R_, t_, goodness, pose,
                                  min_goodness=min_goodness)

    def _accept_non_adjacent(self, kind, cur_kf, other_kf, R_, t_, goodness,
                             pose, min_goodness=None):
        """Acceptance gate + factor/edge emission (reference :794-843)."""
        p = self.params
        st = self.state
        wm = self.worldmodel
        if min_goodness is None:
            min_goodness = (self._lc_gate() if kind == "lc"
                            else p.min_icp_goodness)
        # acceptance gate (reference :794-816) — host math in numpy
        Rp, tp_ = _np_pose(pose)
        Ri, ti = se3_np.inverse((np.asarray(R_, float), np.asarray(t_, float)))
        corr = float(np.linalg.norm(se3_np.compose((Ri, ti), (Rp, tp_))[1]))
        init_norm = max(float(np.linalg.norm(t_)), 0.1)
        accept = goodness >= min_goodness and (
            kind == "lc" or corr < p.max_correction_ratio * init_norm)
        self.profiler.register_user_measure(
            f"checkNonAdjacent.{kind}.goodness", goodness)
        # accepted is 1/0 per CHECK: counter count = checks, total = accepts
        # (the end-to-end loop-closure audit reads these; VERDICT r3 #2)
        self.profiler.register_user_measure(
            f"checkNonAdjacent.{kind}.accepted", float(accept))
        if not accept:
            self.log.info("%s rejected: KF %s <-> %s goodness=%.2f corr=%.2fm",
                          kind, cur_kf, other_kf, goodness, corr)
            return
        if kind == "nearby":
            # evidence stream for the auto loop-closure gate (_lc_gate)
            self._nearby_goodness.append(float(goodness))

        Rn, tn = _np_pose(pose)
        f = FactorRelativePose3(kf_from=cur_kf, kf_to=other_kf, rel_pose=pose)
        if self.slam_backend is not None:
            self.slam_backend.add_factor(f).result()
        if wm is not None:
            wm.add_neighbors(cur_kf, other_kf)
        with self._state_lock:
            st.local_pose_graph.insert_edge(cur_kf, other_kf, Rn, tn)
            st.edge_log.append((cur_kf, other_kf, Rn.copy(), tn.copy()))
            if kind == "lc":
                st.lc_pairs.append((cur_kf, other_kf))
        self.log.info("%s ACCEPTED: KF %s <-> %s goodness=%.2f",
                      "loop closure" if kind == "lc" else "nearby edge",
                      cur_kf, other_kf, goodness)

    # ------------------------------------------------------------------
    # the compute seam (reference run_one_icp :851-895)
    # ------------------------------------------------------------------
    def run_one_icp(self, inp: ICPInput, stages=None) -> ICPOutput:
        if stages is None:
            stages = self.icp_cases[inp.align_kind]
        prof = self.profiler
        prof.enter(f"run_one_icp.{inp.debug_str or inp.align_kind.value}")
        try:
            f = _get_packed_align(stages)
            g = inp.init_guess_to_wrt_from
            flat = np.asarray(f(
                inp.to_pc, inp.from_pc,
                jnp.asarray(g.R, jnp.float32), jnp.asarray(g.t, jnp.float32)))
            return _unpack_icp_result(flat)
        finally:
            prof.leave(f"run_one_icp.{inp.debug_str or inp.align_kind.value}")

    # ------------------------------------------------------------------
    def drain(self, timeout: float = 600.0) -> int:
        """Block until queued scans and nearby checks finish (test/replay
        aid). Times out softly — a straggler loop-closure job logs a warning
        instead of raising (first-compile of the MC batch can be slow) —
        but the leak is ACCOUNTED: the number of jobs still in flight at
        timeout is returned, recorded as the ``drain.jobs_abandoned``
        profiler counter, and surfaced by the replay runner, so a replay
        that ends this way cannot silently lose factors (VERDICT r2 #8;
        reference worker fan-in /root/reference/src/LidarOdometry.cpp:818-830
        joins unconditionally — we match that accounting, not the hang)."""
        import time as _time
        t0 = _time.monotonic()
        abandoned = 0
        while _time.monotonic() - t0 < timeout:
            with self._pending_lock:
                if self._pending == 0 and self._nearby_inflight == 0:
                    break
            _time.sleep(0.005)
        else:
            with self._pending_lock:
                abandoned = self._pending + self._nearby_inflight
            self.log.warning(
                "drain(): %d nearby/LC jobs still running at timeout",
                abandoned)
        self.profiler.register_user_measure("drain.jobs_abandoned", abandoned)
        return abandoned

    def shutdown(self) -> None:
        self._shutting_down = True
        self._pipeline_pool.shutdown(wait=True)
        self._nearby_pool.shutdown(wait=True)
        # join the warm thread (bounded): letting a daemon thread die
        # mid-dispatch at interpreter exit wedges the next process's TPU
        # claim for minutes (CLAUDE.md environment notes); the warm loop
        # checks _shutting_down between dispatches, so this returns after
        # at most one in-flight program
        wt = getattr(self, "_warm_thread", None)
        if wt is not None and wt.is_alive():
            wt.join(timeout=120.0)
            if wt.is_alive():
                self.log.warning(
                    "warm-up thread still running after 120 s join timeout")
