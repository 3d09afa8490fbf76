"""Regression tests for round-2 fixes (VERDICT.md weak #6/#8, ADVICE.md).

Covers: distant-voxel covariance accuracy, deep state_copy snapshots,
per-AlignKind fused-step fallback (+ error propagation), 0-based timestamp
twist updates, checkpoint graph-root restore, and unbiased localizer map
aggregation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.cloud.voxel import lex_sort_by_voxel, voxel_stats
from mola_fe_lidar_tpu.frontend.checkpoint import load_checkpoint, save_checkpoint
from mola_fe_lidar_tpu.frontend.localizer import MapLocalizer
from mola_fe_lidar_tpu.models.config import AlignKind
from mola_fe_lidar_tpu.obs.runner import build_module
from mola_fe_lidar_tpu.obs.synthetic import SyntheticWorld, synthetic_sequence

from test_frontend import odom_test_cfg


@pytest.fixture(scope="module")
def world():
    return SyntheticWorld(extent=60.0, n_world_points=60_000,
                          points_per_scan=4096, max_range=35.0, seed=3)


class TestVoxelCovFarFromOrigin:
    def test_thin_plane_eigenvalue_at_100m(self, rng):
        """E[xxᵀ]−μμᵀ in f32 loses ~1e-3 at |x|~100 m; the centered two-pass
        form must recover a 1e-4-scale plane-thickness eigenvalue there
        (ADVICE.md round-1 medium finding)."""
        n = 512
        sigma_z = 0.01  # plane thickness; variance 1e-4
        pts = np.stack([
            100.0 + rng.uniform(-0.4, 0.4, n),
            100.0 + rng.uniform(-0.4, 0.4, n),
            rng.normal(0.0, sigma_z, n),
        ], -1).astype(np.float32)
        vs = lex_sort_by_voxel(jnp.asarray(pts), jnp.ones(n, jnp.float32), 1.0)
        stats = voxel_stats(vs, num_segments=8)
        occ = np.asarray(stats.valid) > 0.5
        assert occ.sum() >= 1
        cov = np.asarray(stats.cov)[occ]
        count = np.asarray(stats.count)[occ]
        # the dominant voxel holds most points
        i = int(np.argmax(count))
        evals = np.linalg.eigvalsh(cov[i].astype(np.float64))
        ref = np.linalg.eigvalsh(np.cov(pts.astype(np.float64).T, bias=True))
        # smallest eigenvalue ~ sigma_z^2 = 1e-4; one-pass f32 error would
        # swamp it (can even go negative)
        assert evals[0] > 0.0
        np.testing.assert_allclose(evals[0], ref[0], rtol=0.15)


class TestStateCopyDeep:
    def test_snapshot_isolated_from_live_mutation(self, world):
        obs, _ = synthetic_sequence(kind="straight", n_scans=10, speed=2.0,
                                    rate_hz=2.0, world=world)
        m = build_module(odom_test_cfg())
        for o in obs:
            m.on_new_observation(o)
        m.drain()
        snap = m.state_copy()
        n_nodes = len(snap.local_pose_graph)
        n_edges = len(snap.edge_log)
        n_checked = len(snap.checked_KF_pairs)
        assert n_nodes >= 2
        # mutate the LIVE state the way the pipeline would
        with m._state_lock:
            m.state.local_pose_graph.insert_edge(
                900, 901, np.eye(3), np.ones(3))
            m.state.edge_log.append((900, 901, np.eye(3), np.ones(3)))
            m.state.checked_KF_pairs.add((900, 901))
            m.state.twist[:] = 42.0
        assert len(snap.local_pose_graph) == n_nodes
        assert len(snap.edge_log) == n_edges
        assert len(snap.checked_KF_pairs) == n_checked
        assert not np.any(snap.twist == 42.0)
        # snapshot graph reproduces the live topology it was taken from
        poses, _ = snap.local_pose_graph.dijkstra_nodes_estimate(snap.last_kf)
        assert len(poses) == n_nodes
        m.shutdown()


class TestFusedFallbackPerKind:
    def test_trace_failure_disables_only_that_kind(self, world):
        # exactly 2 scans: scan 2 has no valid twist yet, so only the
        # NEARBY_ALIGN (without-vel) fused program runs and fails
        obs, _ = synthetic_sequence(kind="straight", n_scans=2, speed=2.0,
                                    rate_hz=2.0, world=world)
        m = build_module(odom_test_cfg())
        real_get = m._get_fused_step

        def failing_get(kind, for_map=False):
            def f(*a, **k):
                raise jax.errors.JaxRuntimeError("synthetic compile failure")
            return f

        # patch BOTH step getters: the pipelined path dispatches through
        # _get_align_step, the serial path through _get_fused_step
        m._get_fused_step = failing_get
        m._get_align_step = failing_get
        for o in obs:
            m.on_new_observation(o)
        m.drain()
        # scan 2 runs without a valid twist -> NEARBY_ALIGN case; only that
        # kind degrades, and the unfused path still produced keyframes
        assert m._fused_ok.get((AlignKind.NEARBY_ALIGN, False), True) is False
        # ... for THAT (kind, use_map) mode only
        assert m._fused_ok.get((AlignKind.NEARBY_ALIGN, True), True) is True
        assert m._fused_ok.get((AlignKind.LIDAR_ODOMETRY, False), True) is True
        assert m._fused_ok.get((AlignKind.LOOP_CLOSURE, False), True) is True
        assert m.state.last_kf is not None
        m._get_fused_step = real_get
        m.shutdown()

    def test_real_errors_propagate(self, world):
        obs, _ = synthetic_sequence(kind="straight", n_scans=2, speed=2.0,
                                    rate_hz=2.0, world=world)
        m = build_module(odom_test_cfg())

        def broken_get(kind, for_map=False):
            def f(*a, **k):
                raise KeyError("missing layer: config typo")
            return f

        m._get_fused_step = broken_get
        m._get_align_step = broken_get
        m._process(obs[0])  # first scan: no ICP, no fused path
        with pytest.raises(KeyError):
            m._process(obs[1])
        # the fused path stays enabled: this was NOT a trace failure
        assert m._fused_ok.get((AlignKind.NEARBY_ALIGN, False), True) is True
        m.shutdown()


class TestZeroBasedTimestamps:
    def test_second_scan_updates_twist(self, world):
        """With a previous timestamp of exactly 0.0 the old code computed
        dt=0 (falsy-None confusion) and skipped the twist update."""
        obs, _ = synthetic_sequence(kind="straight", n_scans=3, speed=2.0,
                                    rate_hz=2.0, world=world)
        assert obs[0]["timestamp"] == 0.0
        m = build_module(odom_test_cfg())
        m.on_new_observation(obs[0])
        m.drain()
        assert not m.state.twist_is_good
        m.on_new_observation(obs[1])
        m.drain()
        assert m.state.twist_is_good
        # moving 2 m/s along the trajectory: twist norm must reflect it
        assert np.linalg.norm(m.state.twist[:3]) > 0.5
        m.shutdown()


class TestWorldPoseStaysOnSO3:
    def test_det_after_replay(self, world):
        """Device aligns return f32 rotations with ~1e-5 orthonormality
        error; unprojected, 500 chained scans drifted det(world_R) to
        0.9985 (sheared rolling map, inflated rotation RPE). _np_pose now
        projects every readback onto SO(3)."""
        obs, _ = synthetic_sequence(kind="circle", n_scans=25, speed=2.0,
                                    rate_hz=2.0, world=world)
        m = build_module(odom_test_cfg())
        for o in obs:
            m.on_new_observation(o)
            m.drain()
        R = m.state.world_R
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-9)
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-9)
        Ra = m.state.accum_since_last_kf_R
        np.testing.assert_allclose(Ra.T @ Ra, np.eye(3), atol=1e-9)
        m.shutdown()


class TestCheckpointRootRestore:
    def test_non_minimum_root_round_trips(self, tmp_path):
        m = build_module(odom_test_cfg())
        st = m.state
        # root 5 (first inserted), NOT the minimum node id
        with m._state_lock:
            st.local_pose_graph.insert_edge(5, 2, np.eye(3), np.ones(3))
            st.edge_log.append((5, 2, np.eye(3), np.ones(3)))
            st.local_pose_graph.insert_edge(2, 9, np.eye(3), np.ones(3))
            st.edge_log.append((2, 9, np.eye(3), np.ones(3)))
        assert st.local_pose_graph.root == 5
        save_checkpoint(m, str(tmp_path))
        m2 = build_module(odom_test_cfg())
        load_checkpoint(m2, str(tmp_path))
        assert m2.state.local_pose_graph.root == 5
        m.shutdown()
        m2.shutdown()


class TestLocalizerUnbiasedAggregation:
    def test_overflow_keeps_all_regions(self, rng):
        """Over-capacity aggregation must keep a spatially uniform subset —
        the round-1 code truncated in scan order, dropping late keyframes
        entirely (ADVICE.md medium finding)."""
        def patch(cx, cy, n=4000):
            return np.stack([
                cx + rng.uniform(-8, 8, n), cy + rng.uniform(-8, 8, n),
                rng.uniform(0, 2, n)], -1).astype(np.float32)

        kfs = []
        centers = [(0.0, 0.0), (1000.0, 0.0), (0.0, 1000.0)]
        for cx, cy in centers:
            mm = {"raw": from_points(patch(cx, cy), capacity=4096)}
            kfs.append((mm, (np.eye(3), np.zeros(3))))
        loc = MapLocalizer(map_capacity=512, voxel_size=0.5)
        loc.build(kfs)
        pc = loc.map_cloud
        pts = np.asarray(pc.xyz)[np.asarray(pc.mask) > 0.5]
        assert len(pts) <= 512
        for cx, cy in centers:
            near = np.sum((np.abs(pts[:, 0] - cx) < 10)
                          & (np.abs(pts[:, 1] - cy) < 10))
            assert near > 20, f"region ({cx},{cy}) dropped from the map"


class TestUniformCapacityTruncation:
    """Over-capacity filter outputs must keep a spatially UNIFORM subset:
    voxel-sort-order truncation kept a low-x slab, making full-resolution
    odometry underestimate +x motion by ~35% (round-2 finding)."""

    def _cloud(self, rng, n=65536, extent=75.0):
        pts = np.stack([
            rng.uniform(-extent, extent, n),
            rng.uniform(-extent, extent, n),
            rng.normal(0, 0.02, n)], -1).astype(np.float32)
        return pts

    def _coverage(self, pc, extent=75.0):
        m = np.asarray(pc.mask) > 0.5
        xyz = np.asarray(pc.xyz)[m]
        return xyz[:, 0].min(), xyz[:, 0].max(), int(m.sum())

    def test_edges_planes_layers_cover_scene(self, rng):
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.filters.pipeline import FilterEdgesPlanes

        pts = self._cloud(rng)  # one huge noisy ground plane
        f = FilterEdgesPlanes(voxel_filter_resolution=1.0,
                              planes_capacity=2048, edges_capacity=256,
                              decimated_capacity=2048,
                              full_pointcloud_decimation=4)
        mm = f({"raw": from_points(pts, capacity=65536)})
        # ~22k plane voxels >> 2048 capacity: the kept subset must span x
        lo, hi, cnt = self._coverage(mm["planes"])
        assert cnt == 2048
        assert lo < -60 and hi > 60, (lo, hi)
        lo, hi, cnt = self._coverage(mm["decimated"])
        assert lo < -60 and hi > 60, (lo, hi)

    def test_voxel_downsample_mean_covers_scene(self, rng):
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.filters.pipeline import FilterVoxelDownsample

        pts = self._cloud(rng)
        f = FilterVoxelDownsample(voxel_size=1.0, method="mean",
                                  output_capacity=2048)
        mm = f({"raw": from_points(pts, capacity=65536)})
        lo, hi, cnt = self._coverage(mm["decimated"])
        assert cnt == 2048
        assert lo < -60 and hi > 60, (lo, hi)

    def test_decimate_to_count_not_azimuth_slab(self, rng):
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.filters.pipeline import FilterDecimateToCount

        # azimuth-ordered ring (scan order = angle order)
        ang = np.linspace(0, 2 * np.pi, 8192, endpoint=False)
        pts = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                        np.zeros_like(ang)], -1).astype(np.float32)
        f = FilterDecimateToCount(count=1024)
        mm = f({"raw": from_points(pts, capacity=8192)})
        m = np.asarray(mm["raw"].mask) > 0.5
        kept = np.asarray(mm["raw"].xyz)[m]
        a = np.arctan2(kept[:, 1], kept[:, 0])
        # all four quadrants represented
        for q in range(4):
            sel = (a >= -np.pi + q * np.pi / 2) & (a < -np.pi + (q + 1) * np.pi / 2)
            assert sel.sum() > 100, f"quadrant {q} dropped"


class TestEdgeRingRejection:
    """Ground scan rings must NOT reach the edges layer: rings are
    sensor-centered artifacts that move with the sensor, and matching them
    drags registration toward zero motion (round-2 finding: +0.3 m/scan
    systematic undershoot; 98% of edge points were rings before the
    verticality gate)."""

    def test_rings_rejected_poles_kept(self, rng):
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.filters.pipeline import FilterEdgesPlanes

        # concentric ground rings (line-like voxels, horizontal direction)
        pts = []
        for r in np.arange(8.0, 40.0, 2.0):
            a = rng.uniform(0, 2 * np.pi, 600)
            pts.append(np.stack([r * np.cos(a), r * np.sin(a),
                                 rng.normal(-1.73, 0.02, 600)], -1))
        # two poles (vertical lines)
        for px, py in ((5.0, 5.0), (-7.0, 3.0)):
            pts.append(np.stack([np.full(200, px) + rng.normal(0, 0.02, 200),
                                 np.full(200, py) + rng.normal(0, 0.02, 200),
                                 rng.uniform(-1.5, 3.5, 200)], -1))
        cloud = np.concatenate(pts).astype(np.float32)
        f = FilterEdgesPlanes(voxel_filter_resolution=1.0,
                              voxel_filter_decimation=1, edges_capacity=1024)
        mm = f({"raw": from_points(cloud, capacity=16384)})
        m = np.asarray(mm["edges"].mask) > 0.5
        exyz = np.asarray(mm["edges"].xyz)[m]
        assert len(exyz) > 20, "pole edges must survive the gate"
        # every surviving edge point is on a pole, none on ground rings
        on_pole = ((np.abs(exyz[:, 0] - 5) < 1) & (np.abs(exyz[:, 1] - 5) < 1)) | \
                  ((np.abs(exyz[:, 0] + 7) < 1) & (np.abs(exyz[:, 1] - 3) < 1))
        assert on_pole.mean() > 0.95, f"ring leak: {1 - on_pole.mean():.2%}"


class TestDampedDeskewTwist:
    """The deskew twist is a damped state, not the raw per-pair estimate.

    Feeding the raw twist straight back into motion compensation is a
    one-scan-lag feedback loop with ~unit gain on the yaw component
    (measured oscillation of +-3..5 deg/scan on a straight HDL-64 sim
    segment); the damped EMA + acceleration clamp keeps it stable.
    """

    def _module(self):
        from mola_fe_lidar_tpu.frontend.odometry import LidarOdometry
        m = LidarOdometry()
        m.params.deskew_twist_smoothing = 0.5
        m.params.deskew_max_accel = 10.0
        m.params.deskew_max_rot_accel = 5.0
        m.params.deskew_twist_max_age = 5
        return m

    def test_seed_then_ema_and_clamp(self):
        m = self._module()
        st = m.state
        # first validated estimate seeds the smooth twist directly
        st.twist = np.array([8.0, 0, 0, 0, 0, 0.1])
        st.twist_is_good = True
        m._update_deskew_twist(0.1)
        np.testing.assert_allclose(st.twist_smooth, st.twist)
        assert st.twist_smooth_age == 0
        # a wild jump is acceleration-clamped (10 m/s^2 * 0.1 s = 1 m/s)
        # BEFORE the EMA: smooth moves by at most alpha * clamp
        st.twist = np.array([20.0, 0, 0, 0, 0, 3.0])
        m._update_deskew_twist(0.1)
        assert st.twist_smooth[0] == pytest.approx(8.0 + 0.5 * 1.0)
        assert st.twist_smooth[5] == pytest.approx(0.1 + 0.5 * 0.5)

    def test_oscillating_measurements_are_damped(self):
        # alternating +-w yaw-rate measurements (the observed failure mode)
        # must NOT sustain in the smooth twist: |smooth| stays well below w
        m = self._module()
        st = m.state
        st.twist_is_good = True
        st.twist = np.array([0, 0, 0, 0, 0, 0.8])
        m._update_deskew_twist(0.1)
        for i in range(20):
            st.twist = np.array([0, 0, 0, 0, 0, 0.8 * (-1) ** i])
            m._update_deskew_twist(0.1)
        assert abs(st.twist_smooth[5]) < 0.4

    def test_stale_twist_expires(self):
        m = self._module()
        st = m.state
        st.twist = np.array([5.0, 0, 0, 0, 0, 0])
        st.twist_is_good = True
        m._update_deskew_twist(0.1)
        st.twist_is_good = False
        for _ in range(6):
            m._update_deskew_twist(0.1)
        assert st.twist_smooth_age > m.params.deskew_twist_max_age
        # and a fresh validated estimate re-seeds (no clamp against stale)
        st.twist = np.array([-5.0, 0, 0, 0, 0, 0])
        st.twist_is_good = True
        m._update_deskew_twist(0.1)
        np.testing.assert_allclose(st.twist_smooth, st.twist)


class TestDtGateFallback:
    def test_duplicate_timestamps_do_not_reject_motion(self, world):
        """dt<=0 (duplicate/non-monotonic stamps) gives no physical motion
        bound; the teleport gate must fall back to a nominal dt instead of
        a 1 ms bound that rejects every correct ~1 m alignment."""
        obs, _ = synthetic_sequence(kind="straight", n_scans=4, speed=2.0,
                                    rate_hz=2.0, world=world)
        for o in obs:
            o["timestamp"] = 0.0  # clock glitch: all stamps identical
        m = build_module(odom_test_cfg(min_time_between_scans=0.0))
        for o in obs:
            m.on_new_observation(o)
        m.drain()
        # 1 m of true motion per scan: the estimated world pose must have
        # moved (old gate: max_sensor_speed * 1e-3 = 3 cm -> motion-model
        # hold at identity forever)
        assert np.linalg.norm(m.state.world_t) > 1.0
        stats = m.profiler.stats()
        assert "doProcess.reject_unphysical" not in stats
        m.shutdown()


class TestGNPriorEitherSigma:
    def test_translation_only_prior_engages(self, rng):
        """A translation-only prior (rot sigma unset <= 0) must still
        constrain the solve; the old code required BOTH sigmas > 0."""
        from test_icp import structured_world
        from mola_fe_lidar_tpu.geometry import se3
        from mola_fe_lidar_tpu.models import (
            ICPParams, Matcher, Quality, Solver, align)

        pts = structured_world(rng, n=1024)
        mm = {"raw": from_points(pts, capacity=1024)}
        init = se3.Pose(jnp.eye(3), jnp.asarray([0.5, 0.0, 0.0]))
        base = dict(
            max_iterations=15,
            matchers=(Matcher(kind="point2plane_knn", distance_threshold=1.5,
                              knn=6, plane_eigen_threshold=0.3),),
            quality=(Quality(threshold_distance=0.3),),
        )
        tight = ICPParams(solver=Solver(
            kind="gauss_newton", max_iterations=8,
            prior_sigma_trans=1e-3, prior_sigma_rot=0.0), **base)
        free = ICPParams(solver=Solver(
            kind="gauss_newton", max_iterations=8), **base)
        r_tight = align(mm, mm, init, tight)
        r_free = align(mm, mm, init, free)
        t_tight = np.asarray(r_tight.pose.t)
        t_free = np.asarray(r_free.pose.t)
        # identical clouds: unconstrained ICP -> identity; the tight
        # translation prior (1e6 weight vs ~1e3 pairings) must pin the
        # translation near the 0.5 m init instead
        assert np.linalg.norm(t_free) < 0.1
        assert abs(t_tight[0] - 0.5) < 0.1


class TestHashSubsample:
    def test_not_an_input_order_slab(self):
        """hash_subsample_np must spread keeps across the whole input (a
        [:cap] slab of a voxel/azimuth-sorted buffer is spatially biased —
        CLAUDE.md invariant; review finding on bench_localize_tp)."""
        from mola_fe_lidar_tpu.cloud.voxel import hash_subsample_np

        idx = np.arange(10_000)
        sel = hash_subsample_np(idx, 1000)
        assert len(sel) == 1000 and len(np.unique(sel)) == 1000
        # deterministic
        np.testing.assert_array_equal(sel, hash_subsample_np(idx, 1000))
        # covers the full range: every decile gets a share
        hist, _ = np.histogram(sel, bins=10, range=(0, 10_000))
        assert hist.min() > 50
        # identity when under capacity
        np.testing.assert_array_equal(hash_subsample_np(idx[:5], 10), idx[:5])


class TestMapBuildReseedHandoff:
    def test_dirty_rebuild_survives_builder_reseed(self):
        """A rebuild requested while a build for a REPLACED builder is in
        flight must be handed off to the current builder, not dropped
        (review finding: the dirty flag was swallowed and the map stayed
        stale until the next keyframe)."""
        import threading
        import types
        from mola_fe_lidar_tpu.frontend.odometry import LidarOdometry

        class Builder:
            def __init__(self, tag):
                self.tag, self.builds = tag, 0

            def entries(self):
                return []

            def build(self, entries):
                self.builds += 1
                return {"tag": self.tag}

        class InlinePool:
            def submit(self, fn, *a):
                fn(*a)

        a, b = Builder("a"), Builder("b")
        fake = types.SimpleNamespace(
            profiler=types.SimpleNamespace(enter=lambda *_: None,
                                           leave=lambda *_: None),
            log=types.SimpleNamespace(warning=lambda *_, **k: None),
            _state_lock=threading.Lock(),
            _map_build_lock=threading.Lock(),
            _map_build_inflight=True,   # as set by _schedule_map_build
            _map_build_dirty=True,      # rebuild requested mid-build...
            _local_map_builder=b,       # ...after the builder was reseeded
            _nearby_pool=InlinePool(),
            state=types.SimpleNamespace(local_map=None),
        )
        fake._map_build_worker = (
            lambda builder: LidarOdometry._map_build_worker(fake, builder))
        LidarOdometry._map_build_worker(fake, a)
        # the stale build must not be swapped in; the handed-off build must
        assert a.builds == 1 and b.builds == 1
        assert fake.state.local_map == {"tag": "b"}
        assert fake._map_build_inflight is False
        assert fake._map_build_dirty is False


class TestCollinearNeighborhoodGate:
    def test_line_has_no_defined_normal(self, rng):
        """A collinear kNN neighborhood (pole/edge) passes the e0<=thr*e2
        planar gate but its normal is undefined — smallest_eigenvector_3x3
        falls back to +z (ALONG the line) and, ungated, would inject a
        fabricated full-weight plane constraint (review finding)."""
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.ops import eigen3

        # exact rank-1 covariance (line): extraction matrix vanishes
        v = np.array([0.0, 0.0, 1.0], np.float32)
        cov = jnp.asarray(0.12 * np.outer(v, v)[None])
        evs = eigen3.sym_eigenvalues_3x3(cov)
        _, ok = eigen3.smallest_eigenvector_3x3(cov, evs, return_valid=True)
        assert not bool(ok[0])

        # genuine plane patch (noise floor in e0)
        pts = rng.normal(0, 1.0, (64, 3)).astype(np.float32)
        pts[:, 2] = rng.normal(0, 0.01, 64)
        d = pts - pts.mean(0)
        cov = jnp.asarray((d.T @ d / len(d))[None])
        evs = eigen3.sym_eigenvalues_3x3(cov)
        n, ok = eigen3.smallest_eigenvector_3x3(cov, evs, return_valid=True)
        assert bool(ok[0])
        assert abs(float(n[0, 2])) > 0.99  # the true normal, not a fallback

    def test_planarity_attr_zero_on_lines(self, rng):
        """FilterNormals-style planarity must be ~0 for collinear
        neighborhoods (1 - e0/e1 on a line compares two noise terms and
        can fabricate a full-confidence 1.0; eigen3.planarity_score_3x3
        gates line-like spectra to 0)."""
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.filters.pipeline import _attach_normals_knn

        # a dense vertical pole + a dense ground plane
        pole = np.zeros((64, 3), np.float32)
        pole[:, 2] = np.linspace(0, 3.0, 64)
        plane = rng.uniform(-3, 3, (192, 3)).astype(np.float32)
        plane[:, 2] = 0.0
        plane[:, :2] += 10.0  # separate so kNN doesn't mix
        pts = np.concatenate([pole, plane])
        pc = from_points(pts, capacity=256)
        out = _attach_normals_knn(pc.xyz, pc.mask, 8)
        pl_score = np.asarray(out.attrs["planarity"])[:, 0]
        assert pl_score[:64].max() < 0.5, "pole points scored as planes"
        assert np.median(pl_score[64:256]) > 0.9, "plane points lost score"


class TestRobustKernelScale:
    def test_cauchy_scale_algebra(self):
        """robust_kernel_scale pre-scales residuals by sqrt(scale): for
        Cauchy, w = 1/(1 + scale*(r/c)^2) (was parsed-but-ignored)."""
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.solve.robust import robust_weights

        r = jnp.asarray([0.0, 0.05, 0.1, 0.4])
        w = robust_weights(r, "cauchy", 0.1, scale=400.0)
        expect = 1.0 / (1.0 + 400.0 * (np.asarray(r) / 0.1) ** 2)
        np.testing.assert_allclose(np.asarray(w), expect, rtol=1e-5)
        # scale=1 is the nominal kernel
        w1 = robust_weights(r, "cauchy", 0.1)
        np.testing.assert_allclose(
            np.asarray(w1), 1.0 / (1.0 + (np.asarray(r) / 0.1) ** 2), rtol=1e-5)


class TestFromPointsOverCapacity:
    def test_uniform_not_slab(self, rng):
        """from_points must hash-subsample over-capacity input, never keep
        the first-k slab of an azimuth/beam-ordered scan (review finding:
        the default KITTI runner config fed 120k-pt scans into an 8192
        generator capacity)."""
        pts = np.zeros((10_000, 3), np.float32)
        pts[:, 0] = np.arange(10_000)  # "azimuth-ordered": x encodes order
        t = np.arange(10_000, dtype=np.float32)[:, None] / 10_000
        pc = from_points(pts, capacity=1024, attrs={"time": t})
        xs = np.asarray(pc.xyz)[np.asarray(pc.mask) > 0.5, 0]
        hist, _ = np.histogram(xs, bins=10, range=(0, 10_000))
        assert hist.min() > 50, "kept points bunch in a slab"
        # attrs subsampled consistently with xyz (time == x/10000 here)
        tt = np.asarray(pc.attrs["time"])[np.asarray(pc.mask) > 0.5, 0]
        np.testing.assert_allclose(tt, xs / 10_000, atol=1e-6)

    def test_empty_with_attrs(self):
        """0-point observation with keep_time enabled must not crash
        (reshape(0,-1) raised; the scan then missed the degenerate-scan
        path)."""
        pc = from_points(np.zeros((0, 3), np.float32), capacity=256,
                         attrs={"time": np.zeros((0, 1), np.float32)})
        assert int(np.asarray(pc.mask).sum()) == 0
        assert pc.attrs["time"].shape == (256, 1)


class TestQuatNearPi:
    def test_180_deg_yaw_round_trips(self):
        from mola_fe_lidar_tpu.obs.runner import save_trajectory_tum
        import io, types

        R = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]], np.float64)
        buf = io.StringIO()
        # drive through the public writer: one pose at 180 deg yaw
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "t.tum")
            backend = types.SimpleNamespace(keyframes={})
            save_trajectory_tum(path, {0: (R, np.zeros(3))}, backend)
            vals = [float(v) for v in open(path).read().split()]
        q = np.array(vals[4:8])  # qx qy qz qw
        assert abs(np.linalg.norm(q) - 1.0) < 1e-9, "degenerate quaternion"
        # reconstruct R from q and compare
        x, y, z, w = q
        Rq = np.array([
            [1 - 2*(y*y + z*z), 2*(x*y - z*w), 2*(x*z + y*w)],
            [2*(x*y + z*w), 1 - 2*(x*x + z*z), 2*(y*z - x*w)],
            [2*(x*z - y*w), 2*(y*z + x*w), 1 - 2*(x*x + y*y)],
        ])
        np.testing.assert_allclose(Rq, R, atol=1e-9)


class TestProfilerQueuedSpans:
    def test_fifo_multi_enter(self):
        """Queue-latency spans enter() N times before any leave() (cross-
        thread by design); every sample must be kept, FIFO-matched."""
        import time as _time
        from mola_fe_lidar_tpu.utils.profiler import Profiler

        p = Profiler()
        p.enter("q"); _time.sleep(0.02); p.enter("q"); _time.sleep(0.02)
        p.leave("q"); p.leave("q")
        st = p.stats()["q"]
        assert st["count"] == 2
        assert st["max_s"] >= 0.039  # the FIRST enter spans both sleeps
        assert st["min_s"] < 0.035


class TestHasEdgeAdjacency:
    def test_matches_full_scan(self):
        from mola_fe_lidar_tpu.frontend.pose_graph import PoseGraph

        g = PoseGraph()
        for i in range(5):
            g.insert_node(i)
        g.insert_edge(0, 1, np.eye(3), np.zeros(3))
        g.insert_edge(2, 3, np.eye(3), np.zeros(3))
        assert g.has_edge(0, 1) and g.has_edge(1, 0)
        assert g.has_edge(2, 3) and not g.has_edge(0, 2)
        assert not g.has_edge(4, 4)


class TestDecimateToCountKeepsAttrs:
    def test_time_attr_survives(self, rng):
        from mola_fe_lidar_tpu.filters.pipeline import FilterDecimateToCount

        pts = rng.uniform(-10, 10, (2048, 3)).astype(np.float32)
        t = np.linspace(0, 1, 2048, dtype=np.float32)[:, None]
        mm = {"raw": from_points(pts, capacity=2048, attrs={"time": t})}
        out = FilterDecimateToCount(count=512)(mm)["raw"]
        m = np.asarray(out.mask) > 0.5
        assert "time" in out.attrs, "attrs dropped (deskew silently disabled)"
        assert int(m.sum()) == 512
        # attr rows still correspond to their points: time was monotone in
        # input order, and xyz rows must carry their own time values
        kept_xyz = np.asarray(out.xyz)[m]
        kept_t = np.asarray(out.attrs["time"])[m, 0]
        # find each kept point's original index by value match on x
        orig = {float(x): i for i, x in enumerate(pts[:, 0])}
        idxs = np.array([orig[float(x)] for x in kept_xyz[:, 0]])
        np.testing.assert_allclose(kept_t, t[idxs, 0], atol=1e-6)


class TestImportSideEffects:
    def test_import_does_not_initialize_jax_backend(self):
        """Importing the package must run NO device op: callers (runner
        --cpu, __graft_entry__.dryrun_multichip, the test conftest) force
        the virtual CPU mesh AFTER import, and jax refuses config updates
        once a backend is initialized. Regression: ops/matching.py once held
        a module-level ``jnp.float32(1e30)`` constant that broke all of
        them on TPU hosts."""
        import subprocess
        import sys

        code = (
            "import jax\n"
            "import jax._src.xla_bridge as xb\n"
            "import mola_fe_lidar_tpu.frontend\n"
            "import mola_fe_lidar_tpu.obs.runner\n"
            "assert not xb._backends, 'import initialized a jax backend'\n"
        )
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]


class TestNearbyDecimate:
    """nearby_decimate: hash-stratified 1/k layer subsample for the
    nearby-KF batch (the scan pipeline's main chip-queue rival)."""

    def test_decimate_layers_shapes_and_uniformity(self):
        import numpy as np
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.frontend.odometry import _decimate_layers

        rng = np.random.default_rng(3)
        # x-sorted input (the voxel-sort order): a slab subsample would
        # truncate high-x — the hash subsample must keep the full range
        pts = np.sort(rng.uniform(-50, 50, (2048, 3)).astype(np.float32),
                      axis=0)
        t = np.linspace(0, 1, 2048).astype(np.float32)
        mm = {"decimated": from_points(pts, capacity=2048,
                                       attrs={"time": t})}
        out = _decimate_layers(mm, 2)
        pc = out["decimated"]
        assert pc.capacity == 1024  # 256-bucketed half
        assert pc.attrs["time"].shape[0] == 1024
        kept = np.asarray(pc.xyz)[np.asarray(pc.mask) > 0.5]
        # spatial coverage: kept x-range spans nearly the full input range
        assert kept[:, 0].min() < -45 and kept[:, 0].max() > 45
        # identity for k=1 and for tiny layers
        assert _decimate_layers(mm, 1) is mm
        small = {"edges": from_points(pts[:200], capacity=256)}
        assert _decimate_layers(small, 2)["edges"].capacity == 256

    def test_decimated_nearby_align_recovers_pose(self):
        import numpy as np
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.geometry import se3
        from mola_fe_lidar_tpu.models import (
            ICPParams, Matcher, PairWeights, Quality, Solver, align)
        from mola_fe_lidar_tpu.frontend.odometry import _decimate_layers

        rng = np.random.default_rng(5)
        from test_icp import structured_world
        world = structured_world(rng)
        true = se3.from_xyz_ypr(0.5, -0.3, 0.05, 0.04, 0.0, 0.01)
        src_pts = np.array(se3.transform(se3.inverse(true),
                                         jnp.asarray(world)))
        src = {"decimated": from_points(src_pts, capacity=2048)}
        tgt = {"decimated": from_points(world, capacity=2048)}
        params = ICPParams(
            max_iterations=40,
            matchers=(Matcher(kind="point2point", distance_threshold=2.0,
                              src_layer="decimated",
                              tgt_layer="decimated"),),
            solver=Solver(kind="horn"),
            weights=PairWeights(use_scale_outlier_detector=False),
            quality=(Quality(threshold_distance=0.3, src_layer="decimated",
                             tgt_layer="decimated"),),
        )
        res = align(_decimate_layers(src, 2), _decimate_layers(tgt, 2),
                    se3.identity(), params)
        d = se3.log(se3.compose(res.pose, se3.inverse(true)))
        assert float(jnp.linalg.norm(d[:3])) < 2e-2
        assert float(res.quality) > 0.8
