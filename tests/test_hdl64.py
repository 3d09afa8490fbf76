"""HDL-64 simulator tests: beam geometry, occlusion, motion skew + deskew,
route realism, dynamic objects, and the per-scan trajectory evaluation."""

import numpy as np
import pytest

from mola_fe_lidar_tpu.obs.hdl64 import (
    HDL64World, RoutePose, SWEEP_PERIOD, hdl64_sequence,
)


@pytest.fixture(scope="module")
def small_seq():
    return hdl64_sequence(n_scans=4, n_azimuth=256)


class TestGeometry:
    def test_shapes_and_ordering(self, small_seq):
        obs, gt = small_seq
        o = obs[0]
        assert o["xyz"].shape == (64 * 256, 3)
        assert o["valid"].shape == (64 * 256,)
        # per-point times are azimuth-ordered within each beam
        t = o["time"].reshape(64, 256)
        assert np.all(np.diff(t, axis=1) > 0)
        assert 0.0 <= t.min() and t.max() < 1.0

    def test_return_statistics(self, small_seq):
        obs, _ = small_seq
        o = obs[0]
        pts = o["xyz"][o["valid"] > 0.5]
        r = np.linalg.norm(pts, axis=1)
        assert 1.0 < r.min() < 5.0          # nothing inside the sensor
        assert r.max() <= 85.0              # max range + noise
        assert o["valid"].mean() > 0.5      # urban scene: mostly returns
        # ground plane sits ~1.73 m below the sensor
        ground = pts[pts[:, 2] < -1.5]
        assert len(ground) > len(pts) * 0.3
        np.testing.assert_allclose(np.median(ground[:, 2]), -1.73, atol=0.1)

    def test_occlusion(self):
        """A building between sensor and far ground must shadow it: no
        returns just behind the box along those azimuths."""
        w = HDL64World(extent=100.0, building_fill=0.0, seed=1)
        w.boxes = [type(w.boxes)() if False else None]  # replaced below
        from mola_fe_lidar_tpu.obs.hdl64 import Box
        w.boxes = [Box(np.array([10.0, -5.0, 0.0]), np.array([12.0, 5.0, 8.0]))]
        w.poles = []
        pose = lambda t: (np.eye(3), np.array([0.0, 0.0, 1.73]))
        o = w.scan(pose, 0.0, n_azimuth=512)
        pts = o["xyz"][o["valid"] > 0.5]
        # sector toward the box: points either ON the box face (x ~ 10) or
        # on the ground BEFORE it — never beyond x = 12 within |y| < 4
        sector = pts[(np.abs(pts[:, 1]) < 4.0) & (pts[:, 0] > 0)]
        assert len(sector) > 50
        assert sector[:, 0].max() < 12.5

    def test_dynamic_objects_move_between_scans(self):
        w = HDL64World(extent=100.0, building_fill=0.2, seed=2)
        from mola_fe_lidar_tpu.obs.hdl64 import MovingBox
        w.moving = [MovingBox(np.array([8.0, -1.0, 0.0]),
                              np.array([12.0, 1.0, 1.6]),
                              np.array([0.0, 10.0, 0.0]))]
        pose = lambda t: (np.eye(3), np.array([0.0, 0.0, 1.73]))
        o0 = w.scan(pose, 0.0, n_azimuth=512)
        o1 = w.scan(pose, 1.0, n_azimuth=512)
        # the car at t=0 sits at y~0; rays fired later in the sweep see it
        # displaced (per-column time) — verify car returns exist at all
        pts = o0["xyz"][o0["valid"] > 0.5]
        car = pts[(pts[:, 0] > 7.5) & (pts[:, 0] < 12.5) & (pts[:, 2] > -1.5)
                  & (np.abs(pts[:, 1]) < 3.0)]
        assert len(car) > 10
        # at t0=1.0 s the car (v = +10 m/s in y) has moved ~10 m: its old
        # footprint must be EMPTY of car-height returns and a displaced
        # footprint around y ~ 10 must be populated (absolute-time motion —
        # cars must not snap back to their t=0 pose every sweep)
        pts1 = o1["xyz"][o1["valid"] > 0.5]
        old_spot = pts1[(pts1[:, 0] > 7.5) & (pts1[:, 0] < 12.5)
                        & (pts1[:, 2] > -1.5) & (np.abs(pts1[:, 1]) < 3.0)]
        new_spot = pts1[(pts1[:, 0] > 7.5) & (pts1[:, 0] < 12.5)
                        & (pts1[:, 2] > -1.5)
                        & (np.abs(pts1[:, 1] - 10.0) < 3.0)]
        assert len(old_spot) == 0
        assert len(new_spot) > 10


class TestRoute:
    def test_speed_and_turn_limits(self):
        e = 40.0
        route = RoutePose(np.array([[-e, -e], [e * 3, -e],
                                    [e * 3, e * 3], [-e, e * 3]]) + e / 2,
                          speed=8.0)
        yaws, steps = [], []
        prev = None
        for i in range(int(route.lap_time / SWEEP_PERIOD)):
            R, p = route(i * SWEEP_PERIOD)
            yaw = np.arctan2(R[1, 0], R[0, 0])
            if prev is not None:
                dy = np.degrees(abs((yaw - prev[0] + np.pi) % (2 * np.pi) - np.pi))
                yaws.append(dy)
                steps.append(np.linalg.norm(p - prev[1]))
            prev = (yaw, p)
        assert max(yaws) < 7.0          # corners slowed to realistic rates
        assert 0.2 < min(steps) and max(steps) <= 0.81


class TestSkewAndDeskew:
    def test_scans_are_motion_skewed(self, small_seq):
        obs, _ = small_seq
        t = obs[1]["time"][obs[1]["valid"] > 0.5]
        # per-point times span the full sweep (skew raw material)
        assert t.max() - t.min() > 0.9

    def test_deskew_exact_on_wall(self):
        """Analytic check: sensor moving +x at 8 m/s past a wall at x=20.
        Raw per-fire-time coordinates spread the wall face over
        [20−0.8, 20]; start-anchored deskew must collapse it to exactly
        x=20, end-anchored to exactly 19.2."""
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.cloud.metric_map import PointCloud
        from mola_fe_lidar_tpu.filters.pipeline import FilterDeskew
        from mola_fe_lidar_tpu.obs.hdl64 import Box

        w = HDL64World(extent=100.0, building_fill=0.0, seed=3,
                       dropout=0.0, range_noise=0.0)
        w.boxes = [Box(np.array([20.0, -50.0, 0.0]),
                       np.array([22.0, 50.0, 10.0]))]
        w.poles = []
        pose = lambda t: (np.eye(3), np.array([8.0 * t, 0.0, 1.73]))
        o = w.scan(pose, 0.0, n_azimuth=512)
        pc = from_points(o["xyz"], capacity=64 * 512,
                         attrs={"time": o["time"][:, None]})
        pc = PointCloud(pc.xyz, pc.mask * jnp.asarray(o["valid"]), pc.attrs)
        twist = jnp.asarray([8.0, 0, 0, 0, 0, 0], jnp.float32)
        raw = np.asarray(pc.xyz)
        wall = (np.asarray(pc.mask) > 0.5) & (raw[:, 2] > -1.0) & (raw[:, 0] > 5)
        assert raw[wall, 0].min() < 19.3 and raw[wall, 0].max() > 19.9
        for anchor, expect in (("start", 20.0), ("end", 19.2)):
            dsk = FilterDeskew(input_layer="raw", scan_period=SWEEP_PERIOD,
                               anchor=anchor)
            des = np.asarray(dsk({"raw": pc}, twist=twist)["raw"].xyz)
            np.testing.assert_allclose(des[wall, 0], expect, atol=1e-3)

    def test_deskew_improves_structure_fit(self):
        """Deskewing a moving-capture scan with the true twist must fit a
        static-capture reference scan better ON STRUCTURES (walls/poles).
        Ground is rotationally symmetric, so raw mixed-frame ground rings
        coincide with static rings artificially — excluded from the metric."""
        import jax.numpy as jnp
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.cloud.metric_map import PointCloud
        from mola_fe_lidar_tpu.filters.pipeline import FilterDeskew
        from mola_fe_lidar_tpu.geometry import se3_np
        from mola_fe_lidar_tpu.obs.hdl64 import HDL64World, RoutePose

        world = HDL64World(extent=120.0, seed=4, dropout=0.0)
        e = 40.0
        route = RoutePose(np.array([[-e, -e], [e * 3, -e],
                                    [e * 3, e * 3], [-e, e * 3]]) + e / 2,
                          speed=8.0)
        t0 = 1.0
        moving = world.scan(route, t0, n_azimuth=512)
        R_s, p_s = route(t0)
        static = world.scan(lambda t: (R_s, p_s), t0, n_azimuth=512)

        def cloud(o):
            pc = from_points(o["xyz"], capacity=64 * 512,
                             attrs={"time": o["time"][:, None]})
            return PointCloud(pc.xyz, pc.mask * jnp.asarray(o["valid"]),
                              pc.attrs)

        R_e, p_e = route(t0 + SWEEP_PERIOD)
        twist = se3_np.log(R_s.T @ R_e, R_s.T @ (p_e - p_s)) / SWEEP_PERIOD
        dsk = FilterDeskew(input_layer="raw", scan_period=SWEEP_PERIOD,
                           anchor="start")
        c_m, c_s = cloud(moving), cloud(static)
        d_m = dsk({"raw": c_m}, twist=jnp.asarray(twist, jnp.float32))["raw"]

        from mola_fe_lidar_tpu.ops.matching import nearest_neighbors

        def fit(src, tgt, sel=None):
            nn = nearest_neighbors(src.xyz, src.mask, tgt.xyz, tgt.mask)
            ok = (src.mask > 0.5) & (nn.dist < 1e3)
            if sel is not None:
                ok = ok & sel
            return float(jnp.sum(jnp.where(ok, nn.dist, 0)) / jnp.sum(ok))

        struct_m = c_m.xyz[:, 2] > -1.0
        struct_d = d_m.xyz[:, 2] > -1.0
        raw_fit = fit(c_m, c_s, struct_m)
        dsk_fit = fit(d_m, c_s, struct_d)
        assert dsk_fit < raw_fit * 0.8, (raw_fit, dsk_fit)


class TestPerScanTrajectory:
    def test_composition(self):
        from mola_fe_lidar_tpu.frontend.backend import (
            AdvertiseLocalization, InMemoryBackend,
        )
        from mola_fe_lidar_tpu.geometry import se3
        from mola_fe_lidar_tpu.obs.runner import per_scan_trajectory
        import jax.numpy as jnp

        be = InMemoryBackend()
        Rk = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        tk = np.array([10.0, 0, 0])
        acc = se3.Pose(jnp.eye(3), jnp.asarray([1.0, 0, 0]))
        be.advertise_updated_localization(
            AdvertiseLocalization(timestamp=1.0, reference_kf=3, pose=acc)
        ).result()
        traj = per_scan_trajectory(be, {3: (Rk, tk)})
        assert len(traj) == 1
        ts, (R, t) = traj[0]
        np.testing.assert_allclose(t, [10.0, 1.0, 0.0], atol=1e-6)
        be.shutdown()


class TestRoutes:
    """Named routes (obs.hdl64.make_route): geometric preconditions of the
    end-to-end loop-closure and long-drift demonstrations (VERDICT r3 #2/#7
    — reference src/LidarOdometry.cpp:746-849 is the LC path being fed)."""

    def _clearance(self, world, route, n=600):
        ts = np.linspace(0, route.lap_time, n, endpoint=False)
        pts = np.array([route(t)[1][:2] for t in ts])
        worst = np.inf
        for b in world.boxes:
            lo, hi = b.lo[:2], b.hi[:2]
            d = np.linalg.norm(
                np.maximum(np.maximum(lo - pts, pts - hi), 0), axis=1)
            inside = np.all((pts > lo) & (pts < hi), axis=1)
            d = np.where(inside, -1.0, d)
            worst = min(worst, float(d.min()))
        return worst, pts, ts

    def test_snake_is_long_clear_and_revisits(self):
        from mola_fe_lidar_tpu.obs.hdl64 import make_route

        world = HDL64World()
        r = make_route("snake", world)
        assert r.total_length >= 1500.0  # KITTI-length segments exist
        worst, pts, ts = self._clearance(world, r)
        assert worst > 2.0, f"route clips a building ({worst:.1f} m)"
        # ≥300 m of straight-line driving (official 100-800 m segments)
        # and a revisit: some pose returns within the LC window (6-30 m)
        # of a pose ≥600 m of arc earlier — the loop-closure precondition
        arc = np.concatenate(
            [[0], np.cumsum(np.linalg.norm(np.diff(pts, axis=0), axis=1))])
        d2 = np.linalg.norm(pts[None] - pts[:, None], axis=-1)
        sep = np.abs(arc[None] - arc[:, None])
        lc_pairs = (d2 > 6.0) & (d2 < 30.0) & (sep > 600.0)
        assert lc_pairs.any(), "no revisit inside the loop-closure window"

    def test_outback_revisits_quickly(self):
        from mola_fe_lidar_tpu.obs.hdl64 import make_route

        world = HDL64World()
        r = make_route("outback", world, speed=16.0)
        worst, pts, ts = self._clearance(world, r)
        assert worst > 2.0
        arc = np.concatenate(
            [[0], np.cumsum(np.linalg.norm(np.diff(pts, axis=0), axis=1))])
        d2 = np.linalg.norm(pts[None] - pts[:, None], axis=-1)
        sep = np.abs(arc[None] - arc[:, None])
        # the return pass gives LC-window pairs at >=60 m topological
        # separation (min_topo_dist 20 KFs x 3 m) well inside one lap
        assert ((d2 > 6.0) & (d2 < 30.0) & (sep > 90.0)).any()

    def test_relap_revisits_same_direction(self):
        """relap is the loop-closure ACCEPTANCE route: revisit pairs must
        be SAME-direction (reverse revisits have an intrinsic ~0.3
        paired-ratio ceiling from occlusion — scripts/diag_lc.py — and can
        never pass the 0.70 gate, here or in the reference)."""
        from mola_fe_lidar_tpu.obs.hdl64 import make_route

        world = HDL64World()
        r = make_route("relap", world)
        worst, pts, ts = self._clearance(world, r)
        assert worst > 2.0, f"route clips a building ({worst:.1f} m)"
        heads = np.array([r(t)[0][:2, 0] for t in ts])
        arc = np.concatenate(
            [[0], np.cumsum(np.linalg.norm(np.diff(pts, axis=0), axis=1))])
        d2 = np.linalg.norm(pts[None] - pts[:, None], axis=-1)
        sep = np.abs(arc[None] - arc[:, None])
        win = (d2 > 5.0) & (d2 < 30.0) & (sep > 200.0)
        same = win & (heads @ heads.T > 0.9)
        assert same.any(), "no same-direction revisit in the LC window"
        # the same-direction pairs dominate (the lane-offset design)
        assert same.sum() > 0.4 * win.sum()

    def test_unknown_kind_raises(self):
        from mola_fe_lidar_tpu.obs.hdl64 import make_route

        with pytest.raises(ValueError):
            make_route("zigzag", HDL64World())
