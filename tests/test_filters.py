"""Tests for generators + filter pipeline (E6; SURVEY §4.1)."""

import numpy as np
import jax.numpy as jnp

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.cloud.metric_map import to_numpy
from mola_fe_lidar_tpu.filters import (
    FilterPipeline, FilterVoxelDownsample, FilterDecimate, FilterBoundingBox,
    FilterEdgesPlanes, FilterNormals, GeneratorRawPoints,
)
from mola_fe_lidar_tpu.filters.generators import apply_generators, generators_from_config


def scene(rng, n_plane=600, n_line=200, n_scatter=200):
    """Ground plane + vertical pole + scatter, well separated."""
    plane = np.stack([
        rng.uniform(0, 8, n_plane), rng.uniform(0, 8, n_plane),
        rng.normal(0, 0.005, n_plane)], -1)
    line = np.stack([
        np.full(n_line, 20.0) + rng.normal(0, 0.005, n_line),
        np.full(n_line, 20.0) + rng.normal(0, 0.005, n_line),
        rng.uniform(0, 6, n_line)], -1)
    scatter = rng.uniform(30, 38, (n_scatter, 3))
    return (plane.astype(np.float32), line.astype(np.float32),
            scatter.astype(np.float32))


class TestGenerator:
    def test_basic_ingest(self, rng):
        gen = GeneratorRawPoints(capacity=512)
        obs = {"xyz": rng.standard_normal((100, 3)).astype(np.float32)}
        mm = apply_generators([gen], obs)
        assert "raw" in mm and int(mm["raw"].count()) == 100

    def test_range_gate(self, rng):
        gen = GeneratorRawPoints(capacity=256, min_range=2.0, max_range=50.0)
        pts = np.array([[0.5, 0, 0], [10, 0, 0], [100, 0, 0]], np.float32)
        mm = gen({"xyz": pts})
        assert int(mm["raw"].count()) == 1

    def test_from_config(self):
        gens = generators_from_config([
            {"class": "GeneratorRawPoints", "params": {"capacity": 128}}])
        assert len(gens) == 1


class TestVoxelDownsample:
    def test_first_method(self, rng):
        pts = rng.uniform(0, 10, (800, 3)).astype(np.float32)
        mm = {"raw": from_points(pts, capacity=1024)}
        f = FilterVoxelDownsample(voxel_size=1.0, method="first", output_capacity=2048)
        out = f(mm)["decimated"]
        kept = to_numpy(out)
        cells = np.floor((pts - (pts.min(0) - 0.5))).astype(int)
        n_unique = len(np.unique(cells, axis=0))
        assert len(kept) == n_unique

    def test_mean_method(self, rng):
        a = rng.uniform(0, 0.5, (50, 3)).astype(np.float32)
        mm = {"raw": from_points(a, capacity=64)}
        f = FilterVoxelDownsample(voxel_size=2.0, method="mean", output_capacity=16)
        out = f(mm)["decimated"]
        kept = to_numpy(out)
        assert len(kept) == 1
        np.testing.assert_allclose(kept[0], a.mean(0), atol=1e-5)


class TestDecimate:
    def test_every_kth(self, rng):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        mm = {"raw": from_points(pts, capacity=128)}
        out = FilterDecimate(decimation=10)(mm)["decimated"]
        assert int(out.count()) == 10


class TestBoundingBox:
    def test_crop(self, rng):
        pts = np.array([[0, 0, 0], [5, 5, 5], [50, 0, 0]], np.float32)
        mm = {"raw": from_points(pts, capacity=8)}
        out = FilterBoundingBox(min_corner=(-10,) * 3, max_corner=(10,) * 3)(mm)["raw"]
        assert int(out.count()) == 2

    def test_drop_inside(self):
        pts = np.array([[0, 0, 0], [50, 0, 0]], np.float32)
        mm = {"raw": from_points(pts, capacity=4)}
        out = FilterBoundingBox(min_corner=(-1,) * 3, max_corner=(1,) * 3,
                                keep_inside=False)(mm)["raw"]
        assert int(out.count()) == 1


class TestEdgesPlanes:
    def test_classification(self, rng):
        plane, line, scatter = scene(rng)
        pts = np.concatenate([plane, line, scatter])
        mm = {"raw": from_points(pts, capacity=2048)}
        f = FilterEdgesPlanes(voxel_filter_resolution=2.0,
                              voxel_filter_decimation=1,
                              full_pointcloud_decimation=5)
        out = f(mm)
        planes_pts = to_numpy(out["planes"])
        edges_pts = to_numpy(out["edges"])
        # plane points lie near z=0 in the [0,8]² region
        assert len(planes_pts) > 300
        assert np.all(np.abs(planes_pts[:, 2]) < 0.1)
        # edge (pole) points lie near x=y=20
        assert len(edges_pts) > 50
        assert np.all(np.abs(edges_pts[:, 0] - 20) < 0.5)
        # decimated layer exists and is ~1/5 of the cloud
        assert 150 <= int(out["decimated"].count()) <= 250

    def test_plane_normals_attr(self, rng):
        plane, _, _ = scene(rng, n_line=0, n_scatter=0)
        mm = {"raw": from_points(plane, capacity=1024)}
        f = FilterEdgesPlanes(voxel_filter_resolution=2.0, voxel_filter_decimation=1)
        out = f(mm)
        pc = out["planes"]
        assert "normal" in pc.attrs and "planarity" in pc.attrs
        m = np.asarray(pc.mask) > 0.5
        normals = np.asarray(pc.attrs["normal"])[m]
        assert np.all(np.abs(normals[:, 2]) > 0.99)  # ground normal = ±z

    def test_scan_stats_mode_matches_segment(self, rng):
        """stats_mode="scan" (segmented prefix-sum stats) classifies the
        same way as the legacy segment_sum tables — identical layer point
        SETS up to f32 summation-order effects on boundary voxels."""
        plane, line, scatter = scene(rng)
        pts = np.concatenate([plane, line, scatter])
        mm = {"raw": from_points(pts, capacity=2048)}
        kw = dict(voxel_filter_resolution=2.0, voxel_filter_decimation=1,
                  full_pointcloud_decimation=5)
        a = FilterEdgesPlanes(**kw)(mm)
        b = FilterEdgesPlanes(stats_mode="scan", **kw)(mm)
        for layer in ("planes", "edges", "decimated"):
            pa = {tuple(np.round(p, 4)) for p in to_numpy(a[layer])}
            pb = {tuple(np.round(p, 4)) for p in to_numpy(b[layer])}
            union = max(len(pa | pb), 1)
            jaccard = len(pa & pb) / union
            assert jaccard > 0.98, (layer, jaccard)
        # normals ride along in scan mode too
        assert "normal" in b["planes"].attrs

    def test_voxel_stride_decimation(self, rng):
        plane, _, _ = scene(rng, n_plane=1000, n_line=0, n_scatter=0)
        mm = {"raw": from_points(plane, capacity=1024)}
        f1 = FilterEdgesPlanes(voxel_filter_resolution=4.0, voxel_filter_decimation=1)
        f4 = FilterEdgesPlanes(voxel_filter_resolution=4.0, voxel_filter_decimation=4)
        n1 = int(f1(mm)["planes"].count())
        n4 = int(f4(mm)["planes"].count())
        assert 0 < n4 < n1
        assert abs(n4 - n1 / 4) / n1 < 0.15


class TestNormals:
    def test_attach_normals(self, rng):
        plane, _, _ = scene(rng, n_line=0, n_scatter=0)
        mm = {"raw": from_points(plane, capacity=1024)}
        out = FilterNormals(voxel_size=2.0)(mm)["raw"]
        m = np.asarray(out.mask) > 0.5
        normals = np.asarray(out.attrs["normal"])[m]
        planarity = np.asarray(out.attrs["planarity"])[m]
        assert np.all(np.abs(normals[:, 2]) > 0.99)
        assert np.all(planarity > 0.9)
        # order preserved: xyz unchanged
        np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(mm["raw"].xyz))


class TestPipeline:
    def test_from_config(self, rng):
        pts = rng.uniform(0, 20, (500, 3)).astype(np.float32)
        pipe = FilterPipeline.from_config([
            {"class": "FilterBoundingBox",
             "params": {"min_corner": [0, 0, 0], "max_corner": [10, 10, 10]}},
            {"class": "FilterVoxelDownsample",
             "params": {"voxel_size": 1.0, "output_capacity": 1024}},
        ])
        mm = pipe({"raw": from_points(pts, capacity=512)})
        assert "decimated" in mm
        kept = to_numpy(mm["decimated"])
        assert np.all(kept <= 10.0) and len(kept) > 10
