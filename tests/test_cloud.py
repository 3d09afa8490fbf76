"""Tests for cloud containers, voxel grouping, and the 3×3 eigensolver."""

import jax
import jax.numpy as jnp
import numpy as np

from mola_fe_lidar_tpu.cloud import metric_map as mm
from mola_fe_lidar_tpu.cloud import voxel
from mola_fe_lidar_tpu.ops import eigen3


class TestEigen3:
    def test_eigenvalues_match_numpy(self, rng):
        X = rng.standard_normal((64, 3, 3)).astype(np.float32)
        A = X @ np.swapaxes(X, -1, -2)  # SPD
        ours = np.asarray(eigen3.sym_eigenvalues_3x3(jnp.asarray(A)))
        ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_smallest_eigenvector_is_plane_normal(self, rng):
        # Points on the z=0 plane: smallest-eigenvalue direction must be ±z.
        pts = rng.standard_normal((200, 3)).astype(np.float32)
        pts[:, 2] = 0.01 * pts[:, 2]
        cov = np.cov(pts.T).astype(np.float32)
        v = np.asarray(eigen3.smallest_eigenvector_3x3(jnp.asarray(cov)))
        assert abs(v[2]) > 0.999

    def test_degenerate_isotropic(self):
        v = np.asarray(eigen3.smallest_eigenvector_3x3(jnp.eye(3)))
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-5)

    def test_batched(self, rng):
        X = rng.standard_normal((8, 5, 3, 3)).astype(np.float32)
        A = X @ np.swapaxes(X, -1, -2)
        evs = eigen3.sym_eigenvalues_3x3(jnp.asarray(A))
        assert evs.shape == (8, 5, 3)
        vecs = eigen3.smallest_eigenvector_3x3(jnp.asarray(A))
        assert vecs.shape == (8, 5, 3)


class TestPointCloud:
    def test_from_points_pads(self, rng):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        pc = mm.from_points(pts, capacity=256)
        assert pc.capacity == 256
        assert int(pc.count()) == 100
        np.testing.assert_allclose(np.asarray(pc.xyz[:100]), pts)
        assert np.all(np.asarray(pc.xyz[100:]) > 1e5)  # parked far away

    def test_from_points_truncates(self, rng):
        pts = rng.standard_normal((300, 3)).astype(np.float32)
        pc = mm.from_points(pts, capacity=256)
        assert int(pc.count()) == 256

    def test_auto_capacity_rounding(self, rng):
        pc = mm.from_points(rng.standard_normal((100, 3)))
        assert pc.capacity == 256

    def test_attrs_roundtrip(self, rng, tmp_path):
        pts = rng.standard_normal((50, 3)).astype(np.float32)
        normals = rng.standard_normal((50, 3)).astype(np.float32)
        pc = mm.from_points(pts, capacity=64, attrs={"normals": normals})
        m = {"planes": pc, "raw": mm.from_points(pts, capacity=128)}
        path = str(tmp_path / "map.npz")
        mm.save_metric_map(path, m)
        m2 = mm.load_metric_map(path)
        assert set(m2) == {"planes", "raw"}
        np.testing.assert_allclose(np.asarray(m2["planes"].attrs["normals"][:50]), normals)
        np.testing.assert_allclose(np.asarray(m2["raw"].xyz), np.asarray(m["raw"].xyz))

    def test_concat(self, rng):
        a = mm.from_points(rng.standard_normal((10, 3)), capacity=16)
        b = mm.from_points(rng.standard_normal((20, 3)), capacity=32)
        c = mm.concat_clouds(a, b)
        assert c.capacity == 48
        assert int(c.count()) == 30


class TestVoxel:
    def test_groups_match_numpy(self, rng):
        pts = (rng.random((500, 3)) * 10).astype(np.float32)
        pc = mm.from_points(pts, capacity=512)
        vs = voxel.lex_sort_by_voxel(pc.xyz, pc.mask, res=1.0)
        # ground truth: unique cells
        cells = np.floor((pts - (pts.min(0) - 0.5)) / 1.0).astype(int)
        n_unique = len(np.unique(cells, axis=0))
        assert int(vs.num_voxels) == n_unique

    def test_stats_mean(self, rng):
        # Two well-separated clusters → two voxels with exact means.
        a = rng.random((40, 3)).astype(np.float32) * 0.4
        b = rng.random((60, 3)).astype(np.float32) * 0.4 + np.array([10.0, 0, 0], np.float32)
        pc = mm.from_points(np.concatenate([a, b]), capacity=128)
        vs = voxel.lex_sort_by_voxel(pc.xyz, pc.mask, res=1.0)
        st = voxel.voxel_stats(vs, num_segments=8)
        assert int(vs.num_voxels) == 2
        means = np.asarray(st.mean[:2])
        counts = np.asarray(st.count[:2])
        got = {int(c): m for c, m in zip(counts, means)}
        np.testing.assert_allclose(got[40], a.mean(0), atol=1e-5)
        np.testing.assert_allclose(got[60], b.mean(0), atol=1e-5)

    def test_padding_isolated(self, rng):
        pts = rng.random((10, 3)).astype(np.float32)
        pc = mm.from_points(pts, capacity=64)  # 54 padding points
        vs = voxel.lex_sort_by_voxel(pc.xyz, pc.mask, res=0.5)
        st = voxel.voxel_stats(vs, num_segments=64)
        assert float(jnp.sum(st.count)) == 10.0  # padding contributes nothing

    def test_jit_and_vmap(self, rng):
        pts = rng.random((2, 100, 3)).astype(np.float32)
        masks = np.ones((2, 100), np.float32)
        f = jax.jit(jax.vmap(lambda x, m: voxel.lex_sort_by_voxel(x, m, 0.7).num_voxels))
        out = f(jnp.asarray(pts), jnp.asarray(masks))
        assert out.shape == (2,)
        assert int(out[0]) > 0

    def test_cov_of_planar_voxel(self, rng):
        pts = rng.random((100, 3)).astype(np.float32) * np.array([0.9, 0.9, 0.001], np.float32)
        pc = mm.from_points(pts, capacity=128)
        vs = voxel.lex_sort_by_voxel(pc.xyz, pc.mask, res=1.0)
        st = voxel.voxel_stats(vs, num_segments=4)
        evs = np.asarray(eigen3.sym_eigenvalues_3x3(st.cov[0]))
        assert evs[0] < 1e-5 and evs[2] > 1e-3  # flat along one axis
