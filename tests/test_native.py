"""Native C++ runtime tests: parity vs the pure-Python implementations."""

import numpy as np
import pytest

from mola_fe_lidar_tpu.frontend.pose_graph import PoseGraph, make_pose_graph

native = pytest.importorskip("mola_fe_lidar_tpu.native")
if not native.NATIVE_AVAILABLE:
    pytest.skip("native library not built", allow_module_level=True)


def random_graph(rng, n_nodes=30, extra_edges=10):
    gp = PoseGraph()
    gn = native.NativePoseGraph()
    prev = 0
    gp.insert_node(0)
    gn.insert_node(0)
    for i in range(1, n_nodes):
        R = np.eye(3)
        a = rng.uniform(-0.3, 0.3)
        R = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        t = rng.uniform(-2, 2, 3)
        gp.insert_edge(prev, i, R, t)
        gn.insert_edge(prev, i, R, t)
        prev = i
    for _ in range(extra_edges):
        a, b = rng.integers(0, n_nodes, 2)
        if a == b or gp.has_edge(int(a), int(b)):
            continue
        t = rng.uniform(-2, 2, 3)
        gp.insert_edge(int(a), int(b), np.eye(3), t)
        gn.insert_edge(int(a), int(b), np.eye(3), t)
    return gp, gn


class TestNativePoseGraph:
    def test_dijkstra_parity(self, rng):
        gp, gn = random_graph(rng)
        pp, tp = gp.dijkstra_nodes_estimate(0)
        pn, tn = gn.dijkstra_nodes_estimate(0)
        assert set(pp) == set(pn)
        assert tp == tn
        for k in pp:
            np.testing.assert_allclose(pp[k][0], pn[k][0], atol=1e-9)
            np.testing.assert_allclose(pp[k][1], pn[k][1], atol=1e-9)

    def test_remove_and_membership(self, rng):
        gp, gn = random_graph(rng, n_nodes=10, extra_edges=0)
        gn.remove_node(5)
        gp.remove_node(5)
        assert len(gn) == len(gp)
        assert 5 not in gn.nodes
        pn, _ = gn.dijkstra_nodes_estimate(0)
        pp, _ = gp.dijkstra_nodes_estimate(0)
        assert set(pn) == set(pp)

    def test_factory_prefers_native(self):
        g = make_pose_graph()
        assert isinstance(g, native.NativePoseGraph)

    def test_root_tracking(self):
        g = native.NativePoseGraph()
        assert g.root is None
        g.insert_node(7)
        assert g.root == 7


class TestNativeKittiReader:
    def test_read_bin(self, rng, tmp_path):
        pts = rng.standard_normal((500, 4)).astype(np.float32) * 10
        path = str(tmp_path / "scan.bin")
        pts.tofile(path)
        xyz, inten = native.kitti_read_bin_native(path)
        np.testing.assert_allclose(xyz, pts[:, :3])
        np.testing.assert_allclose(inten, pts[:, 3])

    def test_stride_and_range(self, rng, tmp_path):
        pts = np.ones((100, 4), np.float32)
        pts[:50, :3] = 0.1  # inside min_range
        path = str(tmp_path / "scan.bin")
        pts.tofile(path)
        xyz, _ = native.kitti_read_bin_native(path, stride=2, min_range=1.0)
        assert len(xyz) == 25  # half strided out, half range-gated

    def test_matches_numpy_reader(self, rng, tmp_path):
        from mola_fe_lidar_tpu.obs.kitti import read_velodyne_bin
        pts = rng.standard_normal((300, 4)).astype(np.float32) * 10
        path = str(tmp_path / "scan.bin")
        pts.tofile(path)
        ref = read_velodyne_bin(path)
        xyz, inten = native.kitti_read_bin_native(path)
        np.testing.assert_allclose(xyz, ref[:, :3])

    def test_missing_file(self):
        with pytest.raises(IOError):
            native.kitti_read_bin_native("/nonexistent/file.bin")
