"""ctypes bindings for the native C++ runtime (pose graph, dataset IO).

The library auto-builds on first import if g++ is available (one-time,
~1 s); everything degrades gracefully to the pure-Python implementations
when the toolchain or binary is absent — consumers check
:data:`NATIVE_AVAILABLE` or just use the exported classes, which select the
backend themselves.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libmola_native.so"

_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(["sh", str(_DIR / "build.sh")], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_fp = ctypes.POINTER(ctypes.c_float)
    lib.pg_create.restype = ctypes.c_void_p
    lib.pg_destroy.argtypes = [ctypes.c_void_p]
    lib.pg_insert_node.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pg_insert_edge.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int64, c_dp, c_dp]
    lib.pg_has_edge.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.pg_has_edge.restype = ctypes.c_int
    lib.pg_num_nodes.argtypes = [ctypes.c_void_p]
    lib.pg_num_nodes.restype = ctypes.c_int64
    lib.pg_num_edges.argtypes = [ctypes.c_void_p]
    lib.pg_num_edges.restype = ctypes.c_int64
    lib.pg_root.argtypes = [ctypes.c_void_p]
    lib.pg_root.restype = ctypes.c_int64
    lib.pg_remove_node.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pg_dijkstra.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                                c_i64p, c_i64p, c_dp, c_dp]
    lib.pg_dijkstra.restype = ctypes.c_int64
    lib.kitti_read_bin.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                   ctypes.c_float, ctypes.c_float,
                                   ctypes.c_int64, c_fp, c_fp]
    lib.kitti_read_bin.restype = ctypes.c_int64
    _lib = lib
    return lib


NATIVE_AVAILABLE = _load() is not None


class NativePoseGraph:
    """C++-backed pose graph with the same surface as
    :class:`..frontend.pose_graph.PoseGraph`."""

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.pg_create()
        self._nodes = set()  # host mirror for O(1) membership queries

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.pg_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def __len__(self):
        return int(self._lib.pg_num_nodes(self._h))

    @property
    def root(self) -> Optional[int]:
        r = int(self._lib.pg_root(self._h))
        return None if r < 0 else r

    @property
    def num_edges(self) -> int:
        return int(self._lib.pg_num_edges(self._h))

    @property
    def nodes(self):
        return self._nodes

    def insert_node(self, node: int) -> None:
        self._nodes.add(node)
        self._lib.pg_insert_node(self._h, node)

    def insert_edge(self, a: int, b: int, R: np.ndarray, t: np.ndarray) -> None:
        self._nodes.add(a)
        self._nodes.add(b)
        R = np.ascontiguousarray(R, np.float64)
        t = np.ascontiguousarray(t, np.float64)
        self._lib.pg_insert_edge(
            self._h, a, b,
            R.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    def has_edge(self, a: int, b: int) -> bool:
        return bool(self._lib.pg_has_edge(self._h, a, b))

    def remove_node(self, node: int) -> None:
        self._nodes.discard(node)
        self._lib.pg_remove_node(self._h, node)

    def dijkstra_nodes_estimate(
        self, source: Optional[int] = None
    ) -> Tuple[Dict[int, Tuple[np.ndarray, np.ndarray]], Dict[int, int]]:
        cap = max(len(self), 1)
        nodes = np.empty(cap, np.int64)
        topo = np.empty(cap, np.int64)
        Rs = np.empty((cap, 3, 3), np.float64)
        ts = np.empty((cap, 3), np.float64)
        n = int(self._lib.pg_dijkstra(
            self._h, -1 if source is None else source, cap,
            nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            topo.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            Rs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double))))
        n = min(n, cap)
        poses = {int(nodes[i]): (Rs[i].copy(), ts[i].copy()) for i in range(n)}
        topod = {int(nodes[i]): int(topo[i]) for i in range(n)}
        return poses, topod


def kitti_read_bin_native(path: str, stride: int = 1, min_range: float = 0.0,
                          max_range: float = 0.0,
                          max_points: int = 200_000,
                          want_intensity: bool = True):
    """Native .bin reader; returns (xyz [n,3] f32, intensity [n] f32|None)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xyz = np.empty((max_points, 3), np.float32)
    inten = np.empty(max_points, np.float32) if want_intensity else None
    n = int(lib.kitti_read_bin(
        path.encode(), stride, min_range, max_range, max_points,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inten.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if inten is not None else None))
    if n < 0:
        raise IOError(f"cannot read {path}")
    return xyz[:n], (inten[:n] if inten is not None else None)
