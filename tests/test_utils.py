"""Tests for config/registry/profiler/logging utilities (E13-E16)."""

import time

import pytest

from mola_fe_lidar_tpu.utils import (
    DEG2RAD, Profiler, ProfilerEntry, Registry, get_logger, load_yaml, yaml_get,
)
from mola_fe_lidar_tpu.utils.config import loads_yaml, register_package_dir, MissingKey


class TestRegistry:
    def test_register_get(self):
        r = Registry("thing")

        @r.register("Foo")
        class Foo:
            pass

        assert r.get("Foo") is Foo
        assert "Foo" in r

    def test_duplicate_raises(self):
        r = Registry("thing")
        r.register("X")(object())
        with pytest.raises(ValueError):
            r.register("X")(object())

    def test_unknown_raises_with_names(self):
        r = Registry("thing")
        r.register("A")(1)
        with pytest.raises(KeyError, match="A"):
            r.get("B")


class TestConfig:
    def test_include_and_pkgdir(self, tmp_path):
        (tmp_path / "inner.yaml").write_text("val: 42\n")
        (tmp_path / "outer.yaml").write_text(
            "params: $include{inner.yaml}\nname: test\n")
        cfg = load_yaml(str(tmp_path / "outer.yaml"))
        assert cfg["params"]["val"] == 42
        assert cfg["name"] == "test"

    def test_pkg_dir_expansion(self, tmp_path):
        register_package_dir("testpkg", str(tmp_path))
        (tmp_path / "sub.yaml").write_text("x: 1\n")
        cfg = loads_yaml("inc: $include{$(pkg-dir testpkg)/sub.yaml}")
        assert cfg["inc"]["x"] == 1

    def test_env_expansion(self, monkeypatch):
        monkeypatch.setenv("MY_TEST_VAR", "hello")
        cfg = loads_yaml("a: $(env MY_TEST_VAR)\nb: ${MY_TEST_VAR}")
        assert cfg["a"] == "hello" and cfg["b"] == "hello"

    def test_missing_env_raises(self):
        with pytest.raises(KeyError):
            loads_yaml("a: $(env DEFINITELY_NOT_SET_12345)")

    def test_yaml_get_semantics(self):
        cfg = {"a": 1, "deg": 90.0}
        assert yaml_get(cfg, "a", required=True) == 1
        assert yaml_get(cfg, "missing", default=7) == 7
        assert abs(yaml_get(cfg, "deg", deg_to_rad=True) - 90 * DEG2RAD) < 1e-12
        with pytest.raises(MissingKey):
            yaml_get(cfg, "nope", required=True)

    def test_reference_preset_keys_load(self):
        # the rebuilt kitti preset structure parses end-to-end
        text = """
min_time_between_scans: 0.01
min_dist_xyz_between_keyframes: 3
min_icp_goodness: 0.50
min_icp_goodness_lc: 0.70
min_dist_to_matching: 5.0
max_dist_to_matching: 20.0
max_dist_to_loop_closure: 30.0
max_nearby_align_checks: 5
min_topo_dist_to_consider_loopclosure: 30
loop_closure_montecarlo_samples: 10
"""
        cfg = loads_yaml(text)
        assert yaml_get(cfg, "min_dist_xyz_between_keyframes", cast=float) == 3.0


class TestProfiler:
    def test_scopes_and_counters(self):
        p = Profiler("t")
        with ProfilerEntry(p, "work"):
            time.sleep(0.01)
        p.register_user_measure("queue_length", 3)
        p.register_user_measure("queue_length", 5)
        st = p.stats()
        assert st["work"]["count"] == 1
        assert st["work"]["mean_s"] >= 0.01
        assert st["counter:queue_length"]["mean"] == 4.0
        assert "work" in p.report()

    def test_cross_thread_enter_leave(self):
        # the reference's queue-latency pattern: enter in one place,
        # leave in another (src/LidarOdometry.cpp:180 -> :199)
        p = Profiler("t")
        p.enter("delay")
        time.sleep(0.005)
        p.leave("delay")
        assert p.stats()["delay"]["mean_s"] >= 0.005

    def test_disabled_is_noop(self):
        p = Profiler("t", enabled=False)
        with ProfilerEntry(p, "x"):
            pass
        assert p.stats() == {}


class TestLogging:
    def test_throttle(self, caplog):
        log = get_logger("test_throttle_unit")
        with caplog.at_level("ERROR", logger="mola_fe_lidar_tpu.test_throttle_unit"):
            for _ in range(10):
                log.error_throttle(100.0, "spam %d", 1)
        assert sum("spam" in r.message for r in caplog.records) == 1
