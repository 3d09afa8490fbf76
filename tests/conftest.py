"""Test configuration: force CPU JAX with 8 virtual devices.

This is the "multi-node without a cluster" idiom (SURVEY.md §4.5): sharding
and pjit paths are exercised on an 8-device virtual CPU mesh so the suite
runs anywhere, while the same code targets real TPU meshes in production.
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-import jax (site hooks registering accelerator
# plugins), in which case the env vars above were latched too late — force
# the platform/device-count through the live config as well. If the hook
# already INITIALIZED the backend, config.update raises — tolerate it as
# long as enough CPU devices exist (same guard as __graft_entry__).
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8, (
        "jax backend was initialized before conftest and is not an "
        "8-device CPU mesh; cannot force the virtual mesh")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
