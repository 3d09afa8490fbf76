"""Default-on persistent XLA compile cache (VERDICT r4 #6).

The reference front-end is ahead-of-time-compiled C++; its analogue here
is the persistent compile cache — without it every fresh process pays the
remote TPU compiler for programs it has compiled before (observed: a
~25-minute cold start of the 500-scan replay, and single mid-replay
re-rolls of 752 s). Enabling the on-disk cache turns those into
millisecond loads.

Called from the replay runner / harnesses at module-build time; a no-op
when the embedding application already configured a cache dir (their
setting wins) or when ``MOLA_TPU_NO_COMPILE_CACHE`` is set.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "MOLA_TPU_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "mola_fe_lidar_tpu",
                 "jax_cache"))


def enable_default_compile_cache() -> str | None:
    """Point jax at a persistent compile cache unless one is configured.

    Returns the cache dir in effect (ours or the pre-existing one), or
    None when disabled via ``MOLA_TPU_NO_COMPILE_CACHE``.
    """
    if os.environ.get("MOLA_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current  # the application's choice wins
    # accelerator backends only: XLA:CPU AOT cache entries embed host
    # machine-feature lists and warn (or worse, SIGILL) when a cache is
    # shared across differently-configured CPU processes — and the CPU
    # path has no remote-compiler stall to amortize anyway. CPU harnesses
    # that want a cache (tests, --cpu smokes) opt in explicitly.
    if jax.default_backend() == "cpu":
        return None
    os.makedirs(_DEFAULT_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _DEFAULT_DIR)
    # default threshold (1 s) skips small programs; the scan-step programs
    # all take far longer, but 2 s keeps cache churn low explicitly
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return _DEFAULT_DIR
