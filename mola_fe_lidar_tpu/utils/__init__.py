from .registry import Registry
from .config import load_yaml, yaml_get, DEG2RAD
from .profiler import Profiler, ProfilerEntry
from .logging import get_logger

__all__ = [
    "Registry", "load_yaml", "yaml_get", "DEG2RAD",
    "Profiler", "ProfilerEntry", "get_logger",
]
