"""Driver-facing entry points must keep working (compile-check + multichip
dryrun run on the same virtual 8-device CPU mesh the driver uses)."""

import importlib.util
import pathlib

import jax
import numpy as np


def _load():
    path = pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("__graft_entry__", str(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        mod = _load()
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(float(out.quality))
        assert float(out.quality) > 0.5

    def test_dryrun_multichip_8(self):
        mod = _load()
        mod.dryrun_multichip(8)  # asserts internally

    def test_dryrun_multichip_2(self):
        mod = _load()
        mod.dryrun_multichip(2)
