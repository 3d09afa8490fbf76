"""Pallas fused k-NN kernel: cKDTree/XLA parity in interpret mode (CPU
suite) and, when a TPU is present, compiled agreement. The kernel is the
exact counterpart of the reference's kNN=6 point-to-plane matcher
(reference params/icp-settings-regular.yaml:33-39)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mola_fe_lidar_tpu.ops.matching as matching
import mola_fe_lidar_tpu.ops.pallas_knn as pknn

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture
def interp(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(pknn.pl, "pallas_call", patched)
    return patched


def clouds(rng, n=300, m=520, scale=30.0):
    src = jnp.asarray((rng.standard_normal((n, 3)) * scale).astype(np.float32))
    tgt = jnp.asarray((rng.standard_normal((m, 3)) * scale).astype(np.float32))
    return src, tgt


class TestPallasKNNInterpret:
    def test_matches_ckdtree(self, rng, interp):
        from scipy.spatial import cKDTree
        src, tgt = clouds(rng)
        sm, tm = jnp.ones(src.shape[0]), jnp.ones(tgt.shape[0])
        res = pknn.pallas_knn(src, sm, tgt, tm, k=6,
                              src_block=128, tgt_tile=128)
        d_ref, i_ref = cKDTree(np.asarray(tgt)).query(np.asarray(src), k=6)
        np.testing.assert_allclose(np.asarray(res.dist), d_ref,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(res.idx), i_ref)

    def test_ascending_and_xla_parity(self, rng, interp):
        src, tgt = clouds(rng, n=200, m=260)
        sm = jnp.asarray((rng.uniform(size=200) > 0.1).astype(np.float32))
        tm = jnp.asarray((rng.uniform(size=260) > 0.1).astype(np.float32))
        res = pknn.pallas_knn(src, sm, tgt, tm, k=4,
                              src_block=128, tgt_tile=128)
        ref = matching.knn(src, sm, tgt, tm, k=4)
        d = np.asarray(res.dist)
        assert np.all(np.diff(d, axis=1) >= -1e-6)  # ascending
        ok = np.asarray(sm) > 0.5
        np.testing.assert_allclose(d[ok], np.asarray(ref.dist)[ok],
                                   rtol=1e-3, atol=1e-3)

    def test_fewer_valid_targets_than_k(self, rng, interp):
        src = jnp.zeros((8, 3))
        tgt = jnp.asarray(np.array([[0.1, 0, 0], [0, 0.2, 0]]
                                   + [[5.0, 5, 5]] * 6, np.float32))
        tm = jnp.asarray(np.array([1.0, 1.0] + [0.0] * 6, np.float32))
        res = pknn.pallas_knn(src, jnp.ones(8), tgt, tm, k=4,
                              src_block=128, tgt_tile=128)
        d = np.asarray(res.dist)
        # 2 real neighbors, slots 2..3 at the sentinel
        assert np.all(d[:, :2] < 1.0)
        assert np.all(d[:, 2:] > 1e9)
        assert np.all(np.asarray(res.idx)[:, :2] < 2)

    def test_masked_sources(self, rng, interp):
        src, tgt = clouds(rng, n=10, m=130)
        sm = jnp.asarray(np.array([1.0] * 9 + [0.0], np.float32))
        res = pknn.pallas_knn(src, sm, tgt, jnp.ones(130), k=3,
                              src_block=128, tgt_tile=128)
        assert float(res.dist[9, 0]) > 1e10

    def test_duplicate_points(self, interp):
        # k identical closest points must fill k slots, not collapse to one
        src = jnp.zeros((8, 3))
        tgt = jnp.asarray(np.array([[0.1, 0, 0]] * 3 + [[9.0, 9, 9]] * 5,
                                   np.float32))
        res = pknn.pallas_knn(src, jnp.ones(8), tgt, jnp.ones(8), k=3,
                              src_block=128, tgt_tile=128)
        d = np.asarray(res.dist)
        np.testing.assert_allclose(d, 0.1, atol=1e-5)
        assert sorted(np.asarray(res.idx)[0].tolist()) == [0, 1, 2]


@pytest.mark.skipif(not ON_TPU, reason="needs a real TPU")
class TestPallasKNNCompiled:
    def test_compiled_agreement(self, rng):
        from scipy.spatial import cKDTree
        src, tgt = clouds(rng, n=2048, m=2048)
        sm, tm = jnp.ones(2048), jnp.ones(2048)
        res = pknn.pallas_knn(src, sm, tgt, tm, k=6)
        d_ref, _ = cKDTree(np.asarray(tgt)).query(np.asarray(src), k=6)
        match = np.mean(np.abs(np.asarray(res.dist) - d_ref) < 1e-3)
        assert match > 0.999
