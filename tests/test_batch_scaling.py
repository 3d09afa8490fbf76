"""Chunked batched align + coarse-to-fine preset behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.models import align_pipeline, icp_coarse_to_fine
from mola_fe_lidar_tpu.parallel import make_batched_align, make_chunked_batched_align
from tests.test_parallel import P2P, batch_of_pairs, assert_poses_close


class TestChunkedAlign:
    def test_matches_unchunked(self, rng):
        srcs, tgts, trues = batch_of_pairs(rng, B=8, cap=512)
        full = make_batched_align(P2P)(srcs, tgts, se3.identity((8,)))
        chunked = make_chunked_batched_align(P2P, chunk=4)(
            srcs, tgts, se3.identity((8,)))
        np.testing.assert_allclose(np.asarray(chunked.pose.t),
                                   np.asarray(full.pose.t), atol=1e-5)
        np.testing.assert_allclose(np.asarray(chunked.quality),
                                   np.asarray(full.quality), atol=1e-5)

    def test_indivisible_batch_raises(self, rng):
        srcs, tgts, _ = batch_of_pairs(rng, B=6, cap=512)
        import pytest
        f = make_chunked_batched_align(P2P, chunk=4)
        with pytest.raises(ValueError, match="divisible"):
            f(srcs, tgts, se3.identity((6,)))


class TestCoarseToFine:
    def test_rescues_bad_init(self, rng):
        # an init error far beyond the fine threshold: fine-only diverges,
        # the coarse stage pulls it into the fine basin
        from tests.test_icp import structured_world
        from mola_fe_lidar_tpu.cloud import from_points
        from mola_fe_lidar_tpu.filters import FilterNormals
        world = structured_world(rng, n=1024)
        true = se3.from_xyz_ypr(2.5, -1.5, 0.1, 0.15, 0, 0)
        src_pts = np.array(se3.transform(se3.inverse(true), jnp.asarray(world)))
        fn = FilterNormals(method="knn", knn=8)
        src = {"raw": from_points(src_pts, capacity=1024)}
        tgt = fn({"raw": from_points(world, capacity=1024)})
        stages = icp_coarse_to_fine()
        res = align_pipeline(src, tgt, se3.identity(), stages)
        err = float(se3.translation_norm(se3.compose(res.pose, se3.inverse(true))))
        assert err < 0.05
        assert float(res.quality) > 0.8

    def test_stages_structure(self):
        stages = icp_coarse_to_fine()
        assert len(stages) == 2
        assert stages[0].solver.kind == "horn"
        assert stages[1].matchers[0].kind == "point2plane_normals"
        assert stages[0].max_iterations <= 10  # straggler bound
