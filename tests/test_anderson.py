"""Anderson-accelerated ICP (AA-ICP, arXiv:1709.05479 — PAPERS.md):
``ICPParams.anderson_m`` extrapolates the outer match→solve fixed-point
iteration from a short history window on the SE(3) tangent chart.

Contract under test: same converged pose as the plain Picard loop (the
accelerator must not move the fixed point), fewer outer iterations on a
slow-converging registration, safe behavior under vmap, and a config
error when combined with candidate-cached matchers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mola_fe_lidar_tpu.cloud import from_points
from mola_fe_lidar_tpu.geometry import se3
from mola_fe_lidar_tpu.models import ICPParams, Matcher, PairWeights, Solver, align

from test_icp import structured_world, make_maps, pose_error

# A deliberately slow-converging configuration: single GN inner iteration
# per outer step makes the outer loop do the work AA is meant to skip.
SLOW = ICPParams(
    max_iterations=100,
    matchers=(Matcher(kind="point2plane_knn", distance_threshold=2.0, knn=6,
                      plane_eigen_threshold=0.1),),
    solver=Solver(kind="gauss_newton", max_iterations=1),
    weights=PairWeights(use_scale_outlier_detector=False),
)
SLOW_AA = dataclasses.replace(SLOW, anderson_m=4)


@pytest.fixture
def world(rng):
    return structured_world(rng)


def test_same_fixed_point_and_fewer_iterations(world, rng):
    true = se3.from_xyz_ypr(0.5, -0.3, 0.05, 0.06, 0.01, 0.0)
    src, tgt = make_maps(world, true, rng)
    plain = align(src, tgt, se3.identity(), SLOW)
    aa = align(src, tgt, se3.identity(), SLOW_AA)
    et_p, er_p = pose_error(plain.pose, true)
    et_a, er_a = pose_error(aa.pose, true)
    # both recover the transform; AA must not degrade accuracy
    assert et_a < max(1e-2, 2 * et_p + 1e-4)
    assert er_a < max(2e-3, 2 * er_p + 1e-5)
    # ... and must converge in strictly fewer outer iterations
    assert int(aa.n_iterations) < int(plain.n_iterations)


def test_noop_on_fast_converger(world, rng):
    """On an easy pair the safeguards must keep AA from hurting."""
    true = se3.from_xyz_ypr(0.2, 0.1, 0.0, 0.01, 0.0, 0.0)
    src, tgt = make_maps(world, true, rng)
    params = dataclasses.replace(SLOW, solver=Solver(kind="gauss_newton",
                                                     max_iterations=10))
    aa = align(src, tgt, se3.identity(),
               dataclasses.replace(params, anderson_m=4))
    et, er = pose_error(aa.pose, true)
    assert et < 1e-2 and er < 2e-3


def test_vmap_batch(world, rng):
    true = se3.from_xyz_ypr(0.3, 0.1, 0.0, 0.03, 0.0, 0.0)
    src, tgt = make_maps(world, true, rng, cap=1024)
    stack = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), t)
    batched = jax.vmap(lambda s, t, p: align(s, t, p, SLOW_AA),
                       in_axes=(0, 0, 0))
    res = batched(stack(src), stack(tgt),
                  se3.identity(batch_shape=(2,)))
    for i in range(2):
        pose_i = se3.Pose(res.pose.R[i], res.pose.t[i])
        et, er = pose_error(pose_i, true)
        assert et < 1e-2 and er < 2e-3


def test_incompatible_with_candidate_cache(world, rng):
    src, tgt = make_maps(world, se3.identity(), rng, cap=512)
    bad = ICPParams(
        matchers=(Matcher(kind="point2point", cand_k=8),),
        anderson_m=4,
    )
    with pytest.raises(ValueError, match="anderson_m"):
        align(src, tgt, se3.identity(), bad)
