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

# A deliberately slow-converging configuration: heavy uniform Levenberg
# damping under-relaxes each Gauss-Newton step, turning the outer loop into
# a slow linear contraction (rate ≈ 0.9) — the regime AA is built for. The
# undamped map converges in ~7 outer iterations (the round-2 MAP-prior GN
# is strongly contractive) and leaves nothing to accelerate.
SLOW = ICPParams(
    max_iterations=100,
    matchers=(Matcher(kind="point2plane_knn", distance_threshold=2.0, knn=6,
                      plane_eigen_threshold=0.1),),
    solver=Solver(kind="gauss_newton", max_iterations=1, damping=0.1),
    weights=PairWeights(use_scale_outlier_detector=False),
)
SLOW_AA = dataclasses.replace(SLOW, anderson_m=4)
FAST = dataclasses.replace(
    SLOW, solver=Solver(kind="gauss_newton", max_iterations=1))
FAST_AA = dataclasses.replace(FAST, anderson_m=4)


@pytest.fixture
def world(rng):
    return structured_world(rng)


def test_same_fixed_point_and_fewer_iterations(world, rng):
    true = se3.from_xyz_ypr(0.5, -0.3, 0.05, 0.06, 0.01, 0.0)
    src, tgt = make_maps(world, true, rng)
    plain = align(src, tgt, se3.identity(), SLOW)
    aa = align(src, tgt, se3.identity(), SLOW_AA)
    # AA must actually reach the fixed point the damped Picard loop crawls
    # toward (plain does NOT converge in 100 iterations here — that is the
    # point of the config)
    et_a, er_a = pose_error(aa.pose, true)
    assert et_a < 1e-2 and er_a < 2e-3
    # ... in at most half the outer iterations (a meaningful margin, not a
    # brittle exact count — see ADVICE round 2)
    assert int(aa.n_iterations) <= 0.5 * int(plain.n_iterations)


def test_no_regression_on_fast_map(world, rng):
    """On the undamped (fast-contracting) map AA has nothing to add; it
    must not degrade accuracy and must not blow the iteration budget."""
    true = se3.from_xyz_ypr(0.5, -0.3, 0.05, 0.06, 0.01, 0.0)
    src, tgt = make_maps(world, true, rng)
    plain = align(src, tgt, se3.identity(), FAST)
    aa = align(src, tgt, se3.identity(), FAST_AA)
    et_p, er_p = pose_error(plain.pose, true)
    et_a, er_a = pose_error(aa.pose, true)
    assert et_a < max(1e-2, 2 * et_p + 1e-4)
    assert er_a < max(2e-3, 2 * er_p + 1e-5)
    assert int(aa.n_iterations) <= 3 * int(plain.n_iterations)


def test_noop_on_fast_converger(world, rng):
    """On an easy pair the safeguards must keep AA from hurting."""
    true = se3.from_xyz_ypr(0.2, 0.1, 0.0, 0.01, 0.0, 0.0)
    src, tgt = make_maps(world, true, rng)
    params = dataclasses.replace(FAST, solver=Solver(kind="gauss_newton",
                                                     max_iterations=10))
    aa = align(src, tgt, se3.identity(),
               dataclasses.replace(params, anderson_m=4))
    et, er = pose_error(aa.pose, true)
    assert et < 1e-2 and er < 2e-3


def test_vmap_batch(world, rng):
    """AA under vmap must track the unbatched AA result: converged lanes
    freeze (done is sticky) while the batch loop drains the others, so a
    lane's answer may not drift once it converges. The absolute accuracy
    of this coarse cap=1024 pair is a property of the PAIR (~1.6 cm for
    plain ICP too), so the contract here is lane-vs-unbatched agreement
    plus a loose sanity bound."""
    true = se3.from_xyz_ypr(0.3, 0.1, 0.0, 0.03, 0.0, 0.0)
    src, tgt = make_maps(world, true, rng, cap=1024)
    ref = align(src, tgt, se3.identity(), SLOW_AA)
    stack = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), t)
    batched = jax.vmap(lambda s, t, p: align(s, t, p, SLOW_AA),
                       in_axes=(0, 0, 0))
    res = batched(stack(src), stack(tgt),
                  se3.identity(batch_shape=(2,)))
    for i in range(2):
        pose_i = se3.Pose(res.pose.R[i], res.pose.t[i])
        et, er = pose_error(pose_i, true)
        assert et < 5e-2 and er < 5e-3
        # agreement with the unbatched accelerated align
        d = se3.log(se3.compose(pose_i, se3.inverse(ref.pose)))
        assert float(jnp.linalg.norm(d[:3])) < 5e-3
        assert float(jnp.linalg.norm(d[3:])) < 1e-3


def test_incompatible_with_candidate_cache(world, rng):
    src, tgt = make_maps(world, se3.identity(), rng, cap=512)
    bad = ICPParams(
        matchers=(Matcher(kind="point2point", cand_k=8),),
        anderson_m=4,
    )
    with pytest.raises(ValueError, match="anderson_m"):
        align(src, tgt, se3.identity(), bad)
