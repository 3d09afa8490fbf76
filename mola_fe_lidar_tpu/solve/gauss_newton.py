"""Point-to-plane Gauss-Newton solver — the rebuild of
``mp2p_icp::Solver_GaussNewton`` (E4; reference
params/icp-settings-regular.yaml:23-26, maxIterations: 20).

Residual per pairing: r_i = n_iᵀ (R p_i + t − q_i), with n the target
surface normal. Linearized in the tangent δ = [δt, δw] at the current pose:

    r(δ) ≈ r₀ + n·δt + ((R p) × n)·δw    ⇒    J_i = [nᵀ, ((R p_i) × n_i)ᵀ]

Normal equations A δ = b with A = Σ w J Jᵀ (6×6) and b = −Σ w J r: built
with masked MXU contractions over the pairing axis, solved by a dense 6×6
solve, applied as a left-multiplied exp update. The inner loop re-linearizes
at the updated pose while keeping correspondences fixed — exactly the
"solver inner iterations" of the reference stack, as a ``fori_loop`` with
zero host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3


class GNResult(NamedTuple):
    pose: se3.Pose
    normal_matrix: jax.Array  # f32[..., 6, 6]  (A at the final pose)
    sq_residual_sum: jax.Array  # f32[...]
    weight_sum: jax.Array  # f32[...]


def solve_normal_equations(A: jax.Array, b: jax.Array, damping: float = 1e-6) -> jax.Array:
    """Solve (A + λ·max(diag(A))·I) δ = b — tiny UNIFORM Levenberg damping
    (scaled by the largest diagonal entry, floored at 1) keeps
    rank-deficient neighborhoods (e.g. single-plane scenes) finite.
    Deliberately not Marquardt per-axis damping: on degenerate systems the
    weak axes have ~0 curvature, and per-axis scaling would leave them
    undamped."""
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    Ad = A + damping * jnp.eye(A.shape[-1], dtype=A.dtype) * jnp.maximum(
        diag.max(axis=-1)[..., None, None], 1.0
    )
    return jnp.linalg.solve(Ad, b[..., None])[..., 0]


def _build_system(pose, src_pts, tgt_pts, normals, w):
    rp = se3.transform(pose, src_pts)  # [..., N, 3]
    r = jnp.sum((rp - tgt_pts) * normals, axis=-1)  # [..., N]
    cross = jnp.cross(rp, normals)  # (R p) × n, [..., N, 3]
    J = jnp.concatenate([normals, cross], axis=-1)  # [..., N, 6]
    Jw = J * w[..., None]
    A = jnp.einsum("...ni,...nj->...ij", Jw, J, precision="highest")
    b = -jnp.einsum("...ni,...n->...i", Jw, r, precision="highest")
    sse = jnp.sum(w * r * r, axis=-1)
    return A, b, sse


def point_to_plane_step(
    pose: se3.Pose,
    src_pts: jax.Array,
    tgt_pts: jax.Array,
    normals: jax.Array,
    w: jax.Array,
    inner_iterations: int = 20,
    damping: float = 1e-6,
    prior_pose: se3.Pose | None = None,
    prior_w: jax.Array | None = None,
) -> GNResult:
    """Run the GN inner loop at fixed correspondences.

    src_pts [...,N,3] source points (untransformed), tgt_pts/normals their
    matched target points/unit normals, w per-pairing weights (0 = drop).

    ``prior_pose``/``prior_w`` add a weak MAP prior anchoring the solution
    to the initial guess: with the left-multiplied update new = exp(δ)∘p
    and prior error e = log(prior ∘ p⁻¹), the extra cost wᵖ‖δ − e‖²
    contributes A += diag(wᵖ), b += wᵖ·e. In degenerate geometry (a
    corridor of parallel planes leaves the along-corridor direction with
    ~zero data curvature AND ~zero gradient, so noise drives unbounded
    slide — measured 11 m/scan teleports on the HDL-64 sim city blocks)
    the prior term dominates exactly those null directions and pins them
    to the motion-model guess, while well-constrained directions
    (data eigenvalues ≫ wᵖ) are unaffected. This is the standard
    degeneracy treatment in production LiDAR odometry (cf. Zhang & Singh,
    "On Degeneracy of Optimization-based State Estimation", ICRA 2016 —
    solution remapping; a weak Tikhonov prior is the smooth variant).
    """

    def body(_, p):
        A, b, _ = _build_system(p, src_pts, tgt_pts, normals, w)
        if prior_pose is not None:
            e = se3.log(se3.compose(prior_pose, se3.inverse(p)))
            A = A + jnp.diag(prior_w).astype(A.dtype)
            b = b + prior_w * e
        delta = solve_normal_equations(A, b, damping)
        return se3.compose(se3.exp(delta), p)

    pose = jax.lax.fori_loop(0, inner_iterations, body, pose)
    A, _, sse = _build_system(pose, src_pts, tgt_pts, normals, w)
    return GNResult(pose, A, sse, jnp.sum(w, axis=-1))


def covariance_from_normal_matrix(
    A: jax.Array, sse: jax.Array, weight_sum: jax.Array
) -> jax.Array:
    """cov ≈ σ² A⁻¹ with σ² = SSE / max(n_eff − 6, 1) — the 6×6 covariance
    of the reference's ``CPose3DPDFGaussian`` result."""
    dof = jnp.maximum(weight_sum - 6.0, 1.0)
    sigma2 = sse / dof
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    Ad = A + 1e-9 * jnp.eye(6, dtype=A.dtype) * jnp.maximum(
        diag.max(axis=-1)[..., None, None], 1.0
    )
    return sigma2[..., None, None] * jnp.linalg.inv(Ad)
