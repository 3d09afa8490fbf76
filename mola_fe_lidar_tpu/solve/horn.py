"""Weighted closed-form rigid alignment (Horn/Kabsch via SVD) — E4.

The point-to-point solver family of the rebuild. Given weighted pairings
``(p_i → q_i)`` it returns the pose minimizing Σ w_i ‖R p_i + t − q_i‖².
All reductions are masked; the 3×3 SVD is tiny and batches freely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se3


def weighted_horn(src_pts: jax.Array, tgt_pts: jax.Array, w: jax.Array) -> se3.Pose:
    """Optimal SE(3) for weighted pairings.

    src_pts/tgt_pts: f32[..., N, 3]; w: f32[..., N] (zeros drop pairings).
    Falls back to identity when effective weight is ~0 (degenerate input).
    """
    tot = jnp.sum(w, axis=-1, keepdims=True)
    safe_tot = jnp.maximum(tot, 1e-9)
    mu_s = jnp.sum(src_pts * w[..., None], axis=-2) / safe_tot
    mu_t = jnp.sum(tgt_pts * w[..., None], axis=-2) / safe_tot
    ps = src_pts - mu_s[..., None, :]
    qs = tgt_pts - mu_t[..., None, :]
    # 3×3 weighted cross-covariance: one MXU contraction over N.
    H = jnp.einsum("...ni,...nj->...ij", ps * w[..., None], qs, precision="highest")
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", V, Ut, precision="highest"))
    D = jnp.zeros_like(H)
    D = D.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(det)
    R = jnp.einsum("...ij,...jk,...kl->...il", V, D, Ut, precision="highest")
    t = mu_t - jnp.einsum("...ij,...j->...i", R, mu_s, precision="highest")
    degenerate = (tot[..., 0] < 1e-6)[..., None, None]
    R = jnp.where(degenerate, jnp.eye(3, dtype=R.dtype), R)
    t = jnp.where(degenerate[..., 0], jnp.zeros_like(t), t)
    return se3.Pose(R, t)


def point_to_point_normal_matrix(
    src_pts: jax.Array, pose: se3.Pose, w: jax.Array
) -> jax.Array:
    """Gauss-Newton normal matrix A = Σ w JᵀJ for point-to-point residuals
    r_i = R p_i + t − q_i with J_i = [I₃ | −[R p_i]ₓ] ∈ R^{3×6}.

    Used to produce the 6×6 covariance the reference's ICP result carries
    (``optimal_tf: CPose3DPDFGaussian``; reference src/LidarOdometry.cpp:873-888):
    cov ≈ σ² A⁻¹.
    """
    rp = se3.transform(pose, src_pts)  # [..., N, 3]
    X = se3.hat(rp)  # [..., N, 3, 3]
    # J = [I | -X]; A = Σ w [[I, -X],[Xᵀ... ]] assembled blockwise:
    wsum = jnp.sum(w, axis=-1)
    I = jnp.eye(3, dtype=src_pts.dtype)
    A_tt = wsum[..., None, None] * I
    A_tw = -jnp.sum(w[..., None, None] * X, axis=-3)
    A_ww = jnp.einsum("...nij,...nik->...jk", X * w[..., None, None], X, precision="highest")
    top = jnp.concatenate([A_tt, A_tw], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(A_tw, -1, -2), A_ww], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
