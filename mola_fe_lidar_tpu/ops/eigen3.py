"""Closed-form symmetric 3×3 eigen-decomposition, batched and TPU-friendly.

Replaces the per-voxel covariance eigenanalysis the reference stack does on
CPU (mp2p_icp's plane fitting for ``Matcher_Point2Plane`` with
``planeEigenThreshold`` — reference params/icp-settings-regular.yaml:33-39 —
and the edge/plane voxel classifier knobs at
reference params/kitti-default.yaml:23-32).

TPU-first design: ``jnp.linalg.eigh`` lowers to an iterative QR sweep that
serializes badly for huge batches of tiny matrices. Instead we use the
analytic (Cardano/trigonometric) solution — pure element-wise VPU math that
vmaps/fuses for free — and recover the eigenvector of the smallest
eigenvalue (the plane normal) from the column space of
``(A-λ1 I)(A-λ2 I)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def sym_eigenvalues_3x3(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric [..., 3, 3] matrices, ascending [..., 3].

    Trigonometric method (Smith 1961): exact for symmetric 3×3; all
    element-wise ops, so arbitrarily batched.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p_sq = (b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p_sq, _EPS))

    # det(B)/2 with B = (A - qI)
    det_b = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(det_b / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e2 = q + 2.0 * p * jnp.cos(phi)
    e0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e1 = 3.0 * q - e0 - e2
    return jnp.stack([e0, e1, e2], axis=-1)


def smallest_eigenvector_3x3(A: jax.Array, eigenvalues: jax.Array | None = None,
                             return_valid: bool = False):
    """Unit eigenvector for the smallest eigenvalue of symmetric [...,3,3].

    Uses the fact that for eigenvalues λ0 ≤ λ1 ≤ λ2, every column of
    ``(A - λ1 I)(A - λ2 I)`` lies in the λ0 eigenspace; we take the
    largest-norm column for conditioning. Degenerate inputs fall back
    to +z.

    ``return_valid=True`` additionally returns a boolean [...] that is
    False exactly where the fallback fired: for a COLLINEAR neighborhood
    (λ0=λ1, e.g. a pole/edge: the λ0 eigenspace is a 2-D subspace) the
    extraction matrix vanishes identically, and the +z fallback is a
    FABRICATED normal that must not constrain a solve (plane matchers
    zero those pairing weights; planarity attrs zero those scores). The
    vanishing test is RELATIVE to the matrix scale λ2² — f32 covariance
    assembly leaves ~1e-6·λ2² noise in B on an exact line, while a real
    (even ill-conditioned) λ0 eigenvector keeps ‖B column‖ ≈ λ1·λ2 —
    so the 1e-5·λ2² cut separates fabricated from merely noisy, and
    near-collinear-but-real neighborhoods keep their (reference-parity)
    noise-driven normal.
    """
    if eigenvalues is None:
        eigenvalues = sym_eigenvalues_3x3(A)
    e0, e1, e2 = eigenvalues[..., 0], eigenvalues[..., 1], eigenvalues[..., 2]
    I = jnp.eye(3, dtype=A.dtype)
    # metric-space matmul: pin precision (CLAUDE.md) — bf16 product noise
    # is amplified by the eigen-gap conditioning of the extracted column
    B = jnp.matmul(A - e1[..., None, None] * I, A - e2[..., None, None] * I,
                   precision="highest")
    norms = jnp.sum(B * B, axis=-2)  # squared column norms [..., 3]
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(B, best[..., None, None], axis=-1)[..., 0]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = n[..., 0] > jnp.maximum(1e-5 * e2 * e2, 1e-9)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=A.dtype), v.shape)
    v = jnp.where(ok[..., None], v / jnp.where(ok[..., None], n, 1.0), fallback)
    if return_valid:
        return v, ok
    return v


def planarity_score_3x3(eigenvalues: jax.Array,
                        rel_floor: float = 1e-3) -> jax.Array:
    """Planarity ∈ [0,1] from ascending eigenvalues: ``1 − λ0/λ1`` (sharp
    planes → 1), gated to 0 for LINE-like spectra (λ1 ≤ rel_floor·λ2).

    The ratio alone is meaningless on a collinear neighborhood: λ0 and λ1
    are both f32 assembly noise (≤ ~1e-4·λ2 measured), so ``1 − λ0/λ1``
    lands anywhere in [0,1] — including a fabricated 1.0 that would feed
    full-weight point2plane_normals pairings. Genuine areally-sampled
    planes (voxel-spread normals layers) have λ1 ≳ 1e-2·λ2, an order
    above the gate. Shared by the three normal-attaching filters."""
    e0, e1, e2 = (eigenvalues[..., 0], eigenvalues[..., 1],
                  eigenvalues[..., 2])
    score = jnp.clip(1.0 - e0 / jnp.maximum(e1, 1e-9), 0.0, 1.0)
    return score * (e1 > rel_floor * jnp.maximum(e2, _EPS))


def cholesky_3x3(A: jax.Array, jitter: float = 1e-9) -> jax.Array:
    """Closed-form lower Cholesky of SPD [...,3,3] — pure element-wise VPU
    math (no lax.linalg loop kernels), arbitrarily batched."""
    a00 = jnp.maximum(A[..., 0, 0], jitter)
    l00 = jnp.sqrt(a00)
    l10 = A[..., 1, 0] / l00
    l20 = A[..., 2, 0] / l00
    d11 = jnp.maximum(A[..., 1, 1] - l10 * l10, jitter)
    l11 = jnp.sqrt(d11)
    l21 = (A[..., 2, 1] - l20 * l10) / l11
    d22 = jnp.maximum(A[..., 2, 2] - l20 * l20 - l21 * l21, jitter)
    l22 = jnp.sqrt(d22)
    zero = jnp.zeros_like(l00)
    return jnp.stack([
        jnp.stack([l00, zero, zero], axis=-1),
        jnp.stack([l10, l11, zero], axis=-1),
        jnp.stack([l20, l21, l22], axis=-1),
    ], axis=-2)


def invert_lower_3x3(L: jax.Array) -> jax.Array:
    """Inverse of a lower-triangular [...,3,3] (closed form)."""
    l00, l11, l22 = L[..., 0, 0], L[..., 1, 1], L[..., 2, 2]
    i00 = 1.0 / l00
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i10 = -L[..., 1, 0] * i00 * i11
    i20 = (L[..., 1, 0] * L[..., 2, 1] - L[..., 2, 0] * l11) * i00 * i11 * i22
    i21 = -L[..., 2, 1] * i11 * i22
    zero = jnp.zeros_like(i00)
    return jnp.stack([
        jnp.stack([i00, zero, zero], axis=-1),
        jnp.stack([i10, i11, zero], axis=-1),
        jnp.stack([i20, i21, i22], axis=-1),
    ], axis=-2)


def largest_eigenvector_3x3(A: jax.Array, eigenvalues: jax.Array | None = None) -> jax.Array:
    """Unit eigenvector for the largest eigenvalue of symmetric [...,3,3]
    (the line direction of an edge-like neighborhood): columns of
    ``(A - λ0 I)(A - λ1 I)`` span the λ2 eigenspace."""
    if eigenvalues is None:
        eigenvalues = sym_eigenvalues_3x3(A)
    e0, e1 = eigenvalues[..., 0], eigenvalues[..., 1]
    I = jnp.eye(3, dtype=A.dtype)
    B = jnp.matmul(A - e0[..., None, None] * I, A - e1[..., None, None] * I,
                   precision="highest")
    norms = jnp.sum(B * B, axis=-2)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(B, best[..., None, None], axis=-1)[..., 0]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = n[..., 0] > 1e-9
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=A.dtype), v.shape)
    return jnp.where(ok[..., None], v / jnp.where(ok[..., None], n, 1.0), fallback)
