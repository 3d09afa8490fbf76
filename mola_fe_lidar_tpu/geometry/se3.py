"""SE(3) Lie-group core, fully jittable and batch-friendly.

TPU-native replacement for the MRPT pose math the reference consumes
(capability E11 in SURVEY.md: ``mrpt::poses::CPose3D`` compose/inverse/norm,
``mrpt::poses::Lie::SE<3>::log`` used for the keyframe rotation-magnitude
test at reference ``src/LidarOdometry.cpp:324-327``).

Design notes (TPU-first):

* A pose is a pytree ``Pose(R: f32[...,3,3], t: f32[...,3])``. Rotation
  matrices (not quaternions) because transforming an ``[N,3]`` cloud is then
  a single ``[N,3]@[3,3]`` matmul that XLA maps onto the MXU.
* Every function broadcasts over arbitrary leading batch dims and is safe
  under ``jit``/``vmap``/``grad``: small-angle branches use the
  "safe-where" idiom (compute both branches on sanitized inputs, select)
  so no NaNs leak through either value or gradient.
* Tangent convention: ``tau = [v (3), w (3)]`` — translation part first,
  rotation part last, matching mrpt's SE(3) log layout so threshold params
  expressed "in meters / radians" keep their meaning.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


class Pose(NamedTuple):
    """Rigid transform: ``x_world = R @ x_local + t``. Batchable pytree."""

    R: jax.Array  # f32[..., 3, 3]
    t: jax.Array  # f32[..., 3]

    @property
    def batch_shape(self):
        return self.t.shape[:-1]


def identity(batch_shape=(), dtype=jnp.float32) -> Pose:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return Pose(R, t)


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: w[...,3] -> skew-symmetric [...,3,3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jax.Array):
    """Return (A, B, C) = (sinθ/θ, (1-cosθ)/θ², (θ-sinθ)/θ³), small-θ safe.

    Uses Taylor expansions below a cutoff; both branches are evaluated on
    sanitized inputs so gradients stay finite.

    The cutoff must be generous in f32: ``1 - cos(θ)`` underflows to 0 for
    θ ≲ 3e-4 (θ²/2 < f32 eps), which would make B exactly 0 and poison any
    downstream division. θ² < 1e-5 keeps the exact branch well away from
    that cliff while the Taylor error stays ≤ 1e-12 relative.
    """
    small = theta_sq < 1e-5
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    A_exact = jnp.sin(theta) / theta
    B_exact = (1.0 - jnp.cos(theta)) / safe_sq
    C_exact = (theta - jnp.sin(theta)) / (safe_sq * theta)
    A_taylor = 1.0 - theta_sq / 6.0
    B_taylor = 0.5 - theta_sq / 24.0
    C_taylor = 1.0 / 6.0 - theta_sq / 120.0
    A = jnp.where(small, A_taylor, A_exact)
    B = jnp.where(small, B_taylor, B_exact)
    C = jnp.where(small, C_taylor, C_exact)
    return A, B, C


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: so(3) tangent [...,3] -> rotation matrix [...,3,3]."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = jnp.matmul(W, W, precision="highest")  # metric-space matmul (CLAUDE.md)
    I = jnp.eye(3, dtype=w.dtype)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> so(3) tangent; handles θ near 0 and near π."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Generic branch: w = θ/(2 sinθ) * vee(R - Rᵀ)
    sin_theta = jnp.sin(theta)
    small = theta < 1e-3  # f32: arccos/trace lose θ below ~1e-3
    near_pi = theta > jnp.pi - 1e-3
    safe_sin = jnp.where(small | near_pi, 1.0, sin_theta)
    skew = vee(R - jnp.swapaxes(R, -1, -2))
    w_generic = (theta / (2.0 * safe_sin))[..., None] * skew
    # Small-angle: w ≈ ½ vee(R - Rᵀ) (1 + θ²/6)
    w_small = 0.5 * skew * (1.0 + theta[..., None] ** 2 / 6.0)
    # Near π the skew part vanishes; recover the axis from the symmetric
    # part: (R + Rᵀ)/2 = I + (1-cosθ)(aaᵀ - I)  ⇒  aaᵀ = I + (Rsym - I)/(1-cosθ).
    Rsym = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    one_minus_cos = jnp.where(near_pi, 1.0 - cos_theta, 1.0)
    aa = jnp.eye(3, dtype=R.dtype) + (Rsym - jnp.eye(3, dtype=R.dtype)) / (
        one_minus_cos[..., None, None]
    )
    diag = jnp.stack([aa[..., 0, 0], aa[..., 1, 1], aa[..., 2, 2]], axis=-1)
    # Take the column of aaᵀ with the largest diagonal entry: aa[:,k] = a_k·a
    # with a_k = sqrt(diag_k) > 0 by choice of sign convention.
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(aa, k[..., None, None], axis=-1)[..., 0]
    a_k = jnp.sqrt(jnp.clip(jnp.take_along_axis(diag, k[..., None], axis=-1), _EPS, None))
    axis = col / a_k
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis_unit = axis / jnp.where(norm < _EPS, 1.0, norm)
    w_pi = axis_unit * theta[..., None]
    w = jnp.where(small[..., None], w_small, w_generic)
    w = jnp.where(near_pi[..., None], w_pi, w)
    return w


def exp(tau: jax.Array) -> Pose:
    """se(3) exp map: tau[...,6] = [v, w] -> Pose."""
    v, w = tau[..., :3], tau[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, C = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = jnp.matmul(W, W, precision="highest")  # metric-space matmul (CLAUDE.md)
    I = jnp.eye(3, dtype=tau.dtype)
    R = I + A[..., None, None] * W + B[..., None, None] * W2
    V = I + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v, precision="highest")
    return Pose(R, t)


def log(pose: Pose) -> jax.Array:
    """se(3) log map: Pose -> tau[...,6] = [v, w]."""
    w = so3_log(pose.R)
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = jnp.matmul(W, W, precision="highest")  # metric-space matmul (CLAUDE.md)
    # V⁻¹ = I - ½W + (1/θ²)(1 - A/(2B)) W²   (small-θ: 1/12 + θ²/720)
    # f32-safe cutoff — see _sinc_coeffs
    small = theta_sq < 1e-5
    safe_sq = jnp.where(small, 1.0, theta_sq)
    coef_exact = (1.0 - A / (2.0 * B)) / safe_sq
    coef_taylor = 1.0 / 12.0 + theta_sq / 720.0
    coef = jnp.where(small, coef_taylor, coef_exact)
    I = jnp.eye(3, dtype=w.dtype)
    Vinv = I - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, pose.t, precision="highest")
    return jnp.concatenate([v, w], axis=-1)


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b: apply b first, then a (matches CPose3D ``a + b``)."""
    R = jnp.einsum("...ij,...jk->...ik", a.R, b.R, precision="highest")
    t = jnp.einsum("...ij,...j->...i", a.R, b.t, precision="highest") + a.t
    return Pose(R, t)


def inverse(p: Pose) -> Pose:
    Rt = jnp.swapaxes(p.R, -1, -2)
    return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, p.t, precision="highest"))


def relative_to(a: Pose, b: Pose) -> Pose:
    """Pose of ``a`` expressed in frame ``b``: b⁻¹ ∘ a (CPose3D ``a - b``)."""
    return compose(inverse(b), a)


def transform(p: Pose, pts: jax.Array) -> jax.Array:
    """Apply pose to points [..., N, 3] — one MXU matmul."""
    return jnp.einsum("...ij,...nj->...ni", p.R, pts, precision="highest") + p.t[..., None, :]


def from_matrix(T: jax.Array) -> Pose:
    return Pose(T[..., :3, :3], T[..., :3, 3])


def to_matrix(p: Pose) -> jax.Array:
    batch = p.t.shape[:-1]
    T = jnp.zeros((*batch, 4, 4), dtype=p.t.dtype)
    T = T.at[..., :3, :3].set(p.R)
    T = T.at[..., :3, 3].set(p.t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def from_xyz_ypr(x, y, z, yaw, pitch, roll, dtype=jnp.float32) -> Pose:
    """MRPT CPose3D convention: R = Rz(yaw) Ry(pitch) Rx(roll)."""
    x, y, z, yaw, pitch, roll = (
        jnp.asarray(v, dtype=dtype) for v in (x, y, z, yaw, pitch, roll)
    )
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    R = jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
            jnp.stack([-sp, cp * sr, cp * cr], -1),
        ],
        axis=-2,
    )
    t = jnp.stack([x, y, z], axis=-1)
    return Pose(R, t)


def to_xyz_ypr(p: Pose):
    """Inverse of :func:`from_xyz_ypr` (gimbal-lock tolerant)."""
    R = p.R
    pitch = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return p.t[..., 0], p.t[..., 1], p.t[..., 2], yaw, pitch, roll


def rotation_log(p: Pose) -> jax.Array:
    """so(3) log of the rotation part (reference ``Lie::SE<3>::log`` tail)."""
    return so3_log(p.R)


def rotation_angle(p: Pose) -> jax.Array:
    """‖log R‖ — rotation magnitude used by the KF decision
    (reference src/LidarOdometry.cpp:324-327)."""
    return jnp.linalg.norm(so3_log(p.R), axis=-1)


def translation_norm(p: Pose) -> jax.Array:
    """‖t‖ — CPose3D::norm() analogue (reference src/LidarOdometry.cpp:322)."""
    return jnp.linalg.norm(p.t, axis=-1)
