"""Device-resident SE(3) pose-graph optimization (Levenberg-Marquardt).

The reference front-end emits ``FactorRelativePose3`` factors to an
external optimizing back-end (mola-kernel BackEndBase protocol, consumed
at reference src/LidarOdometry.cpp:435-455, :818-830; in the MOLA
ecosystem the optimizer is e.g. mola-slam-gtsam on CPU). This module is
that back-end's TPU-native equivalent: the whole graph lives in padded
fixed-shape arrays and one jit-compiled LM loop refines all keyframe
poses in a single device dispatch.

TPU-first design:

* Fixed shapes — nodes/edges padded to capacity buckets (one compile per
  bucket), masks select real entries; the same compiled program serves a
  growing graph.
* Right-perturbation Gauss-Newton with the standard SLAM linearization:
  residual ``r_e = log(Z_e^-1 X_i^-1 X_j)``, Jacobians
  ``dr/ddelta_j = Jr_inv(r)`` and ``dr/ddelta_i = -Jr_inv(r) Ad(X_j^-1 X_i)``
  with the second-order-accurate ``Jr_inv(r) ~ I + ad(r)/2``.
* The normal system is a dense ``[6N,6N]`` matrix assembled by 6x6 block
  scatter-adds — at SLAM-front-end graph sizes (N <= a few hundred KFs)
  a dense solve on the MXU beats any sparse bookkeeping.
* Gauge freedom fixed STRUCTURALLY: node 0's rows/cols are zeroed and its
  diagonal set to identity via a DOF mask (shapes stay static; a strong
  prior was tried and rejected — ~1e9 diagonal entries destroy f32 solve
  accuracy, see ``_assemble``).
* LM damping with masked accept/reject steps (``jnp.where`` over the
  whole state) — a rejected step keeps the poses and raises the damping
  10x instead of diverging on a bad loop closure.

Precision: the solve and all residual einsums pin
``precision="highest"`` (metric-space invariant, CLAUDE.md).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry import se3

HI = jax.lax.Precision.HIGHEST


def _jr_inv(r: jax.Array) -> jax.Array:
    """Inverse right Jacobian of SE(3), second-order: I + ad(r)/2.

    ``ad([v,w]) = [[hat(w), hat(v)], [0, hat(w)]]`` in the repo's
    [v, w] tangent layout (se3.py docstring).
    """
    v, w = r[..., :3], r[..., 3:]
    hw, hv = se3.hat(w), se3.hat(v)
    Z = jnp.zeros_like(hw)
    ad = jnp.concatenate([
        jnp.concatenate([hw, hv], axis=-1),
        jnp.concatenate([Z, hw], axis=-1),
    ], axis=-2)
    return jnp.eye(6, dtype=r.dtype) + 0.5 * ad


def _adjoint(R: jax.Array, t: jax.Array) -> jax.Array:
    """SE(3) adjoint in [v, w] layout: [[R, hat(t)R], [0, R]]."""
    htR = jnp.einsum("...ij,...jk->...ik", se3.hat(t), R, precision=HI)
    Z = jnp.zeros_like(R)
    return jnp.concatenate([
        jnp.concatenate([R, htR], axis=-1),
        jnp.concatenate([Z, R], axis=-1),
    ], axis=-2)


def _edge_residuals(nodes: se3.Pose, e_from, e_to, rel: se3.Pose):
    """r_e = log(Z_e^-1 X_i^-1 X_j) for all edges at once."""
    Xi = se3.Pose(nodes.R[e_from], nodes.t[e_from])
    Xj = se3.Pose(nodes.R[e_to], nodes.t[e_to])
    d = se3.compose(se3.inverse(Xi), Xj)          # X_i^-1 X_j
    err = se3.compose(se3.inverse(rel), d)        # Z^-1 X_i^-1 X_j
    return se3.log(err), d


def _assemble(nodes, e_from, e_to, rel, w_diag, e_mask, dof_mask):
    """Dense H [6N,6N], b [6N], and the weighted cost.

    ``dof_mask`` [6N] (1 = free) structurally eliminates the gauge node
    and padded nodes: their rows/cols are zeroed and the diagonal set to
    1, so the f32 solve stays well-conditioned (a large-prior gauge
    would put ~1e9 on the diagonal and destroy f32 solve accuracy — the
    f64 reference converges in one GN step, the big-prior f32 version
    crawled for hundreds)."""
    n = nodes.t.shape[0]
    r, d = _edge_residuals(nodes, e_from, e_to, rel)       # [E,6]
    Jri = _jr_inv(r)                                       # [E,6,6]
    # dr/ddelta_i = -Jr_inv(r) Ad(X_j^-1 X_i) = -Jr_inv(r) Ad(d)^-1
    Ad_inv = _adjoint(jnp.swapaxes(d.R, -1, -2),
                      jnp.einsum("...ij,...j->...i", -jnp.swapaxes(d.R, -1, -2),
                                 d.t, precision=HI))       # Ad(d^-1)
    Ji = -jnp.einsum("eab,ebc->eac", Jri, Ad_inv, precision=HI)
    Jj = Jri
    wr = w_diag * e_mask[:, None]                          # [E,6]
    cost = jnp.sum(wr * r * r)
    # block contributions (6x6 each); J is [E, residual k, param a] so the
    # weight (one per residual component) multiplies axis 1, not axis 2
    JiW = Ji * wr[:, :, None]   # W Ji — weight residual rows by w
    JjW = Jj * wr[:, :, None]
    Hii = jnp.einsum("eka,ekb->eab", JiW, Ji, precision=HI)
    Hij = jnp.einsum("eka,ekb->eab", JiW, Jj, precision=HI)
    Hjj = jnp.einsum("eka,ekb->eab", JjW, Jj, precision=HI)
    bi = jnp.einsum("eka,ek->ea", JiW, r, precision=HI)
    bj = jnp.einsum("eka,ek->ea", JjW, r, precision=HI)

    Hb = jnp.zeros((n, n, 6, 6), dtype=r.dtype)
    Hb = Hb.at[e_from, e_from].add(Hii)
    Hb = Hb.at[e_from, e_to].add(Hij)
    Hb = Hb.at[e_to, e_from].add(jnp.swapaxes(Hij, -1, -2))
    Hb = Hb.at[e_to, e_to].add(Hjj)
    H = Hb.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
    b = jnp.zeros((n, 6), dtype=r.dtype)
    b = b.at[e_from].add(bi)
    b = b.at[e_to].add(bj)
    b = b.reshape(6 * n)
    H = dof_mask[:, None] * H * dof_mask[None, :]
    H = H.at[jnp.arange(6 * n), jnp.arange(6 * n)].add(
        jnp.where(dof_mask > 0, 0.0, 1.0))
    b = b * dof_mask
    return H, b, cost


def _cost_only(nodes, e_from, e_to, rel, w_diag, e_mask):
    r, _ = _edge_residuals(nodes, e_from, e_to, rel)
    return jnp.sum(w_diag * e_mask[:, None] * r * r)


def _retract(nodes: se3.Pose, delta: jax.Array, node_mask) -> se3.Pose:
    """X_i <- X_i exp(delta_i) for unmasked nodes except the gauge node."""
    upd = se3.exp(delta)
    newR = jnp.einsum("nij,njk->nik", nodes.R, upd.R, precision=HI)
    newt = jnp.einsum("nij,nj->ni", nodes.R, upd.t, precision=HI) + nodes.t
    m = node_mask[:, None]
    return se3.Pose(jnp.where(m[..., None] > 0, newR, nodes.R),
                    jnp.where(m > 0, newt, nodes.t))


@partial(jax.jit, static_argnames=("iters", "robust"))
def optimize_pose_graph(
    nodes_R: jax.Array,   # f32[N,3,3] initial poses (world frame)
    nodes_t: jax.Array,   # f32[N,3]
    node_mask: jax.Array,  # f32[N] 1=real node
    e_from: jax.Array,    # i32[E]
    e_to: jax.Array,      # i32[E]
    rel_R: jax.Array,     # f32[E,3,3] measured X_from^-1 X_to
    rel_t: jax.Array,     # f32[E,3]
    w_trans: jax.Array,   # f32[E] 1/sigma^2 (meters)
    w_rot: jax.Array,     # f32[E] 1/sigma^2 (radians)
    e_mask: jax.Array,    # f32[E] 1=real edge
    iters: int = 20,
    robust: str = "none",            # "none" | "huber" | "cauchy"
    robust_delta: float = 2.0,       # kernel width in whitened-chi units
    e_robust: jax.Array | None = None,  # f32[E] 1=apply kernel (None=all)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """LM over the padded pose graph; returns (R [N,3,3], t [N,3], cost).

    Padded edges MUST point at node 0 with identity rel so their (masked)
    residuals are finite; their weight rows are zeroed by ``e_mask``.

    ``robust`` applies an IRLS M-estimator per edge (the gtsam
    ``robustModel`` analogue the MOLA back-end would use): each LM step
    re-weights edge ``e`` by ``psi(chi_e)/chi_e`` of its whitened residual
    norm ``chi_e = sqrt(r_e^T W r_e)``, so a single WRONG loop closure is
    soft-disabled instead of bending the whole trajectory. ``e_robust``
    restricts the kernel (typically to non-odometry edges: odometry is
    trusted, loop closures are hypotheses)."""
    nodes = se3.Pose(nodes_R, nodes_t)
    rel = se3.Pose(rel_R, rel_t)
    w_diag = jnp.concatenate([
        jnp.broadcast_to(w_trans[:, None], (*w_trans.shape, 3)),
        jnp.broadcast_to(w_rot[:, None], (*w_rot.shape, 3)),
    ], axis=-1)                                            # [E,6]
    n = nodes_t.shape[0]
    free = node_mask.at[0].set(0.0)  # gauge node never moves
    dof_mask = jnp.repeat(free, 6)
    if e_robust is None:
        e_robust = jnp.ones_like(e_mask)

    def _irls_edge_weights(nodes):
        if robust == "none":
            return e_mask
        r, _ = _edge_residuals(nodes, e_from, e_to, rel)
        chi = jnp.sqrt(jnp.maximum(jnp.sum(w_diag * r * r, axis=-1), 1e-12))
        if robust == "huber":
            w = jnp.minimum(1.0, robust_delta / chi)
        elif robust == "cauchy":
            w = 1.0 / (1.0 + (chi / robust_delta) ** 2)
        else:
            raise ValueError(f"unknown robust kernel {robust!r}")
        return e_mask * jnp.where(e_robust > 0.5, w, 1.0)

    def step(carry, _):
        nodes, lam = carry
        e_w = _irls_edge_weights(nodes)
        H, b, cost = _assemble(nodes, e_from, e_to, rel, w_diag, e_w,
                               dof_mask)

        def try_step(lam_try):
            Hd = H.at[jnp.arange(6 * n), jnp.arange(6 * n)].add(
                lam_try * jnp.diagonal(H) * dof_mask + 1e-8)
            # H is SPD by construction (J^T W J on free DOFs + identity on
            # eliminated DOFs + LM damping): Cholesky, not pivoted LU — on
            # the remote TPU compiler the LU solve at 6N >= 1536 took
            # >15 min to compile while Cholesky compiles in seconds
            delta = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Hd), -b).reshape(n, 6)
            cand = _retract(nodes, delta, free)
            # accept/reject compares like-for-like: the IRLS weights are
            # frozen within the step (standard IRLS-LM)
            return cand, _cost_only(cand, e_from, e_to, rel, w_diag, e_w)

        cand, new_cost = try_step(lam)
        # reject -> keep poses, raise damping; accept -> lower damping
        ok = new_cost < cost
        nodes = jax.tree.map(
            lambda a, b_: jnp.where(ok, a, b_), cand, nodes)
        lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-6),
                        jnp.minimum(lam * 10.0, 1e4))
        return (nodes, lam), cost

    (nodes, _), _ = jax.lax.scan(step, (nodes, jnp.float32(1e-3)),
                                 None, length=iters)
    final_cost = _cost_only(nodes, e_from, e_to, rel, w_diag, e_mask)
    return nodes.R, nodes.t, final_cost
