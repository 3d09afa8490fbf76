"""Constant-velocity motion model — ``mrpt::math::TTwist3D`` analogue (E11).

The reference keeps a twist estimate in ``MethodState`` updated from each
ICP result and uses it to seed the next alignment
(reference src/LidarOdometry.cpp:264-275 for the prediction,
:305-311 for the update). The reference leaves the angular part mostly
unimplemented (``MRPT_TODO("do omega_xyz part!")``, src/LidarOdometry.cpp:276
— only ``wz`` is used); here the full se(3) twist is propagated, honoring
that TODO rather than copying the gap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3

# A twist is a tangent-space velocity: [vx, vy, vz, wx, wy, wz] (units 1/s).
Twist = jax.Array


def twist_zero(dtype=jnp.float32) -> Twist:
    return jnp.zeros((6,), dtype=dtype)


def twist_from_delta(rel_pose: se3.Pose, dt) -> Twist:
    """Estimate twist from an SE(3) increment over ``dt`` seconds
    (reference src/LidarOdometry.cpp:305-311, via the full log map)."""
    dt = jnp.asarray(dt, dtype=rel_pose.t.dtype)
    safe_dt = jnp.where(dt <= 0, 1.0, dt)
    tau = se3.log(rel_pose) / safe_dt
    return jnp.where(dt <= 0, jnp.zeros_like(tau), tau)


def propagate_pose(twist: Twist, dt) -> se3.Pose:
    """Predicted relative motion over ``dt``: exp(dt · twist)
    (reference src/LidarOdometry.cpp:264-275)."""
    dt = jnp.asarray(dt, dtype=twist.dtype)
    return se3.exp(twist * dt)
