"""Gaussian pose PDFs — TPU-native ``CPose3DPDFGaussian`` analogue (E11).

The reference's ICP result carries ``optimal_tf: CPose3DPDFGaussian``
(mean + 6×6 covariance; reference src/LidarOdometry.cpp:873-888). Here a
:class:`PosePDF` is a batchable pytree of a :class:`~..geometry.se3.Pose`
mean and a covariance over the se(3) tangent ``[v, w]`` at the mean.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3


class PosePDF(NamedTuple):
    mean: se3.Pose
    cov: jax.Array  # f32[..., 6, 6] over tangent [v, w]


def pdf_from_pose(pose: se3.Pose, sigma_xyz: float = 0.0, sigma_rot: float = 0.0) -> PosePDF:
    """Diagonal-covariance PDF, e.g. the fixed factor noise of the reference
    (0.10 m / 1°; src/LidarOdometry.cpp:444-445)."""
    batch = pose.t.shape[:-1]
    diag = jnp.array([sigma_xyz**2] * 3 + [sigma_rot**2] * 3, dtype=pose.t.dtype)
    cov = jnp.broadcast_to(jnp.diag(diag), (*batch, 6, 6))
    return PosePDF(pose, cov)
