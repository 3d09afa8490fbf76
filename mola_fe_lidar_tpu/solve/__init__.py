from .robust import robust_weights, scale_outlier_weights, ROBUST_KERNELS
from .horn import weighted_horn, point_to_point_normal_matrix
from .olae import weighted_olae
from .gauss_newton import (
    point_to_plane_step,
    solve_normal_equations,
    covariance_from_normal_matrix,
)
from .quality import paired_ratio

__all__ = [
    "robust_weights", "scale_outlier_weights", "ROBUST_KERNELS",
    "weighted_horn", "point_to_point_normal_matrix", "weighted_olae",
    "point_to_plane_step", "solve_normal_equations",
    "paired_ratio",
]
