"""ICP model presets — the rebuild of the reference's param files.

``icp_settings_regular`` mirrors reference params/icp-settings-regular.yaml
(maxIterations 100, steps 5e-5/1e-5, Matcher_Point2Plane knn=6 @0.70 m,
planeEigenThreshold 0.07, Solver_GaussNewton maxIterations 20,
QualityEvaluator_PairedRatio @0.10 m, scale-outlier detector @1.1);
``icp_settings_loop_closure`` mirrors params/icp-settings-loop-closure.yaml
(byte-identical content in the reference — kept as a separate preset so the
loop-closure case stays independently tunable, as the reference intends).
"""

from __future__ import annotations

from typing import Dict

from .config import AlignKind, ICPParams, Matcher, PairWeights, Quality, Solver


def icp_settings_regular(
    src_layer: str = "raw",
    tgt_layer: str = "raw",
    matcher_kind: str = "point2plane_knn",
) -> ICPParams:
    return ICPParams(
        max_iterations=100,
        min_abs_step_trans=5e-5,
        min_abs_step_rot=1e-5,
        matchers=(
            Matcher(
                kind=matcher_kind,
                src_layer=src_layer,
                tgt_layer=tgt_layer,
                distance_threshold=0.70,
                knn=6,
                plane_eigen_threshold=0.07,
            ),
        ),
        solver=Solver(kind="gauss_newton", max_iterations=20),
        quality=(Quality(kind="paired_ratio", threshold_distance=0.10,
                         src_layer=src_layer, tgt_layer=tgt_layer),),
        weights=PairWeights(
            use_scale_outlier_detector=True,
            scale_outlier_threshold=1.1,
            use_robust_kernel=False,
        ),
    )


def icp_settings_loop_closure(
    src_layer: str = "raw",
    tgt_layer: str = "raw",
    matcher_kind: str = "point2plane_knn",
) -> ICPParams:
    return icp_settings_regular(src_layer, tgt_layer, matcher_kind)


def icp_cases_kitti(
    src_layer: str = "raw", tgt_layer: str = "raw", matcher_kind: str = "point2plane_knn"
) -> Dict[AlignKind, ICPParams]:
    """The three ICP cases keyed by AlignKind (reference
    src/LidarOdometry.cpp:122-128: icp_settings_with_vel / _without_vel /
    _loop_closure)."""
    return {
        AlignKind.LIDAR_ODOMETRY: icp_settings_regular(src_layer, tgt_layer, matcher_kind),
        AlignKind.NEARBY_ALIGN: icp_settings_regular(src_layer, tgt_layer, matcher_kind),
        AlignKind.LOOP_CLOSURE: icp_settings_loop_closure(src_layer, tgt_layer, matcher_kind),
    }
