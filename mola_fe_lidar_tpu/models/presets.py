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


def icp_coarse_to_fine(
    tgt_layer: str = "raw",
    src_layer: str = "raw",
    coarse_threshold: float = 5.0,
    fine_threshold: float = 1.0,
):
    """Two-stage coarse-to-fine pipeline (the decimation-pyramid pattern;
    BASELINE config #3): a short wide-radius point-to-point stage rescues
    bad initializations, then point-to-plane polishes. Use with
    ``models.align_pipeline``. Low iteration caps keep batched while_loops
    from being hostage to one straggler pair."""
    coarse = ICPParams(
        max_iterations=10,
        matchers=(Matcher(kind="point2point", src_layer=src_layer,
                          tgt_layer=tgt_layer,
                          distance_threshold=coarse_threshold),),
        solver=Solver(kind="horn"),
        quality=(Quality(src_layer=src_layer, tgt_layer=tgt_layer),),
        weights=PairWeights(use_scale_outlier_detector=False),
    )
    fine = ICPParams(
        max_iterations=30,
        matchers=(Matcher(kind="point2plane_normals", src_layer=src_layer,
                          tgt_layer=tgt_layer,
                          distance_threshold=fine_threshold),),
        solver=Solver(kind="gauss_newton", max_iterations=10),
        quality=(Quality(src_layer=src_layer, tgt_layer=tgt_layer),),
        weights=PairWeights(use_scale_outlier_detector=False),
    )
    return (coarse, fine)


def icp_pyramid_3level(tgt_layer: str = "raw", src_layer: str = "raw"):
    """Three-level coarse-to-fine decimation-pyramid ICP (BASELINE config #3):
    very-wide point-to-point -> mid point-to-point -> fine point-to-plane."""
    mk = lambda thresh, iters, kind, solver: ICPParams(
        max_iterations=iters,
        matchers=(Matcher(kind=kind, src_layer=src_layer, tgt_layer=tgt_layer,
                          distance_threshold=thresh),),
        solver=solver,
        quality=(Quality(src_layer=src_layer, tgt_layer=tgt_layer),),
        weights=PairWeights(use_scale_outlier_detector=False),
    )
    return (
        mk(10.0, 8, "point2point", Solver(kind="horn")),
        mk(3.0, 10, "point2point", Solver(kind="horn")),
        mk(1.0, 25, "point2plane_normals",
           Solver(kind="gauss_newton", max_iterations=10)),
    )


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
