from .synthetic import SyntheticWorld, synthetic_sequence
from .metrics import ate_rmse, rpe_rmse, umeyama_align
from .kitti import KittiOdometrySequence, read_velodyne_bin

__all__ = [
    "SyntheticWorld", "synthetic_sequence",
    "ate_rmse", "rpe_rmse", "umeyama_align",
    "KittiOdometrySequence", "read_velodyne_bin",
]
