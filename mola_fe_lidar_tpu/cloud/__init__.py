from .metric_map import PointCloud, MetricMap, from_points, empty_cloud, concat_clouds
from .voxel import voxel_coords, lex_sort_by_voxel, voxel_segments, voxel_stats

__all__ = [
    "PointCloud", "MetricMap", "from_points", "empty_cloud", "concat_clouds",
    "voxel_coords", "lex_sort_by_voxel", "voxel_segments", "voxel_stats",
]
