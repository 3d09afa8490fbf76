from .backend import (
    BackEndBase, InMemoryBackend, OptimizingBackend, ProposeKFInput, ProposeKFOutput,
    AddFactorOutput, FactorRelativePose3, AdvertiseLocalization,
)
from .worldmodel import WorldModel, ANNOTATION_NAME_PC_LAYERS
from .pose_graph import PoseGraph
from .module_base import FrontEndBase, MODULE_REGISTRY, RawObservation
from .odometry import LidarOdometry, LidarOdometryParameters, ICPInput, ICPOutput

__all__ = [
    "BackEndBase", "InMemoryBackend", "OptimizingBackend", "ProposeKFInput", "ProposeKFOutput",
    "AddFactorOutput", "FactorRelativePose3", "AdvertiseLocalization",
    "WorldModel", "ANNOTATION_NAME_PC_LAYERS",
    "PoseGraph",
    "FrontEndBase", "MODULE_REGISTRY", "RawObservation",
    "LidarOdometry", "LidarOdometryParameters", "ICPInput", "ICPOutput",
]
