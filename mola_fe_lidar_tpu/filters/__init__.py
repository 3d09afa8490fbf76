from .base import FILTER_REGISTRY, GENERATOR_REGISTRY, FilterPipeline, make_filter, make_generator
from .pipeline import (
    FilterVoxelDownsample,
    FilterDecimate,
    FilterBoundingBox,
    FilterEdgesPlanes,
    FilterNormals,
)
from .generators import GeneratorRawPoints, apply_generators

__all__ = [
    "FILTER_REGISTRY", "GENERATOR_REGISTRY", "FilterPipeline",
    "make_filter", "make_generator",
    "FilterVoxelDownsample", "FilterDecimate", "FilterBoundingBox",
    "FilterEdgesPlanes", "FilterNormals",
    "GeneratorRawPoints", "apply_generators",
]
