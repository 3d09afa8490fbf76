from .eigen3 import sym_eigenvalues_3x3, smallest_eigenvector_3x3
from .matching import nearest_neighbors, knn, NNResult

__all__ = [
    "sym_eigenvalues_3x3",
    "smallest_eigenvector_3x3",
    "nearest_neighbors",
    "knn",
    "NNResult",
]
