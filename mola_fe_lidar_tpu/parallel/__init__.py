from .mesh import make_mesh, default_mesh, shard_batch, pad_batch
from .batch import (
    batched_align, make_batched_align, make_chunked_batched_align,
    monte_carlo_guesses,
)
from .distributed import make_sharded_align, make_dp_tp_align

__all__ = [
    "make_mesh", "default_mesh", "shard_batch", "pad_batch",
    "batched_align", "make_batched_align", "make_chunked_batched_align",
    "monte_carlo_guesses",
    "make_sharded_align", "make_dp_tp_align",
]
