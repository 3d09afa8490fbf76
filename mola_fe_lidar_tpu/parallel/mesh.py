"""Device mesh utilities.

The reference scales scan-pair work with a host thread pool of
``max(2, hw_concurrency/2)`` workers (reference src/LidarOdometry.cpp:94-96).
The TPU-native counterpart is a ``jax.sharding.Mesh``: scan-pair batches
shard over a ``data`` axis, and (optionally) the target point axis of one
huge cloud shards over a ``model`` axis (SURVEY.md §2c). Collectives ride
ICI; there is no NCCL/MPI analogue to manage.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Dict[str, int], devices=None) -> Mesh:
    """Build a mesh from ``{"data": 4, "model": 2}``-style axis sizes."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(list(axes.values())))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(dev, tuple(axes.keys()))


def default_mesh(devices=None) -> Mesh:
    """1-D data mesh over all available devices."""
    devices = devices if devices is not None else jax.devices()
    return make_mesh({"data": len(devices)}, devices)


def pad_batch(tree, multiple: int):
    """Pad every leaf's leading axis to a multiple (for even sharding).
    Returns (padded_tree, original_batch)."""
    leaves = jax.tree.leaves(tree)
    b = leaves[0].shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return tree, b
    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)
    return jax.tree.map(_pad, tree), b


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a batched pytree with its leading axis sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)
