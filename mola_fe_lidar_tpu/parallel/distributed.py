"""Multi-device ICP via ``shard_map``: tensor-parallel and DP×TP layouts.

Parallel layouts offered (SURVEY.md §2c):

* **DP** (``batch.make_batched_align`` with a mesh): scan-pair batch axis
  sharded; zero cross-chip traffic per alignment. Best throughput when
  there are many pairs.
* **TP** (:func:`make_sharded_align`): ONE alignment whose *target cloud
  point axis* is sharded across chips — for clouds too big for one chip's
  HBM/VMEM appetite. Cross-chip traffic per ICP iteration is the tiny
  champion table of the argmin reduction (P×N floats over ICI).
* **DP×TP** (:func:`make_dp_tp_align`): 2-D mesh, batch over ``data``,
  target points over ``model``.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import ICPParams
from ..models.icp import align


def _replicated_specs(tree):
    return jax.tree.map(lambda x: P(), tree)


def _point_sharded_specs(tree, axis_name: str, batch_axes: int = 0):
    """Shard the point axis (first axis after any batch axes) of every leaf."""
    def spec(x):
        dims = [None] * x.ndim
        dims[batch_axes] = axis_name
        return P(*dims)
    return jax.tree.map(spec, tree)


def _batch_specs(tree, axis_name: str):
    def spec(x):
        dims = [None] * x.ndim
        dims[0] = axis_name
        return P(*dims)
    return jax.tree.map(spec, tree)


def _dp_tp_specs(tree, data_axis: str, model_axis: str):
    def spec(x):
        dims = [None] * x.ndim
        dims[0] = data_axis
        if x.ndim > 1:
            dims[1] = model_axis
        return P(*dims)
    return jax.tree.map(spec, tree)


def make_sharded_align(mesh: Mesh, params: ICPParams, model_axis: str = "model"):
    """Tensor-parallel align: target cloud sharded on the point axis.

    Returned fn takes (src_map, tgt_map, init_pose) with *global* shapes;
    src and pose are replicated, the result is replicated. Target layer
    capacities must divide the ``model`` axis size.
    """
    params_tp = dataclasses.replace(params, shard_axis=model_axis)

    def run(src_map, tgt_map, init_pose):
        in_specs = (
            _replicated_specs(src_map),
            _point_sharded_specs(tgt_map, model_axis),
            _replicated_specs(init_pose),
        )
        f = jax.shard_map(
            lambda s, t, g: align(s, t, g, params_tp),
            mesh=mesh, in_specs=in_specs, out_specs=P(),
            check_vma=False,
        )
        return f(src_map, tgt_map, init_pose)

    return jax.jit(run)


def make_dp_tp_align(
    mesh: Mesh,
    params: ICPParams,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """2-D-parallel align: batch over ``data``, target point axis over
    ``model``. Inputs carry a leading batch axis divisible by the data-axis
    size; target layer capacities divisible by the model-axis size."""
    params_tp = dataclasses.replace(params, shard_axis=model_axis)

    def run(src_maps, tgt_maps, init_poses):
        in_specs = (
            _batch_specs(src_maps, data_axis),
            _dp_tp_specs(tgt_maps, data_axis, model_axis),
            _batch_specs(init_poses, data_axis),
        )
        local = jax.vmap(lambda s, t, g: align(s, t, g, params_tp))
        f = jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=P(data_axis),
            check_vma=False,
        )
        return f(src_maps, tgt_maps, init_poses)

    return jax.jit(run)
