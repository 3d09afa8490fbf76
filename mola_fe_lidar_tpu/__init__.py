"""mola_fe_lidar_tpu — a TPU-native LiDAR odometry / scan-matching framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
MOLAorg/mola-fe-lidar (reference: /root/reference/src/LidarOdometry.cpp):
a LiDAR odometry front-end with multi-stage ICP registration, keyframing,
factor emission, local pose graph, nearby-keyframe alignment and
Monte-Carlo loop closure — designed TPU-first:

* device-resident registration engine: fixed-shape padded point clouds,
  ``lax.while_loop`` ICP with zero host round-trips per iteration,
  nearest-neighbor correspondence as MXU matmuls / Pallas kernels instead
  of kd-tree traversal;
* batched alignment: odometry, nearby-align and loop-closure Monte-Carlo
  perturbations all ride one vmapped pair axis, sharded over a
  ``jax.sharding.Mesh`` with pjit/shard_map;
* a thin host orchestrator reproducing the reference front-end protocol
  (observation gating, back-pressure, keyframe decisions, pose-graph
  candidate search, async back-end interface).

Package layout (SURVEY.md §7 build plan):

- ``geometry/``  SE(3) Lie group core, pose PDFs, twist model
- ``cloud/``     MetricMap pytree (named layers of padded clouds), voxel hash
- ``filters/``   generators + filter pipeline (raw scan → layered cloud)
- ``ops/``       matching kernels (brute-force MXU NN, Pallas streaming NN,
                 local plane fitting)
- ``solve/``     Horn/SVD + Gauss-Newton solvers, robust kernels, quality
- ``models/``    the ICP engine families and presets (the "model zoo")
- ``parallel/``  mesh/sharding utilities, multi-device batched ICP
- ``frontend/``  LidarOdometry module, back-end protocol, WorldModel,
                 local pose graph
- ``obs/``       KITTI + synthetic dataset readers, replay runner
- ``utils/``     config (YAML + $include), registry, profiler, logging
"""

__version__ = "0.1.0"
