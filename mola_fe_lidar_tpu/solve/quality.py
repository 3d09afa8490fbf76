"""Quality evaluators (E5) — rebuild of
``mp2p_icp::QualityEvaluator_PairedRatio`` (reference
params/icp-settings-regular.yaml:43-46, thresholdDistance: 0.10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def paired_ratio(
    nn_dist: jax.Array,
    src_mask: jax.Array,
    threshold_distance: float = 0.10,
) -> jax.Array:
    """Fraction of valid source points whose NN lies within
    ``threshold_distance`` — scalar goodness in [0, 1], the gate for
    keyframe acceptance (reference src/LidarOdometry.cpp:321-337) and
    loop-closure acceptance (:809-816)."""
    paired = (nn_dist < threshold_distance).astype(nn_dist.dtype) * src_mask
    n = jnp.maximum(jnp.sum(src_mask, axis=-1), 1.0)
    return jnp.sum(paired, axis=-1) / n
