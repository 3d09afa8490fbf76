"""Robust reweighting (IRLS) and the scale-consistency outlier detector (E4).

The reference's pairing-weight options live in
``pairingsWeightParameters`` (reference params/icp-settings-regular.yaml:14-21):
``use_scale_outlier_detector`` / ``scale_outlier_threshold`` and
``use_robust_kernel`` / ``robust_kernel_param`` / ``robust_kernel_scale``.

All functions are pure, masked, fixed-shape — weights of value 0 remove a
pairing without changing any shape (the TPU idiom for "discard").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _huber(r: jax.Array, c: float) -> jax.Array:
    a = jnp.abs(r)
    return jnp.where(a <= c, 1.0, c / jnp.maximum(a, 1e-12))


def _cauchy(r: jax.Array, c: float) -> jax.Array:
    return 1.0 / (1.0 + (r / c) ** 2)


def _geman_mcclure(r: jax.Array, c: float) -> jax.Array:
    c2 = c * c
    return (c2 / (c2 + r * r)) ** 2


def _tukey(r: jax.Array, c: float) -> jax.Array:
    u = r / c
    w = (1.0 - u * u) ** 2
    return jnp.where(jnp.abs(u) <= 1.0, w, 0.0)


def _welsch(r: jax.Array, c: float) -> jax.Array:
    return jnp.exp(-((r / c) ** 2))


ROBUST_KERNELS = {
    "none": lambda r, c: jnp.ones_like(r),
    "huber": _huber,
    "cauchy": _cauchy,
    "gemanmcclure": _geman_mcclure,
    "tukey": _tukey,
    "welsch": _welsch,
}


def robust_weights(residuals: jax.Array, kernel: str, param: float,
                   scale: float = 1.0) -> jax.Array:
    """IRLS weight ψ(r)/r for the named kernel (static choice).

    ``scale`` sharpens the kernel by pre-scaling residuals with √scale —
    for Cauchy this is exactly ``1 / (1 + scale·(r/param)²)``, the algebra
    of the reference config's ``robust_kernel_scale`` knob
    (reference params/icp-settings-regular.yaml:21, default 400.0 there);
    ``scale=1`` leaves the kernel at its nominal width ``param``."""
    if kernel not in ROBUST_KERNELS:
        raise ValueError(f"unknown robust kernel {kernel!r}; have {sorted(ROBUST_KERNELS)}")
    r = residuals if scale == 1.0 else residuals * (scale ** 0.5)
    return ROBUST_KERNELS[kernel](r, param)


def scale_outlier_weights(
    src_pts: jax.Array,
    tgt_pts: jax.Array,
    mask: jax.Array,
    threshold: float,
) -> jax.Array:
    """Scale-consistency gate over pairings (0/1 weights).

    Behavioral equivalent of mp2p_icp's scale outlier detector
    (``use_scale_outlier_detector``/``scale_outlier_threshold: 1.1``,
    reference params/icp-settings-regular.yaml:15-17): a rigid transform
    preserves distances, so for each pairing the distance of the source
    point to the source pairing-centroid must match the distance of its
    mate to the target pairing-centroid. Pairings whose ratio
    ``max(ds,dt)/min(ds,dt)`` exceeds ``threshold`` are zero-weighted.
    """
    w = mask
    tot = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mu_s = jnp.sum(src_pts * w[..., None], axis=-2, keepdims=True) / tot[..., None]
    mu_t = jnp.sum(tgt_pts * w[..., None], axis=-2, keepdims=True) / tot[..., None]
    ds = jnp.linalg.norm(src_pts - mu_s, axis=-1)
    dt = jnp.linalg.norm(tgt_pts - mu_t, axis=-1)
    lo = jnp.minimum(ds, dt)
    hi = jnp.maximum(ds, dt)
    ratio = hi / jnp.maximum(lo, 1e-6)
    return jnp.where(ratio <= threshold, mask, 0.0)
