"""3D geometry losses (reference torch/loss.py:8-243 + train.py:448-512).

All losses are dense masked reductions over (B, Z, Y, X[, C]) grids — the
TPU-native replacement for the reference's boolean-select reductions (which
produce dynamic shapes). ``masked_mean(x, m) == x[m].mean()`` exactly."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x: jax.Array, mask: jax.Array, eps: float = 1e-12) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), eps)


def apply_log_transform(sdf: jax.Array) -> jax.Array:
    """sign(x) * log(|x| + 1) (reference loss.py:15-19)."""
    return jnp.sign(sdf) * jnp.log1p(jnp.abs(sdf))


def compute_targets(target_sdf: jax.Array, truncation: float) -> jax.Array:
    """Clamp targets to +-truncation; -inf (unobserved) becomes -truncation
    (reference loss.py:8-12 + data_util.py:187-190)."""
    return jnp.clip(target_sdf, -truncation, truncation)


def dense_geo_weights(
    target_sdf: jax.Array,
    input_occ: jax.Array,
    truncation: float,
    weight_surf_geo: float,
    weight_missing_geo: float,
) -> jax.Array:
    """Per-voxel weights: surface voxels get weight_surf_geo, surface voxels
    missing from the input get weight_missing_geo (reference loss.py:29-35)."""
    w = jnp.ones_like(target_sdf)
    surf = jnp.abs(target_sdf) < truncation - 0.01
    if weight_surf_geo > 1:
        w = jnp.where(surf, weight_surf_geo, w)
    if weight_missing_geo > 1:
        w = jnp.where(surf & ~input_occ, weight_missing_geo, w)
    return w


def occ_loss(
    target_sdf: jax.Array,
    occ_logits: jax.Array,
    known: jax.Array | None,
    weight: jax.Array | None,
    truncation: float,
) -> jax.Array:
    """Weighted BCE-with-logits on occupancy, masked to known space
    (reference compute_geo_occ_loss_dense, loss.py:130-146)."""
    target = (jnp.abs(target_sdf) < truncation).astype(jnp.float32)
    logits = occ_logits
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is not None:
        bce = bce * weight
    mask = jnp.ones_like(target) if known is None else known.astype(jnp.float32)
    return masked_mean(bce, mask)


def occ_iou(
    target_sdf: jax.Array,
    occ_logits: jax.Array,
    known: jax.Array | None,
    truncation: float,
) -> jax.Array:
    """Occupancy IoU at sigmoid > 0.5, within known space (reference
    compute_iou_occ_dense, loss.py:216-231). Returns -1 when the union is
    empty."""
    target = jnp.abs(target_sdf) < truncation
    pred = jax.nn.sigmoid(occ_logits) > 0.5
    if known is not None:
        k = known.astype(bool)
        target = target & k
        pred = pred & k
    inter = jnp.sum(pred & target)
    union = jnp.sum(pred | target)
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), -1.0)


def sdf_l1_loss(
    target_sdf: jax.Array,
    pred_sdf: jax.Array,
    known: jax.Array | None,
    weight: jax.Array | None,
    log_transform: bool = True,
) -> jax.Array:
    """(log-)L1 SDF regression, masked to known space (reference
    compute_geo_loss_dense, loss.py:86-114)."""
    t = target_sdf
    p = pred_sdf
    if log_transform:
        t = apply_log_transform(t)
        p = apply_log_transform(p)
    l1 = jnp.abs(t - p)
    if weight is not None:
        l1 = l1 * weight
    mask = jnp.ones_like(l1) if known is None else known.astype(jnp.float32)
    return masked_mean(l1, mask)


def missing_geo_mask(input_occ: jax.Array, target_sdf: jax.Array, truncation: float) -> jax.Array:
    """Target-surface voxels in 8x8x8 blocks with no input geometry
    (reference compute_missing_geo_mask, loss.py:348-356). Inputs are
    (B, Z, Y, X) bool/float."""
    occ = input_occ.astype(jnp.float32)[..., None]
    pooled = jax.lax.reduce_window(
        occ,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 8, 8, 8, 1),
        window_strides=(1, 8, 8, 8, 1),
        padding="VALID",
    )
    up = jnp.repeat(jnp.repeat(jnp.repeat(pooled, 8, 1), 8, 2), 8, 3)[..., 0]
    mask = jnp.abs(target_sdf) < truncation
    return mask & ~(up > 0)
