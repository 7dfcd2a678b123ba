"""Semantic cross-entropy losses, 3D and 2D (reference train.py:736-752).

The reference computes torch F.cross_entropy with per-class weights over
dynamically-selected voxels/pixels; here they are dense masked reductions.
torch's weighted CE normalizes by the sum of selected samples' class weights —
replicated exactly."""

from __future__ import annotations

import jax
import jax.numpy as jnp

UNLABELED = 14


def weighted_cross_entropy(
    logits: jax.Array,  # (..., C)
    labels: jax.Array,  # (...) int
    mask: jax.Array,  # (...) bool
    class_weights: jax.Array,  # (C,)
) -> jax.Array:
    """sum_i m_i * w[y_i] * ce_i / sum_i m_i * w[y_i] — torch F.cross_entropy
    semantics with `weight=` (used at reference train.py:741,745)."""
    c = logits.shape[-1]
    labels_c = jnp.clip(labels, 0, c - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels_c[..., None], axis=-1)[..., 0]
    w = class_weights[labels_c] * mask.astype(logits.dtype)
    return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-12)


def semantic_3d_loss(
    sem_logits: jax.Array,  # (B, Z, Y, X, C)
    target_sem: jax.Array,  # (B, Z, Y, X) uint8
    surface_mask: jax.Array,  # (B, Z, Y, X) bool — predicted surface voxels
    class_weights: jax.Array,
) -> jax.Array:
    """3D semantic CE over predicted-surface voxels with labeled targets
    (reference train.py:736-742: locs from |pred sdf|<trunc & ~empty, targets
    < 14)."""
    labels = target_sem.astype(jnp.int32)
    mask = surface_mask & (labels < UNLABELED)
    return weighted_cross_entropy(sem_logits, labels, mask, class_weights)


def semantic_2d_loss(
    raycast_sem: jax.Array,  # (B, H, W, C) rendered logits (-inf invalid)
    target_label: jax.Array,  # (B, H, W) int labels (UNLABELED = ignore)
    class_weights: jax.Array,
) -> jax.Array:
    """2D semantic CE on rendered logits vs rendered target labels
    (reference train.py:743-747)."""
    valid = (target_label < UNLABELED) & (raycast_sem[..., 0] != -jnp.inf)
    logits = jnp.where(jnp.isfinite(raycast_sem), raycast_sem, 0.0)
    return weighted_cross_entropy(logits, target_label.astype(jnp.int32), valid, class_weights)


def rendered_semantic_label(raycast_sem: jax.Array) -> jax.Array:
    """argmax over rendered semantic channels with an implicit always-1
    "unlabeled" channel appended (reference train.py:613-616, 749-752):
    invalid (-inf) pixels and low-score pixels map to UNLABELED."""
    ones = jnp.ones(raycast_sem.shape[:-1] + (1,), raycast_sem.dtype)
    cat = jnp.concatenate([raycast_sem, ones], axis=-1)
    return jnp.argmax(cat, axis=-1).astype(jnp.int32)
