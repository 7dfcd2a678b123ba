"""VGG style/content losses (reference torch/style.py:18-68).

Feature maps come from :mod:`spsg_tpu.models.vgg` (channel-last). Gram
matrices are batched matmuls — pure MXU work on TPU."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def gram_matrix(features: jax.Array) -> jax.Array:
    """(B, H, W, C) -> Gram of the stacked (B*C, H*W) feature matrix, divided
    by C*H*W (reference style.py:18-22 — note the reference stacks the batch
    into the feature dimension)."""
    b, h, w, c = features.shape
    f = jnp.transpose(features, (0, 3, 1, 2)).reshape(b * c, h * w)
    g = f @ f.T
    return g / (c * h * w)


def style_content_loss(
    output_features: Sequence[jax.Array],
    target_features: Sequence[jax.Array],
    compute_style: bool,
    compute_content: bool,
) -> Tuple[jax.Array, jax.Array]:
    """MSE of (10x scaled) Gram matrices + feature MSE (reference
    style.py:36-50)."""
    loss_style = jnp.zeros(())
    loss_content = jnp.zeros(())
    for out_f, tgt_f in zip(output_features, target_features):
        if compute_content:
            loss_content = loss_content + jnp.mean((out_f - tgt_f) ** 2)
        if compute_style:
            g_out = gram_matrix(out_f) * 10.0
            g_tgt = gram_matrix(tgt_f) * 10.0
            loss_style = loss_style + jnp.mean((g_out - g_tgt) ** 2)
    return loss_style, loss_content
