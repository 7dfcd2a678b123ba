"""2D view-guided losses (reference torch/loss.py:246-356 + train.py:524-752).

Operate on raycast images with -inf invalid sentinels; every dynamic boolean
select of the reference becomes a masked mean."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geo import masked_mean


def depth_l1_loss(
    raycast_depth: jax.Array,  # (B, H, W), voxel units, -inf invalid
    image_depth: jax.Array,  # (B, H, W), meters, 0 = hole
    voxelsize: float,
) -> jax.Array:
    """L1 between rendered depth (converted to meters) and the target depth
    where both are valid (reference train.py:634-638)."""
    pred_m = raycast_depth * voxelsize
    valid = (raycast_depth != -jnp.inf) & (image_depth != 0.0)
    diff = jnp.abs(jnp.where(valid, pred_m - image_depth, 0.0))
    return masked_mean(diff, valid)


def color_l1_loss(
    raycast_color: jax.Array,  # (B, H, W, 3), -inf invalid
    image_color: jax.Array,  # (B, H, W, 3)
    weight: jax.Array | None = None,  # (B, H, W) optional per-pixel weight
) -> jax.Array:
    """L1 between rendered and target color over valid pixels (reference
    compute_2dcolor_loss, loss.py:246-257: the weight multiplies both sides)."""
    valid = raycast_color != -jnp.inf
    pred = raycast_color
    tgt = image_color
    if weight is not None:
        pred = pred * weight[..., None]
        tgt = tgt * weight[..., None]
    diff = jnp.abs(jnp.where(valid, pred - tgt, 0.0))
    return masked_mean(diff, valid)


def filter_proj_target(raycast_color: jax.Array, color_thresh: float, color_space: str) -> jax.Array:
    """Pixels whose projected target color is (near) black / lab-neutral —
    holes in the sparse color volume (reference loss.py:333-345). Returns
    (B, H, W) bool invalid mask."""
    c = raycast_color
    if color_space == "rgb":
        thresh = float(color_thresh) / 255.0
        return (c[..., 0] < thresh) & (c[..., 1] < thresh) & (c[..., 2] < thresh)
    elif color_space == "lab":
        t = 0.01
        return (
            (c[..., 0] < t)
            & (c[..., 1] > 0.5 - t)
            & (c[..., 1] < 0.5 + t)
            & (c[..., 2] > 0.5 - t)
            & (c[..., 2] < 0.5 + t)
        )
    raise ValueError(color_space)


def preprocess_rendered_target_images(render: jax.Array, target: jax.Array):
    """Copy target pixels into invalid (-inf) render pixels (reference
    style.py:24-29). Returns (render', target)."""
    invalid = render == -jnp.inf
    return jnp.where(invalid, target, render), target


def compute_view_matrix(world2grid: jax.Array, poses: jax.Array) -> jax.Array:
    """Camera->grid view matrices: world2grid @ pose (reference
    style.py:9-16). world2grid (B,4,4), poses (B,4,4)."""
    return jnp.einsum("bij,bjk->bik", world2grid, poses)
