"""GAN losses: vanilla / hinge / wgan / wgan-gp (reference torch/loss.py:359-472).

The discriminator outputs patch logits (B, H', W', 1). The reference selects
valid patches with a boolean mask and averages; here every variant is a masked
mean with optional per-patch weights (``weight``) and per-sample weights
(``sample_weight_real/fake`` for --weight_by_percent_pixels,
train.py:705-715)."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .geo import masked_mean


def _bce_logits(logits: jax.Array, target: float) -> jax.Array:
    t = jnp.full_like(logits, target)
    return jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _prep(d: jax.Array, weight: Optional[jax.Array]) -> jax.Array:
    if weight is not None:
        d = d * weight.reshape(d.shape)
    return d


def _masked(x: jax.Array, valid: Optional[jax.Array], sample_weight: Optional[jax.Array]):
    """x (B,H,W,1); valid (B,H,W) or None; sample_weight (B,) or None."""
    x = jnp.mean(x, axis=-1)  # torch.mean(loss, 1) over the singleton channel
    if sample_weight is not None:
        x = x * sample_weight[:, None, None]
    if valid is None:
        return jnp.mean(x)
    return masked_mean(x, valid)


def discriminator_loss(
    loss_type: str,
    d_real: jax.Array,
    d_fake: jax.Array,
    valid: Optional[jax.Array] = None,
    weight: Optional[jax.Array] = None,
    label_smoothing: float = 1.0,
    sample_weight_real: Optional[jax.Array] = None,
    sample_weight_fake: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (real_loss, fake_loss) scalars (reference loss.py:374-442)."""
    d_real = _prep(d_real, weight)
    d_fake = _prep(d_fake, weight)
    if loss_type == "vanilla":
        real = _bce_logits(d_real, label_smoothing)
        fake = _bce_logits(d_fake, 0.0)
    elif loss_type == "hinge":
        real = jax.nn.relu(1.0 - d_real)
        fake = jax.nn.relu(1.0 + d_fake)
    elif loss_type in ("wgan", "wgan_gp"):
        real = -d_real
        fake = d_fake
    else:
        raise ValueError(loss_type)
    return (
        _masked(real, valid, sample_weight_real),
        _masked(fake, valid, sample_weight_fake),
    )


def generator_loss(loss_type: str, d_fake: jax.Array) -> jax.Array:
    """Generator adversarial loss — unmasked mean, like the reference
    (loss.py:393-401)."""
    if loss_type == "vanilla":
        return jnp.mean(_bce_logits(d_fake, 1.0))
    return -jnp.mean(d_fake)


def gradient_penalty(
    disc_apply: Callable[[jax.Array], jax.Array],
    in_real: jax.Array,
    in_fake: jax.Array,
    rng: jax.Array,
) -> jax.Array:
    """WGAN-GP penalty on interpolated inputs (reference loss.py:444-472)."""
    b = in_real.shape[0]
    alpha = jax.random.uniform(rng, (b,) + (1,) * (in_real.ndim - 1))
    interp = alpha * in_real + (1.0 - alpha) * in_fake

    def score(x):
        return jnp.sum(disc_apply(x))

    grads = jax.grad(score)(interp)
    gnorm = jnp.sqrt(jnp.sum(grads.reshape(b, -1) ** 2, axis=1) + 1e-12)
    return jnp.mean((gnorm - 1.0) ** 2)
