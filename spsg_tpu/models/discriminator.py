"""2D spectral-norm patch discriminator (Flax rebuild of reference
torch/model.py:19-104).

Operates on rendered (color+normal) image stacks, channel-last (B, H, W, C).
Depth is chosen from the patch size against approximate receptive-field sizes
(model.py:44-56); each layer is a spectral-normalized 4x4 stride-2 conv with
LeakyReLU(0.2) (the last conv layer has no activation), followed by an
optional 1x1 "final" conv (present unless patch+hinge, model.py:76-78).
``compute_valids`` mirrors the AvgPool(4,2,1) pyramid that maps a pixel
validity mask to patch validity (model.py:82-94)."""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .generator import torch_kernel_init

APPROX_RECEPTIVE_FIELD_SIZES = (4, 10, 22, 46, 94, 190, 382, 766)


def num_disc_layers(patch_size: int, image_dims, patch: bool) -> int:
    """Layer-count rule from reference model.py:44-56. image_dims = (H, W)."""
    num_layers = len(APPROX_RECEPTIVE_FIELD_SIZES)
    if patch:
        for k, rf in enumerate(APPROX_RECEPTIVE_FIELD_SIZES):
            if patch_size < rf:
                num_layers = k
                break
    dim = min(image_dims[0], image_dims[1])
    num_layers = min(int(math.floor(math.log2(dim))), num_layers)
    assert num_layers >= 1
    return num_layers


class Discriminator2D(nn.Module):
    nf_in: int = 12
    nf: int = 8  # reference --nf_disc default (train.py:95)
    patch_size: int = 96
    image_dims: Sequence[int] = (256, 320)  # (H, W)
    patch: bool = True
    use_bias: bool = True
    disc_loss_type: str = "vanilla"
    spectral_norm: bool = True  # False: plain convs (e.g. converted weights)

    @nn.compact
    def __call__(self, x: jax.Array, update_sn_stats: bool = True) -> jax.Array:
        """x: (B, H, W, nf_in) -> patch logits (B, H', W', 1)."""
        n = num_disc_layers(self.patch_size, self.image_dims, self.patch)
        widths = [2 * self.nf, 4 * self.nf] + [8 * self.nf] * max(0, n - 2)
        for k in range(n):
            conv = nn.Conv(
                widths[k],
                kernel_size=(4, 4),
                strides=(2, 2),
                padding=[(1, 1), (1, 1)],
                use_bias=self.use_bias,
                kernel_init=torch_kernel_init(),
                name=f"sn_conv_{k}",
            )
            if self.spectral_norm:
                x = nn.SpectralNorm(conv, collection_name="spectral_stats")(
                    x, update_stats=update_sn_stats
                )
            else:
                x = conv(x)
            if k < n - 1:
                x = nn.leaky_relu(x, 0.2)
        if not (self.patch and self.disc_loss_type == "hinge"):
            x = nn.Conv(
                1,
                kernel_size=(1, 1),
                kernel_init=torch_kernel_init(),
                name="final",
            )(x)
        return x

    def compute_valids(self, valid: jax.Array) -> Optional[jax.Array]:
        """Map a (B, H, W, 1) pixel-validity mask to patch validity via the
        AvgPool(4, stride 2, pad 1) pyramid (reference model.py:82-94)."""
        if not self.patch:
            return None
        n = num_disc_layers(self.patch_size, self.image_dims, self.patch)
        for _ in range(n):
            valid = nn.avg_pool(
                valid,
                window_shape=(4, 4),
                strides=(2, 2),
                padding=[(1, 1), (1, 1)],
                count_include_pad=True,
            )
        return valid
