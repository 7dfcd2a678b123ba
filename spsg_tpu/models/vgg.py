"""VGG19 feature extractor for style/content losses (Flax rebuild of
reference torch/style.py:91-157: torchvision vgg19 truncated at conv_8 ==
conv3_4, with ImageNet normalization; style_layers_default=[8]).

Pretrained weights are converted from a local torchvision checkpoint when one
is available (this image has no network egress); otherwise the extractor
falls back to fixed-seed He-initialized weights — style/content losses remain
well-defined self-consistent perceptual metrics, just not ImageNet-aligned.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

COLOR_MEAN = (0.485, 0.456, 0.406)  # reference train.py:25-26
COLOR_STD = (0.229, 0.224, 0.225)

# vgg19 conv plan up to conv_8 (conv3_4): (out_channels, pool_before)
_VGG19_PREFIX = [
    (64, False),
    (64, False),
    (128, True),
    (128, False),
    (256, True),
    (256, False),
    (256, False),
    (256, False),
]


class VGGFeatures(nn.Module):
    """Returns the feature maps at ``style_layers`` (1-indexed conv indices,
    pre-ReLU — matching reference style.py:123-129 module indexing)."""

    style_layers: Sequence[int] = (8,)

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        mean = jnp.asarray(COLOR_MEAN)
        std = jnp.asarray(COLOR_STD)
        x = (x - mean) / std
        outputs = []
        for i, (width, pool_before) in enumerate(_VGG19_PREFIX):
            if pool_before:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            conv_out = nn.Conv(
                width, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv_{i + 1}"
            )(x)
            if (i + 1) in self.style_layers:
                outputs.append(conv_out)
            x = nn.relu(conv_out)
            if len(outputs) == len(self.style_layers):
                break
        return outputs


def convert_torchvision_weights(state_dict) -> dict:
    """torchvision vgg19 ``features.*`` tensors -> flax params for
    :class:`VGGFeatures` (OIHW -> HWIO)."""
    # features indices of the first 8 convs in torchvision vgg19
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16]
    params = {}
    for i, fi in enumerate(conv_idx):
        w = np.asarray(state_dict[f"features.{fi}.weight"])  # (O, I, H, W)
        b = np.asarray(state_dict[f"features.{fi}.bias"])
        params[f"conv_{i + 1}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    return params


def load_vgg_for_style(style_layers=(8,)) -> Tuple[VGGFeatures, dict]:
    """Build the extractor, preferring converted torchvision weights."""
    model = VGGFeatures(style_layers=style_layers)
    params = None
    try:
        import torch

        hub = os.path.expanduser(
            os.environ.get("TORCH_HOME", "~/.cache/torch")
        )
        ckpt = os.path.join(hub, "hub", "checkpoints", "vgg19-dcbb9e9d.pth")
        if os.path.isfile(ckpt):
            sd = torch.load(ckpt, map_location="cpu")
            params = convert_torchvision_weights(sd)
            print("vgg: loaded pretrained torchvision weights")
    except Exception as e:  # pragma: no cover
        print(f"vgg: weight conversion failed ({e}); using random features")
    if params is None:
        dummy = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(42), dummy)["params"]
        print("vgg: using fixed-seed random features (no pretrained weights found)")
    return model, params
