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


def _npz_to_params(path: str) -> dict:
    data = np.load(path)
    return {
        f"conv_{i + 1}": {
            "kernel": jnp.asarray(data[f"conv_{i + 1}.kernel"]),
            "bias": jnp.asarray(data[f"conv_{i + 1}.bias"]),
        }
        for i in range(len(_VGG19_PREFIX))
    }


def load_vgg_for_style(style_layers=(8,)) -> Tuple[VGGFeatures, dict]:
    """Build the extractor. Weight search order:
      1. $SPSG_VGG_WEIGHTS — a converted .npz (tools/convert_vgg19.py) or a
         torchvision vgg19 .pth;
      2. the packaged artifact spsg_tpu/models/vgg19_conv8.npz;
      3. the torch hub cache (~/.cache/torch/hub/checkpoints/vgg19-*.pth);
      4. fixed-seed random features, with a LOUD warning — style/content and
         Feature-l1 then remain well-defined self-consistent metrics but are
         NOT ImageNet-perceptual and not comparable to reference numbers
         (reference loads pretrained torchvision vgg19, style.py:108-129)."""
    model = VGGFeatures(style_layers=style_layers)
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.environ.get("SPSG_VGG_WEIGHTS", ""),
        os.path.join(here, "vgg19_conv8.npz"),
        os.path.join(
            os.path.expanduser(os.environ.get("TORCH_HOME", "~/.cache/torch")),
            "hub", "checkpoints", "vgg19-dcbb9e9d.pth",
        ),
    ]
    params = None
    for path in candidates:
        if not path or not os.path.isfile(path):
            continue
        try:
            if path.endswith(".npz"):
                params = _npz_to_params(path)
            else:
                import torch

                sd = torch.load(path, map_location="cpu")
                sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
                params = convert_torchvision_weights(sd)
            print(f"vgg: loaded pretrained weights from {path}")
            break
        except Exception as e:  # pragma: no cover
            print(f"vgg: failed to load {path} ({e})")
    if params is None:
        import warnings

        dummy = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(42), dummy)["params"]
        warnings.warn(
            "spsg-tpu: no pretrained VGG19 weights found — style/content "
            "losses and Feature-l1 use FIXED-SEED RANDOM features and are "
            "not comparable to reference numbers. Convert torchvision's "
            "vgg19 once with tools/convert_vgg19.py (see its docstring) "
            "or point SPSG_VGG_WEIGHTS at a vgg19 .pth/.npz.",
            stacklevel=2,
        )
    return model, params
