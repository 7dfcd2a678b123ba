"""Inception-v3 feature extractor for Feature-l1 / FID (reference
torch/metrics.py:45-53 loads torchvision ``inception_v3`` from a local
``--inception_v3_path`` .pth and uses its output as the per-image feature).

This is a from-scratch JAX implementation of the torchvision Inception-v3
architecture (Szegedy et al. 2016, "Rethinking the Inception Architecture"),
eval-mode only (BatchNorm running stats, no dropout, no aux head). Weights
convert from any torchvision ``inception_v3`` state_dict — the same artifact
the reference consumes — via :func:`convert_inception_state_dict`; with no
checkpoint available (this image has no egress) it falls back to fixed-seed
random weights with a loud warning, exactly like the VGG19 path
(``models/vgg.py``).

Implemented as pure functions over a params pytree (not a flax Module): the
net is eval-only, so folding BN into an affine per conv keeps it a single
fused XLA program with no mutable collections.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3  # torchvision BasicConv2d: BatchNorm2d(eps=0.001)

# Declarative conv table: torchvision module name -> (in, out, (kh, kw)).
# Strides/paddings are structural (fixed in the forward below); this table
# drives weight fabrication and converter validation.
_CONVS: Dict[str, Tuple[int, int, Tuple[int, int]]] = {
    "Conv2d_1a_3x3": (3, 32, (3, 3)),
    "Conv2d_2a_3x3": (32, 32, (3, 3)),
    "Conv2d_2b_3x3": (32, 64, (3, 3)),
    "Conv2d_3b_1x1": (64, 80, (1, 1)),
    "Conv2d_4a_3x3": (80, 192, (3, 3)),
}


def _inception_a(prefix: str, cin: int, pool: int) -> None:
    _CONVS[f"{prefix}.branch1x1"] = (cin, 64, (1, 1))
    _CONVS[f"{prefix}.branch5x5_1"] = (cin, 48, (1, 1))
    _CONVS[f"{prefix}.branch5x5_2"] = (48, 64, (5, 5))
    _CONVS[f"{prefix}.branch3x3dbl_1"] = (cin, 64, (1, 1))
    _CONVS[f"{prefix}.branch3x3dbl_2"] = (64, 96, (3, 3))
    _CONVS[f"{prefix}.branch3x3dbl_3"] = (96, 96, (3, 3))
    _CONVS[f"{prefix}.branch_pool"] = (cin, pool, (1, 1))


def _inception_c(prefix: str, c7: int) -> None:
    cin = 768
    _CONVS[f"{prefix}.branch1x1"] = (cin, 192, (1, 1))
    _CONVS[f"{prefix}.branch7x7_1"] = (cin, c7, (1, 1))
    _CONVS[f"{prefix}.branch7x7_2"] = (c7, c7, (1, 7))
    _CONVS[f"{prefix}.branch7x7_3"] = (c7, 192, (7, 1))
    _CONVS[f"{prefix}.branch7x7dbl_1"] = (cin, c7, (1, 1))
    _CONVS[f"{prefix}.branch7x7dbl_2"] = (c7, c7, (7, 1))
    _CONVS[f"{prefix}.branch7x7dbl_3"] = (c7, c7, (1, 7))
    _CONVS[f"{prefix}.branch7x7dbl_4"] = (c7, c7, (7, 1))
    _CONVS[f"{prefix}.branch7x7dbl_5"] = (c7, 192, (1, 7))
    _CONVS[f"{prefix}.branch_pool"] = (cin, 192, (1, 1))


def _inception_e(prefix: str, cin: int) -> None:
    _CONVS[f"{prefix}.branch1x1"] = (cin, 320, (1, 1))
    _CONVS[f"{prefix}.branch3x3_1"] = (cin, 384, (1, 1))
    _CONVS[f"{prefix}.branch3x3_2a"] = (384, 384, (1, 3))
    _CONVS[f"{prefix}.branch3x3_2b"] = (384, 384, (3, 1))
    _CONVS[f"{prefix}.branch3x3dbl_1"] = (cin, 448, (1, 1))
    _CONVS[f"{prefix}.branch3x3dbl_2"] = (448, 384, (3, 3))
    _CONVS[f"{prefix}.branch3x3dbl_3a"] = (384, 384, (1, 3))
    _CONVS[f"{prefix}.branch3x3dbl_3b"] = (384, 384, (3, 1))
    _CONVS[f"{prefix}.branch_pool"] = (cin, 192, (1, 1))


_inception_a("Mixed_5b", 192, 32)
_inception_a("Mixed_5c", 256, 64)
_inception_a("Mixed_5d", 288, 64)
# Mixed_6a (InceptionB)
_CONVS["Mixed_6a.branch3x3"] = (288, 384, (3, 3))
_CONVS["Mixed_6a.branch3x3dbl_1"] = (288, 64, (1, 1))
_CONVS["Mixed_6a.branch3x3dbl_2"] = (64, 96, (3, 3))
_CONVS["Mixed_6a.branch3x3dbl_3"] = (96, 96, (3, 3))
for _name, _c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)):
    _inception_c(_name, _c7)
# Mixed_7a (InceptionD)
_CONVS["Mixed_7a.branch3x3_1"] = (768, 192, (1, 1))
_CONVS["Mixed_7a.branch3x3_2"] = (192, 320, (3, 3))
_CONVS["Mixed_7a.branch7x7x3_1"] = (768, 192, (1, 1))
_CONVS["Mixed_7a.branch7x7x3_2"] = (192, 192, (1, 7))
_CONVS["Mixed_7a.branch7x7x3_3"] = (192, 192, (7, 1))
_CONVS["Mixed_7a.branch7x7x3_4"] = (192, 192, (3, 3))
_inception_e("Mixed_7b", 1280)
_inception_e("Mixed_7c", 2048)

NUM_CLASSES = 1000
POOL_DIM = 2048


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _conv(p, x, stride: int = 1, pad=(0, 0)):
    """BasicConv2d: conv (no bias) -> BN(eval, eps=1e-3) -> ReLU."""
    if isinstance(pad, int):
        pad = (pad, pad)
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    inv = p["scale"] / jnp.sqrt(p["var"] + _BN_EPS)
    return jax.nn.relu(y * inv + (p["bias"] - p["mean"] * inv))


def _max_pool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _avg_pool_3_1_1(x):
    # F.avg_pool2d(x, 3, stride=1, padding=1), count_include_pad=True
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return s / 9.0


def _block_a(p, x, prefix):
    g = lambda n: p[f"{prefix}.{n}"]
    b1 = _conv(g("branch1x1"), x)
    b5 = _conv(g("branch5x5_2"), _conv(g("branch5x5_1"), x), pad=2)
    b3 = _conv(
        g("branch3x3dbl_3"), _conv(g("branch3x3dbl_2"), _conv(g("branch3x3dbl_1"), x), pad=1), pad=1
    )
    bp = _conv(g("branch_pool"), _avg_pool_3_1_1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(p, x):  # Mixed_6a
    g = lambda n: p[f"Mixed_6a.{n}"]
    b3 = _conv(g("branch3x3"), x, stride=2)
    bd = _conv(
        g("branch3x3dbl_3"),
        _conv(g("branch3x3dbl_2"), _conv(g("branch3x3dbl_1"), x), pad=1),
        stride=2,
    )
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _block_c(p, x, prefix):
    g = lambda n: p[f"{prefix}.{n}"]
    b1 = _conv(g("branch1x1"), x)
    b7 = _conv(g("branch7x7_1"), x)
    b7 = _conv(g("branch7x7_2"), b7, pad=(0, 3))
    b7 = _conv(g("branch7x7_3"), b7, pad=(3, 0))
    bd = _conv(g("branch7x7dbl_1"), x)
    bd = _conv(g("branch7x7dbl_2"), bd, pad=(3, 0))
    bd = _conv(g("branch7x7dbl_3"), bd, pad=(0, 3))
    bd = _conv(g("branch7x7dbl_4"), bd, pad=(3, 0))
    bd = _conv(g("branch7x7dbl_5"), bd, pad=(0, 3))
    bp = _conv(g("branch_pool"), _avg_pool_3_1_1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(p, x):  # Mixed_7a
    g = lambda n: p[f"Mixed_7a.{n}"]
    b3 = _conv(g("branch3x3_2"), _conv(g("branch3x3_1"), x), stride=2)
    b7 = _conv(g("branch7x7x3_1"), x)
    b7 = _conv(g("branch7x7x3_2"), b7, pad=(0, 3))
    b7 = _conv(g("branch7x7x3_3"), b7, pad=(3, 0))
    b7 = _conv(g("branch7x7x3_4"), b7, stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _block_e(p, x, prefix):
    g = lambda n: p[f"{prefix}.{n}"]
    b1 = _conv(g("branch1x1"), x)
    b3 = _conv(g("branch3x3_1"), x)
    b3 = jnp.concatenate(
        [_conv(g("branch3x3_2a"), b3, pad=(0, 1)), _conv(g("branch3x3_2b"), b3, pad=(1, 0))],
        axis=-1,
    )
    bd = _conv(g("branch3x3dbl_2"), _conv(g("branch3x3dbl_1"), x), pad=1)
    bd = jnp.concatenate(
        [_conv(g("branch3x3dbl_3a"), bd, pad=(0, 1)), _conv(g("branch3x3dbl_3b"), bd, pad=(1, 0))],
        axis=-1,
    )
    bp = _conv(g("branch_pool"), _avg_pool_3_1_1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_v3(params, x: jax.Array, transform_input: bool = True):
    """Eval-mode Inception-v3. x: (B, H, W, 3) ImageNet-normalized (mean/std)
    RGB, H = W = 299 canonical (any >= 75 works). Returns (pool, logits):
    (B, 2048) adaptive-avg-pool features (the standard FID feature) and
    (B, 1000) class logits (what the reference's ``inception_v3(img)`` call
    yields in eval, metrics.py:92-100)."""
    if transform_input:
        # torchvision's pretrained flag: re-scale ImageNet-normalized input
        # to the TF convention the weights were trained with
        ch = [
            x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
            x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
            x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5,
        ]
        x = jnp.concatenate(ch, axis=-1)
    x = _conv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv(params["Conv2d_2a_3x3"], x)
    x = _conv(params["Conv2d_2b_3x3"], x, pad=1)
    x = _max_pool(x)
    x = _conv(params["Conv2d_3b_1x1"], x)
    x = _conv(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    x = _block_a(params, x, "Mixed_5b")
    x = _block_a(params, x, "Mixed_5c")
    x = _block_a(params, x, "Mixed_5d")
    x = _block_b(params, x)
    for prefix in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _block_c(params, x, prefix)
    x = _block_d(params, x)
    x = _block_e(params, x, "Mixed_7b")
    x = _block_e(params, x, "Mixed_7c")
    pool = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
    logits = pool @ params["fc"]["w"] + params["fc"]["b"]
    return pool, logits


def preprocess(images: jax.Array) -> jax.Array:
    """RGB [0,1] (B, H, W, 3) -> 299x299 ImageNet-normalized input (the
    torchvision eval transform: bilinear resize + mean/std normalize)."""
    mean = jnp.asarray((0.485, 0.456, 0.406))
    std = jnp.asarray((0.229, 0.224, 0.225))
    b = images.shape[0]
    x = jax.image.resize(images, (b, 299, 299, 3), method="bilinear")
    return (x - mean) / std


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------


def convert_inception_state_dict(state_dict) -> Dict:
    """torchvision ``inception_v3`` state_dict -> params pytree for
    :func:`inception_v3`. Conv weights OIHW -> HWIO; BN stats kept separate
    (folded at run time); ``AuxLogits.*`` (train-only head) is skipped.
    Validates every expected conv against the architecture table."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    for name, (cin, cout, (kh, kw)) in _CONVS.items():
        w = sd[f"{name}.conv.weight"]
        if w.shape != (cout, cin, kh, kw):
            raise ValueError(f"{name}: expected {(cout, cin, kh, kw)}, got {w.shape}")
        params[name] = {
            "w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "scale": sd[f"{name}.bn.weight"].astype(np.float32),
            "bias": sd[f"{name}.bn.bias"].astype(np.float32),
            "mean": sd[f"{name}.bn.running_mean"].astype(np.float32),
            "var": sd[f"{name}.bn.running_var"].astype(np.float32),
        }
    params["fc"] = {
        "w": np.transpose(sd["fc.weight"], (1, 0)).astype(np.float32),
        "b": sd["fc.bias"].astype(np.float32),
    }
    return params


def fabricate_state_dict(seed: int = 42) -> Dict[str, np.ndarray]:
    """A torchvision-shaped random state_dict (He-init convs, identity-ish
    BN). Used for the no-pretrained-weights fallback and for tests."""
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for name, (cin, cout, (kh, kw)) in _CONVS.items():
        fan_in = cin * kh * kw
        sd[f"{name}.conv.weight"] = (
            rng.standard_normal((cout, cin, kh, kw)) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
    sd["fc.weight"] = (
        rng.standard_normal((NUM_CLASSES, POOL_DIM)) * np.sqrt(1.0 / POOL_DIM)
    ).astype(np.float32)
    sd["fc.bias"] = np.zeros(NUM_CLASSES, np.float32)
    return sd


def load_inception(path: str = "") -> Dict:
    """Build Inception-v3 params. Weight search order:
      1. explicit ``path`` (--inception_v3_path, reference metrics.py:37,45-50);
      2. $SPSG_INCEPTION_WEIGHTS;
      3. the torch hub cache (inception_v3_google-*.pth);
      4. fixed-seed random weights with a LOUD warning — Feature-l1/FID stay
         well-defined self-consistent distances but are NOT ImageNet-aligned
         and not comparable to reference/paper numbers."""
    here = os.path.expanduser(os.environ.get("TORCH_HOME", "~/.cache/torch"))
    candidates = [
        path,
        os.environ.get("SPSG_INCEPTION_WEIGHTS", ""),
        os.path.join(here, "hub", "checkpoints", "inception_v3_google-0cc3c7bd.pth"),
    ]
    for cand in candidates:
        if not cand or not os.path.isfile(cand):
            continue
        try:
            import torch

            obj = torch.load(cand, map_location="cpu", weights_only=False)
            sd = obj if isinstance(obj, dict) else obj.state_dict()
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
            params = convert_inception_state_dict(sd)
            print(f"inception: loaded pretrained weights from {cand}")
            return params
        except Exception as e:  # pragma: no cover
            print(f"inception: failed to load {cand} ({e})")
    import warnings

    warnings.warn(
        "spsg-tpu: no pretrained Inception-v3 weights found — Feature-l1/FID "
        "use FIXED-SEED RANDOM Inception features and are not comparable to "
        "reference numbers. Point --inception_v3_path or "
        "SPSG_INCEPTION_WEIGHTS at a torchvision inception_v3 .pth "
        "(the same artifact the reference downloads, metrics.py:45-50).",
        stacklevel=2,
    )
    return convert_inception_state_dict(fabricate_state_dict())
