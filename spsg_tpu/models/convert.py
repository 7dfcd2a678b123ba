"""Convert reference PyTorch Generator checkpoints to Flax parameters.

Lets users of the reference implementation load their trained ``.pth``
checkpoints (torch/train.py:781-786 ``{'epoch','state_dict','optimizer'}``)
directly into this framework, and powers the numerical parity test of the
two architectures.

Layer mapping: each torch ``nn.Sequential`` [Conv3d, LeakyReLU, BatchNorm3d]
triplet maps to one :class:`spsg_tpu.models.generator.ConvBlock`; conv
weights transpose OIZYX -> ZYXIO."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# torch module prefix -> ordered (conv_index, bn_index_or_None, flax ConvBlock name)
_GENERATOR_LAYOUT = {
    "geo_0": [(0, 2, "geo_0a"), (3, 5, "geo_0b"), (6, 8, "geo_0c")],
    "geo_1": [(0, 2, "geo_1a"), (3, 5, "geo_1b"), (6, 8, "geo_1c"), (9, 11, "geo_1d")],
    "geo_2": [(0, 2, "geo_2a"), (3, 5, "geo_2b")],
    "geo_occ": [(0, 2, "geo_occ_a"), (3, None, "geo_occ_b")],
    "geo_3": [(0, 2, "geo_3a"), (3, 5, "geo_3b"), (6, None, "geo_3c")],
    "encoder_0": [(0, 2, "encoder_0a"), (3, 5, "encoder_0b"), (6, 8, "encoder_0c")],
    "encoder_geo": [(0, 2, "encoder_geo")],
    "encoder_1": [(0, 2, "encoder_1a"), (3, 5, "encoder_1b"), (6, 8, "encoder_1c")],
    "decoder_2": [(0, 2, "decoder_2a"), (3, 5, "decoder_2b"), (6, 8, "decoder_2c")],
    "decoder_3": [
        (0, 2, "decoder_3a"),
        (3, 5, "decoder_3b"),
        (6, 8, "decoder_3c"),
        (9, 11, "decoder_3d"),
        (12, None, "decoder_3e"),
    ],
    # heads start with a standalone BatchNorm (model.py:303-325)
    "color_head": [(2, 4, "color_head_a"), (5, 7, "color_head_b"), (8, None, "color_head_c")],
    "semantic_head": [
        (2, 4, "semantic_head_a"),
        (5, 7, "semantic_head_b"),
        (8, None, "semantic_head_c"),
    ],
}
_HEAD_BN = {"color_head": ("color_head_bn0", 0), "semantic_head": ("semantic_head_bn0", 0)}


def _conv(params_dict, sd, torch_name, flax_name):
    w = np.asarray(sd[f"{torch_name}.weight"])  # (O, I, kz, ky, kx)
    b = np.asarray(sd[f"{torch_name}.bias"])
    params_dict.setdefault(flax_name, {})["Conv_0"] = {
        "kernel": np.transpose(w, (2, 3, 4, 1, 0)),
        "bias": b,
    }


def _bn(params, batch_stats, sd, torch_name, flax_parent, flax_bn="BatchNorm_0"):
    params.setdefault(flax_parent, {})[flax_bn] = {
        "scale": np.asarray(sd[f"{torch_name}.weight"]),
        "bias": np.asarray(sd[f"{torch_name}.bias"]),
    }
    batch_stats.setdefault(flax_parent, {})[flax_bn] = {
        "mean": np.asarray(sd[f"{torch_name}.running_mean"]),
        "var": np.asarray(sd[f"{torch_name}.running_var"]),
    }


def convert_generator_state_dict(state_dict) -> Dict:
    """torch Generator state_dict -> {'params': ..., 'batch_stats': ...}."""
    sd = {k: v for k, v in state_dict.items()}
    params: Dict = {}
    batch_stats: Dict = {}
    for prefix, layout in _GENERATOR_LAYOUT.items():
        if f"{prefix}.{layout[0][0]}.weight" not in sd:
            continue  # branch absent (e.g. no pass_geo_feats)
        for conv_i, bn_i, flax_name in layout:
            _conv(params, sd, f"{prefix}.{conv_i}", flax_name)
            if bn_i is not None:
                _bn(params, batch_stats, sd, f"{prefix}.{bn_i}", flax_name)
    for prefix, (flax_name, bn_i) in _HEAD_BN.items():
        key = f"{prefix}.{bn_i}.weight"
        if key not in sd:
            continue
        params[flax_name] = {
            "scale": np.asarray(sd[f"{prefix}.{bn_i}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.{bn_i}.bias"]),
        }
        batch_stats[flax_name] = {
            "mean": np.asarray(sd[f"{prefix}.{bn_i}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.{bn_i}.running_var"]),
        }
    return {"params": params, "batch_stats": batch_stats}


def convert_discriminator_state_dict(state_dict) -> Dict:
    """torch Discriminator2D state_dict -> {'params', 'spectral_stats'}.

    The reference wraps each 4x4/2 conv in legacy
    ``torch.nn.utils.spectral_norm`` (model.py:19-24), which stores the
    unnormalized ``weight_orig`` plus power-iteration vectors ``weight_u``
    ((O,)) / ``weight_v`` ((I*kh*kw,)) and renormalizes every forward. Flax's
    ``nn.SpectralNorm`` runs the mathematically identical iteration
    (v = norm(W^T u); u = norm(W v); sigma = u^T W v — invariant to the
    frameworks' different kernel-flatten orders), seeded from a stored
    ``u`` of the same shape, so converting ``weight_orig`` -> kernel and
    ``weight_u`` -> u continues training with exact reference dynamics
    (parity-tested in tests/test_parity.py). ``sigma`` is recomputed from
    (u, v, W) for the stored stat; the forward never reads it (it recomputes
    from u). The final 1x1 conv is not spectral-normalized (model.py:76-78),
    matching our plain ``final`` conv."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}
    # torch Sequential member names in construction order (model.py:57-76):
    # positional '0', then add_module'd 'p1', 'p2', 'p3', ...
    torch_names = ["0"] + [f"p{k}" for k in range(1, len(_RF_SIZES))]
    k = 0
    for name in torch_names:
        base = f"discriminator_net.{name}.conv2d"
        wkey = f"{base}.weight_orig" if f"{base}.weight_orig" in sd else f"{base}.weight"
        if wkey not in sd:
            break
        w = sd[wkey]  # (O, I, kh, kw)
        entry = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        if f"{base}.bias" in sd:
            entry["bias"] = sd[f"{base}.bias"]
        params[f"sn_conv_{k}"] = entry
        if f"{base}.weight_u" in sd:
            u = sd[f"{base}.weight_u"].astype(np.float32)  # (O,)
            wm = w.reshape(w.shape[0], -1).astype(np.float32)  # (O, I*kh*kw)
            if f"{base}.weight_v" in sd:
                v = sd[f"{base}.weight_v"].astype(np.float32)
            else:
                v = wm.T @ u
                v /= max(float(np.linalg.norm(v)), 1e-12)
            sigma = float(u @ (wm @ v))
            stats[f"SpectralNorm_{k}"] = {
                f"sn_conv_{k}/kernel/u": u[None, :],
                f"sn_conv_{k}/kernel/sigma": np.asarray(sigma, np.float32),
            }
        k += 1
    if "final.weight" in sd:
        params["final"] = {
            "kernel": np.transpose(sd["final.weight"], (2, 3, 1, 0)),
            "bias": sd["final.bias"],
        }
    return {"params": params, "spectral_stats": stats}


_RF_SIZES = (4, 10, 22, 46, 94, 190, 382, 766)  # model.py:44


def load_reference_checkpoint(path: str) -> Tuple[Dict, int]:
    """Load a reference .pth checkpoint (generator OR discriminator) into
    Flax variables.

    Returns (variables, epoch). The reference stores
    {'epoch','state_dict','optimizer'} (train.py:1316-1320) for both the
    model and the disc (saved separately, train.py:781-786); the torch Adam
    moments are NOT converted (optax state layout differs) — resuming from a
    .pth restarts the optimizer with fresh moments at the stored epoch.
    Discriminator checkpoints are detected by their ``discriminator_net.*``
    keys and yield {'params','spectral_stats'} instead."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    epoch = int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    if any(k.startswith("discriminator_net.") for k in sd):
        return convert_discriminator_state_dict(sd), epoch
    return convert_generator_state_dict(sd), epoch
