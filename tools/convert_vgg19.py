"""Convert torchvision's pretrained VGG19 into the small .npz artifact the
style/content losses and Feature-l1 metric load (spsg_tpu/models/vgg.py).

The reference loads torchvision's ImageNet VGG19 at runtime
(/root/reference/torch/style.py:108-129); this image has no torchvision and
no network egress, so the conversion is a one-time user step on any machine
with internet access:

  # option A: let torchvision download the checkpoint
  python tools/convert_vgg19.py --out spsg_tpu/models/vgg19_conv8.npz

  # option B: from an already-downloaded torchvision checkpoint
  python tools/convert_vgg19.py --src ~/.cache/torch/hub/checkpoints/vgg19-dcbb9e9d.pth \
      --out spsg_tpu/models/vgg19_conv8.npz

Only the first 8 conv layers (through conv3_4 — all the reference's style
layers use, style.py:87) are kept: the artifact is ~8 MB instead of 550 MB.
Ship the .npz next to spsg_tpu/models/ or set SPSG_VGG_WEIGHTS to its path.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="", help="torchvision vgg19 .pth (downloaded if empty)")
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args()

    import torch

    if args.src:
        sd = torch.load(args.src, map_location="cpu")
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
    else:
        try:
            from torchvision.models import VGG19_Weights, vgg19
        except ImportError:
            print(
                "torchvision is not installed; pass --src <vgg19 .pth> instead",
                file=sys.stderr,
            )
            raise SystemExit(1)
        sd = vgg19(weights=VGG19_Weights.IMAGENET1K_V1).state_dict()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    # weight conversion is pure host work — never touch an accelerator
    # backend (a wedged TPU relay must not be able to hang this tool; the
    # post-import config update is the only reliable way to force CPU here,
    # see CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from spsg_tpu.models.vgg import convert_torchvision_weights

    params = convert_torchvision_weights(sd)
    flat = {}
    for name, kv in params.items():
        flat[f"{name}.kernel"] = np.asarray(kv["kernel"], np.float32)
        flat[f"{name}.bias"] = np.asarray(kv["bias"], np.float32)
    np.savez_compressed(args.out, **flat)
    total = sum(v.size for v in flat.values())
    print(f"wrote {args.out}: {len(flat)} tensors, {total:,} params")


if __name__ == "__main__":
    main()
