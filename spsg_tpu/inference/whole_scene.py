"""Single-shot whole-scene inference, optionally spatially sharded.

The reference runs the fully-convolutional generator once over the padded
scene on one GPU (test_scene.py:103-171, via ``update_sizes``). Scenes at
2 cm can exceed one chip's HBM; here the scene volume can shard **spatially**
over the device mesh: the (B, Z, Y, X, C) activations split along Y, and
GSPMD inserts the halo exchanges every 3^3 convolution needs at shard
boundaries automatically — the TPU-native equivalent of model/spatial
parallelism for volumetric CNNs (no hand-written collectives)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pad_scene(
    inputs: np.ndarray,  # (Z, Y, X, C)
    mask: np.ndarray,
    truncation: float,
    max_height: int = 128,
    multiple: int = 4,
    y_multiple: int = 1,
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int, int]]:
    """Crop height + pad dims to multiples (reference test_scene.py:120-140).
    ``y_multiple`` additionally rounds Y up so it divides the mesh axis."""
    h = min(max_height, inputs.shape[0]) if max_height else inputs.shape[0]
    dims = np.array([h, inputs.shape[1], inputs.shape[2]])
    dims = ((dims + multiple - 1) // multiple) * multiple
    m = max(multiple, y_multiple)
    dims[1] = ((dims[1] + m - 1) // m) * m
    out = np.zeros(tuple(dims) + (inputs.shape[-1],), np.float32)
    out[..., 0] = -truncation
    out[:h, : inputs.shape[1], : inputs.shape[2]] = inputs[:h]
    mout = np.zeros(tuple(dims) + (1,), np.float32)
    mout[:h, : mask.shape[1], : mask.shape[2]] = mask[:h]
    return out, mout, tuple(int(d) for d in dims)


def run_whole_scene(
    generator,
    variables,
    scene_input: np.ndarray,  # (Z, Y, X, 4)
    scene_mask: np.ndarray,  # (Z, Y, X, 1)
    truncation: float = 3.0,
    max_height: int = 128,
    pred_color: bool = True,
    pred_semantic: bool = True,
    mesh=None,
    shard_axis: str = "data",
):
    """One fully-convolutional forward over the padded scene. With ``mesh``,
    activations shard along Y across the mesh axis. Returns
    (occ_logits (Z,Y,X), sdf, color or None, semantics or None) as numpy."""
    n_shards = mesh.shape[shard_axis] if mesh is not None else 1
    inp, msk, dims = pad_scene(
        scene_input, scene_mask, truncation, max_height, y_multiple=4 * n_shards
    )
    x = jnp.asarray(inp[None])
    m = jnp.asarray(msk[None])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(None, None, shard_axis, None, None))
        x = jax.device_put(x, sh)
        m = jax.device_put(m, sh)

    # params as an ARGUMENT, not a closure capture: captured arrays embed in
    # the lowered module as constants, which remote-compile transports may
    # reject for size (see inference/chunked.py)
    fwd = jax.jit(
        lambda v, a, b: generator.apply(
            v, a, b, pred_color=pred_color, pred_sdf=True,
            pred_semantic=pred_semantic, train=False,
        )
    )
    occ_l, sdf, color, sem = fwd(variables, x, m)
    return (
        np.asarray(occ_l)[0, ..., 0],
        np.asarray(sdf)[0, ..., 0],
        np.asarray(color)[0] if color is not None else None,
        np.asarray(sem)[0] if sem is not None else None,
    )
