"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY.md §2.3); here data parallelism is
first-class: the batch dimension of every array shards over the 'data' mesh
axis, parameters/optimizer state replicate, and XLA/GSPMD inserts the gradient
all-reduce over ICI. BatchNorm batch statistics are computed over the *global*
batch automatically (a mean over a sharded axis lowers to a psum).

Whole-scene chunked inference additionally shards the sliding-window grid over
the same axis (spsg_tpu.inference.chunked) — the reference's spatial
decomposition (test_scene_as_chunks.py:156-250) mapped onto chips."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data") -> Dict[str, Any]:
    """Place a host batch dict on the mesh: arrays with a leading batch dim
    shard over `axis`; scalars replicate."""
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v) if not isinstance(v, jax.Array) else v
        if arr.ndim >= 1 and arr.shape[0] % mesh.shape[axis] == 0 and arr.shape[0] > 0:
            spec = P(axis)
        else:
            spec = P()
        out[k] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate a parameter/optimizer pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), state)
