"""Multi-host (multi-process) execution scaffolding.

The reference runs on a single GPU in a single process (SURVEY.md §2.3); the
TPU-native counterpart scales past one host with JAX's multi-controller
runtime: every host runs the same program, ``jax.distributed.initialize``
connects them through a coordinator, ``jax.devices()`` becomes the global
device list, and GSPMD programs span hosts transparently — gradient
all-reduces ride ICI within a slice and DCN across slices, chosen by XLA
from the mesh layout.

Host responsibilities under this model:
  * each process feeds only its local shard of the global batch
    (``local_indices`` + ``make_global_batch``);
  * exactly one process writes checkpoints/logs (``is_primary``);
  * everything else (the jitted step, collectives) is identical to the
    single-process path — the same ``Trainer.step`` runs unchanged.

Launch recipe (N hosts):
  on host i:  SPSG_COORDINATOR=host0:12345 SPSG_NUM_PROCESSES=N \
              SPSG_PROCESS_ID=i python -m spsg_tpu.cli.train --distributed ...
On Cloud TPU pods, ``initialize()`` with no arguments lets JAX auto-discover
the topology from the TPU runtime metadata.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connect this process to the multi-host runtime.

    Arguments default to the SPSG_COORDINATOR / SPSG_NUM_PROCESSES /
    SPSG_PROCESS_ID environment variables; with none set, JAX auto-detects
    (the normal path on Cloud TPU pods). On CPU (tests / local simulation)
    the gloo collectives backend is selected automatically."""
    coordinator_address = coordinator_address or os.environ.get("SPSG_COORDINATOR")
    if num_processes is None and os.environ.get("SPSG_NUM_PROCESSES"):
        num_processes = int(os.environ["SPSG_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SPSG_PROCESS_ID"):
        process_id = int(os.environ["SPSG_PROCESS_ID"])
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # non-CPU backends ignore this
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that owns checkpoint/log writes (reference: the
    single process wrote everything, train.py:775-786)."""
    return jax.process_index() == 0


def local_indices(n_items: int, global_batch: int, *, seed: int, epoch: int) -> np.ndarray:
    """This host's slice of the epoch's sample order.

    All processes derive the same global permutation from (seed, epoch) and
    take interleaved strides, so the union over hosts is the exact global
    epoch with no duplication — the multi-host replacement for the
    single-process DataLoader shuffle (reference train.py:196-211)."""
    order = np.random.default_rng(seed + epoch).permutation(n_items)
    n_proc = jax.process_count()
    per_host = global_batch // n_proc
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    # drop the ragged tail so every host sees the same number of batches
    n_batches = n_items // global_batch
    order = order[: n_batches * global_batch].reshape(n_batches, n_proc, per_host)
    return order[:, jax.process_index(), :].reshape(-1)


def make_global_batch(local_batch: Dict[str, Any], mesh, axis: str = "data") -> Dict[str, Any]:
    """Assemble per-host local batch arrays into global sharded jax.Arrays.

    Arrays with a leading per-host batch dim concatenate (logically) across
    processes along ``axis``; scalars and unbatched arrays replicate. This is
    the multi-process generalization of ``parallel.shard_batch``."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    n_local = None
    for v in local_batch.values():
        a = np.asarray(v)
        if a.ndim >= 1 and a.shape[0] > 0:
            n_local = a.shape[0]
            break
    out = {}
    for k, v in local_batch.items():
        a = np.asarray(v)
        if a.ndim >= 1 and n_local is not None and a.shape[0] == n_local:
            out[k] = multihost_utils.host_local_array_to_global_array(a, mesh, P(axis))
        else:
            out[k] = multihost_utils.host_local_array_to_global_array(a, mesh, P())
    return out
