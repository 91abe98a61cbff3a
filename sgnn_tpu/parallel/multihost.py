"""Multi-host initialization + per-host data sharding utilities.

The distributed-communication layer the reference lacks entirely
(SURVEY.md §2.4, §5.8): `jax.distributed.initialize` forms the process
group (the NCCL/MPI replacement); XLA collectives then ride ICI within a
slice and DCN across slices. Every jitted step in this framework is
already mesh-ready — multi-host only changes which devices the mesh
spans and which slice of the global batch each host feeds.

Typical flow (per host):

    from sgnn_tpu.parallel import multihost
    multihost.initialize()                    # no-op on single host
    mesh = make_mesh(data=jax.device_count())
    batcher = SampleBatcher(..., seed=multihost.host_seed(base_seed))
    for batch in batcher.epochs():
        local = multihost.host_slice(batch, mesh)  # this host's shard
        state, metrics = dp_step(state, local, key)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Form the multi-host process group. Single-process: no-op.

    With no arguments, reads the standard env configuration
    (JAX_COORDINATOR_ADDRESS / cloud-TPU metadata) as
    jax.distributed.initialize does.
    """
    explicit = coordinator_address is not None
    env = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not explicit and not env:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_seed(base_seed: int) -> int:
    """Deterministic per-host data-shuffling seed (SURVEY.md §7.3.6:
    deterministic noise/shuffle keys across hosts)."""
    return base_seed * 1_000_003 + jax.process_index()


def host_batch_slice(global_batch_size: int) -> int:
    """Per-host batch size for an evenly host-sharded global batch."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} hosts"
        )
    return global_batch_size // n


def make_global_batch(local_batch: dict, mesh) -> dict:
    """Assemble per-host numpy batches into globally-sharded jax arrays.

    Each host passes its own local slice; the returned arrays are global
    views sharded over the mesh's 'data' axis
    (jax.make_array_from_process_local_data).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in local_batch.items():
        sharding = NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1))))
        out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out
