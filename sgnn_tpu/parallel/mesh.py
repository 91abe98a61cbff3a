"""Device-mesh construction and common shardings.

The scaling design (SURVEY.md §2.4): a 2-axis logical mesh
  * 'data'  — batch graphs sharded across chips (DP); gradients
              all-reduce over ICI automatically via GSPMD,
  * 'graph' — nodes/edges of a single large graph partitioned across
              chips (the GNN analogue of sequence parallelism), used by
              sgnn_tpu.parallel.edge_partition.

The reference has no distributed code at all (strictly single-device,
train.py:531); this layer is new scope mandated by BASELINE.json.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    graph: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'graph') mesh over the first data*graph devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * graph
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, graph)
    return Mesh(arr, ("data", "graph"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def stacked_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 1 (batch) of a time-stacked [T, B, ...] array over 'data'."""
    return NamedSharding(mesh, P(None, "data", *([None] * (ndim - 2))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
