"""Data-parallel training over a device mesh.

Batch graphs shard along the leading axis over the 'data' mesh axis;
params and optimizer state replicate. The loss is a masked mean over all
particles in the global batch, so GSPMD inserts the gradient all-reduce
over ICI — no hand-written collectives on this path (they live in
edge_partition.py, where XLA can't infer them).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh

from sgnn_tpu.parallel.mesh import batch_sharding, replicated


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device_put every batch leaf with its leading axis over 'data'.

    Tree-aware: batch values may be pytrees (the multi-scale trainer's
    per-sample StaticGraph stacks its leaves on the batch axis too).
    """
    import numpy as np

    return jax.tree.map(
        lambda v: jax.device_put(v, batch_sharding(mesh, np.ndim(v))), batch
    )


def make_dp_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """Wrap a (state, batch, key) -> (state, metrics) step for the mesh.

    The inner `train_step` is already jitted; constraining the inputs is
    enough for GSPMD to propagate shardings through the whole program.
    """
    rep = replicated(mesh)

    def dp_step(state, batch, key):
        state = jax.device_put(state, rep)
        batch = shard_batch(mesh, batch)
        return train_step(state, batch, key)

    return dp_step


def shard_stacked_batch(mesh: Mesh, batches: dict) -> dict:
    """shard_batch for time-stacked batches [T, B, ...]: axis 1 over 'data'."""
    import numpy as np

    from sgnn_tpu.parallel.mesh import stacked_batch_sharding

    return jax.tree.map(
        lambda v: jax.device_put(v, stacked_batch_sharding(mesh, np.ndim(v))),
        batches,
    )


def make_dp_train_multi_step(multi_step: Callable, mesh: Mesh) -> Callable:
    """DP wrapper for make_train_multi_step: (state, batches[T,B,...], key)."""
    rep = replicated(mesh)

    def dp_multi(state, batches, key):
        state = jax.device_put(state, rep)
        batches = shard_stacked_batch(mesh, batches)
        return multi_step(state, batches, key)

    return dp_multi
