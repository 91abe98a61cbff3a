"""Aggregation primitives: the torch_scatter replacement.

The reference aggregates edge messages at receiver nodes with
``aggr='add'`` scatter-adds provided by torch_scatter (via PyG
MessagePassing, sgnn/single_scale/graph_network.py:136,173-175).

TPU-first design: the primary graph format is the dense NeighborList
[N, K], where aggregation is a masked sum over the K axis — a pure dense
reduction XLA fuses into the surrounding matmuls; no scatter hardware
needed. The padded-COO path (needed for the multi-scale hierarchy, whose
per-edge-type receiver sets overlap) uses ``jax.ops.segment_sum`` over
receiver-sorted edges.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def neighbor_sum(messages: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Sum messages over the neighbor axis.

    Args:
      messages: f32[N, K, D] per-edge messages.
      mask: bool[N, K] edge validity.
    Returns:
      f32[N, D] aggregated messages per receiver.
    """
    return jnp.sum(messages * mask[..., None].astype(messages.dtype), axis=1)


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Masked segment sum with a static segment count.

    Padded entries (mask False) contribute zero regardless of their id.
    """
    if mask is not None:
        data = data * mask[..., None].astype(data.dtype)
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def coo_segment_sum(
    messages: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    *,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Aggregate COO edge messages [E, D] at receiver nodes -> [N, D]."""
    return segment_sum(
        messages,
        receivers,
        num_nodes,
        mask=mask,
        indices_are_sorted=indices_are_sorted,
    )
