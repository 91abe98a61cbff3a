"""Encode-Process-Decode GNN over static-shape neighbor lists.

Re-design of the reference architecture (xrkong/sgnn
sgnn/single_scale/graph_network.py:48-406) for TPU:

  * Graphs are dense NeighborLists [N, K]; "scatter-add" aggregation is a
    masked sum over the K axis, which XLA fuses with the edge-MLP matmuls.
  * The edge-MLP's first layer on concat([x_i, x_j, e]) is algebraically
    split into three row-blocks of the same weight matrix:
        cat(a, b, c) @ W  ==  a @ W_a + b @ W_b + c @ W_c
    so the receiver/sender projections are computed once per *node*
    ([N, D] @ [D, H]) instead of once per *edge* ([N*K, D] @ [D, H]) and
    the sender projection is gathered post-matmul (H <= D halves gather
    bytes too). For K=20 this cuts first-layer FLOPs ~2.7x with bitwise-
    identical parameters to the reference layout (up to fp reassociation).

Semantics preserved from the reference (verified by parity tests):
  * Encoder: node MLP + LayerNorm, edge MLP + LayerNorm
    (graph_network.py:86-96).
  * InteractionNetwork: edge update edge_fn([x_i, x_j, e]) with x_i the
    receiver and x_j the sender (PyG flow source_to_target,
    graph_network.py:178-199), sum aggregation at receivers
    (aggr='add', :136), node update node_fn([agg, x]) (:220-221),
    residual connections on both nodes and edges (:176).
  * Processor: M unshared InteractionNetworks applied sequentially
    (:266-274, 291-293).
  * Decoder: node MLP without LayerNorm (:321-322).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sgnn_tpu.nn.core import (
    Params,
    layer_norm_apply,
    linear_apply,
    mlp_apply,
    mlp_init,
    mlp_ln_init,
)
from sgnn_tpu.ops.neighbors import NeighborList


@dataclasses.dataclass(frozen=True)
class EPDConfig:
    """Hyperparameters of the encode-process-decode stack.

    Mirrors the reference constructor args (graph_network.py:336-386):
    latent_dim == mlp_hidden_dim == config 'hidden_dim'; nmlp_layers is the
    number of *hidden* layers per MLP (1 in the single-scale trainer,
    train.py:475).
    """

    node_in: int
    edge_in: int
    node_out: int
    latent_dim: int
    num_message_passing_steps: int
    num_mlp_layers: int = 1
    mlp_hidden_dim: Optional[int] = None

    @property
    def hidden(self) -> int:
        return self.mlp_hidden_dim if self.mlp_hidden_dim is not None else self.latent_dim

    @property
    def hidden_dims(self):
        return [self.hidden] * self.num_mlp_layers


def interaction_network_init(key: jax.Array, cfg: EPDConfig, dtype=jnp.float32) -> Params:
    ke, kn = jax.random.split(key)
    d = cfg.latent_dim
    return {
        # edge_fn: MLP(cat[x_i, x_j, e]) + LN   (graph_network.py:144-148)
        "edge": mlp_ln_init(ke, 3 * d, cfg.hidden_dims, d, dtype),
        # node_fn: MLP(cat[agg, x]) + LN        (graph_network.py:138-142)
        "node": mlp_ln_init(kn, 2 * d, cfg.hidden_dims, d, dtype),
    }


def _split_first_layer(mlp_params: Params, splits) -> Any:
    """View the first Linear of an MLP as row-blocks for concat inputs."""
    first = mlp_params["layers"][0]
    w = first["w"]
    out = []
    start = 0
    for s in splits:
        out.append(w[start : start + s])
        start += s
    assert start == w.shape[0], (start, w.shape)
    return out, first["b"]


def _mlp_tail(mlp_params: Params, h: jnp.ndarray) -> jnp.ndarray:
    """Apply the remaining layers of an MLP given first-layer preactivation."""
    layers = mlp_params["layers"]
    if len(layers) == 1:
        return h  # single Linear: preactivation is the output (identity act)
    x = jax.nn.relu(h)
    for layer in layers[1:-1]:
        x = jax.nn.relu(linear_apply(layer, x))
    return linear_apply(layers[-1], x)


def interaction_network_apply(
    params: Params,
    x: jnp.ndarray,
    edge_latent: jnp.ndarray,
    nl: NeighborList,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One message-passing step.

    Args:
      params: from interaction_network_init.
      x: f32[N, D] node latents.
      edge_latent: f32[N, K, D] edge latents (padded slots must be zero).
      nl: NeighborList defining senders per receiver row.
    Returns:
      (new_x [N, D], new_edge_latent [N, K, D]) with residuals applied and
      padded edge slots re-zeroed.
    """
    d = x.shape[-1]
    mask = nl.mask[..., None].astype(x.dtype)

    # --- edge update: edge_fn(cat[x_i, x_j, e]) ---------------------------
    (w_i, w_j, w_e), b_e = _split_first_layer(params["edge"]["mlp"], (d, d, d))
    proj_i = jnp.dot(x, w_i, preferred_element_type=x.dtype)  # [N, H]
    proj_j = jnp.dot(x, w_j, preferred_element_type=x.dtype)  # [N, H]
    h = (
        proj_i[:, None, :]
        + proj_j[nl.senders]
        + jnp.dot(edge_latent, w_e, preferred_element_type=x.dtype)
        + b_e
    )  # [N, K, H]
    msg = _mlp_tail(params["edge"]["mlp"], h)
    msg = layer_norm_apply(params["edge"]["ln"], msg)
    msg = msg * mask

    # --- aggregate (sum at receivers) + node update: node_fn(cat[agg, x]) -
    agg = jnp.sum(msg, axis=1)  # [N, D]
    (w_agg, w_x), b_n = _split_first_layer(params["node"]["mlp"], (d, d))
    hn = (
        jnp.dot(agg, w_agg, preferred_element_type=x.dtype)
        + jnp.dot(x, w_x, preferred_element_type=x.dtype)
        + b_n
    )
    upd = _mlp_tail(params["node"]["mlp"], hn)
    upd = layer_norm_apply(params["node"]["ln"], upd)

    # --- dual residuals (graph_network.py:176) ----------------------------
    new_x = x + upd
    new_edge = (edge_latent + msg) * mask
    return new_x, new_edge


def encode_process_decode_init(key: jax.Array, cfg: EPDConfig, dtype=jnp.float32) -> Params:
    k_en_n, k_en_e, k_proc, k_dec = jax.random.split(key, 4)
    proc_keys = jax.random.split(k_proc, cfg.num_message_passing_steps)
    return {
        "encoder": {
            "node": mlp_ln_init(k_en_n, cfg.node_in, cfg.hidden_dims, cfg.latent_dim, dtype),
            "edge": mlp_ln_init(k_en_e, cfg.edge_in, cfg.hidden_dims, cfg.latent_dim, dtype),
        },
        "processor": [
            interaction_network_init(k, cfg, dtype) for k in proc_keys
        ],
        "decoder": mlp_init(k_dec, cfg.latent_dim, cfg.hidden_dims, cfg.node_out, dtype),
    }


def encode_process_decode_apply(
    params: Params,
    node_features: jnp.ndarray,
    edge_features: jnp.ndarray,
    nl: NeighborList,
) -> jnp.ndarray:
    """Full forward pass.

    Args:
      node_features: f32[N, node_in].
      edge_features: f32[N, K, edge_in] (padded slots' values are ignored).
      nl: NeighborList.
    Returns:
      f32[N, node_out] decoded node outputs.
    """
    mask = nl.mask[..., None].astype(node_features.dtype)

    # Encoder (graph_network.py:403): lift node and edge features to latent.
    x = mlp_apply(params["encoder"]["node"]["mlp"], node_features)
    x = layer_norm_apply(params["encoder"]["node"]["ln"], x)
    e = mlp_apply(params["encoder"]["edge"]["mlp"], edge_features)
    e = layer_norm_apply(params["encoder"]["edge"]["ln"], e)
    e = e * mask

    # Processor: sequential unshared interaction networks.
    for step_params in params["processor"]:
        x, e = interaction_network_apply(step_params, x, e, nl)

    # Decoder (graph_network.py:405): node MLP, no LayerNorm.
    return mlp_apply(params["decoder"], x)
