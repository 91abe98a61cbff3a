"""Multi-scale simulator: same contract as the single-scale simulator but
consuming an injected static multi-scale graph.

Re-derivation of the reference MultiScaleSimulator
(sgnn/multi_scale/multi_scale_simulator.py:20-388). Deliberate
family differences preserved (SURVEY.md §2.2):
  * wall distance is normalized by the grid radius
    (multi_scale_simulator.py:190-192; the single-scale family leaves it
    raw),
  * per-edge-type feature normalization: grid radius for g2m/m2g,
    coarsest-scale radius for m2m (:203-238),
  * the static graph is built once per trajectory from t=0 positions and
    reused for every step (static_graph_data_loader.py:101-113) — the
    hierarchy does not track deformation,
  * Euler / inverse-Euler postprocessors identical to single-scale
    (:241-265, 348-360).

Functional design: graph arrives as a StaticGraph array pytree argument
(vmappable over a batch of trajectories — fixing the reference's
first-sample's-graph-for-the-whole-batch collate caveat, SURVEY.md §7.4).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sgnn_tpu.models.multi_scale import (
    MSGNNConfig,
    flatten_dense_ms_graph,
    flatten_ms_graph,
    multi_scale_gnn_apply,
    multi_scale_gnn_apply_dense,
    multi_scale_gnn_init,
)
from sgnn_tpu.nn.core import Params, embedding_apply, embedding_init
from sgnn_tpu.physics.multi_scale_graph import (
    DenseStaticGraph,
    MultiScaleConfig,
    StaticGraph,
)
from sgnn_tpu.physics.simulator import (
    NormStats,
    decoder_postprocess,
    inverse_decoder_postprocess,
    time_diff,
)


@dataclasses.dataclass(frozen=True)
class MultiScaleSimulatorConfig:
    dim: int = 2
    latent_dim: int = 128
    num_message_passing_steps: int = 10
    num_mlp_layers: int = 2  # multi_scale_train.py:335
    input_sequence_length: int = 11
    num_particle_types: int = 1
    particle_type_embedding_size: int = 9
    wall_x: float = -2.0
    num_scales: int = 2
    window_size: int = 2
    radius_multiplier: float = 2.0
    grid_spacing: float = 0.5
    max_neighbors: int = 24
    # 'float32' or 'bfloat16': dtype of the edge-sized tensors in the
    # DENSE execution path (models/multi_scale.py), mirroring the
    # single-scale contract: LayerNorm moments, node updates, the
    # prediction head, loss and Adam stay f32. The COO path ignores it.
    compute_dtype: str = "float32"

    @property
    def graph_config(self) -> MultiScaleConfig:
        return MultiScaleConfig(
            num_scales=self.num_scales,
            window_size=self.window_size,
            radius_multiplier=self.radius_multiplier,
            grid_spacing=self.grid_spacing,
            max_neighbors=self.max_neighbors,
        )

    @property
    def node_in(self) -> int:
        base = (self.input_sequence_length - 1) * self.dim + 1
        if self.num_particle_types > 1:
            base += self.particle_type_embedding_size
        return base

    @property
    def edge_in(self) -> int:
        return self.dim + 1

    @property
    def node_out(self) -> int:
        return self.dim + 1

    def gnn_config(self) -> MSGNNConfig:
        return MSGNNConfig(
            node_in=self.node_in,
            edge_in=self.edge_in,
            node_out=self.node_out,
            latent_dim=self.latent_dim,
            num_message_passing_steps=self.num_message_passing_steps,
            num_mlp_layers=self.num_mlp_layers,
        )


def multi_scale_simulator_init(
    key: jax.Array, cfg: MultiScaleSimulatorConfig, dtype=jnp.float32
) -> Params:
    k_gnn, k_emb = jax.random.split(key)
    params: Params = {"gnn": multi_scale_gnn_init(k_gnn, cfg.gnn_config(), dtype)}
    if cfg.num_particle_types > 1:
        params["type_embedding"] = embedding_init(
            k_emb, cfg.num_particle_types, cfg.particle_type_embedding_size, dtype
        )
    return params


def _edge_features_for(
    positions: jnp.ndarray, edges, radius: float
) -> jnp.ndarray:
    """(p_sender - p_receiver)/radius + norm (multi_scale_simulator.py:222-231)."""
    disp = (positions[edges.senders] - positions[edges.receivers]) / radius
    dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    feats = jnp.concatenate([disp, dist], axis=-1)
    return feats * edges.mask[:, None].astype(feats.dtype)


def _edge_features_dense(
    positions: jnp.ndarray, de, radius: float
) -> jnp.ndarray:
    """Dense-slot variant: [R, K, dim+1] features over DenseEdges."""
    disp = (positions[de.senders] - positions[de.recv][:, None, :]) / radius
    dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    feats = jnp.concatenate([disp, dist], axis=-1)
    return feats * de.mask[..., None].astype(feats.dtype)


def _ms_edge_features(cfg, most_recent: jnp.ndarray, graph) -> Dict[str, jnp.ndarray]:
    """Per-edge-type features with the family's per-type radius
    normalization (grid radius for g2m/m2g, coarsest for m2m)."""
    gc = cfg.graph_config
    dense = isinstance(graph, DenseStaticGraph)
    f = _edge_features_dense if dense else _edge_features_for
    return {
        "g2m": f(most_recent, graph.g2m, gc.grid_radius),
        # dense m2m is per-scale (tuple of DenseEdges); every scale's
        # features normalize by the ONE coarsest radius, exactly like the
        # reference's concatenated list (multi_scale_simulator.py:203-238)
        "m2m": (
            tuple(f(most_recent, de, gc.coarsest_radius) for de in graph.m2m)
            if dense
            else f(most_recent, graph.m2m, gc.coarsest_radius)
        ),
        "m2g": f(most_recent, graph.m2g, gc.grid_radius),
    }


def _ms_node_features(
    params: Params,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    position_sequence: jnp.ndarray,  # [..., S, dim]
    particle_types: jnp.ndarray,  # [...]
) -> jnp.ndarray:
    """Node features on arbitrary leading dims (batched or not)."""
    most_recent = position_sequence[..., -1, :]
    velocities = time_diff(position_sequence)
    norm_vel = (velocities - stats.vel_mean) / stats.vel_std
    feats = [norm_vel.reshape(*position_sequence.shape[:-2], -1)]
    grid_radius = cfg.graph_config.grid_radius
    wall = (
        jnp.clip(most_recent[..., 0:1] - cfg.wall_x, 0.0, grid_radius) / grid_radius
    )
    feats.append(wall)
    if cfg.num_particle_types > 1:
        feats.append(embedding_apply(params["type_embedding"], particle_types))
    return jnp.concatenate(feats, axis=-1)


def ms_encoder_preprocess(
    params: Params,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    position_sequence: jnp.ndarray,  # [N, S, dim]
    particle_types: jnp.ndarray,
    graph: StaticGraph,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    most_recent = position_sequence[:, -1]
    node_features = _ms_node_features(
        params, cfg, stats, position_sequence, particle_types
    )
    return node_features, _ms_edge_features(cfg, most_recent, graph)


def _forward(params, cfg, stats, position_sequence, particle_types, graph):
    node_f, edge_f = ms_encoder_preprocess(
        params, cfg, stats, position_sequence, particle_types, graph
    )
    if isinstance(graph, DenseStaticGraph):
        pred = multi_scale_gnn_apply_dense(
            params["gnn"], node_f, edge_f, graph,
            compute_dtype=(
                jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
            ),
        )
    else:
        pred = multi_scale_gnn_apply(
            params["gnn"], node_f, edge_f, graph,
            compute_dtype=(
                jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
            ),
        )
    return pred[:, : cfg.dim], pred[:, -1]


def ms_predict_positions(
    params: Params,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    current_positions: jnp.ndarray,
    particle_types: jnp.ndarray,
    graph: StaticGraph,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    norm_acc, strain = _forward(
        params, cfg, stats, current_positions, particle_types, graph
    )
    next_positions = decoder_postprocess(stats, norm_acc, current_positions)
    return next_positions, strain


def ms_predict_accelerations(
    params: Params,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    next_positions: jnp.ndarray,
    position_sequence_noise: jnp.ndarray,
    position_sequence: jnp.ndarray,
    particle_types: jnp.ndarray,
    graph: StaticGraph,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    noisy = position_sequence + position_sequence_noise
    pred_acc, pred_strain = _forward(params, cfg, stats, noisy, particle_types, graph)
    next_adjusted = next_positions + position_sequence_noise[:, -1]
    target_acc = inverse_decoder_postprocess(stats, next_adjusted, noisy)
    return pred_acc, target_acc, pred_strain


# --------------------------------------------------------------------------
# Batched (block-diagonal flat) execution path — the TPU-fast route.
# Pinned equal to the vmapped per-graph path by tests/test_multi_scale.py.
# --------------------------------------------------------------------------


def ms_forward_batched(
    params: Params,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    position_sequences: jnp.ndarray,  # [B, N, S, dim]
    particle_types: jnp.ndarray,  # [B, N]
    graph: StaticGraph,  # batched: [B, E_pad] leaves (per-sample graphs)
    node_mask: Optional[jnp.ndarray] = None,  # [B, N] (outputs at False rows
    # are garbage the caller must mask — padded nodes have no edges)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch forward as ONE flat block-diagonal graph.

    Replaces jax.vmap(ms_predict_accelerations-forward) — XLA lowers
    batched gathers/scatters poorly on TPU; flattening makes every edge
    gather a flat row gather and the three per-type aggregations single
    sorted segment-sums (see models/multi_scale.flatten_ms_graph).
    """
    del node_mask
    b, n = position_sequences.shape[:2]
    dense = isinstance(graph, DenseStaticGraph)
    flat_graph = (
        flatten_dense_ms_graph(graph, n) if dense else flatten_ms_graph(graph, n)
    )
    nf = _ms_node_features(
        params, cfg, stats, position_sequences, particle_types
    ).reshape(b * n, -1)
    most_recent = position_sequences[..., -1, :].reshape(b * n, -1)
    ef = _ms_edge_features(cfg, most_recent, flat_graph)
    if dense:
        pred = multi_scale_gnn_apply_dense(
            params["gnn"], nf, ef, flat_graph, sorted_receivers=True,
            compute_dtype=(
                jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
            ),
        ).reshape(b, n, -1)
    else:
        pred = multi_scale_gnn_apply(
            params["gnn"], nf, ef, flat_graph, sorted_receivers=True,
            compute_dtype=(
                jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
            ),
        ).reshape(b, n, -1)
    return pred[..., : cfg.dim], pred[..., -1]


def ms_predict_accelerations_batched(
    params: Params,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    next_positions: jnp.ndarray,  # [B, N, dim]
    position_sequence_noise: jnp.ndarray,  # [B, N, S, dim]
    position_sequences: jnp.ndarray,  # [B, N, S, dim]
    particle_types: jnp.ndarray,  # [B, N]
    graph: StaticGraph,  # batched
    node_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched training forward (same contract as ms_predict_accelerations)."""
    noisy = position_sequences + position_sequence_noise
    pred_acc, pred_strain = ms_forward_batched(
        params, cfg, stats, noisy, particle_types, graph, node_mask
    )
    next_adjusted = next_positions + position_sequence_noise[..., -1, :]
    target_acc = inverse_decoder_postprocess(stats, next_adjusted, noisy)
    return pred_acc, target_acc, pred_strain


def ms_rollout(
    params: Params,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    positions: jnp.ndarray,  # [N, T, dim]
    particle_types: jnp.ndarray,
    strains: jnp.ndarray,  # [T, N]
    graph: StaticGraph,
    node_mask: Optional[jnp.ndarray] = None,
    inference_mode: str = "autoregressive",
) -> Dict[str, jnp.ndarray]:
    """Scanned rollout with the static graph held fixed (reference reuses
    the t=0 hierarchy for every rollout step)."""
    from sgnn_tpu.physics.rollout import EROSIONAL_PARTICLE_ID, cumulative_rmse, per_step_rmse

    if inference_mode not in ("autoregressive", "one_step"):
        raise ValueError(f"Unknown inference_mode: {inference_mode}")
    s = cfg.input_sequence_length
    initial_positions = positions[:, :s]
    gt_positions = jnp.transpose(positions[:, s:], (1, 0, 2))
    gt_strains = strains[s:]
    erosional = (particle_types == EROSIONAL_PARTICLE_ID)[:, None]

    def step(window, xs):
        gt_pos, gt_strain = xs
        next_pos, strain = ms_predict_positions(
            params, cfg, stats, window, particle_types, graph
        )
        next_pos = jnp.where(erosional, gt_pos, next_pos)
        strain = jnp.where(erosional[:, 0], gt_strain, strain)
        fill = next_pos if inference_mode == "autoregressive" else gt_pos
        new_window = jnp.concatenate([window[:, 1:], fill[:, None, :]], axis=1)
        return new_window, (next_pos, strain)

    _, (pred_positions, pred_strains) = jax.lax.scan(
        step, initial_positions, (gt_positions, gt_strains)
    )
    return {
        "initial_positions": jnp.transpose(initial_positions, (1, 0, 2)),
        "initial_strains": strains[:s],
        "predicted_rollout": pred_positions,
        "ground_truth_rollout": gt_positions,
        "predicted_strain": pred_strains,
        "ground_truth_strain": gt_strains,
        "particle_types": particle_types,
        "rmse_position": cumulative_rmse(pred_positions, gt_positions, node_mask),
        "rmse_strain": cumulative_rmse(
            pred_strains[..., None], gt_strains[..., None], node_mask
        ),
        # the reference's multi-scale evaluator logs per-step (not
        # cumulative) RMSE (multi_scale_evaluate.py:185-196)
        "rmse_position_per_step": per_step_rmse(
            pred_positions, gt_positions, node_mask
        ),
        "rmse_strain_per_step": per_step_rmse(
            pred_strains[..., None], gt_strains[..., None], node_mask
        ),
    }
