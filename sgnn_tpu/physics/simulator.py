"""The learned particle simulator: features, graph, model, integration.

Functional re-design of the reference ``LearnedSimulator``
(xrkong/sgnn sgnn/single_scale/learned_simulator.py:9-537). State lives in
an explicit params pytree + a frozen config; every method is a pure
function, so the whole pipeline (feature engineering -> radius graph ->
GNN -> Euler integration) jits into a single XLA program and vmaps over
batches.

Behavioral contract preserved (SURVEY.md §2.2):
  * node features = flattened normalized velocity finite differences
    ((S-1)*dim values; v normalized by (v - mean)/std with the training
    noise folded into std by the caller, train.py:446-457) + wall distance
    clamp(x - wall_x, 0, R) (learned_simulator.py:282-284; optionally
    divided by R — the multi-scale family's variant,
    multi_scale_simulator.py:190-192) + optional particle-type embedding
    when num_particle_types > 1.
  * edge features = (p_sender - p_receiver)/R and its L2 norm
    (learned_simulator.py:294-316).
  * graph rebuilt from the most recent positions every call with strict
    < R, self loops, per-receiver cap (learned_simulator.py:114-117).
  * output head: dim accelerations + 1 strain channel
    (learned_simulator.py:433-434).
  * Euler integration with dt=1 (learned_simulator.py:397-411) and its
    exact inverse for training targets (:493-517).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sgnn_tpu.models.encode_process_decode import (
    EPDConfig,
    encode_process_decode_apply,
    encode_process_decode_init,
)
from sgnn_tpu.nn.core import Params, embedding_apply, embedding_init
from sgnn_tpu.ops.neighbors import NeighborList, radius_neighbors


class NormStats(NamedTuple):
    """Normalization statistics (metadata-derived, noise folded into std)."""

    vel_mean: jnp.ndarray  # [dim]
    vel_std: jnp.ndarray  # [dim]
    acc_mean: jnp.ndarray  # [dim]
    acc_std: jnp.ndarray  # [dim]


def make_norm_stats(metadata: dict, noise_std: float, dtype=jnp.float32) -> NormStats:
    """Fold training noise into the velocity/acceleration std.

    Mirrors _get_simulator (train.py:446-457): std = sqrt(std^2 + noise^2).
    """
    as_arr = lambda x: jnp.asarray(x, dtype)
    return NormStats(
        vel_mean=as_arr(metadata["vel_mean"]),
        vel_std=jnp.sqrt(as_arr(metadata["vel_std"]) ** 2 + noise_std**2),
        acc_mean=as_arr(metadata["acc_mean"]),
        acc_std=jnp.sqrt(as_arr(metadata["acc_std"]) ** 2 + noise_std**2),
    )


@dataclasses.dataclass(frozen=True)
class SimulatorConfig:
    """Static hyperparameters of the single-scale simulator."""

    dim: int = 2
    latent_dim: int = 64
    num_message_passing_steps: int = 5
    num_mlp_layers: int = 1
    connectivity_radius: float = 0.6
    input_sequence_length: int = 11  # S: window of positions fed to the model
    num_particle_types: int = 1
    particle_type_embedding_size: int = 9
    max_neighbors: int = 20
    # Physical neighbor-list slot count. Defaults to max_neighbors; can be
    # lowered when the dataset's true max degree is known to be smaller
    # (recorded by the dataset builder), shrinking every edge tensor and
    # gather proportionally with IDENTICAL semantics as long as
    # degree <= neighbor_slots everywhere (the cap rule — keep lowest
    # sender indices — is unchanged).
    neighbor_slots: Optional[int] = None
    # Use the gather-based (scatter-free) VJP for sender gathers. Only
    # valid when the graph is symmetric, i.e. the neighbor cap never
    # binds (dataset max degree <= slots). See ops/sym_gather.py.
    # CAVEAT: with this set, forward_batched routes through the fused
    # packed-gather path, which stop-gradients POSITIONS (epd_flat.py) —
    # gradients w.r.t. position_sequences cover only the node-feature
    # path. Training and rollout never differentiate positions, so this
    # is safe for them; callers that need full position gradients must
    # set symmetric_gather=False (the unfused path keeps them).
    symmetric_gather: bool = False
    # 'float32' (default) or 'bfloat16': dtype of the edge/node latents in
    # the flat execution path. bf16 halves HBM traffic on every edge-sized
    # tensor; LayerNorm moments, node updates, the decoder, loss and Adam
    # all stay f32. Parity tests run f32.
    compute_dtype: str = "float32"
    wall_x: float = -2.0  # rigid wall location (Taylor impact)
    # False = single-scale contract (raw clamped distance); True = the
    # multi-scale family's normalized variant.
    normalize_wall_distance: bool = False
    # Optional static spatial domain enabling the cell-list search path.
    domain: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None
    neighbor_method: str = "auto"
    # Banded-gather index-locality bound: max |sender - receiver| node
    # index distance, valid when the node ordering is spatially sorted
    # (x-major lattices, edge-partition x-sorted samples). When set,
    # large-table gathers (per-layer reverse-gathers and forward sender
    # gathers past ~450k table rows) run the banded scan-over-tiles path
    # — 3.2x at 2.4M rows, 1.5x whole-step at 307k nodes
    # (ops/sym_gather.banded_gather_rows). CONTRACT: values are exact
    # only while the bound holds; forward_batched(return_aux=True)
    # surfaces `band_violations` (exact, near-free check on the actual
    # neighbor lists — the trainer logs/warns on it like the halo
    # guard). An in-op cond fallback was tried and reverted (7x step
    # regression — see banded_gather_rows). None = off.
    band_nodes: Optional[int] = None
    # Node-count ceiling for the fused packed 3-stream gather
    # (ops/sym_gather.packed_sym_gather). Above it forward_batched keeps
    # the symmetric gather-based VJP but builds the reverse index
    # separately and runs the unfused path: the packed path's gathered
    # f32 [M*K, dim+K+H] block crosses the compiler's 2^31-byte
    # single-buffer ceiling near 1M nodes (2.9 GB at 1.2M — the r4
    # compile-crash bisection), while the unfused path's largest buffer
    # is the [M*K, H] sender gather (1.26 GB bf16 at 1.2M). 800k keeps
    # every proven-to-compile config (<=614k nodes) on the fast fused
    # path.
    packed_gather_max_nodes: int = 800_000
    # Max occupants read per grid cell in the cell-list searches (cells
    # have side = radius). Cells holding more particles than this
    # silently drop the overflow, so it must be >= the densest cell's
    # count: with particle spacing h, ~ (radius/h + 1)^dim. The default 8
    # covers the Taylor-impact data (r=0.6 on 0.5 spacing -> <= 4/cell
    # plus deformation headroom). Every search path — single-device,
    # batched, and the per-shard edge-partitioned forward — reads this
    # one knob, so distributed and single-device runs always agree.
    cell_capacity: int = 8
    # Rematerialize each processor layer in the backward (jax.checkpoint)
    # instead of holding its edge-sized residuals. ~6% slower at headline
    # scale (r1: 38.3 -> 40.8 ms) but the difference between running and
    # ResourceExhausted at 614k+ nodes (the un-rematerialized train step
    # holds ~2 [M*K, H] residual sets per layer). Capacity-scale knob.
    # True (== "xj") saves only the gathered sender tensor per layer;
    # "xj_msg" also saves the edge messages, skipping the bwd edge-MLP
    # recompute for +1 bf16 [M*K, H] residual per layer (629 MB at 614k)
    # — use when HBM still has headroom at the target N. "full" saves
    # nothing beyond layer inputs (minimum memory; the xj residuals
    # themselves recompute — needed past ~800k nodes where save-xj's
    # temp HBM crosses the 16 GB chip ceiling, measured r5 bisection).
    remat: object = False  # False | True | "xj" | "xj_msg" | "full"

    @property
    def slots(self) -> int:
        return self.neighbor_slots or self.max_neighbors

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
        return self.dim + 1  # accelerations + strain

    def epd_config(self) -> EPDConfig:
        return EPDConfig(
            node_in=self.node_in,
            edge_in=self.edge_in,
            node_out=self.node_out,
            latent_dim=self.latent_dim,
            num_message_passing_steps=self.num_message_passing_steps,
            num_mlp_layers=self.num_mlp_layers,
        )


def simulator_init(key: jax.Array, cfg: SimulatorConfig, dtype=jnp.float32) -> Params:
    k_epd, k_emb = jax.random.split(key)
    params: Params = {"epd": encode_process_decode_init(key=k_epd, cfg=cfg.epd_config(), dtype=dtype)}
    if cfg.num_particle_types > 1:
        params["type_embedding"] = embedding_init(
            k_emb, cfg.num_particle_types, cfg.particle_type_embedding_size, dtype
        )
    return params


def time_diff(position_sequence: jnp.ndarray) -> jnp.ndarray:
    """Finite-difference velocities (learned_simulator.py:540-550).

    [..., S, dim] -> [..., S-1, dim] (works batched or unbatched).
    """
    return position_sequence[..., 1:, :] - position_sequence[..., :-1, :]


def compute_neighbors(
    cfg: SimulatorConfig,
    positions: jnp.ndarray,
    node_mask: Optional[jnp.ndarray] = None,
) -> NeighborList:
    """Radius graph from current positions (learned_simulator.py:70-124)."""
    return radius_neighbors(
        positions,
        cfg.connectivity_radius,
        max_neighbors=cfg.slots,
        include_self=True,
        node_mask=node_mask,
        strict=True,
        domain=cfg.domain,
        method=cfg.neighbor_method,
        cell_capacity=cfg.cell_capacity,
    )


def encoder_preprocess(
    params: Params,
    cfg: SimulatorConfig,
    stats: NormStats,
    position_sequence: jnp.ndarray,  # [N, S, dim]
    particle_types: jnp.ndarray,  # [N] int32
    node_mask: Optional[jnp.ndarray] = None,  # [N] bool
) -> Tuple[jnp.ndarray, jnp.ndarray, NeighborList]:
    """Features + graph (learned_simulator.py:231-316).

    Returns (node_features [N, node_in], edge_features [N, K, dim+1], nl).
    """
    n = position_sequence.shape[0]
    most_recent = position_sequence[:, -1]  # [N, dim]
    velocities = time_diff(position_sequence)  # [N, S-1, dim]

    nl = compute_neighbors(cfg, most_recent, node_mask)

    # --- node features ----------------------------------------------------
    norm_vel = (velocities - stats.vel_mean) / stats.vel_std
    feats = [norm_vel.reshape(n, -1)]

    wall = jnp.clip(
        most_recent[:, 0:1] - cfg.wall_x, 0.0, cfg.connectivity_radius
    )
    if cfg.normalize_wall_distance:
        wall = wall / cfg.connectivity_radius
    feats.append(wall)

    if cfg.num_particle_types > 1:
        feats.append(embedding_apply(params["type_embedding"], particle_types))
    node_features = jnp.concatenate(feats, axis=-1)

    # --- edge features: (p_sender - p_receiver)/R, plus norm --------------
    disp = (most_recent[nl.senders] - most_recent[:, None, :]) / cfg.connectivity_radius
    dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    edge_features = jnp.concatenate([disp, dist], axis=-1)  # [N, K, dim+1]
    edge_features = edge_features * nl.mask[..., None].astype(edge_features.dtype)

    return node_features, edge_features, nl


def decoder_postprocess(
    stats: NormStats,
    normalized_acceleration: jnp.ndarray,  # [N, dim]
    position_sequence: jnp.ndarray,  # [N, S, dim]
) -> jnp.ndarray:
    """Denormalize + Euler integrate, dt=1 (learned_simulator.py:381-411)."""
    acceleration = normalized_acceleration * stats.acc_std + stats.acc_mean
    most_recent = position_sequence[..., -1, :]
    velocity = most_recent - position_sequence[..., -2, :]
    new_velocity = velocity + acceleration
    return most_recent + new_velocity


def inverse_decoder_postprocess(
    stats: NormStats,
    next_position: jnp.ndarray,  # [N, dim]
    position_sequence: jnp.ndarray,  # [N, S, dim]
) -> jnp.ndarray:
    """Exact inverse of the Euler update (learned_simulator.py:493-517)."""
    previous = position_sequence[..., -1, :]
    previous_velocity = previous - position_sequence[..., -2, :]
    next_velocity = next_position - previous
    acceleration = next_velocity - previous_velocity
    return (acceleration - stats.acc_mean) / stats.acc_std


def _forward(
    params: Params,
    cfg: SimulatorConfig,
    stats: NormStats,
    position_sequence: jnp.ndarray,
    particle_types: jnp.ndarray,
    node_mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    node_f, edge_f, nl = encoder_preprocess(
        params, cfg, stats, position_sequence, particle_types, node_mask
    )
    pred = encode_process_decode_apply(params["epd"], node_f, edge_f, nl)
    return pred[:, : cfg.dim], pred[:, -1]


def predict_positions(
    params: Params,
    cfg: SimulatorConfig,
    stats: NormStats,
    current_positions: jnp.ndarray,  # [N, S, dim]
    particle_types: jnp.ndarray,
    node_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference step: next positions + strain (learned_simulator.py:413-438)."""
    norm_acc, strain = _forward(
        params, cfg, stats, current_positions, particle_types, node_mask
    )
    next_positions = decoder_postprocess(stats, norm_acc, current_positions)
    return next_positions, strain


def predict_accelerations(
    params: Params,
    cfg: SimulatorConfig,
    stats: NormStats,
    next_positions: jnp.ndarray,  # [N, dim]
    position_sequence_noise: jnp.ndarray,  # [N, S, dim]
    position_sequence: jnp.ndarray,  # [N, S, dim]
    particle_types: jnp.ndarray,
    node_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training forward: predicted + target normalized accelerations, strain.

    The target is computed on the noise-adjusted next position so velocity
    noise cancels exactly (learned_simulator.py:440-491).
    """
    noisy = position_sequence + position_sequence_noise
    pred_acc, pred_strain = _forward(
        params, cfg, stats, noisy, particle_types, node_mask
    )
    next_adjusted = next_positions + position_sequence_noise[:, -1]
    target_acc = inverse_decoder_postprocess(stats, next_adjusted, noisy)
    return pred_acc, target_acc, pred_strain


# --------------------------------------------------------------------------
# Batched (block-diagonal flat) execution path — the TPU-fast route.
# --------------------------------------------------------------------------


def _node_features_batched(params, cfg, stats, position_sequences, particle_types):
    """Node features on [..., S, dim] sequences (batched or not)."""
    most_recent = position_sequences[..., -1, :]
    velocities = time_diff(position_sequences)
    norm_vel = (velocities - stats.vel_mean) / stats.vel_std
    feats = [norm_vel.reshape(*position_sequences.shape[:-2], -1)]
    wall = jnp.clip(
        most_recent[..., 0:1] - cfg.wall_x, 0.0, cfg.connectivity_radius
    )
    if cfg.normalize_wall_distance:
        wall = wall / cfg.connectivity_radius
    feats.append(wall)
    if cfg.num_particle_types > 1:
        feats.append(embedding_apply(params["type_embedding"], particle_types))
    return jnp.concatenate(feats, axis=-1)


def forward_batched(
    params: Params,
    cfg: SimulatorConfig,
    stats: NormStats,
    position_sequences: jnp.ndarray,  # [B, N, S, dim]
    particle_types: jnp.ndarray,  # [B, N]
    node_mask: Optional[jnp.ndarray] = None,  # [B, N]
    use_pallas: Optional[bool] = None,
    return_aux: bool = False,
):
    """Batch forward through the flattened block-diagonal model.

    With a configured spatial domain, the radius search itself runs
    batched-flat (ops.neighbors.radius_neighbors_grid_batched) so every
    gather in the step is a fast flat gather; otherwise falls back to a
    vmapped per-graph preprocess.

    With ``return_aux=True`` a third output carries guard metrics:
    ``{"band_violations": int32}`` — the banded-gather contract check
    (ops/sym_gather.band_violations; always 0 when cfg.band_nodes is
    None). Nonzero means the node ordering decayed past the declared
    band and banded gathers were inexact this step — re-sort the nodes
    (the banded analogue of the edge-partition halo guard).
    """
    from sgnn_tpu.models.epd_flat import (
        encode_process_decode_apply_flat,
        flatten_batch_graph,
    )
    from sgnn_tpu.ops.neighbors import radius_neighbors_celltable

    b, n = position_sequences.shape[:2]
    if node_mask is None:
        node_mask = jnp.ones((b, n), bool)
    k = cfg.slots
    rev = None

    def _with_aux(pred, nl_senders, nl_mask):
        if not return_aux:
            return pred
        if cfg.band_nodes is None:
            viol = jnp.zeros((), jnp.int32)
        else:
            from sgnn_tpu.ops.sym_gather import band_violations

            viol = band_violations(nl_senders, nl_mask, cfg.band_nodes)
        return pred + ({"band_violations": viol},)

    if cfg.domain is not None:
        last = position_sequences[..., -1, :]
        nl = radius_neighbors_celltable(
            last,
            cfg.connectivity_radius,
            domain_min=tuple(cfg.domain[0]),
            domain_max=tuple(cfg.domain[1]),
            max_neighbors=k,
            node_mask=node_mask,
            cell_capacity=cfg.cell_capacity,
        )
        senders = nl.senders  # [B*N, K] global flat indices
        nf = _node_features_batched(
            params, cfg, stats, position_sequences, particle_types
        ).reshape(b * n, -1)
        flat_last = last.reshape(b * n, -1)
        if cfg.symmetric_gather and b * n <= cfg.packed_gather_max_nodes:
            # packed-gather fast path: edge features, reverse-edge index
            # and layer 0's sender gather ride ONE row gather
            from sgnn_tpu.models.epd_flat import (
                encode_process_decode_apply_flat_fused,
            )

            pred = encode_process_decode_apply_flat_fused(
                params["epd"],
                nf,
                flat_last,
                senders,
                nl.mask,
                cfg.connectivity_radius,
                use_pallas,
                compute_dtype=(
                    jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
                ),
                band_nodes=cfg.band_nodes,
                remat=cfg.remat,
            ).reshape(b, n, -1)
            return _with_aux(
                (pred[..., : cfg.dim], pred[..., -1]), senders, nl.mask
            )
        if cfg.symmetric_gather:
            # past packed_gather_max_nodes the packed f32 table's gathered
            # output ([M*K, dim+K+H] f32) would cross the compiler's 2^31-
            # byte single-buffer ceiling (2.9 GB at 1.2M nodes — the r4
            # HTTP-500 hypothesis); keep the symmetric scatter-free VJP
            # but build the reverse index separately and run the unfused
            # path, whose largest buffer is the [M*K, H] sender gather
            # (1.26 GB bf16 at 1.2M).
            from sgnn_tpu.ops.sym_gather import reverse_edge_positions

            rev = reverse_edge_positions(senders, nl.mask)
        degrees = jnp.sum(nl.mask, axis=-1, keepdims=True).astype(jnp.float32)
        disp = (flat_last[senders] - flat_last[:, None, :]) / cfg.connectivity_radius
        dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
        ef = jnp.concatenate([disp, dist], axis=-1)
        ef = ef * nl.mask[..., None].astype(ef.dtype)
        senders_flat = senders.reshape(-1)
        ef_flat = ef.reshape(b * n * k, -1)
    else:
        nf, ef, nl = jax.vmap(
            lambda s, t, m: encoder_preprocess(params, cfg, stats, s, t, m)
        )(position_sequences, particle_types, node_mask)
        senders_flat, degrees = flatten_batch_graph(nl.senders, nl.mask, n)
        nf = nf.reshape(b * n, -1)
        ef_flat = ef.reshape(b * n * k, -1)

    pred = encode_process_decode_apply_flat(
        params["epd"],
        nf,
        ef_flat,
        senders_flat,
        degrees,
        k,
        use_pallas,
        rev,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None,
        band_nodes=cfg.band_nodes,
        remat=cfg.remat,
    ).reshape(b, n, -1)
    return _with_aux((pred[..., : cfg.dim], pred[..., -1]), nl.senders, nl.mask)


def predict_accelerations_batched(
    params: Params,
    cfg: SimulatorConfig,
    stats: NormStats,
    next_positions: jnp.ndarray,  # [B, N, dim]
    position_sequence_noise: jnp.ndarray,  # [B, N, S, dim]
    position_sequences: jnp.ndarray,  # [B, N, S, dim]
    particle_types: jnp.ndarray,  # [B, N]
    node_mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    return_aux: bool = False,
):
    """Batched training forward (same contract as predict_accelerations).

    With return_aux=True, appends forward_batched's guard-metrics dict.
    """
    noisy = position_sequences + position_sequence_noise
    out = forward_batched(
        params, cfg, stats, noisy, particle_types, node_mask, use_pallas,
        return_aux=return_aux,
    )
    pred_acc, pred_strain = out[:2]
    next_adjusted = next_positions + position_sequence_noise[..., -1, :]
    target_acc = inverse_decoder_postprocess(stats, next_adjusted, noisy)
    res = (pred_acc, target_acc, pred_strain)
    return res + (out[2],) if return_aux else res


def predict_positions_flat(
    params: Params,
    cfg: SimulatorConfig,
    stats: NormStats,
    current_positions: jnp.ndarray,  # [N, S, dim]
    particle_types: jnp.ndarray,
    node_mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-graph inference through the flat path (B=1)."""
    mask = None if node_mask is None else node_mask[None]
    norm_acc, strain = forward_batched(
        params, cfg, stats, current_positions[None], particle_types[None],
        mask, use_pallas,
    )
    next_positions = decoder_postprocess(stats, norm_acc[0], current_positions)
    return next_positions, strain[0]
