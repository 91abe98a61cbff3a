"""Autoregressive rollout as a single compiled `lax.scan`.

Re-design of the reference rollout loop (sgnn/single_scale/evaluate.py:52-175):
instead of a Python loop issuing one model call per step, the whole
trajectory unrolls inside one XLA program — the graph rebuild, model
forward and window shift all stay on-device, with no host round trips
between steps.

Semantics preserved:
  * erosional particles (type == -1) follow the ground-truth trajectory
    and strain (evaluate.py:17, 113-131),
  * 'autoregressive' shifts the window with the prediction; 'one_step'
    shifts with ground truth (evaluate.py:136-145),
  * cumulative RMSE metric sqrt(cumsum(mean sq)/t) (evaluate.py:23-48).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sgnn_tpu.nn.core import Params
from sgnn_tpu.physics.simulator import (
    NormStats,
    SimulatorConfig,
    predict_positions_flat,
)

EROSIONAL_PARTICLE_ID = -1


def cumulative_rmse(
    pred: jnp.ndarray, gt: jnp.ndarray, node_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Accumulated RMSE over a rollout (evaluate.py:23-48).

    pred/gt: [T, N, ...]; returns [T] where out[t] is the RMSE of the
    first t+1 steps pooled together.
    """
    t = pred.shape[0]
    sq = jnp.square(pred - gt).reshape(t, pred.shape[1], -1)
    if node_mask is not None:
        w = node_mask.astype(sq.dtype)[None, :, None]
        mean_sq = jnp.sum(sq * w, axis=(1, 2)) / (jnp.sum(w) * sq.shape[-1])
    else:
        mean_sq = jnp.mean(sq, axis=(1, 2))
    return jnp.sqrt(jnp.cumsum(mean_sq) / jnp.arange(1, t + 1, dtype=sq.dtype))


def per_step_rmse(
    pred: jnp.ndarray, gt: jnp.ndarray, node_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Per-step RMSE [T] (the multi-scale family's validation metric,
    multi_scale_evaluate.py:185-196 — contrast with cumulative_rmse)."""
    t = pred.shape[0]
    sq = jnp.square(pred - gt).reshape(t, pred.shape[1], -1)
    if node_mask is not None:
        w = node_mask.astype(sq.dtype)[None, :, None]
        mean_sq = jnp.sum(sq * w, axis=(1, 2)) / (jnp.sum(w) * sq.shape[-1])
    else:
        mean_sq = jnp.mean(sq, axis=(1, 2))
    return jnp.sqrt(mean_sq)


def rollout(
    params: Params,
    cfg: SimulatorConfig,
    stats: NormStats,
    positions: jnp.ndarray,  # [N, T, dim] full ground-truth trajectory
    particle_types: jnp.ndarray,  # [N]
    strains: jnp.ndarray,  # [T, N]
    node_mask: Optional[jnp.ndarray] = None,
    inference_mode: str = "autoregressive",
) -> Dict[str, jnp.ndarray]:
    """Roll the model out over a full trajectory.

    Returns the reference's output dict (evaluate.py:161-173) as jnp
    arrays; `run_time` is stamped by callers that care.
    """
    if inference_mode not in ("autoregressive", "one_step"):
        raise ValueError(f"Unknown inference_mode: {inference_mode}")
    s = cfg.input_sequence_length
    n, t, dim = positions.shape

    initial_positions = positions[:, :s]  # [N, S, dim]
    gt_positions = jnp.transpose(positions[:, s:], (1, 0, 2))  # [T-S, N, dim]
    gt_strains = strains[s:]  # [T-S, N]
    erosional = (particle_types == EROSIONAL_PARTICLE_ID)[:, None]  # [N, 1]

    def step(window, xs):
        gt_pos, gt_strain = xs
        next_pos, strain = predict_positions_flat(
            params, cfg, stats, window, particle_types, node_mask
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
        "predicted_rollout": pred_positions,  # [T-S, N, dim]
        "ground_truth_rollout": gt_positions,
        "predicted_strain": pred_strains,  # [T-S, N]
        "ground_truth_strain": gt_strains,
        "particle_types": particle_types,
        "rmse_position": cumulative_rmse(pred_positions, gt_positions, node_mask),
        "rmse_strain": cumulative_rmse(
            pred_strains[..., None], gt_strains[..., None], node_mask
        ),
        # NOTE: inference_mode is static config, not a traced output — callers
        # that pickle reference-compatible rollout dicts stamp it themselves.
    }
