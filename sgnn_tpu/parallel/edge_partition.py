"""Edge-partitioned message passing: one big graph sharded across chips.

The GNN analogue of sequence/context parallelism (SURVEY.md §2.4, §5.7):
nodes are spatially sorted along the bar axis and split into contiguous
slabs, one per chip on the 'graph' mesh axis. Because the interaction
radius r is small, a node's neighbors live either in its own slab or in
a thin boundary strip of the adjacent slabs — so each message-passing
layer only needs a **halo exchange** of those strips with the two
neighbors (jax.lax.ppermute ring over ICI), not an all-gather.

Static-shape design: slabs are equal-sized contiguous index ranges of
the spatially sorted node array, so the halo strips are *static* slices
(first/last `halo` rows of each slab) — no dynamic membership, and the
exchange is two ppermutes of [halo, D] per layer which XLA overlaps
with local compute.

Correctness contract (validated host-side by `partition_plan`):
  * slab x-extent >= r  -> neighbors come only from adjacent slabs,
  * all nodes within distance r of a slab boundary lie within the
    first/last `halo` rows of that slab (x-sorted order guarantees the
    strip is contiguous in index space).

The reference has no distributed code (strictly single-device,
train.py:531); this subsystem is new scope from BASELINE.json.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgnn_tpu.models.encode_process_decode import encode_process_decode_apply
from sgnn_tpu.nn.core import Params
from sgnn_tpu.ops.neighbors import radius_neighbors_bruteforce
from sgnn_tpu.physics.simulator import (
    NormStats,
    SimulatorConfig,
    decoder_postprocess,
    inverse_decoder_postprocess,
    time_diff,
)
from sgnn_tpu.nn.core import embedding_apply


@dataclasses.dataclass(frozen=True)
class PartitionSpec1D:
    """Static plan for slab partitioning of one graph."""

    num_shards: int
    nodes_per_shard: int  # padded local node count
    halo: int  # boundary strip rows exchanged per side

    @property
    def total_nodes(self) -> int:
        return self.num_shards * self.nodes_per_shard

    @property
    def ext_nodes(self) -> int:
        return self.nodes_per_shard + 2 * self.halo


def partition_plan(
    positions: np.ndarray,
    num_shards: int,
    radius: float,
    *,
    pad_multiple: int = 8,
    halo_slack: float = 1.5,
) -> Tuple[PartitionSpec1D, np.ndarray]:
    """Host-side: sort nodes by x, size the slabs and halos, validate.

    Returns (spec, order) where `order` is the permutation that sorts
    nodes by x; callers reorder every per-node array with it.
    """
    n = positions.shape[0]
    order = np.argsort(positions[:, 0], kind="stable")
    xs = positions[order, 0]
    per = -(-n // num_shards)
    per = -(-per // pad_multiple) * pad_multiple

    # For every slab boundary b = s*per, nodes with |x - x_b| <= radius must
    # lie entirely in the two adjacent slabs (else neighbors would skip a
    # shard) and within `halo` rows of the boundary on each side.
    halo_needed = 0
    for s in range(1, num_shards):
        b = s * per
        if b >= n:
            break  # later shards are pure padding
        x_b = 0.5 * (xs[b - 1] + xs[b])
        i0 = int(np.searchsorted(xs, x_b - radius, side="left"))
        i1 = int(np.searchsorted(xs, x_b + radius, side="right"))
        if i0 < (s - 1) * per or i1 > (s + 1) * per:
            raise ValueError(
                f"boundary {s}: interaction strip spans beyond adjacent slabs "
                f"(strip [{i0},{i1}) vs slabs [{(s-1)*per},{(s+1)*per})); "
                "too many shards for this graph — reduce num_shards"
            )
        halo_needed = max(halo_needed, b - i0, i1 - b)
    halo = max(
        pad_multiple,
        -(-int(halo_needed * halo_slack) // pad_multiple) * pad_multiple,
    )
    halo = min(halo, per)
    return PartitionSpec1D(num_shards, per, halo), order


def scatter_to_shards(arr: np.ndarray, order: np.ndarray, spec: PartitionSpec1D):
    """Reorder by `order` and pad the node axis (axis 0) to P*per."""
    arr = np.asarray(arr)[order]
    pad = spec.total_nodes - arr.shape[0]
    if pad:
        arr = np.concatenate([arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)])
    return arr


def _halo_exchange(x_local: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Return ext = concat([left_halo, x_local, right_halo], axis=0).

    left_halo = left neighbor's last `halo` rows; right_halo = right
    neighbor's first `halo` rows. Boundary shards receive zeros.
    """
    p = jax.lax.axis_size(axis)
    # my first rows -> left neighbor's right halo
    right_halo = jax.lax.ppermute(
        x_local[:halo], axis, perm=[(j, j - 1) for j in range(1, p)]
    )
    # my last rows -> right neighbor's left halo
    left_halo = jax.lax.ppermute(
        x_local[-halo:], axis, perm=[(j, j + 1) for j in range(p - 1)]
    )
    return jnp.concatenate([left_halo, x_local, right_halo], axis=0)


def _sharded_forward(
    params: Params,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    axis: str,
    position_sequence: jnp.ndarray,  # [N_local, S, dim] (this shard's slab)
    particle_types: jnp.ndarray,  # [N_local]
    node_mask: jnp.ndarray,  # [N_local]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed EPD forward on one shard (runs under shard_map)."""
    halo = spec.halo
    n_local = position_sequence.shape[0]

    # --- halo exchange of positions + masks for graph build ---------------
    last_pos = position_sequence[:, -1]
    pos_ext = _halo_exchange(last_pos, halo, axis)
    mask_ext = _halo_exchange(node_mask.astype(jnp.int32), halo, axis) > 0

    # --- local radius graph: receivers = local rows of the ext array ------
    if cfg.domain is not None:
        # production path: per-shard cell-table search over the global
        # domain grid (the table is cells-sized, ~10 MB; occupancy work
        # scales with N_ext). The O(N_ext^2) bruteforce below is kept
        # for domain-less configs and as the test oracle.
        from sgnn_tpu.ops.neighbors import radius_neighbors_celltable

        nl_ext = radius_neighbors_celltable(
            pos_ext[None],
            cfg.connectivity_radius,
            domain_min=tuple(cfg.domain[0]),
            domain_max=tuple(cfg.domain[1]),
            max_neighbors=cfg.slots,
            node_mask=mask_ext[None],
        )
    else:
        nl_ext = radius_neighbors_bruteforce(
            pos_ext,
            cfg.connectivity_radius,
            max_neighbors=cfg.slots,
            include_self=True,
            node_mask=mask_ext,
            strict=True,
        )
    senders = nl_ext.senders[halo : halo + n_local]  # [N_local, K] (ext idx)
    e_mask = nl_ext.mask[halo : halo + n_local]

    # --- node features (local) -------------------------------------------
    velocities = time_diff(position_sequence)
    norm_vel = (velocities - stats.vel_mean) / stats.vel_std
    feats = [norm_vel.reshape(n_local, -1)]
    wall = jnp.clip(last_pos[:, 0:1] - cfg.wall_x, 0.0, cfg.connectivity_radius)
    if cfg.normalize_wall_distance:
        wall = wall / cfg.connectivity_radius
    feats.append(wall)
    if cfg.num_particle_types > 1:
        feats.append(embedding_apply(params["type_embedding"], particle_types))
    node_features = jnp.concatenate(feats, axis=-1)

    # --- edge features (sender positions come from the ext array) --------
    disp = (pos_ext[senders] - last_pos[:, None, :]) / cfg.connectivity_radius
    dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    edge_features = jnp.concatenate([disp, dist], axis=-1)
    edge_features = edge_features * e_mask[..., None].astype(edge_features.dtype)

    # --- encode (local) ---------------------------------------------------
    from sgnn_tpu.nn.core import layer_norm_apply, mlp_apply
    from sgnn_tpu.models.encode_process_decode import (
        _mlp_tail,
        _split_first_layer,
    )

    epd = params["epd"]
    x = layer_norm_apply(
        epd["encoder"]["node"]["ln"], mlp_apply(epd["encoder"]["node"]["mlp"], node_features)
    )
    e = layer_norm_apply(
        epd["encoder"]["edge"]["ln"], mlp_apply(epd["encoder"]["edge"]["mlp"], edge_features)
    )
    e = e * e_mask[..., None].astype(e.dtype)

    # --- message passing with per-layer halo refresh ----------------------
    d = x.shape[-1]
    for step_params in epd["processor"]:
        x_ext = _halo_exchange(x, halo, axis)  # refresh neighbor latents
        (w_i, w_j, w_e), b_e = _split_first_layer(step_params["edge"]["mlp"], (d, d, d))
        proj_i = jnp.dot(x, w_i, preferred_element_type=x.dtype)
        proj_j_ext = jnp.dot(x_ext, w_j, preferred_element_type=x.dtype)
        h = (
            proj_i[:, None, :]
            + proj_j_ext[senders]
            + jnp.dot(e, w_e, preferred_element_type=x.dtype)
            + b_e
        )
        msg = _mlp_tail(step_params["edge"]["mlp"], h)
        msg = layer_norm_apply(step_params["edge"]["ln"], msg)
        msg = msg * e_mask[..., None].astype(x.dtype)
        agg = jnp.sum(msg, axis=1)
        (w_agg, w_x), b_n = _split_first_layer(step_params["node"]["mlp"], (d, d))
        hn = (
            jnp.dot(agg, w_agg, preferred_element_type=x.dtype)
            + jnp.dot(x, w_x, preferred_element_type=x.dtype)
            + b_n
        )
        upd = layer_norm_apply(
            step_params["node"]["ln"], _mlp_tail(step_params["node"]["mlp"], hn)
        )
        x = x + upd
        e = (e + msg) * e_mask[..., None].astype(x.dtype)

    pred = mlp_apply(epd["decoder"], x)
    return pred[:, : cfg.dim], pred[:, -1]


def make_partitioned_forward(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    *,
    axis: str = "graph",
):
    """Build a jitted distributed forward over `mesh`'s `axis`.

    Inputs are global arrays with the node axis sharded over `axis`:
      position_sequence [N_total, S, dim], particle_types [N_total],
      node_mask [N_total]. Returns (norm_acc [N_total, dim], strain).
    """
    from jax import shard_map

    fwd = functools.partial(_sharded_forward, cfg=cfg, stats=stats, spec=spec, axis=axis)

    def wrapped(params, position_sequence, particle_types, node_mask):
        return shard_map(
            lambda p, ps, pt, nm: fwd(
                params=p, position_sequence=ps, particle_types=pt, node_mask=nm
            ),
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )(params, position_sequence, particle_types, node_mask)

    return jax.jit(wrapped)


def make_partitioned_predict_positions(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    *,
    axis: str = "graph",
):
    """Distributed inference step: Euler-integrate the partitioned forward."""
    fwd = make_partitioned_forward(mesh, cfg, stats, spec, axis=axis)

    def predict(params, position_sequence, particle_types, node_mask):
        norm_acc, strain = fwd(params, position_sequence, particle_types, node_mask)
        next_pos = decoder_postprocess(stats, norm_acc, position_sequence)
        return next_pos, strain

    return jax.jit(predict)


def make_partitioned_loss(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    *,
    axis: str = "graph",
    loss_weight_position: float = 1.0,
    loss_weight_strain: float = 1.0,
):
    """Distributed training loss (noise-corrupted one-step objective)."""
    fwd = make_partitioned_forward(mesh, cfg, stats, spec, axis=axis)

    def loss_fn(params, position_sequence, noise, next_positions, next_strains,
                particle_types, node_mask):
        noisy = position_sequence + noise
        pred_acc, pred_strain = fwd(params, noisy, particle_types, node_mask)
        next_adjusted = next_positions + noise[:, -1]
        target_acc = inverse_decoder_postprocess(stats, next_adjusted, noisy)
        m = node_mask.astype(pred_acc.dtype)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        loss_pos = jnp.sum((pred_acc - target_acc) ** 2, axis=-1)
        loss_strain = (pred_strain - next_strains) ** 2
        loss = loss_weight_position * loss_pos + loss_weight_strain * loss_strain
        return jnp.sum(loss * m) / denom

    return jax.jit(loss_fn)
