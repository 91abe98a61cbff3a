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


def _halo_needed(xs: np.ndarray, per: int, num_shards: int, radius: float) -> int:
    """Rows each slab must export per side so the halo contract holds.

    For every slab boundary b = s*per, nodes with |x - x_b| <= radius must
    lie entirely in the two adjacent slabs (else neighbors would skip a
    shard) and within `halo` rows of the boundary on each side. Raises if
    an interaction strip spans beyond the adjacent slabs.
    """
    n = len(xs)
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
    return halo_needed


def partition_plan(
    positions: np.ndarray,
    num_shards: int,
    radius: float,
    *,
    pad_multiple: int = 8,
    halo_slack: float = 1.5,
    nodes_per_shard: Optional[int] = None,
) -> Tuple[PartitionSpec1D, np.ndarray]:
    """Host-side: sort nodes by x, size the slabs and halos, validate.

    Returns (spec, order) where `order` is the permutation that sorts
    nodes by x; callers reorder every per-node array with it. Pass
    `nodes_per_shard` to pin the slab size (dataset-level plans that must
    cover graphs of different sizes with one static shape).
    """
    n = positions.shape[0]
    order = np.argsort(positions[:, 0], kind="stable")
    xs = positions[order, 0]
    if nodes_per_shard is None:
        per = -(-n // num_shards)
        per = -(-per // pad_multiple) * pad_multiple
    else:
        per = nodes_per_shard
        if per * num_shards < n:
            raise ValueError(
                f"nodes_per_shard {per} x {num_shards} shards < {n} nodes"
            )
    halo_needed = _halo_needed(xs, per, num_shards, radius)
    halo = max(
        pad_multiple,
        -(-int(halo_needed * halo_slack) // pad_multiple) * pad_multiple,
    )
    halo = min(halo, per)
    return PartitionSpec1D(num_shards, per, halo), order


def dataset_partition_plan(
    frames,
    num_shards: int,
    radius: float,
    *,
    pad_multiple: int = 8,
    halo_slack: float = 1.5,
) -> PartitionSpec1D:
    """One static plan covering every frame in `frames`.

    frames: iterable of [N, dim] position arrays (representative frames of
    every trajectory — e.g. first/last, since deformation moves the
    boundaries). Slab size comes from the largest frame; halo is the max
    over frames (plus slack), and every frame is validated against the
    adjacency contract. Per-sample sort orders still come from
    `partition_plan`/np.argsort at feed time; this spec is what the
    compiled program is shaped by.
    """
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("dataset_partition_plan needs at least one frame")
    max_n = max(f.shape[0] for f in frames)
    per = -(-max_n // num_shards)
    per = -(-per // pad_multiple) * pad_multiple
    halo_needed = 0
    for f in frames:
        xs = np.sort(f[:, 0], kind="stable")
        halo_needed = max(halo_needed, _halo_needed(xs, per, num_shards, radius))
    halo = max(
        pad_multiple,
        -(-int(halo_needed * halo_slack) // pad_multiple) * pad_multiple,
    )
    halo = min(halo, per)
    return PartitionSpec1D(num_shards, per, halo)


def scatter_to_shards(arr: np.ndarray, order: np.ndarray, spec: PartitionSpec1D):
    """Reorder by `order` and pad the node axis (axis 0) to P*per."""
    arr = np.asarray(arr)[order]
    pad = spec.total_nodes - arr.shape[0]
    if pad:
        arr = np.concatenate([arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)])
    return arr


# Sharded symmetric-gather VJP crossover (real-TPU v5e, r4 anchors):
# the ext-table reverse-index build amortizes at >=~19k local rows
# (14.6 ms/step there, ~90% of headline edges/s) but LOSES ~3.5 ms at
# 4.8k local rows where the scatter it replaces is cheap. Below this
# threshold the plain scatter-add VJP runs even when
# cfg.symmetric_gather is set.
_SYM_MIN_LOCAL_ROWS = 12_288


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
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distributed EPD forward on one shard (runs under shard_map).

    Returns (norm_acc, strain, halo_violations) — the third output is a
    replicated int32 count of broken halo-contract conditions (see
    `_halo_guard`); 0 means the static plan still covers this geometry.
    """
    halo = spec.halo
    n_local = position_sequence.shape[0]

    # --- halo exchange of positions + masks for graph build ---------------
    last_pos = position_sequence[:, -1]
    pos_ext = _halo_exchange(last_pos, halo, axis)
    mask_ext = _halo_exchange(node_mask.astype(jnp.int32), halo, axis) > 0
    violations = _halo_guard(
        last_pos[:, 0], node_mask, halo, cfg.connectivity_radius, axis
    )

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
            cell_capacity=cfg.cell_capacity,
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
    if cfg.band_nodes is not None:
        # banded-gather contract breaks fold into the same guard count
        # as halo violations: both mean "this step's gathers were wrong
        # — reject the update / replan", and the rejection gate already
        # keys on the count being nonzero
        from sgnn_tpu.ops.sym_gather import band_violations as _band_viol

        violations = violations + jax.lax.psum(
            _band_viol(senders, e_mask, cfg.band_nodes, halo), axis
        )

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

    # --- encode (local) + tuned processor/decoder -------------------------
    # The processor/decoder run the SAME tuned implementation as the
    # single-chip flat path (models/epd_flat._process_decode: bf16 edge
    # tensors, fused edge block, agg-fold, f32-weight-grad dots) — the
    # only distributed difference is the per-layer sender gather, which
    # halo-exchanges each layer's sender projections before gathering
    # from the [N_ext, H] extended table (VERDICT r3 #2/#6: one tuned
    # implementation instead of a re-derivation).
    from sgnn_tpu.nn.core import layer_norm_apply, mlp_apply
    from sgnn_tpu.models.epd_flat import _process_decode, _split_first_layer

    k = senders.shape[1]
    epd = params["epd"]
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    maskf = e_mask.reshape(n_local * k, 1).astype(jnp.float32)

    x = layer_norm_apply(
        epd["encoder"]["node"]["ln"], mlp_apply(epd["encoder"]["node"]["mlp"], node_features)
    )
    d = x.shape[-1]

    senders_flat = senders.reshape(-1)  # ext-space indices

    use_sym = cfg.symmetric_gather and n_local >= _SYM_MIN_LOCAL_ROWS
    n_ext = pos_ext.shape[0]
    use_packed = use_sym and n_ext <= cfg.packed_gather_max_nodes
    rev = None
    xj0 = None
    if use_packed:
        # Packed 3-stream gather over the EXT rows (r5): sender
        # positions (edge features), senders-of-senders (reverse-edge
        # index) and layer 0's sender projections ride ONE f32 table —
        # the single-chip ~3-gathers-in-1 lever (ops/sym_gather.py)
        # that the 307k sharded profile showed as two ~9 ms unfused
        # fan-out gathers (BASELINE.md r5). Receivers and senders are
        # BOTH ext-indexed here, so the band bound holds with no halo
        # offset, and the packed VJP needs no local-range mask: the
        # local slice below zero-pads discarded rows' cotangents in its
        # AD transpose, so halo-duplicate edges (owned by neighbor
        # shards) contribute exactly nothing; the local d_proj then
        # flows back through the halo exchange's transpose as usual.
        from sgnn_tpu.ops.sym_gather import packed_sym_gather

        (_, w_j0, _), _ = _split_first_layer(
            epd["processor"][0]["edge"]["mlp"], (d, d, d)
        )
        proj_j0 = jnp.dot(x, w_j0, preferred_element_type=x.dtype)
        proj0_ext = _halo_exchange(proj_j0, halo, axis)
        g_aux, xj_all, rev_pos_ext, rev_ok_ext = packed_sym_gather(
            jax.lax.stop_gradient(pos_ext),
            proj0_ext,
            nl_ext.senders,
            nl_ext.mask,
            compute_dtype,
            cfg.band_nodes,
        )
        lo = halo * k
        hi = (halo + n_local) * k
        sender_pos = g_aux[lo:hi].reshape(n_local, k, -1)
        xj0 = xj_all[lo:hi]
    else:
        sender_pos = pos_ext[senders]

    # --- edge features (sender positions come from the ext array) --------
    disp = (sender_pos - last_pos[:, None, :]) / cfg.connectivity_radius
    dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    edge_features = jnp.concatenate([disp, dist], axis=-1)
    edge_features = edge_features * e_mask[..., None].astype(edge_features.dtype)

    e = layer_norm_apply(
        epd["encoder"]["edge"]["ln"],
        mlp_apply(epd["encoder"]["edge"]["mlp"], edge_features.reshape(n_local * k, -1)),
    )
    e = e * maskf
    if compute_dtype is not None:
        e = e.astype(compute_dtype)

    if use_sym:
        # Scatter-free sender-gather VJP in the sharded setting (the
        # single-chip path's 71->56 ms lever, ops/sym_gather.py): the
        # radius graph is symmetric, so the edges where ext row v is the
        # SENDER are the reverses of v's own incoming edges. Build the
        # reverse index over the FULL ext row set (nl_ext covers halo
        # rows too — the packed gather above already produced it), then
        # keep only reverses that land in the local edge table —
        # contributions from edges owned by neighbor shards flow back
        # through the halo exchange's AD transpose (ppermute inverse +
        # add), so the total d_proj is exact. Same precondition as
        # single-chip: max degree <= slots.
        if not use_packed:
            from sgnn_tpu.ops.sym_gather import reverse_edge_positions

            rev_pos_ext, rev_ok_ext = reverse_edge_positions(
                nl_ext.senders, nl_ext.mask
            )
        lo = halo * k
        hi = (halo + n_local) * k
        rev_ok = rev_ok_ext & (rev_pos_ext >= lo) & (rev_pos_ext < hi)
        rev = (jnp.where(rev_ok, rev_pos_ext - lo, 0), rev_ok)

    def gather_fn(proj_j):
        # proj_j arrives already cast to compute_dtype, so the halo
        # ppermutes ship bf16 strips in mixed-precision mode. band_nodes
        # routes the large local gathers through the banded path exactly
        # as on a single chip — the slab order preserves the global
        # x-sort, so the same per-node band bound holds; the halo arg
        # offsets the band center into ext coordinates (fwd: row + halo,
        # bwd: edge pos - halo*K). At production shard sizes (614k/8 =>
        # 77k local nodes, 617k-row local reverse tables) the bwd
        # reverse-gathers sit squarely in the banded regime.
        ext = _halo_exchange(proj_j, halo, axis)
        if rev is None:
            from sgnn_tpu.ops.sym_gather import _maybe_banded_gather

            return _maybe_banded_gather(
                ext, senders_flat, cfg.band_nodes, halo=halo
            )
        from sgnn_tpu.ops.sym_gather import sym_gather

        return sym_gather(
            ext, senders_flat, rev[0], rev[1], cfg.band_nodes, halo
        )

    pred = _process_decode(
        epd, x, e, senders_flat, maskf, k,
        use_pallas=False, rev=None, compute_dtype=compute_dtype,
        gather_fn=gather_fn, xj0=xj0, remat=cfg.remat,
    )
    return pred[:, : cfg.dim], pred[:, -1], violations


def _halo_guard(
    x: jnp.ndarray,  # [N_local] x coordinates (the sorted axis)
    node_mask: jnp.ndarray,  # [N_local]
    halo: int,
    radius: float,
    axis: str,
) -> jnp.ndarray:
    """On-device check that the static partition plan still holds.

    `partition_plan` validates the halo contract ONCE, host-side, from the
    positions it was given. During an autoregressive rollout the body
    deforms; if nodes drift across slab x-extents the contract would break
    *silently* — edges to out-of-halo neighbors simply vanish from the
    search. This guard counts broken contract conditions every forward so
    callers can surface them (rollout outputs carry `halo_violations`) and
    re-plan (`partition_plan` on the current positions) when nonzero.

    The check is exact for the plan's own x-interval invariant: each
    shard publishes (min_x, max_x) over its masked nodes plus
    min_x over nodes NOT in its first-`halo` rows (not shipped left) and
    max_x over nodes NOT in its last-`halo` rows (not shipped right); one
    tiny all_gather later, shard s flags
      * a right neighbor whose unshipped-left nodes come within `radius`
        (in x) of s's extent — senders s's receivers can no longer see,
      * its own unshipped-right nodes within `radius` of the right
        neighbor's extent — senders the right neighbor can't see,
      * any shard >= 2 slabs away whose x-extent comes within `radius` —
        neighbors entirely outside the exchange pattern.
    Left-side conditions are each boundary's right-side condition on the
    previous shard, so every boundary is counted exactly once. A clean
    plan has margin by construction (`halo` rows cover all nodes within
    `radius` of each boundary), so false positives require the invariant
    itself to have decayed — which is exactly when a re-plan is due.
    """
    n_local = x.shape[0]
    row = jnp.arange(n_local)
    inf = jnp.asarray(jnp.inf, x.dtype)
    xm_min = jnp.min(jnp.where(node_mask, x, inf))
    xm_max = jnp.max(jnp.where(node_mask, x, -inf))
    tail_mask = node_mask & (row >= halo)  # not shipped to the left neighbor
    head_mask = node_mask & (row < n_local - halo)  # not shipped right
    min_tail = jnp.min(jnp.where(tail_mask, x, inf))
    max_head = jnp.max(jnp.where(head_mask, x, -inf))
    stats4 = jnp.stack([xm_min, xm_max, min_tail, max_head])
    gath = jax.lax.all_gather(stats4, axis)  # [P, 4] replicated
    p = gath.shape[0]
    s = jax.lax.axis_index(axis)
    t = jnp.arange(p)
    is_right = t == s + 1
    # right neighbor holds back a node within radius of my extent
    viol = is_right & (gath[:, 2] < xm_max + radius)
    # I hold back a node within radius of the right neighbor's extent
    viol |= is_right & (max_head > gath[:, 0] - radius)
    # non-adjacent shards' x-extents within radius of mine (count t > s once)
    far = t > s + 1
    gap = jnp.maximum(gath[:, 0] - xm_max, xm_min - gath[:, 1])
    viol |= far & (gap < radius)
    local = jnp.sum(viol.astype(jnp.int32))
    return jax.lax.psum(local, axis)


def _build_forward(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    axis: str = "graph",
):
    """Unjitted global forward over `mesh`'s `axis`.

    Inputs are global arrays with the node axis sharded over `axis`:
      position_sequence [N_total, S, dim], particle_types [N_total],
      node_mask [N_total].
    Returns (norm_acc [N_total, dim], strain [N_total],
             halo_violations int32 scalar — see `_halo_guard`).
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
            out_specs=(P(axis), P(axis), P()),
            check_vma=False,
        )(params, position_sequence, particle_types, node_mask)

    return wrapped


def make_partitioned_forward(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    *,
    axis: str = "graph",
):
    """Jitted distributed forward: (params, seq, types, mask) -> (acc, strain)."""
    fwd = _build_forward(mesh, cfg, stats, spec, axis)

    def wrapped(params, position_sequence, particle_types, node_mask):
        acc, strain, _ = fwd(params, position_sequence, particle_types, node_mask)
        return acc, strain

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
    fwd = _build_forward(mesh, cfg, stats, spec, axis)

    def predict(params, position_sequence, particle_types, node_mask):
        norm_acc, strain, _ = fwd(params, position_sequence, particle_types, node_mask)
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
    fwd = _build_forward(mesh, cfg, stats, spec, axis)

    def loss_fn(params, position_sequence, noise, next_positions, next_strains,
                particle_types, node_mask):
        noisy = position_sequence + noise
        pred_acc, pred_strain, _ = fwd(params, noisy, particle_types, node_mask)
        next_adjusted = next_positions + noise[:, -1]
        target_acc = inverse_decoder_postprocess(stats, next_adjusted, noisy)
        m = node_mask.astype(pred_acc.dtype)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        loss_pos = jnp.sum((pred_acc - target_acc) ** 2, axis=-1)
        loss_strain = (pred_strain - next_strains) ** 2
        loss = loss_weight_position * loss_pos + loss_weight_strain * loss_strain
        return jnp.sum(loss * m) / denom

    return jax.jit(loss_fn)


# --------------------------------------------------------------------------
# Training driver pieces: optimizer step + autoregressive rollout.
# The distributed counterparts of the hot loop at
# /root/reference/sgnn/single_scale/train.py:230-399 and the rollout loop
# at /root/reference/sgnn/single_scale/evaluate.py:52-175 — which the
# reference runs strictly single-device; this layer is new scope.
# --------------------------------------------------------------------------


def make_partitioned_train_step(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    tx,
    *,
    axis: str = "graph",
    noise_std: float = 0.02,
    loss_weight_position: float = 1.0,
    loss_weight_strain: float = 1.0,
):
    """Jitted (state, batch, key) -> (state, metrics) over a partitioned graph.

    `state` = {params, opt_state, step} with replicated leaves; `batch` =
    {positions [N,S,dim], next_position [N,dim], next_strain [N],
    particle_type [N], node_mask [N]} with the node axis sharded over
    `axis`. Noise is sampled inside the step (same random-walk model as
    the single-device trainer); metric names match the reference wandb
    schema plus `train/halo_violations`.
    """
    return jax.jit(
        _make_partitioned_step_body(
            mesh, cfg, stats, spec, tx,
            axis=axis, noise_std=noise_std,
            loss_weight_position=loss_weight_position,
            loss_weight_strain=loss_weight_strain,
        )
    )


def _make_partitioned_step_body(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    tx,
    *,
    axis: str = "graph",
    noise_std: float = 0.02,
    loss_weight_position: float = 1.0,
    loss_weight_strain: float = 1.0,
):
    """Unjitted (state, batch, key) -> (state, metrics) partitioned step."""
    import optax

    from sgnn_tpu.physics.noise import random_walk_position_noise

    fwd = _build_forward(mesh, cfg, stats, spec, axis)

    def loss_fn(params, batch, key):
        noise = random_walk_position_noise(key, batch["positions"].shape, noise_std)
        noisy = batch["positions"] + noise
        pred_acc, pred_strain, violations = fwd(
            params, noisy, batch["particle_type"], batch["node_mask"]
        )
        next_adjusted = batch["next_position"] + noise[:, -1]
        target_acc = inverse_decoder_postprocess(stats, next_adjusted, noisy)
        m = batch["node_mask"].astype(pred_acc.dtype)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        sq_acc = (pred_acc - target_acc) ** 2  # [N, dim]
        loss_pos = jnp.sum(sq_acc, axis=-1)
        loss_strain = (pred_strain - batch["next_strain"]) ** 2
        loss = (
            loss_weight_position * loss_pos + loss_weight_strain * loss_strain
        )
        loss = jnp.sum(loss * m) / denom
        loss_xy = jnp.sum(sq_acc * m[:, None], axis=0) / denom
        aux = {
            "train/loss-position": jnp.sum(loss_pos * m) / denom,
            "train/loss-strain": jnp.sum(loss_strain * m) / denom,
            "train/loss-x": loss_xy[0],
            "train/loss-y": loss_xy[1],
            "train/halo_violations": violations,
        }
        if cfg.dim == 3:
            aux["train/loss-z"] = loss_xy[2]
        return loss, aux

    def step(state, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, key
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        # Halo-guard gate (VERDICT r3 #6): a step whose guard fired
        # computed gradients on a silently truncated edge set — REJECT
        # it instead of applying it. The update and optimizer state are
        # kept only when the contract held; a rejected step is a no-op
        # on the model. The trainer SKIPS the sample and advances to the
        # next prefetched batch (step/LR schedule still advance; the
        # rejection is visible as train/halo_rejected, and a
        # RejectionTracker aborts after too many consecutive rejections
        # — geometry that permanently outgrew the plan needs a replan
        # with larger halo_slack, not silent param freezing). Branchless
        # jnp.where keeps the step a single compiled program (no
        # lax.cond materialization cliffs — see sym_gather's in-op-cond
        # negative result); the gate's elementwise cost is
        # parameter-sized, negligible next to the graph compute.
        ok = aux["train/halo_violations"] == 0

        def keep(new, old):
            return jnp.where(ok, new, old)

        params = jax.tree.map(keep, params, state["params"])
        opt_state = jax.tree.map(keep, opt_state, state["opt_state"])
        new_state = {
            "params": params,
            "opt_state": opt_state,
            # step counts samples processed (host/LR-schedule sync),
            # including rejected ones — rejection is visible in metrics
            "step": state["step"] + 1,
        }
        aux = dict(aux)
        aux["train/halo_rejected"] = (~ok).astype(jnp.int32)
        return new_state, {"train/loss": loss, **aux}

    return step


class RejectionTracker:
    """Host-side guard against a permanently outgrown partition plan.

    Every rejected step is a no-op on the params while the loop keeps
    consuming samples and advancing the step/LR schedule — correct for
    transient noise-tail violations, but if the GEOMETRY has outgrown
    the static plan every subsequent step is rejected and training
    silently freezes (ADVICE r4). This tracker counts CONSECUTIVE
    rejections and raises after ``limit`` of them so the run fails loudly
    with the fix (replan on current positions / larger halo_slack)
    instead of burning the schedule.
    """

    def __init__(self, limit: int = 50):
        self.limit = int(limit)
        self.consecutive = 0
        self.total = 0

    def update(self, rejected) -> None:
        if rejected:
            self.consecutive += 1
            self.total += 1
            if self.consecutive >= self.limit:
                raise RuntimeError(
                    f"{self.consecutive} consecutive training steps rejected "
                    "by the halo-contract guard: the sample geometry has "
                    "outgrown the static partition plan (params are frozen "
                    "while the LR schedule advances). Rebuild the plan on "
                    "current positions (edge_partition.partition_plan) or "
                    "increase halo_slack."
                )
        else:
            self.consecutive = 0


def make_partitioned_multi_step(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    tx,
    num_steps: int,
    *,
    axis: str = "graph",
    noise_std: float = 0.02,
    loss_weight_position: float = 1.0,
    loss_weight_strain: float = 1.0,
):
    """``num_steps`` partitioned optimizer steps per dispatch via lax.scan.

    The graph-parallel composition of the trainer's ``inner_steps``
    idiom (train.make_train_multi_step): batch leaves carry a leading
    [num_steps] axis (node axis sharded over `axis` as usual); per-step
    noise keys are fold_in(key, i) and per-step math is identical to
    make_partitioned_train_step (pinned by tests). Amortizes the ~1 ms
    host dispatch latency the single-step partitioned trainer pays.
    """
    body = _make_partitioned_step_body(
        mesh, cfg, stats, spec, tx,
        axis=axis, noise_std=noise_std,
        loss_weight_position=loss_weight_position,
        loss_weight_strain=loss_weight_strain,
    )

    @jax.jit
    def multi_step(state, batches, key):
        def scan_body(carry, xs):
            i, batch = xs
            return body(carry, batch, jax.random.fold_in(key, i))

        idx = jnp.arange(num_steps, dtype=jnp.uint32)
        return jax.lax.scan(scan_body, state, (idx, batches))

    return multi_step


def make_partitioned_rollout(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    *,
    axis: str = "graph",
    inference_mode: str = "autoregressive",
):
    """Distributed autoregressive rollout: one lax.scan over the shard_map
    forward (the single-device twin is physics/rollout.py).

    (params, positions [N,T,dim], particle_types [N], strains [T,N],
    node_mask [N]) -> the reference rollout dict (evaluate.py:161-173)
    plus `halo_violations` [T-S]: per-step guard counts (nonzero means
    the deforming body outgrew the static plan that step — re-plan with
    `partition_plan` on the current positions). Node arrays are in the
    plan's x-sorted order; callers holding the plan's `order` can inverse-
    permute for presentation.
    """
    if inference_mode not in ("autoregressive", "one_step"):
        raise ValueError(f"Unknown inference_mode: {inference_mode}")
    from sgnn_tpu.physics.rollout import EROSIONAL_PARTICLE_ID, cumulative_rmse

    fwd = _build_forward(mesh, cfg, stats, spec, axis)
    s = cfg.input_sequence_length

    def run(params, positions, particle_types, strains, node_mask):
        initial_positions = positions[:, :s]  # [N, S, dim]
        gt_positions = jnp.transpose(positions[:, s:], (1, 0, 2))  # [T-S, N, dim]
        gt_strains = strains[s:]  # [T-S, N]
        erosional = (particle_types == EROSIONAL_PARTICLE_ID)[:, None]

        def step(window, xs):
            gt_pos, gt_strain = xs
            norm_acc, strain, violations = fwd(
                params, window, particle_types, node_mask
            )
            next_pos = decoder_postprocess(stats, norm_acc, window)
            next_pos = jnp.where(erosional, gt_pos, next_pos)
            strain = jnp.where(erosional[:, 0], gt_strain, strain)
            fill = next_pos if inference_mode == "autoregressive" else gt_pos
            new_window = jnp.concatenate([window[:, 1:], fill[:, None, :]], axis=1)
            return new_window, (next_pos, strain, violations)

        _, (pred_positions, pred_strains, violations) = jax.lax.scan(
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
            "halo_violations": violations,
        }

    return jax.jit(run)


def make_replanning_rollout(
    mesh: Mesh,
    cfg: SimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    *,
    axis: str = "graph",
    inference_mode: str = "autoregressive",
):
    """Distributed rollout that RE-PLANS the partition when the halo
    guard fires, instead of warning and silently truncating edges.

    Host-driven: one jitted distributed step per rollout frame (window
    kept device-resident between steps). Whenever a step reports nonzero
    `_halo_guard` violations, the current window is pulled back to the
    host, the nodes are re-sorted by their *current* x (a re-plan of the
    same static spec — slab/halo sizes are compile-time shapes, so only
    the permutation changes), re-fed, and the step re-runs on the fresh
    plan. The guard is conservative (it fires whenever a node pair
    within `radius` in x is not covered by the exchange pattern, a
    superset of actually-dropped edges), so a step that executes with 0
    violations computed the exact full-graph edge set — replanned
    rollouts match the single-device rollout (pinned by
    tests/test_edge_partition.py::test_replanning_rollout_...).

    All node arrays are accepted and returned in the CALLER's order
    (sorting is internal). Output = the reference rollout dict
    (evaluate.py:161-173) plus `halo_violations` [T-S] (residual count
    per step, after any replan) and `replans` (int).
    """
    if inference_mode not in ("autoregressive", "one_step"):
        raise ValueError(f"Unknown inference_mode: {inference_mode}")
    from sgnn_tpu.physics.rollout import EROSIONAL_PARTICLE_ID, cumulative_rmse

    fwd = _build_forward(mesh, cfg, stats, spec, axis)
    s = cfg.input_sequence_length
    node_sh = NamedSharding(mesh, P(axis))
    rep_sh = NamedSharding(mesh, P())
    autoregressive = inference_mode == "autoregressive"

    @functools.partial(jax.jit, out_shardings=(node_sh, node_sh, node_sh, rep_sh))
    def step_fn(params, window, types, mask, gt_pos, gt_strain):
        norm_acc, strain, violations = fwd(params, window, types, mask)
        next_pos = decoder_postprocess(stats, norm_acc, window)
        erosional = (types == EROSIONAL_PARTICLE_ID)[:, None]
        next_pos = jnp.where(erosional, gt_pos, next_pos)
        strain = jnp.where(erosional[:, 0], gt_strain, strain)
        fill = next_pos if autoregressive else gt_pos
        new_window = jnp.concatenate([window[:, 1:], fill[:, None, :]], axis=1)
        return new_window, next_pos, strain, violations

    def run(params, positions, particle_types, strains, node_mask):
        params = jax.device_put(params, rep_sh)
        pos = np.asarray(positions)  # [N, T, dim] caller order
        ty = np.asarray(particle_types)
        st = np.asarray(strains)  # [T, N]
        m = np.asarray(node_mask)
        n_view, total_t = pos.shape[:2]
        nt = spec.total_nodes
        idx = np.nonzero(m)[0]
        k = len(idx)
        if k > nt:
            raise ValueError(f"{k} nodes > plan capacity {nt}")

        def plan(frame):  # [N, dim] caller order -> validated sort order
            order = idx[np.argsort(frame[idx, 0], kind="stable")]
            need = _halo_needed(
                frame[order, 0], spec.nodes_per_shard, spec.num_shards,
                cfg.connectivity_radius,
            )
            if need > spec.halo:
                raise ValueError(
                    f"re-plan needs halo {need} > spec halo {spec.halo}; "
                    "the geometry outgrew the static plan — rebuild the "
                    "spec (dataset_partition_plan) with these frames"
                )
            return order

        def sort_pad(a, order, dtype=None):
            buf = np.zeros((nt, *a.shape[1:]), dtype or a.dtype)
            buf[: len(order)] = a[order]
            return buf

        mask_s = np.zeros(nt, bool)
        mask_s[:k] = True  # sorted layout: real nodes first, padding last
        order = plan(pos[:, 0])
        window_h = pos[:, :s].copy()  # [N, S, dim] caller order (host mirror)
        window_d = jax.device_put(sort_pad(window_h, order), node_sh)
        ty_d = jax.device_put(sort_pad(ty, order), node_sh)
        mask_d = jax.device_put(mask_s, node_sh)

        preds = np.zeros((total_t - s, n_view, pos.shape[-1]), pos.dtype)
        pred_strains = np.zeros((total_t - s, n_view), st.dtype)
        viols = np.zeros(total_t - s, np.int32)
        replans = 0

        for t in range(total_t - s):
            gt_pos_t = pos[:, s + t]
            gt_strain_t = st[s + t]
            gp_d = jax.device_put(sort_pad(gt_pos_t, order), node_sh)
            gs_d = jax.device_put(sort_pad(gt_strain_t, order), node_sh)
            new_w, next_p, strain, v = step_fn(
                params, window_d, ty_d, mask_d, gp_d, gs_d
            )
            v = int(v)
            if v:
                # re-plan from the CURRENT (pre-step) window and re-run
                w_sorted = np.asarray(window_d)
                window_h[order] = w_sorted[: len(order)]
                order = plan(window_h[:, -1])
                replans += 1
                window_d = jax.device_put(sort_pad(window_h, order), node_sh)
                ty_d = jax.device_put(sort_pad(ty, order), node_sh)
                gp_d = jax.device_put(sort_pad(gt_pos_t, order), node_sh)
                gs_d = jax.device_put(sort_pad(gt_strain_t, order), node_sh)
                new_w, next_p, strain, v = step_fn(
                    params, window_d, ty_d, mask_d, gp_d, gs_d
                )
                v = int(v)  # residual violations (spec itself insufficient)
            window_d = new_w
            np_next = np.asarray(next_p)
            np_strain = np.asarray(strain)
            preds[t, order] = np_next[: len(order)]
            pred_strains[t, order] = np_strain[: len(order)]
            viols[t] = v

        gt_positions = np.transpose(pos[:, s:], (1, 0, 2))
        gt_strains = st[s:]
        return {
            "initial_positions": np.transpose(pos[:, :s], (1, 0, 2)),
            "initial_strains": st[:s],
            "predicted_rollout": preds,
            "ground_truth_rollout": gt_positions,
            "predicted_strain": pred_strains,
            "ground_truth_strain": gt_strains,
            "particle_types": ty,
            "rmse_position": np.asarray(
                cumulative_rmse(jnp.asarray(preds), jnp.asarray(gt_positions), jnp.asarray(m))
            ),
            "rmse_strain": np.asarray(
                cumulative_rmse(
                    jnp.asarray(pred_strains)[..., None],
                    jnp.asarray(gt_strains)[..., None],
                    jnp.asarray(m),
                )
            ),
            "halo_violations": viols,
            "replans": replans,
        }

    return run


def partition_sample(
    batch: dict, spec: PartitionSpec1D, *, sort_frame: int = -1
) -> dict:
    """Host-side: one [1, N, ...] SampleBatcher batch -> a partitioned flat
    sample for `make_partitioned_train_step`.

    Real (masked) nodes are x-sorted by ``positions[:, sort_frame, 0]``
    and padded to ``spec.total_nodes``; loader padding rows (which sit at
    arbitrary positions like x=0 and would corrupt the slab sort) are
    dropped and re-appended at the end with ``node_mask`` False.
    """
    m = np.asarray(batch["node_mask"][0])
    idx = np.nonzero(m)[0]
    pos = np.asarray(batch["positions"][0])
    order = idx[np.argsort(pos[idx, sort_frame, 0], kind="stable")]
    nt = spec.total_nodes
    if len(order) > nt:
        raise ValueError(f"sample has {len(order)} nodes > plan capacity {nt}")
    out = {}
    for k in ("positions", "next_position", "next_strain", "particle_type"):
        a = np.asarray(batch[k][0])
        buf = np.zeros((nt, *a.shape[1:]), a.dtype)
        buf[: len(order)] = a[order]
        out[k] = buf
    mask = np.zeros(nt, bool)
    mask[: len(order)] = True
    out["node_mask"] = mask
    return out
