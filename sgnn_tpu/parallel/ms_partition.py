"""Graph-axis (slab) partitioning for the MULTI-SCALE family.

The single-scale edge partition (parallel/edge_partition.py) re-searches
the radius graph per shard every step because the graph deforms. The
multi-scale hierarchy is STATIC — built once per trajectory from t=0
positions and never rebuilt (reference semantics,
/root/reference/sgnn/multi_scale/static_graph_data_loader.py:101-113) —
so its partition can be planned EXACTLY on the host: every edge of every
type (g2m / per-scale m2m / m2g) is known up front, the halo each slab
needs is the max sender overhang over those edges (no conservative
x-window estimates, no runtime guard), and each shard's edge lists are
pre-remapped to its extended-array coordinates.

Design (VERDICT r2 #3): coarse-scale m2m radii grow as
window_size^scale * radius_multiplier * grid_spacing
(/root/reference/sgnn/multi_scale/multi_scale_graph.py:269-274), so a
single halo wide enough for the coarsest scale serves every edge type —
one [halo, D] ppermute pair per interaction block, identical exchange
pattern to the single-scale partition. When the coarsest radius
approaches the slab width the plan fails validation (reduce num_shards)
— the replicate-coarse-scales alternative only pays off past that
point, recorded as the scaling limit rather than built speculatively.

Node state stays one full-grid-sized [N_local, D] tensor per shard at
every stage (the reference's dataflow: mesh scales exist only as edge
lists over global grid indices, multi_scale_gnn.py:296,307-321).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sgnn_tpu.nn.core import Params, mlp_apply, mlp_ln_apply
from sgnn_tpu.parallel.edge_partition import PartitionSpec1D, _halo_exchange
from sgnn_tpu.physics.multi_scale_graph import MultiScaleConfig, create_all_edges
from sgnn_tpu.physics.multi_scale_simulator import (
    MultiScaleSimulatorConfig,
    _ms_node_features,
)
from sgnn_tpu.physics.simulator import (
    NormStats,
    decoder_postprocess,
    inverse_decoder_postprocess,
)


class ShardedEdges(NamedTuple):
    """One edge type pre-split by receiver's shard (host-built, exact).

    senders: int32[P, E_pad] sender position in the shard's EXTENDED
      array (left halo | local slab | right halo), i.e.
      global_sorted_idx - shard*per + halo.
    receivers: int32[P, E_pad] receiver position in the LOCAL slab,
      non-decreasing per shard (padded rows hold per-1, appended last,
      so downstream segment-sums may claim indices_are_sorted).
    mask: bool[P, E_pad].
    """

    senders: np.ndarray
    receivers: np.ndarray
    mask: np.ndarray


class ShardedMSGraph(NamedTuple):
    g2m: ShardedEdges
    m2m: ShardedEdges
    m2g: ShardedEdges


class ShardedDenseMSGraph(NamedTuple):
    """Dense-slot sharded static graph: the fast layout under partitioning.

    Each field holds DenseEdges with a leading [P] shard axis; receivers
    index the LOCAL slab (0..per-1), senders and the transpose plan index
    the halo-EXTENDED per-shard array (0..per+2*halo-1). m2m is a tuple
    of per-scale DenseEdges (tight per-scale slot widths, see
    physics/multi_scale_graph.DenseStaticGraph). This is what lets the
    partitioned path run models/multi_scale._interact_dense — the layout
    that wins ~1.7x over COO at capacity scales (BASELINE.md r4 sweep)
    but was unreachable under graph_parallel in r4 (VERDICT r4 weak #4).
    """

    g2m: object  # DenseEdges, [P, ...] leaves
    m2m: tuple  # per-scale DenseEdges, [P, ...] leaves
    m2g: object  # DenseEdges, [P, ...] leaves


def _shard_edges(
    senders: np.ndarray,
    receivers: np.ndarray,
    spec: PartitionSpec1D,
    e_pad: int,
) -> ShardedEdges:
    """Split global-sorted-index COO edges by receiver's slab and remap."""
    per, halo, p = spec.nodes_per_shard, spec.halo, spec.num_shards
    shard = receivers // per
    s_out = np.zeros((p, e_pad), np.int32)
    r_out = np.full((p, e_pad), per - 1, np.int32)
    m_out = np.zeros((p, e_pad), bool)
    for sh in range(p):
        sel = shard == sh
        s = senders[sel] - sh * per + halo
        r = receivers[sel] - sh * per
        order = np.argsort(r, kind="stable")  # receiver-sorted, within-
        # receiver edge order preserved (matches pad_edges' stable sort,
        # so per-receiver summation order equals the single-device path)
        s, r = s[order], r[order]
        if len(s) > e_pad:
            raise ValueError(f"shard {sh}: {len(s)} edges > pad {e_pad}")
        if len(s) and (s.min() < 0 or s.max() >= per + 2 * halo):
            raise ValueError(
                f"shard {sh}: sender outside the halo window — plan invalid"
            )
        s_out[sh, : len(s)] = s
        r_out[sh, : len(r)] = r
        m_out[sh, : len(s)] = True
    return ShardedEdges(s_out, r_out, m_out)


def _shard_dense_edges(
    senders: np.ndarray,
    receivers: np.ndarray,
    spec: PartitionSpec1D,
    sizes: Tuple[int, int, int, int],
):
    """Per-shard DenseEdges (stacked on a leading [P] axis) from global
    x-sorted COO edges. sizes = (rows_pad, k_slots, tsp_rows_pad,
    tsp_slots), common across shards (and trajectories when pinned)."""
    from sgnn_tpu.physics.multi_scale_graph import CooEdges, dense_edges

    per, halo, p = spec.nodes_per_shard, spec.halo, spec.num_shards
    rows_pad, k_slots, tsp_rows_pad, tsp_slots = sizes
    ext = per + 2 * halo
    shard = receivers // per
    parts = []
    for sh in range(p):
        sel = shard == sh
        s = senders[sel] - sh * per + halo
        r = receivers[sel] - sh * per
        if len(s) and (s.min() < 0 or s.max() >= ext):
            raise ValueError(
                f"shard {sh}: sender outside the halo window — plan invalid"
            )
        parts.append(
            dense_edges(
                CooEdges(s.astype(np.int64), r.astype(np.int64)),
                per, rows_pad, k_slots,
                tsp_rows_pad=tsp_rows_pad, tsp_slots=tsp_slots,
                num_sender_nodes=ext,
            )
        )
    return jax.tree.map(lambda *xs: np.stack(xs), *parts)


def _dense_shard_sizes(
    senders: np.ndarray, receivers: np.ndarray, per: int, num_shards: int,
    pad_multiple: int = 8,
) -> Tuple[int, int, int, int]:
    """(rows, K, tsp_rows, tsp_K) maxima over shards for one edge set."""
    shard = receivers // per
    r_max = k_max = sr_max = sk_max = 1
    for sh in range(num_shards):
        sel = shard == sh
        if not sel.any():
            continue
        _, counts = np.unique(receivers[sel], return_counts=True)
        r_max = max(r_max, len(counts))
        k_max = max(k_max, int(counts.max()))
        _, scounts = np.unique(senders[sel], return_counts=True)
        sr_max = max(sr_max, len(scounts))
        sk_max = max(sk_max, int(scounts.max()))
    up = lambda v, m: -(-v // m) * m
    # K stays EXACT (max over shards, no round-up): the slot dim is the
    # middle axis of [R, K, H] tensors (no sublane-tiling penalty for
    # odd K there — the single-chip dense path uses exact degrees too,
    # r1 "TIGHT per-type widths" entry), and every padded slot row runs
    # the full 5-layer m2m stack: rounding 9 -> 12 cost ~33% extra slot
    # rows at the 76k anchor (r5, measured +73% vs matched single-chip
    # before this fix).
    return (up(r_max, pad_multiple), k_max, up(sr_max, pad_multiple),
            sk_max)


def plan_ms_partition(
    ms_cfg: MultiScaleConfig,
    grid_positions: np.ndarray,  # [N, dim] trajectory t=0 positions
    num_shards: int,
    *,
    pad_multiple: int = 8,
    halo_slack: float = 1.25,
    nodes_per_shard: Optional[int] = None,
    halo: Optional[int] = None,
    e_pads: Optional[Dict[str, int]] = None,
    layout: str = "coo",
    dense_sizes: Optional[dict] = None,
) -> Tuple[PartitionSpec1D, np.ndarray, ShardedMSGraph]:
    """Host-side exact partition plan for one trajectory's static graph.

    Returns (spec, order, sharded_graph): `order` x-sorts the nodes (all
    per-node arrays must be fed in this order, padding appended);
    `sharded_graph` holds each shard's pre-remapped edge lists. Raises
    when any edge's sender falls outside the adjacent-slab halo window
    (slabs too narrow for the coarsest m2m radius — reduce num_shards).

    Pass nodes_per_shard / halo / e_pads to pin shapes across the plans
    of different trajectories (one compiled program serves them all).

    layout="dense" returns a ShardedDenseMSGraph instead (per-shard
    dense slots + transpose plans, m2m per scale) — the fast layout; the
    hierarchy is static so the plans are exactly as host-computable as
    the COO remap. dense_sizes optionally pins the per-type size tuples
    ({"g2m": (rows, K, tsp_rows, tsp_K), "m2m": [per-scale...],
    "m2g": ...}) across trajectories.
    """
    grid_positions = np.asarray(grid_positions)
    n = grid_positions.shape[0]
    order = np.argsort(grid_positions[:, 0], kind="stable")
    pos_sorted = grid_positions[order]
    per = nodes_per_shard or -(-(-(-n // num_shards)) // pad_multiple) * pad_multiple
    if per * num_shards < n:
        raise ValueError(f"nodes_per_shard {per} x {num_shards} < {n} nodes")

    edges = create_all_edges(ms_cfg, pos_sorted)
    types = {
        "g2m": edges["grid2mesh_edges"],
        "m2m": edges["mesh2mesh_edges"],
        "m2g": edges["mesh2grid_edges"],
    }

    halo_needed = 0
    for e in types.values():
        if not len(e.senders):
            continue
        shard = e.receivers // per
        over_l = int(np.max(shard * per - e.senders))
        over_r = int(np.max(e.senders - ((shard + 1) * per - 1)))
        halo_needed = max(halo_needed, over_l, over_r, 0)
    if halo_needed > per:
        raise ValueError(
            f"coarsest-scale senders reach {halo_needed} rows past their "
            f"slab (> slab size {per}) — beyond the adjacent-slab exchange "
            "pattern; reduce num_shards (or replicate coarse scales)"
        )
    if halo is None:
        halo = max(
            pad_multiple,
            -(-int(halo_needed * halo_slack) // pad_multiple) * pad_multiple,
        )
        halo = min(halo, per)
    elif halo_needed > halo:
        raise ValueError(f"pinned halo {halo} < needed {halo_needed}")
    spec = PartitionSpec1D(num_shards, per, halo)

    if layout == "dense":
        ds = dense_sizes or {}
        per_scale = [
            (np.asarray(e.senders), np.asarray(e.receivers))
            for e in edges["mesh2mesh_edges_per_scale"]
        ]

        def sizes_for(s, r, pinned):
            return pinned if pinned is not None else _dense_shard_sizes(
                s, r, per, num_shards, pad_multiple
            )

        g2m_sr = (np.asarray(types["g2m"].senders), np.asarray(types["g2m"].receivers))
        m2g_sr = (np.asarray(types["m2g"].senders), np.asarray(types["m2g"].receivers))
        m2m_pinned = ds.get("m2m") or [None] * len(per_scale)
        graph = ShardedDenseMSGraph(
            g2m=_shard_dense_edges(
                *g2m_sr, spec, sizes_for(*g2m_sr, ds.get("g2m"))
            ),
            m2m=tuple(
                _shard_dense_edges(s, r, spec, sizes_for(s, r, m2m_pinned[i]))
                for i, (s, r) in enumerate(per_scale)
            ),
            m2g=_shard_dense_edges(
                *m2g_sr, spec, sizes_for(*m2g_sr, ds.get("m2g"))
            ),
        )
        return spec, order, graph

    e_pads = e_pads or {}
    sharded = {}
    for name, e in types.items():
        if name in e_pads:
            pad = e_pads[name]
        else:
            counts = np.bincount(e.receivers // per, minlength=num_shards)
            pad = max(-(-int(counts.max()) // pad_multiple) * pad_multiple, pad_multiple)
        sharded[name] = _shard_edges(
            np.asarray(e.senders), np.asarray(e.receivers), spec, pad
        )
    return spec, order, ShardedMSGraph(**sharded)


def ms_dataset_partition(
    ms_cfg: MultiScaleConfig,
    frame0_list,  # iterable of [N, dim] t=0 positions, one per trajectory
    num_shards: int,
    *,
    pad_multiple: int = 8,
    halo_slack: float = 1.25,
    layout: str = "coo",
):
    """Plans for every trajectory with ONE common set of static shapes.

    Returns (spec, plans) where plans[i] = (order_i, sharded_graph_i);
    every sharded graph has identical leaf shapes, so one compiled
    program serves all trajectories. layout="dense" emits
    ShardedDenseMSGraph plans (dense sizes pinned dataset-wide).
    """
    frames = [np.asarray(f) for f in frame0_list]
    if not frames:
        raise ValueError("ms_dataset_partition needs at least one trajectory")
    max_n = max(f.shape[0] for f in frames)
    per = -(-(-(-max_n // num_shards)) // pad_multiple) * pad_multiple
    draft = [
        plan_ms_partition(
            ms_cfg, f, num_shards,
            pad_multiple=pad_multiple, halo_slack=halo_slack,
            nodes_per_shard=per, layout=layout,
        )
        for f in frames
    ]
    halo = max(s.halo for s, _, _ in draft)
    spec = PartitionSpec1D(num_shards, per, halo)
    if layout == "dense":
        def size_max(des):
            # DenseEdges leaves are [P, ...]: (rows, K, tsp_rows, tsp_K)
            return (
                max(d.recv.shape[1] for d in des),
                max(d.senders.shape[2] for d in des),
                max(d.tsp_node.shape[1] for d in des),
                max(d.tsp_rows.shape[2] for d in des),
            )

        dense_sizes = {
            "g2m": size_max([g.g2m for _, _, g in draft]),
            "m2m": [
                size_max([g.m2m[s] for _, _, g in draft])
                for s in range(len(draft[0][2].m2m))
            ],
            "m2g": size_max([g.m2g for _, _, g in draft]),
        }
        plans = [
            plan_ms_partition(
                ms_cfg, f, num_shards,
                pad_multiple=pad_multiple, halo_slack=halo_slack,
                nodes_per_shard=per, halo=halo, layout="dense",
                dense_sizes=dense_sizes,
            )[1:]
            for f in frames
        ]
        return spec, plans
    e_pads = {
        t: max(getattr(g, t).senders.shape[1] for _, _, g in draft)
        for t in ("g2m", "m2m", "m2g")
    }
    plans = [
        plan_ms_partition(
            ms_cfg, f, num_shards,
            pad_multiple=pad_multiple, halo_slack=halo_slack,
            nodes_per_shard=per, halo=halo, e_pads=e_pads,
        )[1:]
        for f in frames
    ]
    return spec, plans


# --------------------------------------------------------------------------
# Device side
# --------------------------------------------------------------------------


def _interact_sharded(
    block: Params,
    x: jnp.ndarray,  # [N_local, D]
    e: jnp.ndarray,  # [E_pad, D]
    edges,  # per-shard ShardedEdges leaves ([E_pad] arrays)
    halo: int,
    axis: str,
    compute_dtype=None,
) -> tuple:
    """One interaction block on one shard: halo-refresh + local compute.

    A thin wrapper over models/multi_scale._interact (ONE tuned
    implementation, VERDICT r3 #2/#6): the halo-extended latents become
    the sender table, everything else — receiver projections,
    aggregation, node update, the mixed-precision contract — is the
    single-device code path.
    """
    from sgnn_tpu.models.multi_scale import _interact

    return _interact(
        block, x, e, edges, sorted_receivers=True,
        x_sender_table=_halo_exchange(x, halo, axis),
        compute_dtype=compute_dtype,
    )


def _ms_sharded_forward(
    params: Params,
    cfg: MultiScaleSimulatorConfig,
    spec: PartitionSpec1D,
    axis: str,
    stats: NormStats,
    position_sequence: jnp.ndarray,  # [N_local, S, dim]
    particle_types: jnp.ndarray,  # [N_local]
    graph,  # per-shard ShardedMSGraph leaves
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed MultiScaleGNN forward on one shard (under shard_map)."""
    halo = spec.halo
    gc = cfg.graph_config
    last = position_sequence[:, -1]
    pos_ext = _halo_exchange(last, halo, axis)

    node_f = _ms_node_features(params, cfg, stats, position_sequence, particle_types)

    def edge_feats(edges, radius):
        disp = (pos_ext[edges.senders] - last[edges.receivers]) / radius
        dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
        f = jnp.concatenate([disp, dist], axis=-1)
        return f * edges.mask[:, None].astype(f.dtype)

    gnn = params["gnn"]
    x = mlp_ln_apply(gnn["grid_node_encoder"], node_f)
    e = {
        "g2m": mlp_ln_apply(
            gnn["g2m_edge_encoder"], edge_feats(graph.g2m, gc.grid_radius)
        ),
        "m2m": mlp_ln_apply(
            gnn["m2m_edge_encoder"], edge_feats(graph.m2m, gc.coarsest_radius)
        ),
        "m2g": mlp_ln_apply(
            gnn["m2g_edge_encoder"], edge_feats(graph.m2g, gc.grid_radius)
        ),
    }
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    for key in e:
        e[key] = e[key] * getattr(graph, key).mask[:, None].astype(x.dtype)
        if cd is not None:
            e[key] = e[key].astype(cd)

    x, e["g2m"] = _interact_sharded(
        gnn["g2m_block"], x, e["g2m"], graph.g2m, halo, axis, cd
    )
    for block in gnn["m2m_blocks"]:
        x, e["m2m"] = _interact_sharded(
            block, x, e["m2m"], graph.m2m, halo, axis, cd
        )
    x, e["m2g"] = _interact_sharded(
        gnn["m2g_block"], x, e["m2g"], graph.m2g, halo, axis, cd
    )

    pred = mlp_apply(gnn["prediction_head"], x)
    return pred[:, : cfg.dim], pred[:, -1]


def _ms_sharded_forward_dense(
    params: Params,
    cfg: MultiScaleSimulatorConfig,
    spec: PartitionSpec1D,
    axis: str,
    stats: NormStats,
    position_sequence: jnp.ndarray,  # [N_local, S, dim]
    particle_types: jnp.ndarray,  # [N_local]
    graph,  # per-shard ShardedDenseMSGraph leaves
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed dense-slot MultiScaleGNN forward on one shard.

    Thin wrapper over models/multi_scale._interact_dense /
    _interact_dense_scales (ONE tuned implementation per layout): each
    block refreshes the halo-extended latents and points the sender
    table/transpose plan at them; receiver projections, slot
    aggregation, the per-scale m2m split and the mixed-precision
    contract are the single-device dense code path.
    """
    from sgnn_tpu.models.multi_scale import (
        _interact_dense,
        _interact_dense_scales,
    )

    halo = spec.halo
    gc = cfg.graph_config
    last = position_sequence[:, -1]
    pos_ext = _halo_exchange(last, halo, axis)

    node_f = _ms_node_features(params, cfg, stats, position_sequence, particle_types)

    def edge_feats(de, radius):
        disp = (pos_ext[de.senders] - last[de.recv][:, None, :]) / radius
        dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
        f = jnp.concatenate([disp, dist], axis=-1)
        return f * de.mask[..., None].astype(f.dtype)

    gnn = params["gnn"]
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    x = mlp_ln_apply(gnn["grid_node_encoder"], node_f)

    def enc(name, de, radius):
        out = mlp_ln_apply(gnn[name], edge_feats(de, radius))
        out = out * de.mask[..., None].astype(x.dtype)
        return out.astype(cd) if cd is not None else out

    e_g2m = enc("g2m_edge_encoder", graph.g2m, gc.grid_radius)
    e_m2m = [
        enc("m2m_edge_encoder", de, gc.coarsest_radius) for de in graph.m2m
    ]
    e_m2g = enc("m2g_edge_encoder", graph.m2g, gc.grid_radius)

    x, e_g2m = _interact_dense(
        gnn["g2m_block"], x, e_g2m, graph.g2m, sorted_receivers=True,
        compute_dtype=cd, x_sender_table=_halo_exchange(x, halo, axis),
    )
    for block in gnn["m2m_blocks"]:
        x, e_m2m = _interact_dense_scales(
            block, x, e_m2m, graph.m2m, sorted_receivers=True,
            compute_dtype=cd, x_sender_table=_halo_exchange(x, halo, axis),
        )
    x, e_m2g = _interact_dense(
        gnn["m2g_block"], x, e_m2g, graph.m2g, sorted_receivers=True,
        compute_dtype=cd, x_sender_table=_halo_exchange(x, halo, axis),
    )

    pred = mlp_apply(gnn["prediction_head"], x)
    return pred[:, : cfg.dim], pred[:, -1]


def _build_ms_forward(
    mesh: Mesh,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    axis: str = "graph",
):
    """Unjitted global distributed forward over `mesh`'s `axis`.

    Inputs: position_sequence [N_total, S, dim], particle_types
    [N_total] (node axis sharded), graph = ShardedMSGraph (COO) or
    ShardedDenseMSGraph (dense slots) with per-shard leaves sharded on
    their leading axis — the layout picks the sharded forward.
    Returns (norm_acc, strain).
    """
    from jax import shard_map

    fwd = functools.partial(_ms_sharded_forward, cfg=cfg, spec=spec, axis=axis, stats=stats)
    fwd_dense = functools.partial(
        _ms_sharded_forward_dense, cfg=cfg, spec=spec, axis=axis, stats=stats
    )

    def wrapped(params, position_sequence, particle_types, graph):
        run = fwd_dense if isinstance(graph, ShardedDenseMSGraph) else fwd

        def body(p, ps, pt, g):
            g = jax.tree.map(lambda a: a[0], g)  # [1, ...] -> per-shard
            return run(params=p, position_sequence=ps, particle_types=pt, graph=g)

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )(params, position_sequence, particle_types, graph)

    return wrapped


def make_ms_partitioned_forward(
    mesh: Mesh,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    *,
    axis: str = "graph",
):
    """Jitted distributed ms forward: (params, seq, types, graph) -> (acc, strain)."""
    return jax.jit(_build_ms_forward(mesh, cfg, stats, spec, axis))


def make_ms_partitioned_train_step(
    mesh: Mesh,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    tx,
    *,
    axis: str = "graph",
    noise_std: float = 0.02,
    loss_weight_position: float = 1.0,
    loss_weight_strain: float = 1.0,
):
    """Jitted (state, batch, key) -> (state, metrics) over a partitioned
    multi-scale graph — the ms counterpart of
    edge_partition.make_partitioned_train_step. `batch` adds a `graph`
    entry (ShardedMSGraph, [P, E_pad] leaves sharded on axis 0); node
    arrays are in the plan's x-sorted order.
    """
    import optax

    from sgnn_tpu.physics.noise import random_walk_position_noise

    fwd = _build_ms_forward(mesh, cfg, stats, spec, axis)

    def loss_fn(params, batch, key):
        noise = random_walk_position_noise(key, batch["positions"].shape, noise_std)
        noisy = batch["positions"] + noise
        pred_acc, pred_strain = fwd(
            params, noisy, batch["particle_type"], batch["graph"]
        )
        next_adjusted = batch["next_position"] + noise[:, -1]
        target_acc = inverse_decoder_postprocess(stats, next_adjusted, noisy)
        m = batch["node_mask"].astype(pred_acc.dtype)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        loss_pos = jnp.sum((pred_acc - target_acc) ** 2, axis=-1)
        loss_strain = (pred_strain - batch["next_strain"]) ** 2
        loss = loss_weight_position * loss_pos + loss_weight_strain * loss_strain
        loss = jnp.sum(loss * m) / denom
        aux = {
            "train/loss-position": jnp.sum(loss_pos * m) / denom,
            "train/loss-strain": jnp.sum(loss_strain * m) / denom,
        }
        return loss, aux

    def step(state, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, key
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            {"train/loss": loss, **aux},
        )

    return jax.jit(step)


def make_ms_partitioned_multi_step(
    mesh: Mesh,
    cfg: MultiScaleSimulatorConfig,
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
    """``num_steps`` partitioned ms optimizer steps per dispatch
    (lax.scan) — inner_steps x graph_parallel for the multi-scale family.
    Batch leaves (INCLUDING the per-sample ShardedMSGraph arrays) carry a
    leading [num_steps] axis; per-step noise keys are fold_in(key, i);
    per-step math is pinned equal to single steps by test.
    """
    single = make_ms_partitioned_train_step(
        mesh, cfg, stats, spec, tx,
        axis=axis, noise_std=noise_std,
        loss_weight_position=loss_weight_position,
        loss_weight_strain=loss_weight_strain,
    )

    @jax.jit
    def multi_step(state, batches, key):
        def scan_body(carry, xs):
            i, batch = xs
            return single(carry, batch, jax.random.fold_in(key, i))

        idx = jnp.arange(num_steps, dtype=jnp.uint32)
        return jax.lax.scan(scan_body, state, (idx, batches))

    return multi_step


def make_ms_partitioned_rollout(
    mesh: Mesh,
    cfg: MultiScaleSimulatorConfig,
    stats: NormStats,
    spec: PartitionSpec1D,
    *,
    axis: str = "graph",
    inference_mode: str = "autoregressive",
):
    """Distributed autoregressive multi-scale rollout (scan over the
    shard_map forward; single-device twin: multi_scale_simulator.ms_rollout).

    Unlike the single-scale partitioned rollout, NO replanning/guard is
    needed: the hierarchy is static, so sender INDICES never change —
    deformation only moves their positions, which ride the same per-step
    halo exchange the plan already sized. The plan stays exact for the
    whole trajectory by construction.

    Node arrays are in the plan's x-sorted order (padding at the end).
    """
    if inference_mode not in ("autoregressive", "one_step"):
        raise ValueError(f"Unknown inference_mode: {inference_mode}")
    from sgnn_tpu.physics.rollout import (
        EROSIONAL_PARTICLE_ID,
        cumulative_rmse,
        per_step_rmse,
    )

    fwd = _build_ms_forward(mesh, cfg, stats, spec, axis)
    s = cfg.input_sequence_length

    def run(params, positions, particle_types, strains, node_mask, graph):
        initial_positions = positions[:, :s]
        gt_positions = jnp.transpose(positions[:, s:], (1, 0, 2))
        gt_strains = strains[s:]
        erosional = (particle_types == EROSIONAL_PARTICLE_ID)[:, None]

        def step(window, xs):
            gt_pos, gt_strain = xs
            norm_acc, strain = fwd(params, window, particle_types, graph)
            next_pos = decoder_postprocess(stats, norm_acc, window)
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
            "rmse_position_per_step": per_step_rmse(
                pred_positions, gt_positions, node_mask
            ),
            "rmse_strain_per_step": per_step_rmse(
                pred_strains[..., None], gt_strains[..., None], node_mask
            ),
        }

    return jax.jit(run)


def ms_partition_sample(
    batch: dict, spec: PartitionSpec1D, order: np.ndarray
) -> dict:
    """Host-side: one [1, N, ...] ms batch -> a partitioned flat sample.

    Real nodes are reordered by the trajectory plan's `order` and padded
    to spec.total_nodes (padding masked False at the end). The caller
    attaches the trajectory's ShardedMSGraph as `graph`.
    """
    nt = spec.total_nodes
    out = {}
    for k in ("positions", "next_position", "next_strain", "particle_type"):
        a = np.asarray(batch[k][0])
        buf = np.zeros((nt, *a.shape[1:]), a.dtype)
        buf[: len(order)] = a[order]
        out[k] = buf
    m = np.asarray(batch["node_mask"][0])
    mask = np.zeros(nt, bool)
    mask[: len(order)] = m[order]
    out["node_mask"] = mask
    return out
