"""Multi-scale GNN: grid encoder + G2M -> M x M2M -> M2G interaction blocks.

Re-derivation of the reference MultiScaleGNN
(xrkong/sgnn sgnn/multi_scale/multi_scale_gnn.py:208-325) for TPU:

  * Node state is a single full-grid-sized [N, D] tensor at every stage;
    the "mesh" scales exist only as edge lists over global grid indices
    (multi_scale_gnn.py:296, 307-321) — non-mesh nodes ride through M2M
    steps untouched except via residuals. We keep that exact dataflow.
  * The three block types (G2MBlock/M2MBlock/M2GBlock,
    multi_scale_gnn.py:66-205) are structurally identical interaction
    networks — edge update edge_fn([x_i, x_j, e]) with x_i the receiver,
    sum aggregation at receivers, node update node_fn([agg, x]),
    residuals on both — differing only in which (static, padded COO)
    edge list they consume. One ``_interact`` implements all three.
  * Edges are fixed-size receiver-sorted PaddedEdges (StaticGraph,
    physics/multi_scale_graph.py) built once per trajectory on the host;
    aggregation is a masked ``segment_sum`` so padded slots are inert.
  * The edge-MLP's first layer on cat([x_i, x_j, e]) is split into
    row-blocks (cat(a,b,c) @ W == a@Wa + b@Wb + c@Wc) so receiver/sender
    projections are [N, D] @ [D, H] node matmuls gathered per edge,
    not per-edge concat matmuls — same trick as the single-scale path
    (models/encode_process_decode.py), bitwise-same parameter layout.

Encoders: grid node encoder + three per-edge-type encoders, each
MLP + LayerNorm (multi_scale_gnn.py:241-258); prediction head is a plain
MLP (:275, 324). Layer count: 1 G2M, num_message_passing_steps M2M
(unshared), 1 M2G (:260-272, 307-321).

Parity with a plain-torch oracle of the reference is pinned by
tests/test_multi_scale.py::test_ms_gnn_parity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp

from sgnn_tpu.models.encode_process_decode import _mlp_tail, _split_first_layer
from sgnn_tpu.nn.core import (
    Params,
    layer_norm_apply,
    mlp_apply,
    mlp_init,
    mlp_ln_apply,
    mlp_ln_init,
)
from sgnn_tpu.ops.segment import coo_segment_sum
from sgnn_tpu.physics.multi_scale_graph import StaticGraph


@dataclasses.dataclass(frozen=True)
class MSGNNConfig:
    """Hyperparameters (multi_scale_gnn.py:208-239; nmlp_layers=2 is the
    reference trainer's default, multi_scale_train.py:335)."""

    node_in: int
    edge_in: int
    node_out: int
    latent_dim: int
    num_message_passing_steps: int
    num_mlp_layers: int = 2

    @property
    def hidden_dims(self):
        return [self.latent_dim] * self.num_mlp_layers


def _block_init(key: jax.Array, cfg: MSGNNConfig, dtype) -> Params:
    ke, kn = jax.random.split(key)
    d = cfg.latent_dim
    return {
        "edge": mlp_ln_init(ke, 3 * d, cfg.hidden_dims, d, dtype),
        "node": mlp_ln_init(kn, 2 * d, cfg.hidden_dims, d, dtype),
    }


def multi_scale_gnn_init(key: jax.Array, cfg: MSGNNConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 7 + cfg.num_message_passing_steps)
    d = cfg.latent_dim
    return {
        "grid_node_encoder": mlp_ln_init(keys[0], cfg.node_in, cfg.hidden_dims, d, dtype),
        "g2m_edge_encoder": mlp_ln_init(keys[1], cfg.edge_in, cfg.hidden_dims, d, dtype),
        "m2m_edge_encoder": mlp_ln_init(keys[2], cfg.edge_in, cfg.hidden_dims, d, dtype),
        "m2g_edge_encoder": mlp_ln_init(keys[3], cfg.edge_in, cfg.hidden_dims, d, dtype),
        "g2m_block": _block_init(keys[4], cfg, dtype),
        "m2m_blocks": [
            _block_init(k, cfg, dtype)
            for k in keys[5 : 5 + cfg.num_message_passing_steps]
        ],
        "m2g_block": _block_init(keys[5 + cfg.num_message_passing_steps], cfg, dtype),
        "prediction_head": mlp_init(
            keys[6 + cfg.num_message_passing_steps], d, cfg.hidden_dims, cfg.node_out, dtype
        ),
    }


def _interact(
    block: Params,
    x: jnp.ndarray,
    e: jnp.ndarray,
    edges,
    sorted_receivers: bool = False,
    *,
    x_sender_table: jnp.ndarray = None,
    compute_dtype=None,
) -> tuple:
    """One interaction step over padded COO edges.

    Matches G2M/M2M/M2G block semantics (multi_scale_gnn.py:66-205):
    msg = edge_fn([x_receiver, x_sender, e]); sum-aggregate at receivers;
    upd = node_fn([agg, x]); residuals on both nodes and edges. Padded
    edge slots (mask False) contribute nothing to the aggregation and
    their latents stay zeroed.

    ``x_sender_table`` overrides the table ``edges.senders`` indexes
    into (default x) — the hook the graph-partitioned path
    (parallel/ms_partition.py) uses to point senders at the
    halo-extended latents, so the distributed forward runs THIS
    implementation instead of a re-derivation (VERDICT r3 #2/#6).

    ``compute_dtype`` (e.g. bf16) lowers the edge-sized tensors'
    precision — same mixed-precision contract as _interact_dense and
    the single-scale flat path: LN moments, aggregation and the node
    update accumulate f32; with compute_dtype=None the math is
    bit-identical to the original f32 formulation (every astype is a
    no-op and the same dots run in the same order).
    """
    from sgnn_tpu.models.epd_flat import _mlp_tail_in

    d = x.shape[-1]
    n = x.shape[0]
    dt = e.dtype if compute_dtype is None else compute_dtype
    maskf = edges.mask[:, None].astype(dt)
    xs = x if x_sender_table is None else x_sender_table

    (w_i, w_j, w_e), b_e = _split_first_layer(block["edge"]["mlp"], (d, d, d))
    proj_i = jnp.dot(x, w_i, preferred_element_type=x.dtype)  # [N, H]
    proj_j = jnp.dot(xs, w_j, preferred_element_type=x.dtype)  # [N(ext), H]
    if compute_dtype is not None:
        proj_j = proj_j.astype(dt)
    h = (
        proj_i[edges.receivers].astype(dt)
        + proj_j[edges.senders]
        + jnp.dot(e, w_e.astype(dt), preferred_element_type=dt)
        + b_e.astype(dt)
    )  # [E, H]
    msg = _mlp_tail_in(block["edge"]["mlp"], h) if compute_dtype is not None \
        else _mlp_tail(block["edge"]["mlp"], h)
    msg = layer_norm_apply(block["edge"]["ln"], msg)
    msg = msg * maskf

    agg = coo_segment_sum(
        msg.astype(jnp.float32), edges.receivers, n,
        indices_are_sorted=sorted_receivers,
    )  # padded slots are zero; f32 accumulation in mixed precision
    (w_agg, w_x), b_n = _split_first_layer(block["node"]["mlp"], (d, d))
    hn = (
        jnp.dot(agg, w_agg, preferred_element_type=x.dtype)
        + jnp.dot(x, w_x, preferred_element_type=x.dtype)
        + b_n
    )
    upd = _mlp_tail(block["node"]["mlp"], hn)
    upd = layer_norm_apply(block["node"]["ln"], upd)

    return x + upd, (e + msg) * maskf


def multi_scale_gnn_apply(
    params: Params,
    node_features: jnp.ndarray,  # [N, node_in] full-grid nodes
    edge_features: Dict[str, jnp.ndarray],  # {'g2m','m2m','m2g'}: [E_pad, edge_in]
    graph: StaticGraph,
    sorted_receivers: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """Forward pass (multi_scale_gnn.py:277-325). Returns [N, node_out].

    ``sorted_receivers=True`` asserts every edge list's receiver indices
    are non-decreasing INCLUDING padded slots (the flatten_ms_graph
    contract), unlocking XLA's sorted-scatter path for the segment sums.

    ``compute_dtype`` (e.g. jnp.bfloat16) lowers the edge-sized
    tensors' precision (see _interact); None keeps the original f32
    math bit-for-bit.
    """
    x = mlp_ln_apply(params["grid_node_encoder"], node_features)
    e_g2m = mlp_ln_apply(params["g2m_edge_encoder"], edge_features["g2m"])
    e_m2m = mlp_ln_apply(params["m2m_edge_encoder"], edge_features["m2m"])
    e_m2g = mlp_ln_apply(params["m2g_edge_encoder"], edge_features["m2g"])
    e_g2m = e_g2m * graph.g2m.mask[:, None].astype(x.dtype)
    e_m2m = e_m2m * graph.m2m.mask[:, None].astype(x.dtype)
    e_m2g = e_m2g * graph.m2g.mask[:, None].astype(x.dtype)
    if compute_dtype is not None:
        e_g2m = e_g2m.astype(compute_dtype)
        e_m2m = e_m2m.astype(compute_dtype)
        e_m2g = e_m2g.astype(compute_dtype)

    x, e_g2m = _interact(
        params["g2m_block"], x, e_g2m, graph.g2m, sorted_receivers,
        compute_dtype=compute_dtype,
    )
    for block in params["m2m_blocks"]:
        x, e_m2m = _interact(
            block, x, e_m2m, graph.m2m, sorted_receivers,
            compute_dtype=compute_dtype,
        )
    x, e_m2g = _interact(
        params["m2g_block"], x, e_m2g, graph.m2g, sorted_receivers,
        compute_dtype=compute_dtype,
    )

    return mlp_apply(params["prediction_head"], x)


# --------------------------------------------------------------------------
# Dense per-receiver slot path (no edge-sized scatters). Optional layout:
# measured slower than flat COO on the hierarchy's skewed degree
# distributions (see multi_scale_graph.DenseEdges caveat), kept for
# degree-uniform graphs. Pinned equal to the COO path by
# tests/test_multi_scale.py.
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sorted_gather(table, idx, num_nodes):
    """table[idx] whose VJP is a SORTED segment-sum (idx must be ascending).

    AD's transpose of a gather is an unsorted scatter-add; for the dense
    layout's receiver rows (ascending by construction) the sorted path
    is markedly faster on TPU.
    """
    del num_nodes
    return table[idx]


def _sorted_gather_fwd(table, idx, num_nodes):
    return table[idx], idx


def _sorted_gather_bwd(num_nodes, idx, g):
    from sgnn_tpu.ops.segment import segment_sum

    return segment_sum(g, idx, num_nodes, indices_are_sorted=True), None


_sorted_gather.defvjp(_sorted_gather_fwd, _sorted_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _planned_gather(table, senders, tsp_rows, tsp_node, tsp_mask, num_nodes):
    """table[senders] with a scatter-free VJP via the static transpose plan.

    The plan (DenseEdges.tsp_*, host-built once per static graph) lists,
    for every sender node, the flat positions of its outgoing edges.
    d(table) = per-sender masked sum of the cotangent rows at those
    positions, written back with ONE compact sorted segment-sum — no
    node-sized unsorted scatter (the dense path's dominant backward cost,
    ~1 ms/layer profiled on v5e).
    """
    del tsp_rows, tsp_node, tsp_mask, num_nodes
    return table[senders]


def _planned_gather_fwd(table, senders, tsp_rows, tsp_node, tsp_mask, num_nodes):
    return table[senders], (senders, tsp_rows, tsp_node, tsp_mask)


def _planned_gather_bwd(num_nodes, res, g):
    from sgnn_tpu.ops.segment import segment_sum

    senders, tsp_rows, tsp_node, tsp_mask = res
    from sgnn_tpu.ops.sym_gather import _slot_reduce_dot

    r, k = senders.shape
    gf = g.reshape(r * k, -1)
    rows = gf[tsp_rows]  # [Rs, Ks, H]
    masked = rows * tsp_mask[..., None].astype(gf.dtype)
    # masked slot sum as an identity dot: f32 MXU accumulation, no
    # convert materialization (ops/sym_gather._slot_reduce_dot)
    sums = _slot_reduce_dot(masked, gf.dtype)
    d_table = segment_sum(sums, tsp_node, num_nodes, indices_are_sorted=True)
    return d_table, None, None, None, None


_planned_gather.defvjp(_planned_gather_fwd, _planned_gather_bwd)


def _interact_dense(
    block: Params,
    x: jnp.ndarray,
    e: jnp.ndarray,
    de,
    sorted_receivers: bool = False,
    compute_dtype=None,
    *,
    x_sender_table: jnp.ndarray = None,
) -> tuple:
    """One interaction step over DenseEdges (multi_scale_graph.DenseEdges).

    Same math as _interact, restructured for TPU: the edge computation
    runs on [R, K, .] dense slots (R = receiver rows of this edge type,
    R << N for mesh-side types), aggregation is a masked sum over K, and
    the only scatter is ONE node-sized sorted segment-sum writing agg
    rows back to the full grid. The node update still runs on ALL N
    nodes — reference semantics: node_fn([agg=0, x]) + residual also
    updates nodes this edge type never targets (multi_scale_gnn.py:296,
    307-321; non-mesh nodes ride through M2M via these updates).

    compute_dtype (e.g. bf16) applies to the edge-sized tensors only —
    the same mixed-precision contract as the single-scale flat path
    (models/epd_flat.py): LN moments, node update and aggregation
    accumulate f32.
    """
    from sgnn_tpu.models.epd_flat import _mlp_tail_in
    from sgnn_tpu.ops.segment import segment_sum

    d = x.shape[-1]
    n = x.shape[0]
    dt = e.dtype if compute_dtype is None else compute_dtype
    maskf = de.mask[..., None].astype(dt)
    # x_sender_table: the table de.senders indexes into (default x) — the
    # graph-partitioned hook pointing senders at halo-extended latents
    # (parallel/ms_partition.py), same contract as _interact's.
    xs = x if x_sender_table is None else x_sender_table

    (w_i, w_j, w_e), b_e = _split_first_layer(block["edge"]["mlp"], (d, d, d))
    proj_i = _sorted_gather(
        jnp.dot(x, w_i, preferred_element_type=x.dtype), de.recv, n
    )  # [R, H]
    proj_j = jnp.dot(xs, w_j, preferred_element_type=x.dtype)  # [N(ext), H]
    if compute_dtype is not None:
        proj_j = proj_j.astype(dt)
    xj = _planned_gather(
        proj_j, de.senders, de.tsp_rows, de.tsp_node, de.tsp_mask, xs.shape[0]
    )  # [R, K, H]
    h = (
        proj_i.astype(dt)[:, None, :]
        + xj
        + jnp.dot(e, w_e.astype(dt), preferred_element_type=dt)
        + b_e.astype(dt)
    )  # [R, K, H]
    msg = _mlp_tail_in(block["edge"]["mlp"], h)
    msg = layer_norm_apply(block["edge"]["ln"], msg)
    msg = msg * maskf

    # Slot aggregation folded into the node-update matmul (same trick as
    # epd_flat): segsum(sum_k(msg)) @ w_agg == segsum(msg.reshape(R, K*D)
    # @ tile(w_agg, K)) — segment_sum is linear, so the matmul commutes
    # through it. One MXU dot (f32 accumulation) replaces the per-layer
    # [R, K, D] -> [R, D] slot reduce; the segment scatter is unchanged.
    r, ks = de.senders.shape
    (w_agg, w_x), b_n = _split_first_layer(block["node"]["mlp"], (d, d))
    w_big = jnp.tile(w_agg, (ks, 1)).astype(msg.dtype)  # [K*D, D]
    agg_rows = jnp.dot(
        msg.reshape(r, ks * d), w_big, preferred_element_type=jnp.float32
    )  # [R, D]
    agg_hn = segment_sum(
        agg_rows, de.recv, n, indices_are_sorted=sorted_receivers
    )  # node-sized
    hn = (
        agg_hn.astype(x.dtype)
        + jnp.dot(x, w_x, preferred_element_type=x.dtype)
        + b_n
    )
    upd = _mlp_tail(block["node"]["mlp"], hn)
    upd = layer_norm_apply(block["node"]["ln"], upd)

    return x + upd, (e + msg) * maskf


def _interact_dense_scales(
    block: Params,
    x: jnp.ndarray,
    es,  # sequence of [R_s, K_s, D] per-scale edge latents
    des,  # sequence of DenseEdges (disjoint edge sets over the same nodes)
    sorted_receivers: bool = False,
    compute_dtype=None,
    *,
    x_sender_table: jnp.ndarray = None,
) -> tuple:
    """One interaction step over a UNION of dense edge sets (per-scale m2m).

    Reference semantics: each M2M block consumes the CONCATENATED
    per-scale mesh edges (multi_scale_gnn.py:312-316 over edges from
    multi_scale_graph.py:245-281). Because the scales' edge sets are
    disjoint and aggregation is a sum at receivers, running the edge
    update per scale and summing the per-scale segment-sums is the same
    math — but each scale keeps its own tight slot width K_s instead of
    padding every row to the summed degree of the coarsest member node
    (chained sampling makes coarse nodes members of every finer scale).
    Node update runs ONCE on the summed aggregate, exactly like the
    combined form; same mixed-precision contract as _interact_dense.
    """
    from sgnn_tpu.models.epd_flat import _mlp_tail_in
    from sgnn_tpu.ops.segment import segment_sum

    d = x.shape[-1]
    n = x.shape[0]
    dt = es[0].dtype if compute_dtype is None else compute_dtype
    xs = x if x_sender_table is None else x_sender_table

    (w_i, w_j, w_e), b_e = _split_first_layer(block["edge"]["mlp"], (d, d, d))
    proj_i_full = jnp.dot(x, w_i, preferred_element_type=x.dtype)  # [N, H]
    proj_j = jnp.dot(xs, w_j, preferred_element_type=x.dtype)  # [N(ext), H]
    if compute_dtype is not None:
        proj_j = proj_j.astype(dt)
    w_e_dt = w_e.astype(dt)
    b_e_dt = b_e.astype(dt)

    (w_agg, w_x), b_n = _split_first_layer(block["node"]["mlp"], (d, d))
    agg_hn = jnp.zeros((n, d), jnp.float32)
    new_es = []
    for e, de in zip(es, des):
        maskf = de.mask[..., None].astype(dt)
        proj_i = _sorted_gather(proj_i_full, de.recv, n)  # [R_s, H]
        xj = _planned_gather(
            proj_j, de.senders, de.tsp_rows, de.tsp_node, de.tsp_mask,
            xs.shape[0],
        )  # [R_s, K_s, H]
        h = (
            proj_i.astype(dt)[:, None, :]
            + xj
            + jnp.dot(e, w_e_dt, preferred_element_type=dt)
            + b_e_dt
        )
        msg = _mlp_tail_in(block["edge"]["mlp"], h)
        msg = layer_norm_apply(block["edge"]["ln"], msg)
        msg = msg * maskf
        new_es.append((e + msg) * maskf)

        # slot aggregation folded into the node matmul (see _interact_dense)
        r, ks = de.senders.shape
        w_big = jnp.tile(w_agg, (ks, 1)).astype(msg.dtype)  # [K_s*D, D]
        agg_rows = jnp.dot(
            msg.reshape(r, ks * d), w_big, preferred_element_type=jnp.float32
        )  # [R_s, D]
        agg_hn = agg_hn + segment_sum(
            agg_rows, de.recv, n, indices_are_sorted=sorted_receivers
        )

    hn = (
        agg_hn.astype(x.dtype)
        + jnp.dot(x, w_x, preferred_element_type=x.dtype)
        + b_n
    )
    upd = _mlp_tail(block["node"]["mlp"], hn)
    upd = layer_norm_apply(block["node"]["ln"], upd)

    return x + upd, new_es


def multi_scale_gnn_apply_dense(
    params: Params,
    node_features: jnp.ndarray,  # [N, node_in]
    edge_features: Dict[str, jnp.ndarray],  # {'g2m','m2m','m2g'}: [R_t, K_t, edge_in]
    graph,  # DenseStaticGraph (single or flattened batch)
    sorted_receivers: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """Dense-slot forward; same parameters/semantics as multi_scale_gnn_apply.

    compute_dtype (e.g. jnp.bfloat16) lowers the edge-sized tensors'
    dtype; node encoder/updates, the prediction head and all
    accumulations stay f32 (the single-scale mixed-precision contract).
    """
    x = mlp_ln_apply(params["grid_node_encoder"], node_features)

    def enc(name, feats, mask):
        out = mlp_ln_apply(params[name], feats) * mask[..., None].astype(x.dtype)
        return out.astype(compute_dtype) if compute_dtype is not None else out

    e_g2m = enc("g2m_edge_encoder", edge_features["g2m"], graph.g2m.mask)
    # m2m is per-scale: one shared encoder applied to each scale's features
    e_m2m = [
        enc("m2m_edge_encoder", f, de.mask)
        for f, de in zip(edge_features["m2m"], graph.m2m)
    ]
    e_m2g = enc("m2g_edge_encoder", edge_features["m2g"], graph.m2g.mask)

    x, e_g2m = _interact_dense(
        params["g2m_block"], x, e_g2m, graph.g2m, sorted_receivers, compute_dtype
    )
    for block in params["m2m_blocks"]:
        x, e_m2m = _interact_dense_scales(
            block, x, e_m2m, graph.m2m, sorted_receivers, compute_dtype
        )
    x, e_m2g = _interact_dense(
        params["m2g_block"], x, e_m2g, graph.m2g, sorted_receivers, compute_dtype
    )

    return mlp_apply(params["prediction_head"], x)


def flatten_dense_ms_graph(graph, n: int):
    """Batched per-sample DenseStaticGraph ([B, R, ...] leaves) -> one flat
    block-diagonal graph over B*n nodes.

    Padded rows already point at their graph's last node (dense_edges),
    so adding per-graph offsets keeps every recv array globally sorted.
    """
    from sgnn_tpu.physics.multi_scale_graph import DenseEdges, DenseStaticGraph

    def flat(de):
        b, r = de.recv.shape
        k = de.senders.shape[-1]
        rs = de.tsp_node.shape[1]
        off = (jnp.arange(b, dtype=de.recv.dtype) * n)[:, None]
        # transpose-plan edge positions offset by each graph's edge block
        eoff = (jnp.arange(b, dtype=de.tsp_rows.dtype) * (r * k))[:, None, None]
        return DenseEdges(
            recv=(de.recv + off).reshape(-1),
            senders=(de.senders + off[..., None]).reshape(b * r, -1),
            mask=de.mask.reshape(b * r, -1),
            tsp_rows=(de.tsp_rows + eoff).reshape(b * rs, -1),
            tsp_node=(de.tsp_node + off).reshape(-1),
            tsp_mask=de.tsp_mask.reshape(b * rs, -1),
        )

    return DenseStaticGraph(
        g2m=flat(graph.g2m),
        m2m=tuple(flat(de) for de in graph.m2m),
        m2g=flat(graph.m2g),
    )


def flatten_ms_graph(graph: StaticGraph, n: int) -> StaticGraph:
    """Batched per-sample StaticGraph ([B, E_pad] leaves) -> ONE flat
    block-diagonal graph over B*n nodes.

    This is the multi-scale counterpart of the single-scale flat path
    (models/epd_flat.py): instead of vmapping segment-sums/gathers over
    the batch — which XLA lowers poorly on TPU — the whole batch becomes
    a single COO problem with fast flat gathers and one scatter.

    Graph b's node i becomes global index b*n + i. Padded slots are
    re-pointed at their graph's LAST node ((b+1)*n - 1, messages are
    masked so the target only ever receives zeros), which keeps the
    receiver array globally non-decreasing: valid edges are
    receiver-sorted per graph (pad_edges), padding sits at each graph's
    maximum index, and graph b+1 starts strictly above it. Downstream
    segment sums may therefore claim ``indices_are_sorted=True``.
    """
    from sgnn_tpu.physics.multi_scale_graph import PaddedEdges

    def flat(pe):
        b = pe.senders.shape[0]
        off = (jnp.arange(b, dtype=pe.senders.dtype) * n)[:, None]
        last = off + (n - 1)
        s = jnp.where(pe.mask, pe.senders + off, last).reshape(-1)
        r = jnp.where(pe.mask, pe.receivers + off, last).reshape(-1)
        return PaddedEdges(senders=s, receivers=r, mask=pe.mask.reshape(-1))

    return StaticGraph(g2m=flat(graph.g2m), m2m=flat(graph.m2m), m2g=flat(graph.m2g))
