"""Flat (block-diagonal batched) encode-process-decode execution path.

The readable reference implementation lives in
``models/encode_process_decode.py`` (per-graph [N, K] tensors, vmapped
over the batch). This module is the TPU-fast route: the whole batch is
ONE flat graph of M = B*N receivers whose senders carry global flat
indices (block-diagonal — no cross-graph edges by construction), so

  * every sender gather is a flat [M, H] table gather (XLA lowers
    vmapped/batched gathers poorly; flat gathers hit the fast path),
    and same-index gathers merge into ONE packed wide-table gather
    (gather cost is per-row, width-free — ops/sym_gather.py),
  * slot aggregations and broadcast transposes run as MXU dots
    (the agg fold in _process_decode, _recv_broadcast_add,
    ops/sym_gather._slot_reduce_dot) instead of convert-materializing
    reduces,
  * edge tensors are 2D [M*K, D] receiver-major arrays driven by the
    XLA pipeline above; the fused Pallas edge-block kernel lives in
    experimental/edge_block.py (opt-in via use_pallas=True — it loses
    ~5x at the production slot widths, see its module docstring),
  * the per-edge validity mask derives from prefix-compacted neighbor
    rows (``slot < degree``).

Semantics are pinned equal to the vmapped reference path by
tests/test_epd_flat.py (change both or neither — CLAUDE.md). The model
math re-derives xrkong/sgnn sgnn/single_scale/graph_network.py:48-406;
see encode_process_decode.py for the full contract and the first-layer
split trick (cat(a,b,c) @ W == a@Wa + b@Wb + c@Wc).

Mixed precision: ``compute_dtype=jnp.bfloat16`` casts the edge-sized
tensors (edge latents, gathered sender projections) to bf16, halving
HBM traffic on every [M*K, D] operand. LayerNorm moments, the node
update, the decoder and all parameters stay f32.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from sgnn_tpu.nn.core import Params, layer_norm_apply, mlp_apply
from sgnn_tpu.models.encode_process_decode import _mlp_tail, _split_first_layer
from sgnn_tpu.experimental.edge_block import _tile_receivers, fused_edge_block
from sgnn_tpu.ops.sym_gather import packed_sym_gather, sym_gather


def flatten_batch_graph(
    senders: jnp.ndarray,  # int32[B, N, K] per-graph sender indices
    mask: jnp.ndarray,  # bool[B, N, K]
    n: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-graph neighbor lists -> one block-diagonal flat graph.

    Returns:
      senders_flat: int32[B*N*K] global flat sender indices (graph b's
        node i becomes b*n + i). Padded slots already hold the
        receiver's own index (ops/neighbors.py NeighborList contract),
        so after offsetting they stay in-bounds self-references.
      degrees: f32[B*N, 1] valid-slot count per receiver. Neighbor rows
        are prefix-compacted, so the edge mask is ``slot < degree``.
    """
    b = senders.shape[0]
    offsets = (jnp.arange(b, dtype=senders.dtype) * n)[:, None, None]
    senders_flat = (senders + offsets).reshape(-1)
    degrees = jnp.sum(mask, axis=-1).reshape(-1, 1).astype(jnp.float32)
    return senders_flat, degrees


def _slot_mask(degrees: jnp.ndarray, m: int, k: int) -> jnp.ndarray:
    """f32[M*K, 1] edge validity from prefix-compacted degrees."""
    slot = jax.lax.broadcasted_iota(jnp.float32, (m, k), 1)
    return (slot < degrees).astype(jnp.float32).reshape(m * k, 1)


def _pallas_eligible(edge_mlp: Params, m: int, k: int, d: int) -> bool:
    """The fused kernel covers the 1-hidden-layer edge MLP and needs the
    receiver count to tile (see _tile_receivers)."""
    if len(edge_mlp["layers"]) != 2:
        return False
    try:
        _tile_receivers(m, k, d)
        _tile_receivers(m, k, d, bwd=True)
    except ValueError:
        return False
    return True


@jax.custom_vjp
def _dot_wf32(x, w):
    """dot(x, w.astype(x.dtype)) whose weight-grad dot emits f32.

    AD's transpose of a bf16-preferred dot computes d_w as a bf16-OUTPUT
    dot_general contracting the edge dim, which then converts to f32 at
    the w.astype boundary — i.e. the weight grads round through bf16
    before the optimizer ever sees them. This wrapper computes d_w with
    preferred_element_type=f32 directly: strictly more accurate (one
    rounding removed from a 307k-term accumulation) at zero wall cost
    (headline bench 25.82 ms vs a 25.88 ms same-session control).
    scripts/wgrad_probe.py context: ISOLATED, the bf16-out contraction
    is pathological on v5e (75.5 ms vs 2.07 ms for the f32-out form at
    bf16 [307k, 64] operands) — in the full step XLA already rewrites
    it, so the win here is numerics, not time. d_x is AD's exact
    formulation; for f32 inputs every dot matches AD bit-for-bit (same
    operands, same preferred type).
    """
    dt = x.dtype
    return jnp.dot(x, w.astype(dt), preferred_element_type=dt)


# probe knob (see _dot_wf32_bwd); read once at import
_WGRAD_SWAP = bool(int(__import__("os").environ.get("WGRAD_SWAP", "0")))


def _dot_wf32_fwd(x, w):
    return _dot_wf32(x, w), (x, w)


def _dot_wf32_bwd(res, g):
    x, w = res
    dt = x.dtype
    d_x = jnp.dot(g, w.astype(dt).T, preferred_element_type=dt)
    # Contract ALL leading (batch) dims: the ms dense path feeds 3D
    # [R, K, H] tensors through _mlp_tail_in (models/multi_scale.py),
    # so d_w must reduce every non-feature axis, not just axis 0.
    bd = tuple(range(x.ndim - 1))
    if _WGRAD_SWAP:
        # probe (r5, headline copy bucket): swap operand order so the
        # OTHER edge-sized operand carries the contracted-major layout —
        # moves which tensor XLA may relayout for the x^T-on-lanes
        # weight-grad contraction. d_w = (g^T x)^T == x^T g exactly
        # (same f32 accumulation, transpose of a [H, H] result is free).
        d_w = jax.lax.dot_general(
            g, x, ((bd, bd), ((), ())), preferred_element_type=jnp.float32
        ).T
    else:
        d_w = jax.lax.dot_general(
            x, g, ((bd, bd), ((), ())), preferred_element_type=jnp.float32
        )
    return d_x, d_w.astype(w.dtype)


_dot_wf32.defvjp(_dot_wf32_fwd, _dot_wf32_bwd)


def _mlp_tail_in(mlp_params: Params, h: jnp.ndarray) -> jnp.ndarray:
    """_mlp_tail that keeps activations in h's dtype (casts weights).

    Identical to _mlp_tail for f32 inputs; for bf16 edge pipelines it
    keeps every materialized [M*K, H] tensor bf16 — profiling showed the
    f32-h variant spent ~6 ms/step on f32 layout copies (the transposed
    operands of the weight-grad matmuls) and broadcast materializations
    that all halve in bf16.
    """
    dt = h.dtype
    layers = mlp_params["layers"]
    if len(layers) == 1:
        return h
    x = jax.nn.relu(h)
    # preferred_element_type=dt (not f32+astype): the MXU accumulates in
    # f32 either way, so forward bits match — but AD's cotangents now stay
    # in dt instead of materializing f32 [M*K, H] intermediates in bwd.
    for layer in layers[1:-1]:
        x = jax.nn.relu(_dot_wf32(x, layer["w"]) + layer["b"].astype(dt))
    last = layers[-1]
    return _dot_wf32(x, last["w"]) + last["b"].astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _recv_broadcast_add(h, proj_ib, k):
    """h[m*K+k] += proj_ib[m], with the transpose-reduce as an MXU dot.

    AD's transpose of the receiver broadcast is a [m, k, d] -> [m, d]
    slot reduce, which XLA lowers with a bf16->f32 convert
    materialization (~0.16 ms/layer on v5e). The custom VJP runs it as a
    two-dim-contraction dot against a broadcast identity — f32
    accumulation on the MXU, no extra materialization. (f32 accumulation
    vs AD's bf16 slot sum: same values up to bf16 rounding of an
    8-term sum; the f32 path is bit-identical since eye-products are
    exact.)
    """
    m, d = proj_ib.shape
    return (
        h.reshape(m, k, d) + proj_ib.astype(h.dtype)[:, None, :]
    ).reshape(h.shape)


def _recv_broadcast_add_fwd(h, proj_ib, k):
    return _recv_broadcast_add(h, proj_ib, k), (
        jnp.zeros((0,), proj_ib.dtype),
        proj_ib.shape,
    )


def _recv_broadcast_add_bwd(k, res, g):
    sentinel, (m, d) = res
    eye3 = jnp.broadcast_to(jnp.eye(d, dtype=g.dtype)[None], (k, d, d))
    d_proj = jax.lax.dot_general(
        g.reshape(m, k, d),
        eye3,
        (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return g, d_proj.astype(sentinel.dtype)


_recv_broadcast_add.defvjp(_recv_broadcast_add_fwd, _recv_broadcast_add_bwd)


def _edge_block_xla(
    params: Params,
    e: jnp.ndarray,  # [M*K, D] edge latents (padded slots zero)
    xj: jnp.ndarray,  # [M*K, H] gathered sender projections
    proj_i: jnp.ndarray,  # [M, H] receiver projections
    maskf: jnp.ndarray,  # f32[M*K, 1]
    w_e: jnp.ndarray,
    b_e: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA fallback of the fused block: same math, compiler-fused.

    Every edge-sized intermediate stays in e's dtype; only the LayerNorm
    moments run f32 (inside layer_norm_apply). Bit-identical to the
    previous f32-h formulation when e is f32.

    Returns (new_e, msg); the caller folds the slot aggregation into the
    node-update matmul (see _process_decode) instead of a separate
    per-layer slot-sum reduce.
    """
    m = proj_i.shape[0]
    d = e.shape[-1]
    dt = e.dtype
    h = _dot_wf32(e, w_e) + xj.astype(dt)
    h = _recv_broadcast_add(h, proj_i + b_e, k)
    msg = _mlp_tail_in(params["mlp"], h)
    msg = layer_norm_apply(params["ln"], msg)
    msg = msg * maskf.astype(dt)
    new_e = e + msg
    return new_e, msg


def encode_process_decode_apply_flat(
    params: Params,
    node_features: jnp.ndarray,  # [M, node_in]
    edge_features: jnp.ndarray,  # [M*K, edge_in] receiver-major
    senders: jnp.ndarray,  # int32[M*K] global flat sender indices
    degrees: jnp.ndarray,  # f32[M, 1]
    k: int,
    use_pallas: Optional[bool] = None,
    rev: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    band_nodes: Optional[int] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Full EPD forward over one flat block-diagonal graph.

    Args:
      params: encode_process_decode_init layout.
      use_pallas: True opts into the experimental fused kernel
        (experimental/edge_block.py); None/False run the XLA edge path
        (the production path at every slot width — fresh 2026-08-20
        measurement in the experimental module docstring).
      rev: optional (rev_pos [M, K], rev_ok [M, K]) reverse-edge index
        enabling the gather-based sender-gather VJP (ops/sym_gather.py;
        valid only for symmetric, uncapped graphs).
      compute_dtype: optional low-precision dtype for edge-sized tensors.
      band_nodes: optional static bound on |sender - receiver| index
        distance (valid for spatially sorted node orderings) routing the
        large-table gathers through the banded path (runtime-guarded,
        exact — ops/sym_gather.banded_gather_rows).
    Returns:
      f32[M, node_out] decoded node outputs.
    """
    m = node_features.shape[0]
    maskf = _slot_mask(degrees, m, k)

    # --- encoder (graph_network.py:86-96) ----------------------------------
    x = layer_norm_apply(
        params["encoder"]["node"]["ln"],
        mlp_apply(params["encoder"]["node"]["mlp"], node_features),
    )
    e = layer_norm_apply(
        params["encoder"]["edge"]["ln"],
        mlp_apply(params["encoder"]["edge"]["mlp"], edge_features),
    )
    e = e * maskf
    if compute_dtype is not None:
        e = e.astype(compute_dtype)

    return _process_decode(
        params, x, e, senders, maskf, k, use_pallas, rev, compute_dtype,
        band_nodes=band_nodes, remat=remat,
    )


def _process_decode(
    params: Params,
    x: jnp.ndarray,  # [M, D] encoded node latents
    e: jnp.ndarray,  # [M*K, D] encoded edge latents (masked, compute dtype)
    senders: jnp.ndarray,  # int32[M*K]
    maskf: jnp.ndarray,  # f32[M*K, 1]
    k: int,
    use_pallas: Optional[bool],
    rev: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    compute_dtype: Optional[jnp.dtype],
    xj0: Optional[jnp.ndarray] = None,  # [M*K, D] layer-0 gathered senders
    band_nodes: Optional[int] = None,
    gather_fn=None,  # Optional[(proj_j [M, H]) -> xj [M*K, H]]
    remat: bool = False,
) -> jnp.ndarray:
    """Processor + decoder over encoded latents (shared by both entries).

    ``gather_fn`` overrides the per-layer sender gather — the hook the
    edge-partitioned path (parallel/edge_partition.py) uses to halo-
    exchange each layer's sender projections before gathering from the
    extended table, so the distributed forward runs THIS tuned
    implementation (bf16 edge tensors, fused edge block, agg-fold)
    instead of re-deriving the math (VERDICT r3 #2/#6). It receives
    proj_j already cast to compute_dtype (bf16 halo exchange ships half
    the bytes). Mutually exclusive with ``rev``; composes with ``xj0``
    (r5: the sharded path's packed ext-table gather produces layer 0's
    senders, and gather_fn serves layers 1+ — same split as the
    single-chip packed fused entry).
    """
    # enforce the documented exclusivity: a caller passing both would get
    # rev silently ignored, changing the VJP path (ADVICE r4)
    assert gather_fn is None or rev is None, (
        "gather_fn is mutually exclusive with rev"
    )
    m = x.shape[0]
    d = x.shape[-1]
    # valid-slot counts for the pallas kernel (slot < degree recovers the
    # edge mask in-kernel); maskf rows are prefix-compacted so the sum is
    # exact
    degrees = jnp.sum(maskf.reshape(m, k), axis=-1, keepdims=True)
    if use_pallas is None:
        use_pallas = False  # kernel demoted to experimental/ (see above)

    # --- processor ----------------------------------------------------------
    def _layer(step_params, x, e, xj0_l):
        (w_i, w_j, w_e), b_e = _split_first_layer(step_params["edge"]["mlp"], (d, d, d))
        proj_i = jnp.dot(x, w_i, preferred_element_type=x.dtype)  # [M, H]
        if xj0_l is not None:
            xj = xj0_l  # packed gather already produced layer 0's senders
        else:
            proj_j = jnp.dot(x, w_j, preferred_element_type=x.dtype)  # [M, H]
            if compute_dtype is not None:
                proj_j = proj_j.astype(compute_dtype)
            if gather_fn is not None:
                xj = gather_fn(proj_j)  # [M*K, H]
            elif rev is not None:
                xj = sym_gather(proj_j, senders, rev[0], rev[1], band_nodes)
            else:
                xj = proj_j[senders]  # [M*K, H]
            # named for the remat policy: the gather is the one layer
            # stage worth its residual bytes (recomputing it in bwd
            # costs a second banded/large-table gather; recomputing the
            # MXU dots around it is near-free)
            xj = jax.ad_checkpoint.checkpoint_name(xj, "xj")

        if use_pallas and len(step_params["edge"]["mlp"]["layers"]) == 2:
            w2 = step_params["edge"]["mlp"]["layers"][1]
            new_e, agg = fused_edge_block(
                e,
                xj,
                proj_i,
                degrees,
                w_e,
                b_e,
                w2["w"],
                w2["b"],
                step_params["edge"]["ln"]["scale"],
                step_params["edge"]["ln"]["bias"],
                k,
            )
            e = new_e
            agg = agg.astype(jnp.float32)
            agg_hn = None
        else:
            # (jax.checkpoint around this block was tried and measured
            # SLOWER — 38.3 -> 40.8 ms/step: the recomputed matmuls cost
            # more than the f32 LN-residual copies they avoid.)
            e, msg = _edge_block_xla(
                step_params["edge"], e, xj, proj_i, maskf, w_e, b_e, k
            )
            # named for the remat="xj_msg" policy: also saving the edge
            # messages skips recomputing the edge-MLP dots in bwd
            # (+1 bf16 [M*K, H] residual per layer — 629 MB at 614k)
            msg = jax.ad_checkpoint.checkpoint_name(msg, "msg")
            agg = None

        # node update: node_fn(cat[agg, x]) + residual (graph_network.py:220)
        (w_agg, w_x), b_n = _split_first_layer(step_params["node"]["mlp"], (d, d))
        if agg is None:
            # slot-sum folded into the aggregation matmul:
            #   slotsum(msg) @ w_agg == dot(msg[m,k,d], w_agg[k,d,d'])
            # contracting BOTH (k, d). One MXU dot with f32 accumulation
            # replaces the per-layer reduce that XLA lowered as a
            # bf16->f32 convert + relayout copy of the full edge tensor
            # (~0.49 ms/layer on v5e). The 3D form (not reshape to
            # [m, k*d] @ tile(w_agg, k)): the [E, d] -> [m, k, d] reshape
            # is tiling-compatible (a bitcast), while the 512-wide 2D
            # reshape materialized a repack copy (~0.26 ms/layer). In
            # bf16 mode the products are bf16*bf16 (weights rounded once,
            # same as every edge-MLP dot); f32 mode is a pure
            # reassociation of the same f32 sums. (A custom VJP with the
            # closed-form transposes — d_msg = broadcast(g @ w_agg^T),
            # d_w = slotsum(msg)^T @ g — measured ~0.5 ms SLOWER than
            # AD's 3D-dot transpose: 26.35-26.4 vs 25.88 ms same-session
            # control; AD's batched dot fuses where the explicit
            # broadcast + slot-reduce materialize. BASELINE.md r3 notes.)
            w_3d = jnp.broadcast_to(
                w_agg.astype(msg.dtype)[None], (k,) + w_agg.shape
            )
            agg_hn = jax.lax.dot_general(
                msg.reshape(m, k, d),
                w_3d,
                (((1, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            agg_hn = jnp.dot(agg, w_agg, preferred_element_type=jnp.float32)
        hn = (
            agg_hn
            + jnp.dot(x, w_x, preferred_element_type=jnp.float32)
            + b_n
        )
        upd = _mlp_tail(step_params["node"]["mlp"], hn)
        upd = layer_norm_apply(step_params["node"]["ln"], upd)
        return x + upd, e

    # remat=True checkpoints each layer: the backward recomputes the
    # layer's edge tensors instead of holding ~2 [M*K, H] residual sets
    # per layer. Measured SLOWER at headline scale (38.3 -> 40.8 ms,
    # r1) but it is what fits the 614k+ capacity points in HBM (the
    # un-rematerialized 614k train step ResourceExhausts a 16 GB v5e).
    # The save-xj policy keeps the gathered sender tensor (recomputing
    # it would repeat the layer's banded/large-table gather in bwd —
    # 614k: 808.9 ms full remat vs the policy's number in BASELINE.md);
    # everything else (MXU dots, LN, masks) recomputes.
    # everything else (MXU dots, LN, masks) recomputes. remat="xj_msg"
    # additionally saves the edge messages (the edge-MLP output), so the
    # bwd recompute is just LN/masks — trades +629 MB/layer at 614k for
    # the ~25 ms of recomputed edge dots. remat="full" saves NOTHING
    # beyond the layer inputs (x, e) — the minimum-memory mode: the r5
    # bisection showed the "1.2M compiler block" is HBM exhaustion at
    # buffer assignment (700k grad peaks at 14.8 GiB temp with save-xj;
    # 830k crosses the 16 GB ceiling and the compile helper crashes),
    # so past ~800k nodes the xj residuals themselves must go.
    # remat="group" nests two levels (binomial checkpointing): the layer
    # stack splits into two checkpointed GROUPS whose residuals are just
    # the group inputs — only ~2 (x, e) boundary pairs stay live instead
    # of one per layer — and each layer inside is full-checkpointed for
    # the recompute pass. Cuts the layer-input residual class from
    # 5x(x, e) to 2x(x, e) (-4.7 GB at 1.2M) for one extra fwd recompute
    # of each group; the mode that targets the 16 GiB ceiling itself.
    if remat:
        if remat in ("full", "group"):
            layer_fn = jax.checkpoint(_layer)
        else:
            names = ("xj", "msg") if remat == "xj_msg" else ("xj",)
            layer_fn = jax.checkpoint(
                _layer,
                policy=jax.checkpoint_policies.save_only_these_names(*names),
            )
    else:
        layer_fn = _layer
    if remat == "group":
        def _run_group(group_params, x, e, xj0_g):
            for li, sp in enumerate(group_params):
                x, e = layer_fn(sp, x, e, xj0_g if li == 0 else None)
            return x, e

        run_group = jax.checkpoint(_run_group, static_argnums=())
        stack = params["processor"]
        mid = (len(stack) + 1) // 2
        x, e = run_group(stack[:mid], x, e, xj0)
        x, e = run_group(stack[mid:], x, e, None)
    else:
        for li, step_params in enumerate(params["processor"]):
            x, e = layer_fn(step_params, x, e, xj0 if li == 0 else None)

    # --- decoder (graph_network.py:321-322): node MLP, no LayerNorm --------
    return mlp_apply(params["decoder"], x)


def encode_process_decode_apply_flat_fused(
    params: Params,
    node_features: jnp.ndarray,  # [M, node_in]
    flat_last: jnp.ndarray,  # f32[M, dim] most-recent positions
    senders2d: jnp.ndarray,  # int32[M, K] neighbor lists
    mask2d: jnp.ndarray,  # bool[M, K]
    radius: float,
    use_pallas: Optional[bool] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    band_nodes: Optional[int] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """EPD forward with the packed-gather fusion (symmetric graphs only).

    Numerically identical to building edge features + reverse index
    outside and calling ``encode_process_decode_apply_flat`` with
    ``rev`` set (pinned by tests/test_epd_flat.py), but runs ONE row
    gather where the unfused path runs three: sender positions (edge
    features), senders-of-senders (reverse-edge index) and layer 0's
    sender projections ride one packed f32 table (ops/sym_gather.py
    ``packed_sym_gather``; each 307k-row gather costs ~0.9 ms on v5e
    regardless of width, so this saves ~1.8 ms/step at bench scale).

    Position gradients are stopped (training/rollout never use them);
    use the unfused path if you need them.
    """
    m, k = senders2d.shape
    dim = flat_last.shape[-1]
    maskf = mask2d.reshape(m * k, 1).astype(jnp.float32)

    # node encoder first: layer 0's sender projections feed the packed
    # gather that also produces the edge features
    x = layer_norm_apply(
        params["encoder"]["node"]["ln"],
        mlp_apply(params["encoder"]["node"]["mlp"], node_features),
    )
    d = x.shape[-1]
    (_, w_j0, _), _ = _split_first_layer(params["processor"][0]["edge"]["mlp"], (d, d, d))
    proj_j0 = jnp.dot(x, w_j0, preferred_element_type=x.dtype)  # [M, D] f32

    g_aux, xj0, rev_pos, rev_ok = packed_sym_gather(
        jax.lax.stop_gradient(flat_last),
        proj_j0,
        senders2d,
        mask2d,
        compute_dtype,
        band_nodes,
    )

    # edge features from the gathered sender positions
    # (simulator.encoder_preprocess contract: disp/R, its norm, masked)
    disp = (g_aux.reshape(m, k, dim) - flat_last[:, None, :]) / radius
    dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    ef = jnp.concatenate([disp, dist], axis=-1)
    ef = ef * mask2d[..., None].astype(ef.dtype)

    e = layer_norm_apply(
        params["encoder"]["edge"]["ln"],
        mlp_apply(params["encoder"]["edge"]["mlp"], ef.reshape(m * k, -1)),
    )
    e = e * maskf
    if compute_dtype is not None:
        e = e.astype(compute_dtype)

    return _process_decode(
        params,
        x,
        e,
        senders2d.reshape(-1),
        maskf,
        k,
        use_pallas,
        (rev_pos, rev_ok),
        compute_dtype,
        xj0=xj0,
        band_nodes=band_nodes,
        remat=remat,
    )
