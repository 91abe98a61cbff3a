"""Fused edge-MLP + LayerNorm + mask + neighbor-aggregation Pallas kernel.

This is the hot op of the framework (BASELINE.json: "fused edge-MLP +
scatter-aggregate kernels"). One interaction-network layer's edge path:

    h   = e @ We + xj + proj_i[recv] + be   # first Linear in split form
    a   = relu(h)
    o   = a @ W2 + b2                       # second Linear
    msg = LayerNorm(o) * mask
    new_e = e + msg                         # edge residual
    agg   = segment-sum of msg at receivers # sum aggregation

XLA executes this as ~10 separate HBM passes over edge-sized tensors;
the kernel streams them through VMEM once (2 big reads + 1 big write)
with every matmul on the MXU.

Layout notes (TPU): all big operands are **2D** [E, D] with E = R*K
edges in receiver-major order (R receivers x K dense neighbor slots,
batch folded into R). 2D blocks avoid Mosaic relayouts entirely — the
per-receiver structure is recovered with an on-the-fly indicator matrix
  seg[e_row, r_local] = (e_row // K == r_local)
built from broadcasted_iota in VMEM, so the receiver broadcast
(seg @ proj_i) and the aggregation (seg^T @ msg) are MXU matmuls rather
than reshapes/reductions over a padded sublane axis.

The sender gather (xj = proj_j[senders]) stays in XLA — TPU gathers are
memory ops a kernel can't beat from VMEM at these table sizes.

Backward is a second Pallas kernel (custom_vjp): it recomputes h/a/o
from saved inputs (FLOPs are free, HBM is not) and emits input grads
plus weight grads accumulated across grid steps (constant out-block
index maps + first-step zero init).

Constraint: one hidden layer in the edge MLP (num_mlp_layers=1, the
single-scale reference configuration, train.py:475). Other depths use
the XLA fallback path. Parameter vectors travel as [1, dim] blocks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5
# MXU precision for kernel matmuls. DEFAULT = single-pass bf16 inputs: the
# fwd and bwd kernels recompute h with the SAME in-kernel op, so ReLU gates
# stay self-consistent and the custom-vjp grads are the exact grads of the
# bf16-computed function (interpret-mode tests verify exact math on CPU).
# Switch to HIGHEST for full-f32 MXU at ~+30% kernel time if needed.
_PRECISION = jax.lax.Precision.DEFAULT


def _seg_matrix(te: int, k: int, dtype=jnp.float32):
    """Indicator seg[e, r] = 1 if edge-row e belongs to local receiver r.

    Built with mul/compare only — integer division is slow on the VPU.
    seg[e, r] = (0 <= e - r*k < k).
    """
    t = te // k
    rows = jax.lax.broadcasted_iota(jnp.int32, (te, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (te, t), 1) * k
    delta = rows - cols
    return ((delta >= 0) & (delta < k)).astype(dtype)


def _slot_column(te: int, k: int):
    """slot[e] = e mod k as an [te, 1] i32 column, div-free."""
    t = te // k
    rows = jax.lax.broadcasted_iota(jnp.int32, (te, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (te, t), 1) * k
    delta = rows - cols
    inband = (delta >= 0) & (delta < k)
    return jnp.sum(jnp.where(inband, delta, 0), axis=1, keepdims=True)


def _recompute(e, xj, proji_b, we, be, w2, b2):
    """Shared forward math: returns (h, a, o) for [TE, ...] blocks.

    Weights arrive f32 (master copies); they are cast to the activation
    dtype so bf16 activations use bf16 MXU passes with f32 accumulation.
    """
    dt = e.dtype
    h = (
        jnp.dot(e, we.astype(dt), preferred_element_type=jnp.float32, precision=_PRECISION)
        + xj.astype(jnp.float32)
        + proji_b
        + be
    )
    a = jnp.maximum(h, 0.0).astype(dt)
    o = jnp.dot(a, w2.astype(dt), preferred_element_type=jnp.float32, precision=_PRECISION) + b2
    return h, a, o


def _ln_stats(o):
    # moments in f32 regardless of activation dtype
    o = o.astype(jnp.float32)
    mu = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return (o - mu) * inv, inv


def _edge_mask(seg, deg_col, te, k):
    """mask[e, 1] = slot(e) < degree(receiver(e)); computed in-kernel from
    the tiny per-receiver degree vector (the [TE, 1] mask array in HBM
    would cost as much traffic as the edge tensor itself due to lane
    padding)."""
    deg_b = jnp.dot(seg, deg_col, preferred_element_type=jnp.float32, precision=_PRECISION)
    slot = _slot_column(te, k).astype(jnp.float32)
    return (slot < deg_b).astype(jnp.float32)


def _fwd_kernel(
    k,  # static neighbor-slot count (baked via functools.partial)
    e_ref, xj_ref, proji_ref, deg_ref,
    we_ref, be_ref, w2_ref, b2_ref, lns_ref, lnb_ref,
    new_e_ref, agg_ref,
):
    te = e_ref.shape[0]
    seg = _seg_matrix(te, k)
    mask = _edge_mask(seg, deg_ref[:], te, k)
    proji_b = jnp.dot(seg, proji_ref[:], preferred_element_type=jnp.float32, precision=_PRECISION)
    h, a, o = _recompute(e_ref[:], xj_ref[:], proji_b, we_ref[:], be_ref[:], w2_ref[:], b2_ref[:])
    xhat, _ = _ln_stats(o)
    msg = ((xhat * lns_ref[:] + lnb_ref[:]) * mask).astype(e_ref.dtype)
    new_e_ref[:] = e_ref[:] + msg
    agg_ref[:] = jnp.dot(
        seg.astype(e_ref.dtype).T, msg, preferred_element_type=jnp.float32,
        precision=_PRECISION,
    ).astype(agg_ref.dtype)


def _bwd_kernel(
    k,
    e_ref, xj_ref, proji_ref, deg_ref,
    we_ref, be_ref, w2_ref, b2_ref, lns_ref, lnb_ref,
    g_new_ref, g_agg_ref,
    g_e_ref, g_xj_ref, g_proji_ref,
    g_we_ref, g_be_ref, g_w2_ref, g_b2_ref, g_lns_ref, g_lnb_ref,
):
    te = e_ref.shape[0]
    seg = _seg_matrix(te, k)
    mask = _edge_mask(seg, deg_ref[:], te, k)
    proji_b = jnp.dot(seg, proji_ref[:], preferred_element_type=jnp.float32, precision=_PRECISION)
    e = e_ref[:]
    h, a, o = _recompute(e, xj_ref[:], proji_b, we_ref[:], be_ref[:], w2_ref[:], b2_ref[:])
    xhat, inv = _ln_stats(o)

    g_msg = (
        g_new_ref[:].astype(jnp.float32)
        + jnp.dot(
            seg, g_agg_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32, precision=_PRECISION,
        )
    ) * mask
    g_xhat = g_msg * lns_ref[:]
    g_o = inv * (
        g_xhat
        - xhat * jnp.mean(g_xhat * xhat, axis=-1, keepdims=True)
        - jnp.mean(g_xhat, axis=-1, keepdims=True)
    )
    g_a = jnp.dot(g_o, w2_ref[:].T, preferred_element_type=jnp.float32, precision=_PRECISION)
    g_h = jnp.where(h > 0, g_a, 0.0)

    g_e_ref[:] = (
        g_new_ref[:].astype(jnp.float32)
        + jnp.dot(g_h, we_ref[:].T, preferred_element_type=jnp.float32,
                  precision=_PRECISION)
    ).astype(g_e_ref.dtype)
    g_xj_ref[:] = g_h.astype(g_xj_ref.dtype)
    g_proji_ref[:] = jnp.dot(
        seg.T, g_h, preferred_element_type=jnp.float32, precision=_PRECISION
    ).astype(g_proji_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        g_we_ref[:] = jnp.zeros_like(g_we_ref)
        g_be_ref[:] = jnp.zeros_like(g_be_ref)
        g_w2_ref[:] = jnp.zeros_like(g_w2_ref)
        g_b2_ref[:] = jnp.zeros_like(g_b2_ref)
        g_lns_ref[:] = jnp.zeros_like(g_lns_ref)
        g_lnb_ref[:] = jnp.zeros_like(g_lnb_ref)

    g_we_ref[:] += jnp.dot(
        e.astype(jnp.float32).T, g_h, preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )
    g_be_ref[:] += jnp.sum(g_h, axis=0, keepdims=True)
    g_w2_ref[:] += jnp.dot(
        a.astype(jnp.float32).T, g_o, preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )
    g_b2_ref[:] += jnp.sum(g_o, axis=0, keepdims=True)
    g_lns_ref[:] += jnp.sum(g_msg * xhat, axis=0, keepdims=True)
    g_lnb_ref[:] += jnp.sum(g_msg, axis=0, keepdims=True)


def _check_shapes(e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb, k):
    te_total, d = e.shape
    h = we.shape[1]
    r = te_total // k
    assert te_total == r * k
    assert xj.shape == (te_total, h), (xj.shape, (te_total, h))
    assert proj_i.shape == (r, h)
    assert degrees.shape == (r, 1), degrees.shape
    assert we.shape == (d, h) and w2.shape == (h, d)
    assert be.shape == (h,) and b2.shape == (d,)
    assert lns.shape == (d,) and lnb.shape == (d,)
    return r, d, h


def _tile_receivers(r: int, k: int, d: int, bwd: bool = False) -> int:
    """Receivers per tile: edge-rows TE = T*K, budgeted so that the edge
    blocks plus the kernel's recomputed intermediates fit VMEM (physical
    lanes pad d to 128; the backward holds ~3x more live tensors)."""
    d_pad = -(-d // 128) * 128
    bytes_per_recv = 4 * k * d_pad
    budget_bytes = (2 * 1024 * 1024) if bwd else (8 * 1024 * 1024)
    budget = max(1, budget_bytes // bytes_per_recv)
    t = 512
    while t > 1 and (r % t or t > budget or (t * k) % 8):
        t //= 2
    if r % t or (t * k) % 8:
        raise ValueError(
            f"receiver count {r} with K={k} not tileable; pad receivers"
        )
    return t


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_edge_block(e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb, k, interpret=False):
    """Forward. e/xj: [R*K, D|H] receiver-major flat edges; proj_i: [R, H];
    degrees: [R, 1] f32 — valid-slot count per receiver (slots are
    compacted to the row prefix by the neighbor search, so the per-edge
    mask is slot < degree). Returns (new_e [R*K, D], agg [R, D])."""
    out, _ = _fused_fwd(e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb, k, interpret)
    return out


def _row_spec(shape):
    return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1))


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


def _common_specs(t, k, d, h):
    return [
        _row_spec((t * k, d)),   # e
        _row_spec((t * k, h)),   # xj
        _row_spec((t, h)),       # proj_i
        _row_spec((t, 1)),       # degrees
        _full_spec((d, h)),
        _full_spec((1, h)),
        _full_spec((h, d)),
        _full_spec((1, d)),
        _full_spec((1, d)),
        _full_spec((1, d)),
    ]


def _call_fwd(e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb, k, interpret):
    r, d, h = _check_shapes(e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb, k)
    t = _tile_receivers(r, k, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k),
        grid=(r // t,),
        in_specs=_common_specs(t, k, d, h),
        out_specs=(_row_spec((t * k, d)), _row_spec((t, d))),
        out_shape=(
            jax.ShapeDtypeStruct((r * k, d), e.dtype),
            jax.ShapeDtypeStruct((r, d), e.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        e, xj, proj_i, degrees, we, be[None], w2, b2[None], lns[None], lnb[None],
    )


def _fused_fwd(e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb, k, interpret):
    out = _call_fwd(e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb, k, interpret)
    residuals = (e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb)
    return out, residuals


def _fused_bwd(k, interpret, residuals, cotangents):
    e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb = residuals
    g_new, g_agg = cotangents
    r, d, h = _check_shapes(e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb, k)
    t = _tile_receivers(r, k, d, bwd=True)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, k),
        grid=(r // t,),
        in_specs=_common_specs(t, k, d, h)
        + [_row_spec((t * k, d)), _row_spec((t, d))],
        out_specs=(
            _row_spec((t * k, d)),
            _row_spec((t * k, h)),
            _row_spec((t, h)),
            _full_spec((d, h)),
            _full_spec((1, h)),
            _full_spec((h, d)),
            _full_spec((1, d)),
            _full_spec((1, d)),
            _full_spec((1, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r * k, d), e.dtype),
            jax.ShapeDtypeStruct((r * k, h), e.dtype),
            jax.ShapeDtypeStruct((r, h), e.dtype),
            jax.ShapeDtypeStruct((d, h), we.dtype),
            jax.ShapeDtypeStruct((1, h), be.dtype),
            jax.ShapeDtypeStruct((h, d), w2.dtype),
            jax.ShapeDtypeStruct((1, d), b2.dtype),
            jax.ShapeDtypeStruct((1, d), lns.dtype),
            jax.ShapeDtypeStruct((1, d), lnb.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        e, xj, proj_i, degrees, we, be[None], w2, b2[None], lns[None], lnb[None],
        g_new, g_agg,
    )
    g_e, g_xj, g_proji, g_we, g_be, g_w2, g_b2, g_lns, g_lnb = outs
    return (
        g_e, g_xj, g_proji, None,
        g_we, g_be[0], g_w2, g_b2[0], g_lns[0], g_lnb[0],
    )


fused_edge_block.defvjp(_fused_fwd, _fused_bwd)


def fused_edge_block_reference(
    e, xj, proj_i, degrees, we, be, w2, b2, lns, lnb, k
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-jnp reference of the fused block (test oracle + CPU fallback)."""
    r = proj_i.shape[0]
    d = e.shape[-1]
    slot = jnp.tile(jnp.arange(k), r)[:, None].astype(jnp.float32)
    mask = (slot < jnp.repeat(degrees, k, axis=0)).astype(e.dtype)
    proji_b = jnp.repeat(proj_i, k, axis=0)
    h = jnp.dot(e, we) + xj + proji_b + be
    a = jnp.maximum(h, 0.0)
    o = jnp.dot(a, w2) + b2
    mu = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=-1, keepdims=True)
    xhat = (o - mu) * jax.lax.rsqrt(var + _LN_EPS)
    msg = (xhat * lns + lnb) * mask
    new_e = e + msg
    agg = jnp.sum(msg.reshape(r, k, d), axis=1)
    return new_e, agg
