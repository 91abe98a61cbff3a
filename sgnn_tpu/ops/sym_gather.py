"""Row gather with a gather-based (scatter-free) transpose.

XLA differentiates `table[idx]` into a scatter-add, which on TPU runs
several times slower than a gather. For **symmetric** graphs (radius
graphs whose neighbor cap never binds — guaranteed when the dataset's
max degree <= neighbor_slots), the transpose has closed form: the edges
in which node v is the *sender* are exactly the reverses of v's own
incoming edges, so

    (d table)[v] = sum_k cot[reverse_edge_position(v, k)]

which is a dense gather + masked sum over the node's own K slots.

`reverse_edge_positions` builds the reverse index once per step from the
neighbor list itself (cost: one K-wide row gather + a KxK compare — tiny
next to the five per-layer scatters it eliminates).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def reverse_edge_positions(
    senders: jnp.ndarray,  # [R, K] global flat sender indices
    mask: jnp.ndarray,  # [R, K] bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each edge (sender j -> receiver i) at slot (i, k), find the flat
    position of the reverse edge (i -> j) in j's row.

    Returns (rev_pos [R, K] int32 flat edge positions, rev_ok [R, K]).
    For a symmetric, uncapped graph rev_ok == mask; callers may assert.
    """
    r, k = senders.shape
    # 2D formulation: the naive [R, K, K] form (gather senders-of-senders
    # and mask as 3D tensors) pays ~1 ms/step of layout copies on TPU
    # (minor dims of K force T(8,128) relayouts). Instead pack validity
    # into the sender table as -1 (node ids are >= 0, so an invalid slot
    # can never equal a receiver id) and do ONE flat [R*K, K] row gather.
    flat_s = senders.reshape(-1)  # [R*K]
    packed = jnp.where(mask, senders, -1)
    sos = packed[flat_s]  # [R*K, K] — valid senders of each edge's sender
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, k), 0).reshape(-1, 1)
    hit = sos == rows  # [R*K, K]
    kp = jnp.argmax(hit, axis=-1).astype(jnp.int32)  # first match slot
    rev_ok = (jnp.any(hit, axis=-1) & mask.reshape(-1)).reshape(r, k)
    rev_pos = (flat_s * k + kp).reshape(r, k)
    rev_pos = jnp.where(rev_ok, rev_pos, 0)
    return rev_pos, rev_ok


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def packed_sym_gather(aux, proj, senders, mask, out_dtype=None):
    """ONE row gather serving three consumers of the same sender indices.

    On TPU, XLA's row gather costs ~3 ns/row regardless of row width (up
    to >=128 lanes), so three separate gathers at the same [M*K] indices
    — sender positions for edge features, the senders-of-senders table
    for the reverse-edge index, and the first layer's sender projections
    — cost 3x what one packed gather does. This op concatenates them into
    one f32 table [aux | bitcast(packed senders) | proj] and gathers once
    (the int32 columns ride as bitcast f32 lanes; a gather is a bit copy).

    Args:
      aux: f32[M, A] per-node columns consumed WITHOUT gradient (positions
        feeding edge features). Treated as a constant by the VJP — correct
        for training/rollout, which never differentiate positions; use the
        unfused path if you need position gradients.
      proj: f32[M, H] differentiable sender projections.
      senders: int32[M, K] neighbor lists (padded slots = own index).
      mask: bool[M, K] edge validity.
      out_dtype: dtype of the returned xj (default proj's). Casting after
        the gather equals casting before it (a gather is a copy), so bf16
        consumers see the exact values the unfused cast-then-gather path
        produced; the VJP likewise mirrors the unfused path's
        bf16-sum-then-f32-cast cotangent chain.

    Returns:
      g_aux: f32[M*K, A] gathered aux columns.
      xj: [M*K, H] gathered projections, in out_dtype.
      rev_pos: int32[M, K], rev_ok: bool[M, K] — the reverse-edge index
        (identical to ``reverse_edge_positions(senders, mask)``), reused
        by later layers' sym_gather calls.

    VJP (valid for symmetric, uncapped graphs, same precondition as
    sym_gather): d_proj[v] = sum_k d_xj[rev_pos[v, k]] masked.
    """
    out, _ = _packed_fwd_impl(aux, proj, senders, mask, out_dtype)
    return out


def _packed_fwd_impl(aux, proj, senders, mask, out_dtype):
    m, k = senders.shape
    a = aux.shape[1]
    dt = out_dtype or proj.dtype
    packed = jnp.where(mask, senders, -1)
    table = jnp.concatenate(
        [
            aux,
            jax.lax.bitcast_convert_type(packed, jnp.float32),
            proj.astype(jnp.float32),
        ],
        axis=1,
    )
    flat_s = senders.reshape(-1)
    g = table[flat_s]  # [M*K, A + K + H] — the one gather
    g_aux = g[:, :a]
    sos = jax.lax.bitcast_convert_type(g[:, a : a + k], jnp.int32)
    xj = g[:, a + k :].astype(dt)
    # reverse-edge index from the gathered senders-of-senders (same math
    # as reverse_edge_positions, minus its separate gather)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, k), 0).reshape(-1, 1)
    hit = sos == rows
    kp = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    rev_ok = (jnp.any(hit, axis=-1) & mask.reshape(-1)).reshape(m, k)
    rev_pos = jnp.where(rev_ok, (flat_s * k + kp).reshape(m, k), 0)
    # zero-size sentinel carries proj's dtype through the residuals
    return (g_aux, xj, rev_pos, rev_ok), (rev_pos, rev_ok, jnp.zeros((0,), proj.dtype))


def _packed_sym_gather_fwd(aux, proj, senders, mask, out_dtype):
    return _packed_fwd_impl(aux, proj, senders, mask, out_dtype)


# XLA's TPU row-gather cost grows with the TABLE's row count (~1.5 ns/row
# at 38k rows -> 8 ns/row at 614k; independent of row bytes and of index
# locality — BASELINE.md capacity sweep). Above this edge count, gather
# from a row-packed view of the table: P rows fused into one wide row
# cuts table rows Px for one extra select pass over the gathered block.
_PACK_GATHER_MIN_ROWS = 500_000
_PACK = 4


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx] for 2D tables, routing huge tables via row-packing.

    Returns table[idx] exactly; for tables with >= ~500k rows the gather
    runs against a [rows/P, P*H] reshape (P=4) whose per-row cost is far
    lower, followed by a sub-row select. Requires rows % P == 0 to pack
    (falls back to the plain gather otherwise).
    """
    rows, h = table.shape
    flat = idx.reshape(-1)
    # Measured window (BASELINE.md capacity sweep): P=4 wins at 614k
    # rows (+24% on the N=76k step) but LOSES at 3M rows (both P=4 and
    # P=8 — the packed table is still in the slow-gather regime there
    # and the select/repack overhead is pure cost), so packing engages
    # only up to 1.2M rows, i.e. while the P=4 packed view stays under
    # ~300k rows.
    pack = _PACK if _PACK_GATHER_MIN_ROWS <= rows <= 1_200_000 else 1
    if pack == 1 or rows % pack:
        out = table[flat]
    else:
        packed = table.reshape(rows // pack, pack * h)
        g = packed[flat // pack]  # [E, P*H]
        sub = (flat % pack)[:, None]
        out = jnp.zeros((flat.shape[0], h), table.dtype)
        for p in range(pack):
            out = out + jnp.where(
                sub == p, g[:, p * h : (p + 1) * h], jnp.zeros((), table.dtype)
            )
    return out.reshape(idx.shape + (h,))


def _slot_reduce_dot(x3d: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """[R, K, H] -> [R, H] slot sum as a two-dim-contraction identity dot.

    XLA lowers the straight jnp.sum of a bf16 operand with a convert
    materialization (+ possible relayout); the dot accumulates f32 on
    the MXU reading the operand in place (identity products are exact;
    only the summation ORDER differs from a sequential reduce).
    """
    r, k, h = x3d.shape
    eye3 = jnp.broadcast_to(jnp.eye(h, dtype=x3d.dtype)[None], (k, h, h))
    out = jax.lax.dot_general(
        x3d, eye3, (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def _packed_sym_gather_bwd(out_dtype, res, cots):
    del out_dtype
    rev_pos, rev_ok, proj_sentinel = res
    d_xj = cots[1]
    # same reverse-gather transpose as sym_gather, with the masked slot
    # sum as an identity dot (f32 MXU accumulation, no convert pass).
    # The d_xj.dtype hop mirrors the unfused astype-then-sym_gather
    # chain bit-for-bit (pinned by test_fused_packed_gather_path_exact).
    gathered = gather_rows(d_xj, rev_pos)  # [M, K, H]
    masked = gathered * rev_ok[..., None].astype(d_xj.dtype)
    d_proj = _slot_reduce_dot(masked, d_xj.dtype)
    return None, d_proj.astype(proj_sentinel.dtype), None, None


packed_sym_gather.defvjp(_packed_sym_gather_fwd, _packed_sym_gather_bwd)


@jax.custom_vjp
def sym_gather(table, idx, rev_pos, rev_mask):
    """table[idx] whose VJP gathers via the precomputed reverse index."""
    return table[idx]


def _sym_gather_fwd(table, idx, rev_pos, rev_mask):
    return table[idx], (idx, rev_pos, rev_mask)


def _sym_gather_bwd(res, cot):
    idx, rev_pos, rev_mask = res
    # cot: [E, H]; d_table[v] = sum over v's reverse-edge positions,
    # computed as an identity dot (see _slot_reduce_dot)
    gathered = gather_rows(cot, rev_pos)  # [R, K, H]
    masked = gathered * rev_mask[..., None].astype(cot.dtype)
    return _slot_reduce_dot(masked, cot.dtype), None, None, None


sym_gather.defvjp(_sym_gather_fwd, _sym_gather_bwd)
