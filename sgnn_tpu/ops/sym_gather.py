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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def packed_sym_gather(aux, proj, senders, mask, out_dtype=None, band_nodes=None):
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
      band_nodes: optional static bound on |sender - receiver| (valid for
        spatially sorted node orderings); routes the large-table gathers
        (fwd packed gather, bwd reverse-gather) through the banded path
        (runtime-guarded, exact — see banded_gather_rows).

    Returns:
      g_aux: f32[M*K, A] gathered aux columns.
      xj: [M*K, H] gathered projections, in out_dtype.
      rev_pos: int32[M, K], rev_ok: bool[M, K] — the reverse-edge index
        (identical to ``reverse_edge_positions(senders, mask)``), reused
        by later layers' sym_gather calls.

    VJP (valid for symmetric, uncapped graphs, same precondition as
    sym_gather): d_proj[v] = sum_k d_xj[rev_pos[v, k]] masked.
    """
    out, _ = _packed_fwd_impl(aux, proj, senders, mask, out_dtype, band_nodes)
    return out


def _packed_fwd_impl(aux, proj, senders, mask, out_dtype, band_nodes):
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
    g = _maybe_banded_gather(table, flat_s, band_nodes)  # [M*K, A+K+H]
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


def _packed_sym_gather_fwd(aux, proj, senders, mask, out_dtype, band_nodes):
    return _packed_fwd_impl(aux, proj, senders, mask, out_dtype, band_nodes)


# XLA's TPU row-gather cost grows with the TABLE's row count (~1.5 ns/row
# at 38k rows -> 8 ns/row at 614k; independent of row bytes and of index
# locality — BASELINE.md capacity sweep). Above this edge count, gather
# from a row-packed view of the table: P rows fused into one wide row
# cuts table rows Px for one extra select pass over the gathered block.
_PACK_GATHER_MIN_ROWS = 500_000
_PACK = 4

# Banded gather engages at table row counts where the plain gather has
# left the fast (~1.5 ns/row) regime. scripts/banded_probe.py sweep
# (v5e, bf16 h=64, 20-iter loops incl ~1.4 ms tunnel amortization):
#   307k rows: plain 2.08 ms -> banded 1.89 (tile 2400 nodes)
#   2.46M rows: plain 30.8 ms -> banded 9.52-9.56 (tile 4096-12800 nodes)
# At 307k rows the isolated probe's ~10% win inverts IN CONTEXT (the
# headline bench measured 26.3 -> 28.6 ms with the cond guard, and
# still 30.3 ms without it: the dynamic-slice traffic costs more than
# the modest regime gap when output rows == table rows) — so the
# same-size threshold sits above it, where the gap is multiples, not
# percent. When the gather FANS OUT (out_rows >> table_rows, the
# forward sender gathers at K slots/node), each dynamic slice is
# amortized over K times more output rows, so banded pays off at
# smaller tables — the ratio rule below.
_BANDED_MIN_ROWS = 450_000
_BANDED_MIN_FANOUT_ROWS = 200_000
_BANDED_TILE_ROWS = 32_768
# Compiler ceiling (r4): SINGLE-LEVEL banded gathers on tables past
# ~4M rows deterministically crash this environment's remote TPU
# compile helper (HTTP 500, subprocess exit 1; bisected at 614k nodes
# — the 4.9M-row bwd reverse tables fail at any tile size while the
# 614k-row fwd tables compile fine; the 2.45M-row 307k case compiles).
# banded_gather_rows therefore splits bigger tables into static window
# slices of <= this many rows (the proven-to-compile shape) and runs
# the banded core per chunk — same band contract, same result. The
# ceiling sits just ABOVE the 307k-node reverse tables (2,456,064
# rows, the largest single-level shape proven to compile AND the r3
# measured-fast path) so that case stays single-level.
_BANDED_MAX_ROWS = 2_500_000


def _banded_worth(table_rows: int, out_rows: int) -> bool:
    return table_rows >= _BANDED_MIN_ROWS or (
        table_rows >= _BANDED_MIN_FANOUT_ROWS and out_rows >= 4 * table_rows
    )


def banded_gather_rows(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    band_rows: int,
    tile_rows: Optional[int] = None,
    *,
    map_rows: Optional[int] = None,
    map_offset: int = 0,
) -> jnp.ndarray:
    """Exact ``table[idx]`` exploiting index BANDEDNESS.

    XLA's TPU row-gather cost per output row grows with the *table's* row
    count (BASELINE.md capacity sweep: ~1.5 ns/row at 38k rows, 3.4 at
    307k, 8+ at 614k) — so a gather whose indices are index-local
    (|idx[i] - i*E/R| <= band_rows, true for spatially sorted node
    orderings where neighbors are index-near) can run 3x+ faster by
    scanning over output tiles, dynamic-slicing only the [~tile+2*band]
    window of the table each tile can touch, and gathering from that
    small window (which sits back in the fast regime).

    CORRECTNESS CONTRACT: exact iff the band bound holds. Out-of-window
    indices are clamped into the slice (wrong rows, never OOB), so a
    violated band corrupts values SILENTLY — callers must pair this
    with a band guard on the actual indices (the model paths surface
    `band_violations` through the trainer metrics, mirroring the halo
    guard). An in-op ``lax.cond`` fallback was tried and REVERTED: at
    307k nodes it blew the full train step from 278 ms to 1968 ms (the
    conditional forces materialization + un-fused buffers around every
    314 MB edge-cotangent operand), i.e. the guard cost 7x more than
    the optimization saved.

    Args:
      table: [E, H] rows.
      idx: integer indices, any shape; flattened to R output rows.
      band_rows: static bound on |idx[i] - (i*MR/R + map_offset)| where
        MR = map_rows or E.
      tile_rows: static output tile size (scan step granularity).
      map_rows / map_offset: optional affine index map when the band is
        NOT centered on i*E/R — the graph-partitioned paths gather from
        halo-EXTENDED tables where output row i expects table row
        i//K + halo (fwd senders: map_rows=n_local, map_offset=halo) or
        i - halo*K (bwd reverse-gathers over local edge tables:
        map_rows=R, map_offset=-halo*K). Defaults reproduce the
        single-chip contract exactly.

    Returns table[idx] with shape idx.shape + (H,) (exact under the band
    contract).
    """
    e, h = table.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    r = flat.shape[0]
    tr = min(tile_rows or _BANDED_TILE_ROWS, r)
    # per-tile slice window: covers [start, start + tile span + 2*band]
    slice_rows = (tr * e) // r + 2 * band_rows + 2
    slice_rows = -(-slice_rows // 512) * 512
    mr = map_rows or e
    # exact int32 forms of i*MR//R (i*MR overflows int32 at these
    # scales); every caller has R a multiple of MR (reverse-gathers:
    # R == MR; sender gathers: R == MR*K) or vice versa
    if r % mr == 0:
        q = r // mr
        row_to_table = lambda i: i // q + map_offset
    elif mr % r == 0:
        q = mr // r
        row_to_table = lambda i: i * q + map_offset
    else:
        return table[flat].reshape(idx.shape + (h,))
    if slice_rows >= e:
        return table[flat].reshape(idx.shape + (h,))

    def _core(sub_table, sub_flat, out_base, table_base):
        """Banded scan over one contiguous output chunk.

        Local output row i maps to global output out_base + i; its
        expected table row, LOCAL to sub_table, is
        row_to_table(out_base + i) - table_base.
        """
        e_s, r_s = sub_table.shape[0], sub_flat.shape[0]
        n_tiles = -(-r_s // tr)
        r_pad = n_tiles * tr
        if slice_rows >= e_s or n_tiles <= 1:
            return sub_table[jnp.clip(sub_flat, 0, e_s - 1)]
        idx_pad = jnp.pad(sub_flat, (0, r_pad - r_s))  # pad rows gather 0
        idx_tiles = idx_pad.reshape(n_tiles, tr)
        starts = jnp.clip(
            row_to_table(out_base + jnp.arange(n_tiles, dtype=jnp.int32) * tr)
            - table_base
            - band_rows,
            0,
            e_s - slice_rows,
        )

        def body(_, xs):
            start, it = xs
            sub = jax.lax.dynamic_slice(sub_table, (start, 0), (slice_rows, h))
            # clamp keeps the sub-gather in bounds for pad-row indices
            # (0, below start of later tiles — sliced off below) and for
            # band-contract violations (see docstring: silently wrong
            # there; callers guard via band_violations)
            return None, sub[jnp.clip(it - start, 0, slice_rows - 1)]

        _, out = jax.lax.scan(body, None, (starts, idx_tiles))
        return out.reshape(r_pad, h)[:r_s]

    if e <= _BANDED_MAX_ROWS:
        return _core(table, flat, 0, 0).reshape(idx.shape + (h,))

    # Chunked two-level form (r4): tables past the ~4M-row compiler
    # ceiling are split into static window slices of <= _BANDED_MAX_ROWS
    # rows (plus band overlap), each handled by the proven-to-compile
    # single-level core. Exact under the same band contract: output
    # chunk [lo, hi) can only touch table rows within band of
    # row_to_table([lo, hi)), which the window covers by construction.
    n_chunks = -(-e // _BANDED_MAX_ROWS)
    per_out = -(-r // n_chunks)
    per_out = -(-per_out // tr) * tr  # tile-aligned chunk boundaries
    parts = []
    lo = 0
    while lo < r:
        hi = min(r, lo + per_out)
        t_lo = max(0, int(row_to_table(lo)) - band_rows)
        t_hi = min(e, int(row_to_table(hi - 1)) + band_rows + 2)
        sub = jax.lax.slice_in_dim(table, t_lo, t_hi)
        sub_idx = flat[lo:hi] - t_lo
        parts.append(_core(sub, sub_idx, lo, t_lo))
        lo = hi
    return jnp.concatenate(parts, axis=0).reshape(idx.shape + (h,))


def gather_rows(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    band_rows: Optional[int] = None,
    *,
    map_rows: Optional[int] = None,
    map_offset: int = 0,
) -> jnp.ndarray:
    """table[idx] for 2D tables, routing huge tables via banded tiling
    or row-packing.

    Returns table[idx] exactly. When ``band_rows`` is given and the table
    is large enough to have left the fast-gather regime, the banded
    scan-over-tiles path runs (with its own runtime guard + fallback —
    see banded_gather_rows). Otherwise, for tables with >= ~500k rows the
    gather runs against a [rows/P, P*H] reshape (P=4) whose per-row cost
    is far lower, followed by a sub-row select (requires rows % P == 0).
    """
    rows, h = table.shape
    if band_rows is not None and _banded_worth(rows, int(np.prod(idx.shape))):
        return banded_gather_rows(
            table, idx, band_rows, map_rows=map_rows, map_offset=map_offset
        )
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


def _packed_sym_gather_bwd(out_dtype, band_nodes, res, cots):
    del out_dtype
    rev_pos, rev_ok, proj_sentinel = res
    d_xj = cots[1]
    band = None if band_nodes is None else (band_nodes + 1) * rev_pos.shape[-1]
    # same reverse-gather transpose as sym_gather, with the masked slot
    # sum as an identity dot (f32 MXU accumulation, no convert pass).
    # The d_xj.dtype hop mirrors the unfused astype-then-sym_gather
    # chain bit-for-bit (pinned by test_fused_packed_gather_path_exact).
    gathered = gather_rows(d_xj, rev_pos, band)  # [M, K, H]
    masked = gathered * rev_ok[..., None].astype(d_xj.dtype)
    d_proj = _slot_reduce_dot(masked, d_xj.dtype)
    return None, d_proj.astype(proj_sentinel.dtype), None, None


packed_sym_gather.defvjp(_packed_sym_gather_fwd, _packed_sym_gather_bwd)


def band_violations(
    senders: jnp.ndarray,  # int32[..., K] sender indices, receiver-major rows
    mask: jnp.ndarray,  # bool[..., K]
    band_nodes: int,
    halo: int = 0,
) -> jnp.ndarray:
    """Count neighbor-list entries violating the banded-gather contract.

    Returns an int32 scalar: the number of valid edges with
    |sender - (receiver + halo)| > band_nodes (receiver = row position
    along the second-to-last axis; halo offsets receiver rows into a
    halo-extended sender index space, 0 on single-chip). One check
    covers both banded directions: a zero count implies the forward
    sender-gather band (band_nodes) AND the reverse-gather band
    ((band_nodes + 1) * K) both hold, so every banded_gather_rows in
    the step was exact. Mirrors the edge-partition halo guard: surfaced
    as a metric, near-free to compute.
    """
    k = senders.shape[-1]
    m = senders.shape[-2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, k), 0) + halo
    rows = jnp.broadcast_to(rows, senders.shape)
    dev = jnp.abs(senders - rows)
    return jnp.sum((dev > band_nodes) & mask).astype(jnp.int32)


def _maybe_banded_gather(table, idx, band_nodes, halo=0):
    """Forward sender gather: banded when the node table is large and the
    ordering is declared index-local (idx[i] within band_nodes of
    i//K + halo — the halo offset covers halo-extended per-shard
    tables, see sym_gather)."""
    if band_nodes is not None and _banded_worth(
        table.shape[0], int(np.prod(idx.shape))
    ):
        return banded_gather_rows(
            table, idx, band_nodes,
            map_rows=table.shape[0] - 2 * halo, map_offset=halo,
        )
    return table[idx.reshape(-1)].reshape(idx.shape + (table.shape[-1],))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sym_gather(table, idx, rev_pos, rev_mask, band_nodes=None, halo=0):
    """table[idx] whose VJP gathers via the precomputed reverse index.

    band_nodes: optional static bound on |sender - receiver| (valid for
    spatially sorted node orderings); enables the banded fast path for
    both the forward sender gather and the backward reverse-gather at
    large row counts (see banded_gather_rows — runtime-guarded, exact).

    halo: static left-halo row count when ``table`` is a halo-EXTENDED
    per-shard table (parallel/edge_partition.py): output row i then
    expects table row i//K + halo, and the backward reverse positions
    over the [N_ext, K] row set expect local-edge-table row
    (i - halo*K). 0 reproduces the single-chip band contract exactly.
    """
    return _maybe_banded_gather(table, idx, band_nodes, halo=halo)


def _sym_gather_fwd(table, idx, rev_pos, rev_mask, band_nodes, halo):
    return (
        _maybe_banded_gather(table, idx, band_nodes, halo=halo),
        (idx, rev_pos, rev_mask),
    )


def _sym_gather_bwd(band_nodes, halo, res, cot):
    idx, rev_pos, rev_mask = res
    k = rev_pos.shape[-1]
    band = None if band_nodes is None else (band_nodes + 1) * k
    # cot: [E, H]; d_table[v] = sum over v's reverse-edge positions,
    # computed as an identity dot (see _slot_reduce_dot)
    gathered = gather_rows(
        cot, rev_pos, band,
        map_rows=int(np.prod(rev_pos.shape)), map_offset=-halo * k,
    )  # [R, K, H]
    masked = gathered * rev_mask[..., None].astype(cot.dtype)
    return _slot_reduce_dot(masked, cot.dtype), None, None, None


sym_gather.defvjp(_sym_gather_fwd, _sym_gather_bwd)
