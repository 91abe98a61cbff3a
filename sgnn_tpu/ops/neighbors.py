"""Device-side fixed-radius neighbor search with static shapes.

This replaces the reference's `torch_cluster.radius_graph` native kernel
(used at sgnn/single_scale/learned_simulator.py:116-117 and
sgnn/multi_scale/multi_scale_graph.py:222-227,269-274 of xrkong/sgnn).

TPU-first design notes
----------------------
XLA requires static shapes, so instead of a variable-length COO edge list we
emit a dense **neighbor list**: for every receiver node ``i`` a row of up to
``K`` sender indices plus a validity mask. This exactly matches the
reference's semantics — PyG's ``radius_graph(pos, r, loop, max_num_neighbors)``
caps incoming edges *per receiver* (each query point gets at most
``max_num_neighbors`` neighbors) — while making downstream aggregation a
dense ``[N, K, D] -> [N, D]`` masked sum with **no scatter at all**, which
XLA fuses straight into the edge-MLP matmuls on the MXU.

Reference semantics reproduced here (learned_simulator.py:114-124):
  * strict inequality: an edge exists iff ``dist < r`` (not ``<=``)
  * self loops included when ``include_self=True`` (the reference always
    passes ``loop=True``)
  * per-receiver cap ``K``; when the cap binds we keep the lowest sender
    indices (deterministic — torch_cluster's truncation order is
    backend-dependent, so parity tests only compare configs where the cap
    does not bind, per SURVEY.md §7.3)
  * edge direction: sender = neighbor ``j``, receiver = query ``i``;
    messages aggregate at the receiver.

Two implementations:
  * ``radius_neighbors_bruteforce`` — tiled O(N^2) distance scan. Simple,
    exact, and on TPU actually fast up to ~10^4 particles (a 4797^2 f32
    distance tile stream is nothing for the VPU). Reference oracle for
    tests.
  * ``radius_neighbors_grid`` — uniform-grid cell binning (count-sort by
    cell id, candidate scan over 3^dim neighbor cells). O(N * 3^dim * cap).
    Needs a static spatial domain so cell ids are exact (no hash
    collisions -> no duplicate edges). This is the production path for
    large N / 3D.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# Sentinel: any key >= this is an invalid candidate.
_INF_I32 = jnp.int32(2**31 - 1)


class NeighborList(NamedTuple):
    """Static-shape radius graph: per-receiver padded sender lists.

    Attributes:
      senders: int32[N, K] — sender (neighbor) node index for each slot of
        each receiver row. Padded slots hold the receiver's own index so
        gathers stay in-bounds and produce inert features.
      mask: bool[N, K] — True for real edges.
    """

    senders: jnp.ndarray
    mask: jnp.ndarray

    @property
    def num_nodes(self) -> int:
        return self.senders.shape[0]

    @property
    def max_neighbors(self) -> int:
        return self.senders.shape[1]

    def count_edges(self) -> jnp.ndarray:
        """Total number of real edges (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32))


def _select_k_smallest(keys: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row, keep the k smallest keys (ascending). Returns (values, valid).

    keys: int32[N, C] where invalid candidates hold _INF_I32. Valid keys
    must be unique per row (true for all callers: a candidate is a node
    index appearing in exactly one cell / column).

    For narrow candidate rows this runs k rounds of row-min + mask-out —
    pure VPU compare/select passes, measured ~4x faster on TPU than the
    sort-based lax.top_k it replaces (which bitonic-sorts the whole row).
    Wide rows (bruteforce N-wide scans) keep top_k: k full passes over a
    wide row would cost more than one sort.
    """
    c = keys.shape[-1]
    if keys.shape[-1] < k:
        pad = jnp.full(keys.shape[:-1] + (k - keys.shape[-1],), _INF_I32, keys.dtype)
        keys = jnp.concatenate([keys, pad], axis=-1)
        c = k
    if c <= 256:
        vals = []
        cur = keys
        for _ in range(k):
            m = jnp.min(cur, axis=-1)
            vals.append(m)
            # valid keys are unique, so masking every match removes one
            # candidate; exhausted rows stay at _INF_I32
            cur = jnp.where(cur == m[..., None], _INF_I32, cur)
        vals = jnp.stack(vals, axis=-1)
    else:
        # top_k finds largest, so negate. Valid keys are < _INF_I32.
        neg_topk, _ = jax.lax.top_k(-keys, k)
        vals = -neg_topk  # ascending k smallest
    valid = vals < _INF_I32
    return vals, valid


def _finalize(keys: jnp.ndarray, k: int) -> NeighborList:
    """Compact candidate keys [N, C] into a NeighborList with K slots."""
    n = keys.shape[0]
    senders, mask = _select_k_smallest(keys, k)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)
    senders = jnp.where(mask, senders, row_ids)
    return NeighborList(senders=senders.astype(jnp.int32), mask=mask)


@functools.partial(
    jax.jit, static_argnames=("max_neighbors", "include_self", "strict", "tile")
)
def radius_neighbors_bruteforce(
    positions: jnp.ndarray,
    radius: float,
    *,
    max_neighbors: int = 20,
    include_self: bool = True,
    node_mask: Optional[jnp.ndarray] = None,
    strict: bool = True,
    tile: int = 1024,
) -> NeighborList:
    """O(N^2) radius search via tiled distance scan.

    Args:
      positions: f32[N, dim] particle positions.
      radius: connectivity radius (edge iff dist < radius when strict).
      max_neighbors: per-receiver cap K (reference: 20 single-scale, 24
        multi-scale).
      include_self: include the self edge (reference always does).
      node_mask: optional bool[N]; False rows are excluded as both senders
        and receivers (used for padded particles).
      strict: use ``dist < r`` (reference semantics); else ``<=``.
      tile: receiver tile size for the scan (memory/latency tradeoff).
    """
    n, _ = positions.shape
    r2 = jnp.asarray(radius, positions.dtype) ** 2
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    num_tiles = -(-n // tile)
    pad_n = num_tiles * tile
    pos_pad = jnp.pad(positions, ((0, pad_n - n), (0, 0)))
    rmask_pad = jnp.pad(node_mask, (0, pad_n - n))

    def scan_tile(carry, idx):
        del carry
        start = idx * tile
        q = jax.lax.dynamic_slice_in_dim(pos_pad, start, tile)  # [T, dim]
        qmask = jax.lax.dynamic_slice_in_dim(rmask_pad, start, tile)
        d = q[:, None, :] - positions[None, :, :]  # [T, N, dim]
        d2 = jnp.sum(d * d, axis=-1)
        within = (d2 < r2) if strict else (d2 <= r2)
        row_ids = start + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        valid = within & node_mask[None, :] & qmask[:, None]
        if not include_self:
            valid &= col_ids != row_ids
        keys = jnp.where(valid, col_ids, _INF_I32)  # [T, N]
        vals, vmask = _select_k_smallest(keys, max_neighbors)
        return None, (vals, vmask)

    _, (vals, vmask) = jax.lax.scan(
        scan_tile, None, jnp.arange(num_tiles, dtype=jnp.int32)
    )
    vals = vals.reshape(pad_n, max_neighbors)[:n]
    vmask = vmask.reshape(pad_n, max_neighbors)[:n]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, max_neighbors), 0)
    senders = jnp.where(vmask, vals, row_ids).astype(jnp.int32)
    return NeighborList(senders=senders, mask=vmask)


def _cell_grid_shape(
    domain_min: Sequence[float], domain_max: Sequence[float], cell_size: float
) -> Tuple[int, ...]:
    return tuple(
        max(1, int(math.ceil((hi - lo) / cell_size)))
        for lo, hi in zip(domain_min, domain_max)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius",  # cell-grid shape derives from it
        "max_neighbors",
        "include_self",
        "strict",
        "domain_min",
        "domain_max",
        "cell_capacity",
    ),
)
def radius_neighbors_grid(
    positions: jnp.ndarray,
    radius: float,
    *,
    domain_min: Tuple[float, ...],
    domain_max: Tuple[float, ...],
    max_neighbors: int = 20,
    include_self: bool = True,
    node_mask: Optional[jnp.ndarray] = None,
    strict: bool = True,
    cell_capacity: int = 8,
) -> NeighborList:
    """Uniform-grid cell-list radius search, O(N * 3^dim * cell_capacity).

    Bins particles into cells of side ``radius`` over a *static* domain
    (exact dense cell ids — no hashing, so no collision-induced duplicate
    edges). Particles are count-sorted by cell id; each receiver scans the
    3^dim adjacent cells, reading up to ``cell_capacity`` occupants per cell.

    The domain must contain all particles (positions are clipped into it;
    out-of-domain particles would alias into border cells, which keeps
    shapes valid but can create spurious long edges — callers should size
    the domain generously). ``cell_capacity`` must be >= the max particle
    count of any cell or neighbors are silently dropped; with cell side =
    radius and physical particle spacing h, capacity ~ (radius/h + 1)^dim
    is safe for near-uniform media.
    """
    n, dim = positions.shape
    grid_shape = _cell_grid_shape(domain_min, domain_max, radius)
    num_cells = math.prod(grid_shape)
    lo = jnp.asarray(domain_min, positions.dtype)
    cell = jnp.asarray(radius, positions.dtype)
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)

    # --- bin particles -----------------------------------------------------
    coords = jnp.floor((positions - lo) / cell).astype(jnp.int32)
    coords = jnp.clip(coords, 0, jnp.asarray(grid_shape, jnp.int32) - 1)
    # Row-major flat cell id.
    strides = []
    acc = 1
    for s in reversed(grid_shape):
        strides.append(acc)
        acc *= s
    strides = jnp.asarray(list(reversed(strides)), jnp.int32)
    cid = jnp.sum(coords * strides[None, :], axis=-1)
    # Masked-out particles go to a virtual overflow cell so they never match.
    cid = jnp.where(node_mask, cid, num_cells)

    order = jnp.argsort(cid)  # stable -> within-cell order is by index
    sorted_cid = cid[order]
    # Bucket starts via histogram + exclusive cumsum (static num_cells+1).
    counts = jnp.zeros((num_cells + 2,), jnp.int32).at[sorted_cid].add(1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )  # starts[c] = first sorted slot of cell c; starts[c+1] = end

    # --- candidate scan ----------------------------------------------------
    offsets = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2, dtype=jnp.int32)] * dim), indexing="ij"),
        axis=-1,
    ).reshape(-1, dim)  # [3^dim, dim]
    n_off = offsets.shape[0]

    nbr_coords = coords[:, None, :] + offsets[None, :, :]  # [N, 3^dim, dim]
    in_bounds = jnp.all(
        (nbr_coords >= 0) & (nbr_coords < jnp.asarray(grid_shape, jnp.int32)),
        axis=-1,
    )
    nbr_cid = jnp.sum(
        jnp.clip(nbr_coords, 0, jnp.asarray(grid_shape, jnp.int32) - 1)
        * strides[None, None, :],
        axis=-1,
    )
    nbr_cid = jnp.where(in_bounds, nbr_cid, num_cells + 1)  # empty bucket

    c_start = starts[nbr_cid]  # [N, 3^dim]
    c_end = starts[nbr_cid + 1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, n_off, cell_capacity), 2)
    cand_sorted_pos = c_start[:, :, None] + slot  # [N, 3^dim, cap]
    cand_valid = cand_sorted_pos < c_end[:, :, None]
    cand_sorted_pos = jnp.clip(cand_sorted_pos, 0, n - 1)
    cand_idx = order[cand_sorted_pos]  # original particle index

    # --- distance filter + compaction -------------------------------------
    cand_idx_flat = cand_idx.reshape(n, n_off * cell_capacity)
    cand_valid_flat = cand_valid.reshape(n, n_off * cell_capacity)
    cand_pos = positions[cand_idx_flat]  # [N, C, dim]
    d = cand_pos - positions[:, None, :]
    d2 = jnp.sum(d * d, axis=-1)
    r2 = jnp.asarray(radius, positions.dtype) ** 2
    within = (d2 < r2) if strict else (d2 <= r2)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, cand_idx_flat.shape, 0)
    valid = cand_valid_flat & within & node_mask[:, None]
    if not include_self:
        valid &= cand_idx_flat != row_ids
    keys = jnp.where(valid, cand_idx_flat, _INF_I32)
    return _finalize(keys, max_neighbors)


def radius_neighbors(
    positions: jnp.ndarray,
    radius: float,
    *,
    max_neighbors: int = 20,
    include_self: bool = True,
    node_mask: Optional[jnp.ndarray] = None,
    strict: bool = True,
    domain: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None,
    method: str = "auto",
    cell_capacity: int = 8,
) -> NeighborList:
    """Dispatching front door for radius search.

    method: 'auto' | 'bruteforce' | 'grid'. 'auto' picks grid when a domain
    is provided and N is large enough to pay for binning. ``cell_capacity``
    applies to the grid path only (see radius_neighbors_grid).
    """
    n = positions.shape[0]
    if method == "auto":
        # Grid wins whenever a domain is known (measured 19x at N=4797 on
        # TPU v5e); bruteforce remains for domain-free small inputs/tests.
        method = "grid" if domain is not None else "bruteforce"
    if method == "grid":
        if domain is None:
            raise ValueError("grid method requires a static `domain=(min, max)`")
        return radius_neighbors_grid(
            positions,
            radius,
            domain_min=tuple(domain[0]),
            domain_max=tuple(domain[1]),
            max_neighbors=max_neighbors,
            include_self=include_self,
            node_mask=node_mask,
            strict=strict,
            cell_capacity=cell_capacity,
        )
    return radius_neighbors_bruteforce(
        positions,
        radius,
        max_neighbors=max_neighbors,
        include_self=include_self,
        node_mask=node_mask,
        strict=strict,
    )


def neighbor_list_to_coo(
    nl: NeighborList,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flatten a NeighborList into padded COO (senders, receivers, mask).

    Receivers come out sorted (row-major flatten), which downstream
    segment-sums exploit via ``indices_are_sorted``.
    """
    n, k = nl.senders.shape
    receivers = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0).reshape(-1)
    return nl.senders.reshape(-1), receivers, nl.mask.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius",
        "max_neighbors",
        "include_self",
        "strict",
        "domain_min",
        "domain_max",
        "cell_capacity",
    ),
)
def radius_neighbors_grid_batched(
    positions: jnp.ndarray,  # [B, N, dim]
    radius: float,
    *,
    domain_min: Tuple[float, ...],
    domain_max: Tuple[float, ...],
    max_neighbors: int = 20,
    include_self: bool = True,
    node_mask: Optional[jnp.ndarray] = None,  # [B, N]
    strict: bool = True,
    cell_capacity: int = 8,
) -> NeighborList:
    """Batched grid search over a block-diagonal flat graph.

    Equivalent to vmapping radius_neighbors_grid per graph, but runs the
    whole batch as ONE flat problem (per-graph cell-id offsets prevent
    cross-graph edges). All gathers are flat — measured 2-3x faster than
    their vmapped forms on TPU v5e, which lowers batched gathers poorly.

    Returned senders are **global flat indices into [B*N]** (exactly what
    the block-diagonal model path consumes); mask/senders have shape
    [B*N, K].
    """
    b, n, dim = positions.shape
    grid_shape = _cell_grid_shape(domain_min, domain_max, radius)
    num_cells = math.prod(grid_shape)
    lo = jnp.asarray(domain_min, positions.dtype)
    cell = jnp.asarray(radius, positions.dtype)
    if node_mask is None:
        node_mask = jnp.ones((b, n), dtype=bool)
    flat_pos = positions.reshape(b * n, dim)
    flat_mask = node_mask.reshape(b * n)

    coords = jnp.floor((positions - lo) / cell).astype(jnp.int32)
    coords = jnp.clip(coords, 0, jnp.asarray(grid_shape, jnp.int32) - 1)
    strides = []
    acc = 1
    for s in reversed(grid_shape):
        strides.append(acc)
        acc *= s
    strides = jnp.asarray(list(reversed(strides)), jnp.int32)
    cid = jnp.sum(coords * strides[None, None, :], axis=-1)  # [B, N]
    batch_off = jnp.arange(b, dtype=jnp.int32)[:, None] * num_cells
    cid = (cid + batch_off).reshape(b * n)
    total_cells = b * num_cells
    cid = jnp.where(flat_mask, cid, total_cells)

    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    counts = jnp.zeros((total_cells + 2,), jnp.int32).at[sorted_cid].add(1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    offsets = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2, dtype=jnp.int32)] * dim), indexing="ij"),
        axis=-1,
    ).reshape(-1, dim)
    n_off = offsets.shape[0]

    nbr_coords = coords.reshape(b * n, 1, dim) + offsets[None, :, :]
    in_bounds = jnp.all(
        (nbr_coords >= 0) & (nbr_coords < jnp.asarray(grid_shape, jnp.int32)), axis=-1
    )
    nbr_cid = jnp.sum(
        jnp.clip(nbr_coords, 0, jnp.asarray(grid_shape, jnp.int32) - 1)
        * strides[None, None, :],
        axis=-1,
    ) + jnp.repeat(batch_off.reshape(b), n)[:, None]
    nbr_cid = jnp.where(in_bounds, nbr_cid, total_cells + 1)

    c_start = starts[nbr_cid]
    c_end = starts[nbr_cid + 1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (b * n, n_off, cell_capacity), 2)
    cand_sorted_pos = c_start[:, :, None] + slot
    cand_valid = cand_sorted_pos < c_end[:, :, None]
    cand_sorted_pos = jnp.clip(cand_sorted_pos, 0, b * n - 1)
    cand_idx = order[cand_sorted_pos].reshape(b * n, n_off * cell_capacity)
    cand_valid = cand_valid.reshape(b * n, n_off * cell_capacity)

    cand_pos = flat_pos[cand_idx]
    d = cand_pos - flat_pos[:, None, :]
    d2 = jnp.sum(d * d, axis=-1)
    r2 = jnp.asarray(radius, positions.dtype) ** 2
    within = (d2 < r2) if strict else (d2 <= r2)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, cand_idx.shape, 0)
    valid = cand_valid & within & flat_mask[:, None]
    if not include_self:
        valid &= cand_idx != row_ids
    keys = jnp.where(valid, cand_idx, _INF_I32)
    return _finalize(keys, max_neighbors)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius",
        "max_neighbors",
        "include_self",
        "strict",
        "domain_min",
        "domain_max",
        "cell_capacity",
    ),
)
def radius_neighbors_celltable(
    positions: jnp.ndarray,  # [B, N, dim]
    radius: float,
    *,
    domain_min: Tuple[float, ...],
    domain_max: Tuple[float, ...],
    max_neighbors: int = 20,
    include_self: bool = True,
    node_mask: Optional[jnp.ndarray] = None,  # [B, N]
    strict: bool = True,
    cell_capacity: int = 8,
) -> NeighborList:
    """Batched cell-TABLE radius search — the TPU-fast production path.

    Same semantics/returns as radius_neighbors_grid_batched (global flat
    senders over the block-diagonal batch), but instead of per-candidate
    element gathers it materializes a dense per-cell table holding each
    occupant's position AND index as float rows, so fetching a node's
    3^dim candidate cells is a contiguous ROW gather ([B*N*3^dim] rows of
    cell_capacity*(dim+1) floats). Measured ~2x faster overall than the
    sorted-bucket variant on v5e (element gathers were 80% of its time).

    Node indices ride in a float channel — exact for B*N < 2^24.
    """
    b, n, dim = positions.shape
    if b * n >= (1 << 24):
        raise ValueError("celltable path requires B*N < 2^24 (float index channel)")
    grid_shape = _cell_grid_shape(domain_min, domain_max, radius)
    num_cells = math.prod(grid_shape)
    total = b * num_cells
    lo = jnp.asarray(domain_min, positions.dtype)
    if node_mask is None:
        node_mask = jnp.ones((b, n), dtype=bool)
    flat_pos = positions.reshape(b * n, dim)
    flat_mask = node_mask.reshape(b * n)

    coords = jnp.floor((positions - lo) / radius).astype(jnp.int32)
    coords = jnp.clip(coords, 0, jnp.asarray(grid_shape, jnp.int32) - 1)
    strides = []
    acc = 1
    for s in reversed(grid_shape):
        strides.append(acc)
        acc *= s
    strides = jnp.asarray(list(reversed(strides)), jnp.int32)
    batch_off = jnp.arange(b, dtype=jnp.int32)[:, None] * num_cells
    # Table row layout: [0..total-1] real cells, [total..total+2] inf
    # guard rows (gather sentinels — three consecutive so the row-TRIPLE
    # path below has an all-inert window), [total+3] the masked/overflow
    # cell (absorbs writes, never gathered).
    masked_row = total + 3
    cid = (jnp.sum(coords * strides[None, None, :], axis=-1) + batch_off).reshape(-1)
    cid = jnp.where(flat_mask, cid, masked_row)  # masked -> overflow cell

    # --- build the dense cell table --------------------------------------
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    counts = jnp.zeros((masked_row + 1,), jnp.int32).at[sorted_cid].add(1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(b * n, dtype=jnp.int32) - starts[sorted_cid]
    # Capacity overflow drops occupants into the masked row — NOT a
    # gatherable sentinel (real data there would surface as phantom
    # candidates at domain borders).
    slot_ok = (rank < cell_capacity) & (sorted_cid < total)
    w_row = cell_capacity * (dim + 1)
    # Scatter occupant rows [x..., idx] as dim+1 flat ELEMENT writes
    # straight into the final [rows, w_row] table layout. Scattering
    # [*, dim+1] ROWS instead was ~2.5 ms/step slower on v5e: XLA
    # materializes the (dim+1)-wide tensor in a T(4,128) sliver layout
    # (42x lane waste at dim=2) and then pays a relayout copy + reshape.
    base = jnp.where(
        slot_ok,
        sorted_cid * w_row + rank * (dim + 1),
        jnp.int32(masked_row * w_row),
    )
    idx = base[:, None] + jnp.arange(dim + 1, dtype=jnp.int32)[None, :]
    # rows: [x..., idx] per occupant; empty slots hold +inf positions
    occ = jnp.concatenate(
        [flat_pos[order], order.astype(positions.dtype)[:, None]], axis=-1
    )
    # (indices_are_sorted would be a lie here: capacity-overflow writes
    # jump to the masked row mid-sequence, breaking monotonicity.)
    table = (
        jnp.full(((masked_row + 1) * w_row,), jnp.inf, positions.dtype)
        .at[idx.reshape(-1)]
        .set(occ.reshape(-1))
        .reshape(masked_row + 1, w_row)
    )

    # --- candidate cells ----------------------------------------------------
    gshape = jnp.asarray(grid_shape, jnp.int32)
    if grid_shape[-1] >= 3:
        # ROW-TRIPLE gather: cells along the last grid dim have stride 1,
        # so the window [c-1, c, c+1] is one row of a windowed table3
        # (built by concatenating three shifted views — two dense copies,
        # ~0.1 ms, vs ~0.9 ms of per-row gather overhead saved: 3^dim
        # single-cell rows become 3^(dim-1) triple rows at ~3 ns/row).
        # Last-dim under/overflow WRAPS to a neighboring flat id instead
        # of hitting a sentinel; that is sound because (a) grid_shape[-1]
        # >= 3 makes the three triple windows {t-1,t,t+1} disjoint (no
        # duplicate candidates, preserving _select_k_smallest's unique-
        # key precondition), and (b) every wrapped cell is >= one full
        # cell width away along the last axis (or in another graph of
        # the batch, near the opposite domain edge), so the exact d2 < r2
        # test below rejects its occupants — the edge set is bit-
        # identical to the 9-cell form (pinned vs bruteforce by tests).
        pad_row = jnp.full((1, w_row), jnp.inf, positions.dtype)
        padded = jnp.concatenate([pad_row, table, pad_row], axis=0)
        table3 = jnp.concatenate(
            [padded[:-2], padded[1:-1], padded[2:]], axis=1
        )  # [rows, 3*w_row]: row c = cells (c-1, c, c+1)
        if dim > 1:
            off_outer = jnp.stack(
                jnp.meshgrid(
                    *([jnp.arange(-1, 2, dtype=jnp.int32)] * (dim - 1)),
                    indexing="ij",
                ),
                axis=-1,
            ).reshape(-1, dim - 1)
        else:
            off_outer = jnp.zeros((1, 0), jnp.int32)
        outer_coords = coords.reshape(b * n, 1, dim)[:, :, :-1] + off_outer[None]
        in_bounds = jnp.all(
            (outer_coords >= 0) & (outer_coords < gshape[:-1]), axis=-1
        )
        t_cid = cid[:, None] + jnp.sum(
            off_outer[None] * strides[None, None, :-1], axis=-1
        )
        # sentinel total+1: its triple covers guard rows total..total+2
        t_cid = jnp.where(in_bounds & flat_mask[:, None], t_cid, total + 1)
        n_off = off_outer.shape[0] * 3
        cand_rows = table3[t_cid]  # [M, 3^(dim-1), 3*w_row]
    else:
        # narrow-grid fallback: one row gather per (node, offset)
        offsets = jnp.stack(
            jnp.meshgrid(*([jnp.arange(-1, 2, dtype=jnp.int32)] * dim), indexing="ij"),
            axis=-1,
        ).reshape(-1, dim)
        n_off = offsets.shape[0]
        nbr_coords = coords.reshape(b * n, 1, dim) + offsets[None, :, :]
        in_bounds = jnp.all((nbr_coords >= 0) & (nbr_coords < gshape), axis=-1)
        nbr_cid = jnp.sum(
            jnp.clip(nbr_coords, 0, gshape - 1) * strides[None, None, :],
            axis=-1,
        ) + jnp.repeat(batch_off.reshape(b), n)[:, None]
        nbr_cid = jnp.where(in_bounds, nbr_cid, total)  # inf guard row
        cand_rows = table[nbr_cid]  # [M, 3^dim, w_row]

    # --- distance/validity on the INTERLEAVED [M, W] block -----------------
    # Slicing channels out of [M, C, dim+1] tensors is layout-poison on
    # TPU (last dim of 3 pads to 128 lanes, ~42x waste; measured ~5 ms of
    # the search). Instead keep the gathered block 2D [M, W] and let the
    # MXU do the de-interleave: d2 and the index channel come out of two
    # matmuls with constant 0/1 selector matrices. precision=HIGHEST
    # keeps them EXACT: each output sums one (d2: two) nonzero f32
    # products, so no accumulation-order or bf16-split effects — the
    # strict `< r` edge set is bit-identical to the elementwise form.
    import numpy as _np

    w = n_off * w_row
    c_cand = n_off * cell_capacity
    cand = cand_rows.reshape(b * n, w)
    # sanitize inf (empty slots) so 0-coefficient products can't nan the
    # matmuls; BIG keeps d2 of empties astronomically outside r.
    big = jnp.asarray(1e9, positions.dtype)
    cand = jnp.minimum(cand, big)

    lane = _np.arange(w)
    lane_ch = lane % (dim + 1)
    lane_j = lane // (dim + 1)  # candidate index of each lane
    sel_d = _np.zeros((w, c_cand), _np.float32)
    sel_i = _np.zeros((w, c_cand), _np.float32)
    sel_d[lane[lane_ch < dim], lane_j[lane_ch < dim]] = 1.0
    sel_i[lane[lane_ch == dim], lane_j[lane_ch == dim]] = 1.0

    pattern = jnp.zeros((b * n, w), positions.dtype)
    for c in range(dim):
        chmask = jnp.asarray((lane_ch == c).astype(_np.float32))
        pattern = pattern + flat_pos[:, c : c + 1] * chmask[None, :]
    t = cand - pattern
    d2 = jnp.dot(
        t * t, jnp.asarray(sel_d), precision=jax.lax.Precision.HIGHEST
    )  # [M, C]
    cand_idx = jnp.dot(
        cand, jnp.asarray(sel_i), precision=jax.lax.Precision.HIGHEST
    )  # [M, C] — exact: floats < 2^24, single nonzero term per column

    r2 = jnp.asarray(radius, positions.dtype) ** 2
    within = (d2 < r2) if strict else (d2 <= r2)
    within &= flat_mask[:, None]  # empty/garbage slots fail the d2 test
    cand_i32 = jnp.where(within, cand_idx, 0.0).astype(jnp.int32)
    if not include_self:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, cand_i32.shape, 0)
        within &= cand_i32 != row_ids
    keys = jnp.where(within, cand_i32, _INF_I32)
    return _finalize(keys, max_neighbors)
