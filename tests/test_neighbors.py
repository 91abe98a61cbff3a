"""Radius-neighbor search vs a brute-force numpy oracle.

Oracle reproduces the reference semantics of torch_cluster radius_graph as
used at learned_simulator.py:114-124: strict `dist < r`, optional self
loop, per-receiver neighbor cap.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sgnn_tpu.ops import (
    radius_neighbors_bruteforce,
    radius_neighbors_grid,
    neighbor_list_to_coo,
)


def oracle_edges(pos, r, include_self=True, node_mask=None, strict=True):
    """Set of (sender, receiver) pairs, no cap."""
    n = pos.shape[0]
    if node_mask is None:
        node_mask = np.ones(n, bool)
    edges = set()
    for i in range(n):
        if not node_mask[i]:
            continue
        for j in range(n):
            if not node_mask[j]:
                continue
            if not include_self and i == j:
                continue
            d = np.linalg.norm(pos[i] - pos[j])
            if (d < r) if strict else (d <= r):
                edges.add((j, i))  # sender j -> receiver i
    return edges


def nl_edges(nl):
    s, r, m = neighbor_list_to_coo(nl)
    s, r, m = np.asarray(s), np.asarray(r), np.asarray(m)
    return set(zip(s[m].tolist(), r[m].tolist()))


@pytest.mark.parametrize("include_self", [True, False])
@pytest.mark.parametrize("dim", [2, 3])
def test_bruteforce_matches_oracle(rng, include_self, dim):
    pos = rng.uniform(-1.0, 1.0, size=(64, dim)).astype(np.float32)
    r = 0.5
    nl = radius_neighbors_bruteforce(
        jnp.asarray(pos), r, max_neighbors=64, include_self=include_self
    )
    assert nl_edges(nl) == oracle_edges(pos, r, include_self)


def test_strict_inequality():
    # Particles exactly at distance r must NOT be connected (strict < r).
    pos = np.array([[0.0, 0.0], [0.6, 0.0], [0.0, 0.59]], np.float32)
    nl = radius_neighbors_bruteforce(jnp.asarray(pos), 0.6, max_neighbors=8)
    edges = nl_edges(nl)
    assert (1, 0) not in edges and (0, 1) not in edges
    assert (2, 0) in edges and (0, 2) in edges
    # self loops present
    assert all((i, i) in edges for i in range(3))


def test_node_mask_excludes_padded(rng):
    pos = rng.uniform(-1, 1, size=(32, 2)).astype(np.float32)
    mask = np.ones(32, bool)
    mask[20:] = False
    nl = radius_neighbors_bruteforce(
        jnp.asarray(pos), 0.8, max_neighbors=32, node_mask=jnp.asarray(mask)
    )
    got = nl_edges(nl)
    assert got == oracle_edges(pos, 0.8, True, mask)
    # padded receivers have zero edges
    assert not np.asarray(nl.mask)[20:].any()


def test_cap_keeps_lowest_indices(rng):
    # A cluster where every node sees every other; cap K=4 keeps senders
    # with the smallest indices (deterministic truncation).
    pos = rng.uniform(0, 0.05, size=(10, 2)).astype(np.float32)
    nl = radius_neighbors_bruteforce(jnp.asarray(pos), 1.0, max_neighbors=4)
    senders = np.asarray(nl.senders)
    assert np.asarray(nl.mask).all()
    np.testing.assert_array_equal(senders, np.tile(np.arange(4), (10, 1)))


@pytest.mark.parametrize("n", [50, 300])
def test_grid_matches_bruteforce(rng, n):
    pos = rng.uniform(-2.0, 3.0, size=(n, 2)).astype(np.float32)
    r = 0.6
    bf = radius_neighbors_bruteforce(jnp.asarray(pos), r, max_neighbors=64)
    gr = radius_neighbors_grid(
        jnp.asarray(pos),
        r,
        domain_min=(-2.5, -2.5),
        domain_max=(3.5, 3.5),
        max_neighbors=64,
        cell_capacity=32,
    )
    assert nl_edges(gr) == nl_edges(bf)


def test_grid_3d_matches_bruteforce(rng):
    pos = rng.uniform(-1.0, 1.0, size=(200, 3)).astype(np.float32)
    r = 0.5
    bf = radius_neighbors_bruteforce(jnp.asarray(pos), r, max_neighbors=64)
    gr = radius_neighbors_grid(
        jnp.asarray(pos),
        r,
        domain_min=(-1.2, -1.2, -1.2),
        domain_max=(1.2, 1.2, 1.2),
        max_neighbors=64,
        cell_capacity=32,
    )
    assert nl_edges(gr) == nl_edges(bf)


def test_grid_lattice_exact():
    # The actual Taylor-impact regime: 0.5 mm lattice, r=0.6 -> each interior
    # node sees self + 4 axial neighbors (diagonals at 0.707 excluded).
    xs, ys = np.meshgrid(np.arange(10) * 0.5, np.arange(10) * 0.5)
    pos = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    nl = radius_neighbors_grid(
        jnp.asarray(pos),
        0.6,
        domain_min=(-1.0, -1.0),
        domain_max=(6.0, 6.0),
        max_neighbors=20,
        cell_capacity=8,
    )
    counts = np.asarray(nl.mask).sum(1)
    # corner: 3, edge: 4, interior: 5
    assert counts.min() == 3 and counts.max() == 5
    assert (counts == 5).sum() == 64  # 8x8 interior


def test_grid_batched_matches_per_graph(rng):
    from sgnn_tpu.ops.neighbors import radius_neighbors_grid_batched

    b, n = 3, 120
    pos = rng.uniform(-2.0, 3.0, size=(b, n, 2)).astype(np.float32)
    kw = dict(domain_min=(-2.5, -2.5), domain_max=(3.5, 3.5),
              max_neighbors=16, cell_capacity=32)
    batched = radius_neighbors_grid_batched(jnp.asarray(pos), 0.6, **kw)
    got_s = np.asarray(batched.senders)
    got_m = np.asarray(batched.mask)
    for g in range(b):
        single = radius_neighbors_grid(jnp.asarray(pos[g]), 0.6, **kw)
        # batched senders are global flat indices; localize and compare sets
        rows = slice(g * n, (g + 1) * n)
        edges_b = set()
        for i in range(n):
            for k in range(16):
                if got_m[rows][i, k]:
                    s = got_s[rows][i, k]
                    assert g * n <= s < (g + 1) * n  # no cross-graph edges
                    edges_b.add((int(s - g * n), i))
        assert edges_b == nl_edges(single)


def test_celltable_matches_grid_batched(rng):
    from sgnn_tpu.ops.neighbors import (
        radius_neighbors_celltable,
        radius_neighbors_grid_batched,
    )

    b, n = 3, 150
    pos = rng.uniform(-2.0, 3.0, size=(b, n, 2)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[:, -10:] = False
    kw = dict(domain_min=(-2.5, -2.5), domain_max=(3.5, 3.5),
              max_neighbors=16, cell_capacity=32, node_mask=jnp.asarray(mask))
    a = radius_neighbors_celltable(jnp.asarray(pos), 0.6, **kw)
    c = radius_neighbors_grid_batched(jnp.asarray(pos), 0.6, **kw)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(c.mask))
    np.testing.assert_array_equal(
        np.asarray(a.senders)[np.asarray(a.mask)],
        np.asarray(c.senders)[np.asarray(c.mask)],
    )


def test_celltable_3d_and_boundary_wrap(rng):
    """3D span gathers + particles packed against every domain face (the
    span-wrap paths: cy-1 at cy=0 reads a far row and must be
    distance-rejected, never duplicated)."""
    from sgnn_tpu.ops.neighbors import (
        radius_neighbors_celltable,
        radius_neighbors_grid_batched,
    )

    b, n = 2, 200
    pos = rng.uniform(0.0, 2.0, size=(b, n, 3)).astype(np.float32)
    # pin particles onto the domain corners/faces
    pos[:, :8] = np.array(
        [[0, 0, 0], [2, 0, 0], [0, 2, 0], [0, 0, 2],
         [2, 2, 0], [2, 0, 2], [0, 2, 2], [2, 2, 2]], np.float32
    )
    kw = dict(domain_min=(0.0, 0.0, 0.0), domain_max=(2.0, 2.0, 2.0),
              max_neighbors=24, cell_capacity=32)
    a = radius_neighbors_celltable(jnp.asarray(pos), 0.5, **kw)
    c = radius_neighbors_grid_batched(jnp.asarray(pos), 0.5, **kw)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(c.mask))
    np.testing.assert_array_equal(
        np.asarray(a.senders)[np.asarray(a.mask)],
        np.asarray(c.senders)[np.asarray(c.mask)],
    )


def test_celltable_small_grid_fallback(rng):
    """< 3 cells per axis routes to the grid_batched path (same results)."""
    from sgnn_tpu.ops.neighbors import (
        radius_neighbors_celltable,
        radius_neighbors_grid_batched,
    )

    pos = rng.uniform(0.0, 1.0, size=(2, 50, 2)).astype(np.float32)
    kw = dict(domain_min=(0.0, 0.0), domain_max=(1.0, 1.0),
              max_neighbors=16, cell_capacity=64)
    a = radius_neighbors_celltable(jnp.asarray(pos), 0.5, **kw)
    c = radius_neighbors_grid_batched(jnp.asarray(pos), 0.5, **kw)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(c.mask))
    np.testing.assert_array_equal(
        np.asarray(a.senders)[np.asarray(a.mask)],
        np.asarray(c.senders)[np.asarray(c.mask)],
    )
