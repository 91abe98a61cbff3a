"""Flat (block-diagonal batched) EPD path vs the reference vmap path."""

import numpy as np

import jax
import jax.numpy as jnp

from sgnn_tpu.models import EPDConfig, encode_process_decode_apply, encode_process_decode_init
from sgnn_tpu.models.epd_flat import (
    encode_process_decode_apply_flat,
    flatten_batch_graph,
)
from sgnn_tpu.ops import radius_neighbors_bruteforce
from sgnn_tpu.ops.neighbors import NeighborList


def make_batch(rng, b=3, n=40, k=8, dim=2):
    pos = rng.uniform(-1, 1, size=(b, n, dim)).astype(np.float32)
    nls = [radius_neighbors_bruteforce(jnp.asarray(p), 0.5, max_neighbors=k) for p in pos]
    senders = jnp.stack([nl.senders for nl in nls])
    mask = jnp.stack([nl.mask for nl in nls])
    return pos, senders, mask


def test_flat_matches_vmap_path(rng):
    b, n, k = 3, 40, 8
    cfg = EPDConfig(node_in=7, edge_in=3, node_out=3, latent_dim=32,
                    num_message_passing_steps=2, num_mlp_layers=1)
    params = encode_process_decode_init(jax.random.key(0), cfg)
    pos, senders, mask = make_batch(rng, b=b, n=n, k=k)
    nf = jnp.asarray(rng.normal(size=(b, n, cfg.node_in)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(b, n, k, cfg.edge_in)).astype(np.float32))

    # reference: vmap of the standard path
    ref = jax.vmap(
        lambda a, e, s, m: encode_process_decode_apply(params, a, e, NeighborList(s, m))
    )(nf, ef, senders, mask)

    senders_flat, degrees = flatten_batch_graph(senders, mask, n)
    out = encode_process_decode_apply_flat(
        params,
        nf.reshape(b * n, -1),
        ef.reshape(b * n * k, -1),
        senders_flat,
        degrees,
        k,
        use_pallas=False,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(b * n, -1), rtol=2e-5, atol=2e-5
    )


def test_flat_pallas_interpret_matches(rng, monkeypatch):
    """Force the pallas kernel (interpret mode on CPU) through the flat path."""
    import sgnn_tpu.models.epd_flat as epd_flat
    import sgnn_tpu.experimental.edge_block as eb

    orig = eb.fused_edge_block
    monkeypatch.setattr(
        epd_flat, "fused_edge_block",
        lambda *args: orig(*args[:-1], args[-1], True)
        if not isinstance(args[-1], bool)
        else orig(*args),
    )

    b, n, k = 2, 32, 8
    cfg = EPDConfig(node_in=5, edge_in=3, node_out=3, latent_dim=16,
                    num_message_passing_steps=2, num_mlp_layers=1)
    params = encode_process_decode_init(jax.random.key(1), cfg)
    pos, senders, mask = make_batch(rng, b=b, n=n, k=k)
    nf = jnp.asarray(rng.normal(size=(b, n, cfg.node_in)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(b, n, k, cfg.edge_in)).astype(np.float32))

    ref = jax.vmap(
        lambda a, e, s, m: encode_process_decode_apply(params, a, e, NeighborList(s, m))
    )(nf, ef, senders, mask)

    senders_flat, degrees = flatten_batch_graph(senders, mask, n)
    out = encode_process_decode_apply_flat(
        params, nf.reshape(b * n, -1), ef.reshape(b * n * k, -1),
        senders_flat, degrees, k, use_pallas=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref).reshape(b * n, -1), rtol=5e-5, atol=5e-5
    )


def test_forward_batched_domain_path_matches_vmap_path(rng):
    """The fully-flat (domain) route equals the vmapped preprocess route."""
    from sgnn_tpu.physics.simulator import (
        NormStats, SimulatorConfig, forward_batched, simulator_init,
    )
    import dataclasses

    b, n, s = 2, 48, 4
    base = SimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2,
        input_sequence_length=s, connectivity_radius=0.6, max_neighbors=12,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = simulator_init(jax.random.key(0), base)
    pos = rng.uniform(-1.5, 1.5, size=(b, n, 2)).astype(np.float32)
    seq = (pos[:, :, None, :]
           + rng.normal(scale=0.01, size=(b, n, s, 2)).cumsum(2)).astype(np.float32)
    types = jnp.zeros((b, n), jnp.int32)
    mask = np.ones((b, n), bool); mask[:, -5:] = False

    ref = forward_batched(params, base, stats, jnp.asarray(seq), types,
                          jnp.asarray(mask), use_pallas=False)
    cfg_dom = dataclasses.replace(base, domain=((-2.5, -2.5), (2.5, 2.5)))
    got = forward_batched(params, cfg_dom, stats, jnp.asarray(seq), types,
                          jnp.asarray(mask), use_pallas=False)
    for a, b_ in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a)[np.asarray(mask)], np.asarray(b_)[np.asarray(mask)],
            rtol=2e-5, atol=2e-5,
        )


def test_sym_gather_grads_match_plain(rng):
    """Reverse-index VJP == XLA scatter VJP on a symmetric uncapped graph."""
    from sgnn_tpu.ops.sym_gather import reverse_edge_positions, sym_gather

    n, k = 60, 24
    pos = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    nl = radius_neighbors_bruteforce(jnp.asarray(pos), 0.5, max_neighbors=k)
    assert int(np.asarray(nl.mask).sum(1).max()) < k  # cap never binds
    senders, mask = nl.senders, nl.mask
    rev_pos, rev_ok = reverse_edge_positions(senders, mask)
    np.testing.assert_array_equal(np.asarray(rev_ok), np.asarray(mask))
    # reverse of the reverse points back
    s_np, m_np = np.asarray(senders), np.asarray(mask)
    rp = np.asarray(rev_pos)
    for i in range(n):
        for kk in range(k):
            if m_np[i, kk]:
                p = rp[i, kk]
                assert s_np[p // k, p % k] == i

    table = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    idx = senders.reshape(-1)
    cot_seed = jnp.asarray(rng.normal(size=(n * k, 16)).astype(np.float32))
    # zero cotangent on invalid slots (the model always masks them)
    cot_seed = cot_seed * mask.reshape(-1, 1)

    g_plain = jax.grad(lambda t: jnp.sum(t[idx] * cot_seed))(table)
    g_sym = jax.grad(
        lambda t: jnp.sum(sym_gather(t, idx, rev_pos, rev_ok) * cot_seed)
    )(table)
    np.testing.assert_allclose(np.asarray(g_sym), np.asarray(g_plain), rtol=1e-5, atol=1e-6)


def test_forward_batched_symmetric_gather_grads(rng):
    """End-to-end grads equal with and without the symmetric-gather VJP."""
    from sgnn_tpu.physics.simulator import (
        NormStats, SimulatorConfig, forward_batched, simulator_init,
    )
    import dataclasses

    b, n, s = 2, 48, 4
    base = SimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2,
        input_sequence_length=s, connectivity_radius=0.6, max_neighbors=12,
        domain=((-2.5, -2.5), (2.5, 2.5)),
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = simulator_init(jax.random.key(0), base)
    pos = rng.uniform(-1.5, 1.5, size=(b, n, 2)).astype(np.float32)
    seq = jnp.asarray((pos[:, :, None, :]
           + rng.normal(scale=0.01, size=(b, n, s, 2)).cumsum(2)).astype(np.float32))
    types = jnp.zeros((b, n), jnp.int32)

    def loss(p, cfg):
        acc, strain = forward_batched(p, cfg, stats, seq, types, use_pallas=False)
        return jnp.sum(acc**2) + jnp.sum(strain**2)

    g_ref = jax.grad(lambda p: loss(p, base))(params)
    cfg_sym = dataclasses.replace(base, symmetric_gather=True)
    g_sym = jax.grad(lambda p: loss(p, cfg_sym))(params)
    for a, b_ in zip(jax.tree.leaves(g_sym), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-5, atol=1e-6)


def _sym_fixture(rng, n=64, k=16, latent=16, layers=2):
    cfg = EPDConfig(node_in=7, edge_in=3, node_out=3, latent_dim=latent,
                    num_message_passing_steps=layers, num_mlp_layers=1)
    params = encode_process_decode_init(jax.random.key(2), cfg)
    pos = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    nl = radius_neighbors_bruteforce(jnp.asarray(pos), 0.45, max_neighbors=k)
    assert int(np.asarray(nl.mask).sum(1).max()) < k  # symmetric: cap unbound
    nf = jnp.asarray(rng.normal(size=(n, cfg.node_in)).astype(np.float32))
    return cfg, params, jnp.asarray(pos), nl, nf


def test_fused_packed_gather_path_exact(rng):
    """apply_flat_fused == apply_flat + explicit features/rev, bit-exact.

    The packed gather must be a pure re-plumbing: gathering positions,
    the reverse index and layer-0 projections through one table cannot
    change a single bit of the output or the parameter gradients.
    """
    from sgnn_tpu.models.epd_flat import encode_process_decode_apply_flat_fused
    from sgnn_tpu.ops.sym_gather import reverse_edge_positions

    cfg, params, pos, nl, nf = _sym_fixture(rng)
    n, k = nl.senders.shape
    radius = 0.45

    def unfused(p, dt):
        disp = (pos[nl.senders] - pos[:, None, :]) / radius
        dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
        ef = jnp.concatenate([disp, dist], axis=-1)
        ef = ef * nl.mask[..., None].astype(ef.dtype)
        degrees = jnp.sum(nl.mask, axis=-1, keepdims=True).astype(jnp.float32)
        rev = reverse_edge_positions(nl.senders, nl.mask)
        return encode_process_decode_apply_flat(
            p, nf, ef.reshape(n * k, -1), nl.senders.reshape(-1), degrees, k,
            use_pallas=False, rev=rev, compute_dtype=dt,
        )

    def fused(p, dt):
        return encode_process_decode_apply_flat_fused(
            p, nf, pos, nl.senders, nl.mask, radius,
            use_pallas=False, compute_dtype=dt,
        )

    for dt in (None, jnp.bfloat16):
        ref = unfused(params, dt)
        got = fused(params, dt)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        # grads: same ops, but x's cotangent summands accumulate in a
        # different order (proj_j0's dot sits outside the loop in the
        # fused trace), so allow last-ULP f32 reassociation differences
        g_ref = jax.grad(lambda p: jnp.sum(unfused(p, dt) ** 2))(params)
        g_got = jax.grad(lambda p: jnp.sum(fused(p, dt) ** 2))(params)
        for a, b_ in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )


def test_gather_rows_packed_equals_plain(rng):
    """The row-packed huge-table gather returns exactly table[idx]."""
    from sgnn_tpu.ops import sym_gather as sg

    rows, h = 512 * 1024, 8
    tbl = jnp.asarray(rng.normal(size=(rows, h)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, rows, (1000, 3)), jnp.int32)
    assert rows >= sg._PACK_GATHER_MIN_ROWS  # packed path engaged
    out = sg.gather_rows(tbl, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[np.asarray(idx)])


def test_banded_gather_rows_chunked_exact(rng, monkeypatch):
    """The two-level (chunked) banded form — tables past the compiler
    ceiling split into window slices — returns exactly table[idx] under
    the band contract, in both caller geometries (r == e reverse
    gathers; r == e*K fan-out sender gathers) including ragged final
    chunks and chunk-boundary band overlap."""
    from sgnn_tpu.ops import sym_gather as sg

    monkeypatch.setattr(sg, "_BANDED_MAX_ROWS", 600)
    monkeypatch.setattr(sg, "_BANDED_TILE_ROWS", 64)
    band = 7
    h = 5
    # r == e case (reverse-gather geometry), ragged r
    e = 2000
    tbl = jnp.asarray(rng.normal(size=(e, h)).astype(np.float32))
    base = np.arange(e)
    idx = np.clip(base + rng.integers(-band, band + 1, e), 0, e - 1)
    out = sg.banded_gather_rows(tbl, jnp.asarray(idx, jnp.int32), band)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx])

    # r == e*K case (fan-out sender-gather geometry)
    k = 4
    base2 = np.repeat(np.arange(e), k)
    idx2 = np.clip(base2 + rng.integers(-band, band + 1, e * k), 0, e - 1)
    out2 = sg.banded_gather_rows(tbl, jnp.asarray(idx2, jnp.int32), band)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(tbl)[idx2])

    # e == r*q case (table larger than outputs)
    r3 = 500
    base3 = np.arange(r3) * (e // r3)
    idx3 = np.clip(base3 + rng.integers(-band, band + 1, r3), 0, e - 1)
    out3 = sg.banded_gather_rows(tbl, jnp.asarray(idx3, jnp.int32), band)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(tbl)[idx3])


def test_banded_gather_rows_exact(rng):
    """Banded scan-over-tiles gather == table[idx] under the band
    contract; violations are caught by the band_violations guard."""
    from sgnn_tpu.ops.sym_gather import band_violations, banded_gather_rows

    # reverse-gather shape: table rows == output rows (E == R)
    n, k, w = 3000, 8, 40
    e = n * k
    v = np.arange(n)
    send = np.clip(v[:, None] + rng.integers(-w, w + 1, (n, k)), 0, n - 1)
    kp = rng.integers(0, k, (n, k))
    idx = jnp.asarray((send * k + kp).astype(np.int32))
    tbl = jnp.asarray(rng.normal(size=(e, 16)).astype(np.float32))
    band = (w + 1) * k
    fn = jax.jit(lambda t, i: banded_gather_rows(t, i, band, 2048))
    ref = np.asarray(tbl)[np.asarray(idx)]
    np.testing.assert_array_equal(np.asarray(fn(tbl, idx)), ref)

    # the guard metric: clean senders -> 0; one out-of-band sender -> 1
    # (banded_gather_rows itself is only exact under the contract — the
    # in-op cond fallback was reverted for a 7x step regression)
    mask = jnp.ones((n, k), bool)
    senders = jnp.asarray(send.astype(np.int32))
    assert int(band_violations(senders, mask, w)) == 0
    bad = senders.at[0, 0].set(n - 1)
    assert int(band_violations(bad, mask, w)) == 1
    assert int(band_violations(bad, mask.at[0, 0].set(False), w)) == 0

    # sender-gather shape: output rows == K * table rows, plus a tile
    # size that does not divide the row count (padding path)
    tbl_n = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    out = jax.jit(lambda t, i: banded_gather_rows(t, i, w, 2048 + 512))(
        tbl_n, jnp.asarray(send.astype(np.int32))
    )
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(tbl_n)[send]
    )


def test_sym_gather_band_matches_unbanded(rng, monkeypatch):
    """sym_gather/packed_sym_gather with band_nodes: outputs and grads
    bit-equal to the unbanded path (threshold lowered to force the
    banded route on test-sized tables)."""
    from sgnn_tpu.ops import sym_gather as sg
    from sgnn_tpu.ops.sym_gather import reverse_edge_positions

    n, k, h = 512, 8, 16
    w = 20
    monkeypatch.setattr(
        __import__("sgnn_tpu.ops.sym_gather", fromlist=["x"]),
        "_BANDED_TILE_ROWS",
        512,
    )  # force multiple scan tiles at test size
    pos = np.stack(
        [np.arange(n) * 0.01, np.zeros(n)], -1
    ).astype(np.float32)  # x-sorted line: neighbors index-local
    nl = radius_neighbors_bruteforce(jnp.asarray(pos), 0.035, max_neighbors=k)
    assert int(np.asarray(nl.mask).sum(1).max()) < k
    senders, mask = nl.senders, nl.mask
    rev_pos, rev_ok = reverse_edge_positions(senders, mask)
    table = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    idx = senders.reshape(-1)
    cot = jnp.asarray(rng.normal(size=(n * k, h)).astype(np.float32))
    cot = cot * mask.reshape(-1, 1)

    def run(band):
        out = sg.sym_gather(table, idx, rev_pos, rev_ok, band)
        g = jax.grad(
            lambda t: jnp.sum(sg.sym_gather(t, idx, rev_pos, rev_ok, band) * cot)
        )(table)
        return out, g

    ref_out, ref_g = run(None)
    monkeypatch.setattr(sg, "_BANDED_MIN_ROWS", 64)
    out, g = run(w)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ref_g))

    # packed variant
    aux = jnp.asarray(pos)
    proj = table

    def packed(band):
        g_aux, xj, rp, ro = sg.packed_sym_gather(aux, proj, senders, mask, None, band)
        gr = jax.grad(
            lambda p: jnp.sum(
                sg.packed_sym_gather(aux, p, senders, mask, None, band)[1] * cot
            )
        )(proj)
        return g_aux, xj, rp, ro, gr

    monkeypatch.setattr(sg, "_BANDED_MIN_ROWS", 10**9)
    ref = packed(None)
    monkeypatch.setattr(sg, "_BANDED_MIN_ROWS", 64)
    got = packed(w)
    for a, b_ in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_dot_wf32_grads_match_ad_2d_and_3d():
    """_dot_wf32's hand-written VJP == AD of the plain dot, any rank.

    Regression for the round-3 snapshot bug: the backward contracted
    only axis 0 of x, so 3D [R, K, H] inputs (the multi-scale dense
    path, models/multi_scale.py) produced a 4D weight grad that crashed
    the optimizer. Shapes must match the param, values must match AD of
    the un-customized formulation (bit-exact in f32: same dots, same
    preferred types).
    """
    from sgnn_tpu.models.epd_flat import _dot_wf32, _mlp_tail_in

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(16, 12)).astype(np.float32))
    for shape in [(9, 16), (5, 4, 16), (3, 2, 4, 16)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=shape[:-1] + (12,)).astype(np.float32))

        def f_custom(xx, ww):
            return jnp.sum(_dot_wf32(xx, ww) * cot)

        def f_plain(xx, ww):
            return jnp.sum(
                jnp.dot(xx, ww.astype(xx.dtype), preferred_element_type=xx.dtype) * cot
            )

        gx, gw = jax.grad(f_custom, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(f_plain, argnums=(0, 1))(x, w)
        assert gw.shape == w.shape
        assert gx.shape == x.shape
        np.testing.assert_array_equal(np.asarray(gw), np.asarray(rw))
        np.testing.assert_array_equal(np.asarray(gx), np.asarray(rx))

    # _mlp_tail_in end-to-end on a 3D input: grad shapes match params
    from sgnn_tpu.nn.core import mlp_init
    params = mlp_init(jax.random.key(0), 16, [16], 16)
    h3 = jnp.asarray(rng.normal(size=(5, 4, 16)).astype(np.float32))
    g = jax.grad(lambda p: jnp.sum(_mlp_tail_in(p, h3) ** 2))(params)
    flat_g = jax.tree_util.tree_leaves(g)
    flat_p = jax.tree_util.tree_leaves(params)
    for gv, pv in zip(flat_g, flat_p):
        assert gv.shape == pv.shape


def test_remat_matches_plain(rng):
    """remat=True (per-layer jax.checkpoint) changes memory, not math:
    outputs bit-equal, grads equal to AD of the plain path."""
    from sgnn_tpu.models.epd_flat import encode_process_decode_apply_flat

    b, n, k = 2, 40, 8
    cfg = EPDConfig(node_in=7, edge_in=3, node_out=3, latent_dim=16,
                    num_message_passing_steps=3, num_mlp_layers=2)
    params = encode_process_decode_init(jax.random.key(0), cfg)
    pos, senders, mask = make_batch(rng, b=b, n=n, k=k)
    nf = jnp.asarray(rng.normal(size=(b * n, cfg.node_in)).astype(np.float32))
    ef = jnp.asarray(rng.normal(size=(b * n * k, cfg.edge_in)).astype(np.float32))
    senders_flat, degrees = flatten_batch_graph(senders, mask, n)

    def run(p, remat):
        return encode_process_decode_apply_flat(
            p, nf, ef, senders_flat, degrees, k, use_pallas=False,
            remat=remat,
        )

    ref = run(params, False)
    for mode in (True, "xj_msg", "full", "group"):
        got = run(params, mode)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    g_ref = jax.grad(lambda p: jnp.sum(run(p, False) ** 2))(params)
    for mode in (True, "xj_msg", "full", "group"):
        g_got = jax.grad(lambda p: jnp.sum(run(p, mode) ** 2))(params)
        for a, b_ in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-7)


def test_forward_batched_unpacked_sym_over_threshold(rng):
    """Above packed_gather_max_nodes, forward_batched keeps the symmetric
    gather-based VJP but drops the packed 3-stream gather (whose f32
    gathered block crosses the 2^31-byte buffer ceiling near 1M nodes).
    Forced here with a tiny threshold: outputs match the fused path
    bit-for-bit in f32 (same math, different plumbing) and grads match
    the plain-VJP reference."""
    import dataclasses

    from sgnn_tpu.physics.simulator import (
        NormStats, SimulatorConfig, forward_batched, simulator_init,
    )

    b, n, s = 2, 48, 4
    base = SimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2,
        input_sequence_length=s, connectivity_radius=0.6, max_neighbors=12,
        domain=((-2.5, -2.5), (2.5, 2.5)), symmetric_gather=True,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = simulator_init(jax.random.key(0), base)
    pos = rng.uniform(-1.5, 1.5, size=(b, n, 2)).astype(np.float32)
    seq = jnp.asarray((pos[:, :, None, :]
           + rng.normal(scale=0.01, size=(b, n, s, 2)).cumsum(2)).astype(np.float32))
    types = jnp.zeros((b, n), jnp.int32)

    cfg_unpacked = dataclasses.replace(base, packed_gather_max_nodes=1)
    assert b * n > cfg_unpacked.packed_gather_max_nodes

    ref = forward_batched(params, base, stats, seq, types, use_pallas=False)
    got = forward_batched(params, cfg_unpacked, stats, seq, types, use_pallas=False)
    for a, b_ in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def loss(p, cfg):
        acc, strain = forward_batched(p, cfg, stats, seq, types, use_pallas=False)
        return jnp.sum(acc**2) + jnp.sum(strain**2)

    g_plain = jax.grad(lambda p: loss(p, dataclasses.replace(
        base, symmetric_gather=False)))(params)
    g_unpacked = jax.grad(lambda p: loss(p, cfg_unpacked))(params)
    for a, b_ in zip(jax.tree.leaves(g_unpacked), jax.tree.leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-5, atol=1e-6)
