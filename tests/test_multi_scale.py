"""Multi-scale hierarchy, blocks, simulator, loader tests.

Hierarchy tests translate the reference's synthetic-grid suite
(sgnn/multi_scale/test/test_multi_scale_graph.py) against SOURCE
behavior (self-loops present via loop=True; max_neighbors=24 —
the reference's own tests drifted from its source, SURVEY.md §4.2).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sgnn_tpu.physics.multi_scale_graph import (
    CooEdges,
    MultiScaleConfig,
    StaticGraph,
    build_hierarchy,
    build_static_graph,
    create_all_edges,
    pad_edges,
)
from sgnn_tpu.models.multi_scale import (
    MSGNNConfig,
    multi_scale_gnn_apply,
    multi_scale_gnn_init,
)
from sgnn_tpu.physics.multi_scale_simulator import (
    MultiScaleSimulatorConfig,
    ms_predict_accelerations,
    ms_predict_positions,
    ms_rollout,
    multi_scale_simulator_init,
)
from sgnn_tpu.physics.simulator import NormStats

from torch_oracle import build_mlp, copy_mlp_to_jax, copy_mlp_ln_to_jax


def square_grid(n_side, spacing=0.5):
    xs, ys = np.meshgrid(np.arange(n_side) * spacing, np.arange(n_side) * spacing)
    return np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)


# --- config / hierarchy ----------------------------------------------------


def test_config_validation():
    with pytest.raises(ValueError):
        MultiScaleConfig(num_scales=1)
    cfg = MultiScaleConfig(num_scales=3, window_size=2)
    assert cfg.grid_radius == 1.0
    assert cfg.scale_spacing(1) == 1.0
    assert cfg.scale_spacing(2) == 2.0
    assert cfg.coarsest_radius == 4.0


@pytest.mark.parametrize("n_side,expected", [(4, [16, 4, 1]), (8, [64, 16, 4]), (16, [256, 64, 16])])
def test_hierarchy_counts(n_side, expected):
    cfg = MultiScaleConfig(num_scales=3, window_size=2)
    h = build_hierarchy(cfg, square_grid(n_side))
    counts = [h[s]["num_particles"] for s in range(3)]
    assert counts == expected


def test_hierarchy_chained_indices():
    cfg = MultiScaleConfig(num_scales=3, window_size=2)
    grid = square_grid(8)
    h = build_hierarchy(cfg, grid)
    # every scale's indices are a subset of the parent's
    s1, s2 = set(h[1]["sampling_indices"]), set(h[2]["sampling_indices"])
    assert s2 <= s1 <= set(range(64))
    # sampled positions are every-2nd coordinate of the parent
    pos1 = grid[h[1]["sampling_indices"]]
    assert set(np.unique(pos1[:, 0])) == {0.0, 1.0, 2.0, 3.0}
    assert h[1]["spacing"] == 1.0 and h[2]["spacing"] == 2.0


def test_edges_valid_and_self_loops_present():
    cfg = MultiScaleConfig(num_scales=2, window_size=2)
    grid = square_grid(6)
    out = create_all_edges(cfg, grid)
    n = len(grid)
    mesh = set(out["graph_hierarchy"][1]["sampling_indices"])
    for key in ["grid2mesh_edges", "mesh2mesh_edges", "mesh2grid_edges"]:
        e = out[key]
        assert (e.senders >= 0).all() and (e.senders < n).all()
        assert (e.receivers >= 0).all() and (e.receivers < n).all()
    # source behavior: loop=True -> mesh nodes have self edges in all types
    g2m = set(zip(out["grid2mesh_edges"].senders, out["grid2mesh_edges"].receivers))
    m2m = set(zip(out["mesh2mesh_edges"].senders, out["mesh2mesh_edges"].receivers))
    for i in mesh:
        assert (i, i) in g2m and (i, i) in m2m
    # g2m targets are mesh; m2g sources are mesh
    assert set(out["grid2mesh_edges"].receivers) <= mesh
    assert set(out["mesh2grid_edges"].senders) <= mesh


def test_g2m_m2g_symmetry():
    # radius graph is symmetric when the cap doesn't bind, so reversing
    # g2m yields exactly m2g (multi_scale_graph.py:229-242 semantics).
    cfg = MultiScaleConfig(num_scales=2, window_size=2)
    out = create_all_edges(cfg, square_grid(6))
    g2m_rev = set(zip(out["grid2mesh_edges"].receivers, out["grid2mesh_edges"].senders))
    m2g = set(zip(out["mesh2grid_edges"].senders, out["mesh2grid_edges"].receivers))
    assert g2m_rev == m2g


def test_determinism():
    cfg = MultiScaleConfig(num_scales=3, window_size=2)
    grid = square_grid(8)
    a = create_all_edges(cfg, grid)
    b = create_all_edges(cfg, grid)
    for key in ["grid2mesh_edges", "mesh2mesh_edges", "mesh2grid_edges"]:
        np.testing.assert_array_equal(a[key].senders, b[key].senders)
        np.testing.assert_array_equal(a[key].receivers, b[key].receivers)


def test_pad_edges_sorted_and_masked():
    e = CooEdges(np.array([3, 1, 2]), np.array([2, 0, 1]))
    p = pad_edges(e, 8)
    np.testing.assert_array_equal(p.receivers[:3], [0, 1, 2])
    np.testing.assert_array_equal(p.senders[:3], [1, 2, 3])
    assert p.mask[:3].all() and not p.mask[3:].any()
    with pytest.raises(ValueError):
        pad_edges(e, 2)


# --- model parity vs torch oracle -----------------------------------------


class OracleMSGNN(nn.Module):
    """Plain-torch oracle of multi_scale_gnn.py:208-325 (explicit
    gather/index_add in place of PyG MessagePassing)."""

    def __init__(self, node_in, edge_in, node_out, d, steps, nlayers):
        super().__init__()
        mk = lambda i, o: nn.Sequential(build_mlp(i, d, o, nlayers), nn.LayerNorm(o))
        self.node_enc = mk(node_in, d)
        self.g2m_enc = mk(edge_in, d)
        self.m2m_enc = mk(edge_in, d)
        self.m2g_enc = mk(edge_in, d)

        def block():
            return nn.ModuleDict(
                {"edge": mk(3 * d, d), "node": mk(2 * d, d)}
            )

        self.g2m = block()
        self.m2m = nn.ModuleList([block() for _ in range(steps)])
        self.m2g = block()
        self.head = build_mlp(d, d, node_out, nlayers)

    @staticmethod
    def _interact(blk, x, e, senders, receivers):
        msg = blk["edge"](torch.cat([x[receivers], x[senders], e], -1))
        agg = torch.zeros_like(x).index_add_(0, receivers, msg)
        upd = blk["node"](torch.cat([agg, x], -1))
        return x + upd, e + msg

    def forward(self, nf, ef, edges):
        x = self.node_enc(nf)
        e_g2m = self.g2m_enc(ef["g2m"])
        e_m2m = self.m2m_enc(ef["m2m"])
        e_m2g = self.m2g_enc(ef["m2g"])
        x, e_g2m = self._interact(self.g2m, x, e_g2m, *edges["g2m"])
        for blk in self.m2m:
            x, e_m2m = self._interact(blk, x, e_m2m, *edges["m2m"])
        x, e_m2g = self._interact(self.m2g, x, e_m2g, *edges["m2g"])
        return self.head(x)


def _oracle_params_to_jax(oracle: OracleMSGNN):
    blk = lambda b: {
        "edge": copy_mlp_ln_to_jax(b["edge"]),
        "node": copy_mlp_ln_to_jax(b["node"]),
    }
    return {
        "grid_node_encoder": copy_mlp_ln_to_jax(oracle.node_enc),
        "g2m_edge_encoder": copy_mlp_ln_to_jax(oracle.g2m_enc),
        "m2m_edge_encoder": copy_mlp_ln_to_jax(oracle.m2m_enc),
        "m2g_edge_encoder": copy_mlp_ln_to_jax(oracle.m2g_enc),
        "g2m_block": blk(oracle.g2m),
        "m2m_blocks": [blk(b) for b in oracle.m2m],
        "m2g_block": blk(oracle.m2g),
        "prediction_head": copy_mlp_to_jax(oracle.head),
    }


def test_ms_gnn_parity(rng):
    torch.manual_seed(0)
    node_in, edge_in, node_out, d = 7, 3, 3, 16
    oracle = OracleMSGNN(node_in, edge_in, node_out, d, steps=2, nlayers=2).eval()

    cfg = MultiScaleConfig(num_scales=2, window_size=2)
    grid = square_grid(6)
    n = len(grid)
    sg = build_static_graph(cfg, grid, g2m_pad=512, m2m_pad=256, m2g_pad=512)

    nf = rng.normal(size=(n, node_in)).astype(np.float32)
    ef, ef_torch, edges_torch = {}, {}, {}
    for key in ["g2m", "m2m", "m2g"]:
        pe = getattr(sg, key)
        feats = rng.normal(size=(len(pe.senders), edge_in)).astype(np.float32)
        feats *= pe.mask[:, None]
        ef[key] = feats
        ef_torch[key] = torch.tensor(feats[pe.mask])
        edges_torch[key] = (
            torch.tensor(pe.senders[pe.mask], dtype=torch.long),
            torch.tensor(pe.receivers[pe.mask], dtype=torch.long),
        )

    with torch.no_grad():
        t_out = oracle(torch.tensor(nf), ef_torch, edges_torch)

    params = jax.tree.map(jnp.asarray, _oracle_params_to_jax(oracle))
    graph = jax.tree.map(jnp.asarray, sg)
    j_out = multi_scale_gnn_apply(
        params, jnp.asarray(nf), {k: jnp.asarray(v) for k, v in ef.items()}, graph
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=5e-5, atol=5e-5)


# --- simulator -------------------------------------------------------------


def _ms_setup(rng, s=5):
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2, num_mlp_layers=2,
        input_sequence_length=s, num_scales=2, window_size=2,
    )
    grid = square_grid(6)
    n = len(grid)
    sg = build_static_graph(cfg.graph_config, grid, g2m_pad=512, m2m_pad=256, m2g_pad=512)
    graph = jax.tree.map(jnp.asarray, sg)
    drift = rng.normal(scale=0.01, size=(n, s, 2)).cumsum(axis=1)
    seq = (grid[:, None, :] + drift).astype(np.float32)
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), cfg)
    return cfg, stats, params, jnp.asarray(seq), graph, n


def test_ms_simulator_forward(rng):
    cfg, stats, params, seq, graph, n = _ms_setup(rng)
    types = jnp.zeros(n, jnp.int32)
    next_pos, strain = ms_predict_positions(params, cfg, stats, seq, types, graph)
    assert next_pos.shape == (n, 2) and strain.shape == (n,)
    assert np.isfinite(np.asarray(next_pos)).all()

    noise = jnp.zeros_like(seq)
    tgt_next = seq[:, -1] + 0.01
    pred, target, st = ms_predict_accelerations(
        params, cfg, stats, tgt_next, noise, seq, types, graph
    )
    assert pred.shape == target.shape == (n, 2)
    # with zero noise and identity stats, target = next_vel - prev_vel
    prev_vel = np.asarray(seq[:, -1] - seq[:, -2])
    expected = (0.01 - prev_vel)
    np.testing.assert_allclose(np.asarray(target), expected, rtol=1e-4, atol=1e-5)


def test_ms_wall_distance_normalized(rng):
    cfg, stats, params, seq, graph, n = _ms_setup(rng)
    from sgnn_tpu.physics.multi_scale_simulator import ms_encoder_preprocess

    nf, ef = ms_encoder_preprocess(params, cfg, stats, seq, jnp.zeros(n, jnp.int32), graph)
    wall_col = (cfg.input_sequence_length - 1) * 2
    assert float(jnp.max(nf[:, wall_col])) <= 1.0 + 1e-6
    assert ef["g2m"].shape[-1] == 3


def test_ms_rollout(rng):
    cfg, stats, params, _, graph, n = _ms_setup(rng, s=5)
    t = 9
    grid = square_grid(6)
    drift = rng.normal(scale=0.01, size=(n, t, 2)).cumsum(axis=1)
    pos = jnp.asarray((grid[:, None, :] + drift).astype(np.float32))
    strains = jnp.asarray(rng.normal(size=(t, n)).astype(np.float32))
    out = ms_rollout(
        params, cfg, stats, pos, jnp.zeros(n, jnp.int32), strains, graph
    )
    assert out["predicted_rollout"].shape == (4, n, 2)
    assert np.isfinite(np.asarray(out["rmse_position"])).all()


def test_ms_flat_batched_matches_vmap(rng):
    """ms_forward_batched (block-diagonal flat) == vmapped per-graph path,
    on a batch mixing two different hierarchies."""
    from sgnn_tpu.physics.multi_scale_simulator import (
        ms_forward_batched,
        ms_predict_accelerations,
        ms_predict_accelerations_batched,
    )

    s = 5
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2, num_mlp_layers=2,
        input_sequence_length=s, num_scales=2, window_size=2,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), cfg)

    # two distinct graphs: a 6x6 grid and a 9x4 bar, padded alike
    grids = [square_grid(6)]
    xs, ys = np.meshgrid(np.arange(9) * 0.5, np.arange(4) * 0.5)
    grids.append(np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64))
    n = len(grids[0])
    sgs = [
        build_static_graph(cfg.graph_config, g, g2m_pad=512, m2m_pad=256, m2g_pad=512)
        for g in grids
    ]
    graph = jax.tree.map(lambda *xs_: jnp.stack([jnp.asarray(x) for x in xs_]), *sgs)

    seqs = np.stack([
        (g[:, None, :] + rng.normal(scale=0.01, size=(n, s, 2)).cumsum(1)).astype(np.float32)
        for g in grids
    ])
    seqs = jnp.asarray(seqs)
    types = jnp.zeros((2, n), jnp.int32)

    ref = jax.vmap(
        lambda seq, t, g: ms_predict_positions(params, cfg, stats, seq, t, g)[0]
    )(seqs, types, graph)
    # vmapped forward uses ms_predict_positions; compare raw forward output
    acc, strain = ms_forward_batched(params, cfg, stats, seqs, types, graph)
    from sgnn_tpu.physics.multi_scale_simulator import decoder_postprocess

    got = decoder_postprocess(stats, acc, seqs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # training contract too
    noise = jnp.zeros_like(seqs)
    nxt = seqs[:, :, -1] + 0.01
    ref_t = jax.vmap(
        lambda nx, no, seq, t, g: ms_predict_accelerations(
            params, cfg, stats, nx, no, seq, t, g
        )
    )(nxt, noise, seqs, types, graph)
    got_t = ms_predict_accelerations_batched(
        params, cfg, stats, nxt, noise, seqs, types, graph
    )
    for a, b in zip(got_t, ref_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_ms_dense_graph_roundtrip():
    """dense_edges groups exactly the COO edge set, receiver-sorted."""
    from sgnn_tpu.physics.multi_scale_graph import dense_edges

    cfg = MultiScaleConfig(num_scales=2, window_size=2)
    grid = square_grid(6)
    out = create_all_edges(cfg, grid)
    coo = out["grid2mesh_edges"]
    de = dense_edges(coo, len(grid), r_pad=64, k_slots=24)
    got = {
        (int(de.senders[r, k]), int(de.recv[r]))
        for r in range(64)
        for k in range(24)
        if de.mask[r, k]
    }
    assert got == set(zip(coo.senders.tolist(), coo.receivers.tolist()))
    assert (np.diff(de.recv) >= 0).all()  # sorted incl. padding
    # padded slots point at the row's receiver; padded rows at last node
    assert de.recv[-1] == len(grid) - 1


def test_ms_dense_apply_matches_coo(rng):
    """multi_scale_gnn_apply_dense == multi_scale_gnn_apply, and the flat
    dense batched forward matches both, on a mixed-graph batch."""
    from sgnn_tpu.physics.multi_scale_graph import build_dense_static_graph
    from sgnn_tpu.models.multi_scale import multi_scale_gnn_apply_dense
    from sgnn_tpu.physics.multi_scale_simulator import (
        ms_forward_batched,
        ms_predict_positions,
    )

    s = 5
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2, num_mlp_layers=2,
        input_sequence_length=s, num_scales=2, window_size=2,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), cfg)

    grids = [square_grid(6)]
    xs, ys = np.meshgrid(np.arange(9) * 0.5, np.arange(4) * 0.5)
    grids.append(np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64))
    n = len(grids[0])

    coo = [
        build_static_graph(cfg.graph_config, g, g2m_pad=512, m2m_pad=256, m2g_pad=512)
        for g in grids
    ]
    common = dict(
        tsp_rows={"g2m": n, "m2m": 16, "m2g": 16},
        tsp_slots={"g2m": 8, "m2m": 24, "m2g": 24},
    )
    dense = [
        build_dense_static_graph(
            cfg.graph_config, g, g2m_rows=16, m2m_rows=16, m2g_rows=n, **common
        )
        for g in grids
    ]
    seqs = np.stack([
        (g[:, None, :] + rng.normal(scale=0.01, size=(n, s, 2)).cumsum(1)).astype(np.float32)
        for g in grids
    ])
    seqs = jnp.asarray(seqs)
    types = jnp.zeros((2, n), jnp.int32)

    # unbatched: dense forward (via _forward dispatch) == COO forward
    for i in range(2):
        ref_pos, ref_strain = ms_predict_positions(
            params, cfg, stats, seqs[i], types[i], jax.tree.map(jnp.asarray, coo[i])
        )
        got_pos, got_strain = ms_predict_positions(
            params, cfg, stats, seqs[i], types[i], jax.tree.map(jnp.asarray, dense[i])
        )
        np.testing.assert_allclose(np.asarray(got_pos), np.asarray(ref_pos), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_strain), np.asarray(ref_strain), rtol=2e-5, atol=2e-5)

    # batched flat: dense == COO
    coo_b = jax.tree.map(lambda *x: jnp.stack([jnp.asarray(v) for v in x]), *coo)
    dense_b = jax.tree.map(lambda *x: jnp.stack([jnp.asarray(v) for v in x]), *dense)
    ref = ms_forward_batched(params, cfg, stats, seqs, types, coo_b)
    got = ms_forward_batched(params, cfg, stats, seqs, types, dense_b)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_ms_dense_batcher(tmp_path, rng):
    from sgnn_tpu.data import DatasetBuilder, generate_synthetic_raw_dataset
    from sgnn_tpu.data.static_graph_loader import MultiScaleSampleBatcher
    from sgnn_tpu.physics.multi_scale_graph import DenseStaticGraph

    raw, out = tmp_path / "raw", tmp_path / "proc"
    generate_synthetic_raw_dataset(raw, num_sims=3, nx=12, ny=6, num_steps=50, seed=0)
    DatasetBuilder(raw, out, step_size=2, total_steps=30, val_patterns=["-110"],
                   boundary_particles_to_remove=2).build()
    b = MultiScaleSampleBatcher(
        out / "train.npz", input_sequence_length=4, batch_size=3,
        ms_cfg=MultiScaleConfig(num_scales=2, window_size=2),
        pad_multiple=32, edge_pad_multiple=256, seed=0, dense=True,
    )
    batch = next(iter(b))
    g = batch["graph"]
    assert isinstance(g, DenseStaticGraph)
    assert g.g2m.senders.shape[0] == 3  # batch axis
    assert g.g2m.recv.ndim == 2 and g.g2m.mask.ndim == 3


# --- loader ----------------------------------------------------------------


def test_ms_sample_batcher(tmp_path, rng):
    from sgnn_tpu.data import DatasetBuilder, generate_synthetic_raw_dataset
    from sgnn_tpu.data.static_graph_loader import MultiScaleSampleBatcher

    raw, out = tmp_path / "raw", tmp_path / "proc"
    generate_synthetic_raw_dataset(raw, num_sims=3, nx=12, ny=6, num_steps=50, seed=0)
    DatasetBuilder(raw, out, step_size=2, total_steps=30, val_patterns=["-110"],
                   boundary_particles_to_remove=2).build()
    b = MultiScaleSampleBatcher(
        out / "train.npz", input_sequence_length=4, batch_size=3,
        ms_cfg=MultiScaleConfig(num_scales=2, window_size=2),
        pad_multiple=32, edge_pad_multiple=256, seed=0,
    )
    batch = next(iter(b))
    g = batch["graph"]
    assert g.g2m.senders.shape[0] == 3  # batch axis
    assert g.g2m.senders.shape[1] % 256 == 0
    # graphs differ per trajectory: find a batch mixing trajectories
    tids = [b.samples[i][0] for i in range(len(b.samples))]
    assert len(set(tids)) == 2


def test_native_radius_search_matches_scipy(rng):
    from sgnn_tpu import native

    if not native.available():
        pytest.skip("no g++ / native lib")
    pos = rng.uniform(-2, 2, size=(500, 2)).astype(np.float64)
    s, r = native.radius_search_host(pos, 0.5, 64)
    # scipy oracle
    from scipy.spatial import cKDTree

    tree = cKDTree(pos)
    exp = set()
    for i, nbrs in enumerate(tree.query_ball_point(pos, 0.5)):
        for j in nbrs:
            if np.linalg.norm(pos[j] - pos[i]) < 0.5:
                exp.add((j, i))
    assert set(zip(s.tolist(), r.tolist())) == exp
    # max_degree agrees
    degs = np.bincount(r, minlength=len(pos))
    assert native.max_degree_host(pos, 0.5) == degs.max()


def test_native_radius_search_3d(rng):
    from sgnn_tpu import native

    if not native.available():
        pytest.skip("no g++ / native lib")
    pos = rng.uniform(-1, 1, size=(300, 3)).astype(np.float64)
    s, r = native.radius_search_host(pos, 0.4, 64)
    from scipy.spatial import cKDTree

    tree = cKDTree(pos)
    exp = set()
    for i, nbrs in enumerate(tree.query_ball_point(pos, 0.4)):
        for j in nbrs:
            if np.linalg.norm(pos[j] - pos[i]) < 0.4:
                exp.add((j, i))
    assert set(zip(s.tolist(), r.tolist())) == exp


def test_ms_dense_grads_match_coo(rng):
    """Grads through the dense path (sorted/planned gather VJPs) == COO."""
    from sgnn_tpu.physics.multi_scale_graph import build_dense_static_graph
    from sgnn_tpu.physics.multi_scale_simulator import ms_forward_batched

    s = 4
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=8, num_message_passing_steps=2, num_mlp_layers=2,
        input_sequence_length=s, num_scales=2, window_size=2,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), cfg)
    g = square_grid(6)
    n = len(g)
    coo = build_static_graph(cfg.graph_config, g, g2m_pad=512, m2m_pad=256, m2g_pad=512)
    dense = build_dense_static_graph(
        cfg.graph_config, g, g2m_rows=16, m2m_rows=16, m2g_rows=n
    )
    seqs = jnp.asarray(
        (g[None, :, None, :] + rng.normal(scale=0.01, size=(1, n, s, 2)).cumsum(2)).astype(np.float32)
    )
    types = jnp.zeros((1, n), jnp.int32)
    batch = lambda gr: jax.tree.map(lambda a: jnp.asarray(a)[None], gr)

    def loss(p, graph):
        acc, strain = ms_forward_batched(p, cfg, stats, seqs, types, graph)
        return jnp.sum(acc**2) + jnp.sum(strain**2)

    g_coo = jax.grad(loss)(params, batch(coo))
    g_dense = jax.grad(loss)(params, batch(dense))
    for a, b in zip(jax.tree.leaves(g_coo), jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_ms_dense_per_scale_matches_coo_3scales(rng):
    """num_scales=3: the dense path's PER-SCALE m2m sub-blocks (tight K
    per scale instead of the concatenated set's summed coarse-node
    degree) produce the same outputs AND grads as the combined COO path.

    This is the layout change that cuts the 62%-occupancy m2m slot
    padding at capacity scale (chained sampling makes every scale-2 node
    also a scale-1 node, so combined degree = sum of per-scale degrees)."""
    from sgnn_tpu.physics.multi_scale_graph import build_dense_static_graph
    from sgnn_tpu.physics.multi_scale_simulator import (
        ms_forward_batched,
        ms_predict_positions,
    )

    s = 4
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=8, num_message_passing_steps=3, num_mlp_layers=2,
        input_sequence_length=s, num_scales=3, window_size=2,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), cfg)
    g = square_grid(8)
    n = len(g)
    coo = build_static_graph(cfg.graph_config, g, g2m_pad=512, m2m_pad=512, m2g_pad=512)
    out = create_all_edges(cfg.graph_config, g)
    scale_ks = [
        int(np.bincount(e.receivers).max())
        for e in out["mesh2mesh_edges_per_scale"]
    ]
    dense = build_dense_static_graph(
        cfg.graph_config, g, g2m_rows=32, m2m_rows=[16, 8], m2g_rows=n,
        m2m_slots=scale_ks,
    )
    # the split is real: two scales, and each scale's K is tighter than
    # the combined max degree (a scale-2 node carries both scales' edges)
    assert len(dense.m2m) == 2
    comb_k = int(np.bincount(out["mesh2mesh_edges"].receivers).max())
    assert max(de.senders.shape[1] for de in dense.m2m) < comb_k

    seqs = jnp.asarray(
        (g[None, :, None, :] + rng.normal(scale=0.01, size=(1, n, s, 2)).cumsum(2)).astype(np.float32)
    )
    types = jnp.zeros((1, n), jnp.int32)
    batch = lambda gr: jax.tree.map(lambda a: jnp.asarray(a)[None], gr)

    # unbatched forward
    ref_pos, ref_strain = ms_predict_positions(
        params, cfg, stats, seqs[0], types[0], jax.tree.map(jnp.asarray, coo)
    )
    got_pos, got_strain = ms_predict_positions(
        params, cfg, stats, seqs[0], types[0], jax.tree.map(jnp.asarray, dense)
    )
    np.testing.assert_allclose(np.asarray(got_pos), np.asarray(ref_pos), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_strain), np.asarray(ref_strain), rtol=2e-5, atol=2e-5)

    # batched flat grads
    def loss(p, graph):
        acc, strain = ms_forward_batched(p, cfg, stats, seqs, types, graph)
        return jnp.sum(acc**2) + jnp.sum(strain**2)

    g_coo = jax.grad(loss)(params, batch(coo))
    g_dense = jax.grad(loss)(params, batch(dense))
    for a, b in zip(jax.tree.leaves(g_coo), jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_ms_dense_bf16_close_to_f32(rng):
    """Dense path with compute_dtype=bf16: outputs close to f32, grads
    flow (mixed-precision contract mirrors the single-scale flat path)."""
    import dataclasses

    from sgnn_tpu.physics.multi_scale_graph import build_dense_static_graph
    from sgnn_tpu.physics.multi_scale_simulator import (
        ms_forward_batched,
        ms_predict_accelerations_batched,
    )

    s = 4
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2, num_mlp_layers=2,
        input_sequence_length=s, num_scales=2, window_size=2,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), cfg)
    grid = square_grid(6)
    n = len(grid)
    dense = build_dense_static_graph(
        cfg.graph_config, grid, g2m_rows=16, m2m_rows=16, m2g_rows=n,
        tsp_rows={"g2m": n, "m2m": 16, "m2g": 16},
        tsp_slots={"g2m": 8, "m2m": 24, "m2g": 24},
    )
    dense_b = jax.tree.map(lambda a: jnp.asarray(a)[None], dense)
    seqs = jnp.asarray(
        (grid[:, None, :] + rng.normal(scale=0.01, size=(n, s, 2)).cumsum(1))
        .astype(np.float32)[None]
    )
    types = jnp.zeros((1, n), jnp.int32)

    ref = ms_forward_batched(params, cfg, stats, seqs, types, dense_b)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    got = ms_forward_batched(params, cfg16, stats, seqs, types, dense_b)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.1, atol=0.05)

    def loss(p, c):
        acc, tgt, strain = ms_predict_accelerations_batched(
            p, c, stats, seqs[:, :, -1] + 0.01, jnp.zeros_like(seqs), seqs,
            types, dense_b,
        )
        return jnp.mean((acc - tgt) ** 2) + jnp.mean(strain**2)

    g16 = jax.grad(lambda p: loss(p, cfg16))(params)
    g32 = jax.grad(lambda p: loss(p, cfg))(params)
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        assert np.all(np.isfinite(np.asarray(a)))
        # same sign structure / magnitude band as f32
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.35, atol=0.05
        )


def test_ms_coo_bf16_close_to_f32(rng):
    """COO path with compute_dtype=bf16 (new in r4, via the consolidated
    _interact): outputs close to f32, grads finite and in-band. With
    compute_dtype=None the same code path is bit-identical to the
    pre-consolidation formulation (pinned by test_golden_parity)."""
    import dataclasses

    s = 4
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2, num_mlp_layers=2,
        input_sequence_length=s, num_scales=2, window_size=2,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), cfg)
    grid = square_grid(6)
    n = len(grid)
    coo = build_static_graph(cfg.graph_config, grid, g2m_pad=512, m2m_pad=256, m2g_pad=512)
    coo_b = jax.tree.map(lambda a: jnp.asarray(a)[None], coo)
    seqs = jnp.asarray(
        (grid[:, None, :] + rng.normal(scale=0.01, size=(n, s, 2)).cumsum(1))
        .astype(np.float32)[None]
    )
    types = jnp.zeros((1, n), jnp.int32)
    from sgnn_tpu.physics.multi_scale_simulator import ms_forward_batched

    ref = ms_forward_batched(params, cfg, stats, seqs, types, coo_b)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    got = ms_forward_batched(params, cfg16, stats, seqs, types, coo_b)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.1, atol=0.05)

    def loss(p, c):
        acc, strain = ms_forward_batched(p, c, stats, seqs, types, coo_b)
        return jnp.mean(acc**2) + jnp.mean(strain**2)

    g16 = jax.grad(lambda p: loss(p, cfg16))(params)
    g32 = jax.grad(lambda p: loss(p, cfg))(params)
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        assert np.all(np.isfinite(np.asarray(a)))
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.35, atol=0.05
        )
