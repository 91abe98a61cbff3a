"""Multi-scale graph-axis partitioning vs single-device reference.

Runs on the virtual 8-device CPU mesh (conftest): the slab-partitioned
MultiScaleGNN forward/train step over a static hierarchy must reproduce
the single-device path on the same x-sorted node order (VERDICT r2 #3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgnn_tpu.parallel.ms_partition import (
    make_ms_partitioned_forward,
    make_ms_partitioned_train_step,
    ms_dataset_partition,
    ms_partition_sample,
    plan_ms_partition,
)
from sgnn_tpu.physics.multi_scale_graph import build_static_graph
from sgnn_tpu.physics.multi_scale_simulator import (
    MultiScaleSimulatorConfig,
    _forward,
    multi_scale_simulator_init,
)
from sgnn_tpu.physics.simulator import NormStats


def bar(nx=48, ny=8, spacing=0.5):
    xs, ys = np.meshgrid(np.arange(nx) * spacing, np.arange(ny) * spacing, indexing="ij")
    return np.stack([xs.ravel() - 1.0, ys.ravel()], -1).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    devices = np.asarray(jax.devices()[:4])
    return Mesh(devices.reshape(4), ("graph",))


def _setup(rng, s=4, nx=48, ny=8, shards=4):
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2,
        num_mlp_layers=2, input_sequence_length=s,
        num_scales=2, window_size=2, radius_multiplier=2.0,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), cfg)
    grid = bar(nx=nx, ny=ny)
    n = grid.shape[0]
    spec, order, sgraph = plan_ms_partition(cfg.graph_config, grid, shards)
    drift = rng.normal(scale=0.004, size=(n, s, 2)).cumsum(axis=1).astype(np.float32)
    seq_sorted = grid[order][:, None, :] + drift  # drift applied post-sort
    nt = spec.total_nodes
    seq_pad = np.zeros((nt, s, 2), np.float32)
    seq_pad[:n] = seq_sorted
    types = np.zeros(nt, np.int32)
    mask = np.zeros(nt, bool)
    mask[:n] = True
    return cfg, stats, params, spec, order, sgraph, grid, seq_pad, types, mask, n


def test_plan_validates_and_sizes_halo():
    cfg = MultiScaleSimulatorConfig(num_scales=3, window_size=2, input_sequence_length=4)
    grid = bar(nx=64, ny=8)
    spec, order, g = plan_ms_partition(cfg.graph_config, grid, 4)
    # x-sorted order
    assert (np.diff(grid[order, 0]) >= 0).all()
    # coarsest radius 2^2 * 2 * 0.5 = 4.0, but scale-2 senders live on the
    # 4-column coarse lattice: max x-overhang is 2.0 (strict < r kills the
    # 4.0 offset) = 4 grid columns x 8 rows = 32 rows before slack
    assert spec.halo >= 32
    # every sender within the ext window (enforced by _shard_edges)
    for t in (g.g2m, g.m2m, g.m2g):
        ext = spec.nodes_per_shard + 2 * spec.halo
        assert t.senders[t.mask].min() >= 0 and t.senders[t.mask].max() < ext
    # too many shards for the coarsest scale -> validation error
    with pytest.raises(ValueError):
        plan_ms_partition(
            MultiScaleSimulatorConfig(
                num_scales=3, window_size=3, input_sequence_length=4
            ).graph_config,
            bar(nx=24, ny=8),
            8,
        )


def test_ms_partitioned_forward_matches_single_device(mesh, rng):
    cfg, stats, params, spec, order, sgraph, grid, seq_pad, types, mask, n = _setup(rng)

    # single-device reference on the same sorted layout: static graph
    # built from the SORTED t=0 positions (same edge set the plan used)
    sg = build_static_graph(
        cfg.graph_config, grid[order], g2m_pad=2048, m2m_pad=1024, m2g_pad=2048
    )
    ref_acc, ref_strain = _forward(
        params, cfg, stats, jnp.asarray(seq_pad[:n]), jnp.asarray(types[:n]), sg
    )

    fwd = make_ms_partitioned_forward(mesh, cfg, stats, spec)
    acc, strain = fwd(
        params, jnp.asarray(seq_pad), jnp.asarray(types),
        jax.tree.map(jnp.asarray, sgraph),
    )
    np.testing.assert_allclose(
        np.asarray(acc)[:n], np.asarray(ref_acc), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(strain)[:n], np.asarray(ref_strain), rtol=2e-4, atol=2e-5
    )


def test_ms_partitioned_train_step_matches_single_device(mesh, rng):
    import optax

    from sgnn_tpu.physics.multi_scale_simulator import ms_predict_accelerations
    from sgnn_tpu.physics.noise import random_walk_position_noise

    cfg, stats, params, spec, order, sgraph, grid, seq_pad, types, mask, n = _setup(rng)
    nt = spec.total_nodes
    nxt = seq_pad[:, -1] + rng.normal(scale=0.01, size=(nt, 2)).astype(np.float32)
    nstrain = rng.normal(size=(nt,)).astype(np.float32)
    batch = {
        "positions": jnp.asarray(seq_pad),
        "next_position": jnp.asarray(nxt),
        "next_strain": jnp.asarray(nstrain),
        "particle_type": jnp.asarray(types),
        "node_mask": jnp.asarray(mask),
        "graph": jax.tree.map(jnp.asarray, sgraph),
    }
    noise_std = 1e-3
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    part_step = make_ms_partitioned_train_step(
        mesh, cfg, stats, spec, tx, noise_std=noise_std
    )

    sg = build_static_graph(
        cfg.graph_config, grid[order], g2m_pad=2048, m2m_pad=1024, m2g_pad=2048
    )

    def ref_loss(p, key):
        # same noise bits: sample at padded shape, slice real rows
        noise = random_walk_position_noise(key, batch["positions"].shape, noise_std)
        pa, ta, ps = ms_predict_accelerations(
            p, cfg, stats, batch["next_position"][:n], noise[:n],
            batch["positions"][:n], batch["particle_type"][:n], sg,
        )
        l = jnp.sum((pa - ta) ** 2, axis=-1) + (ps - batch["next_strain"][:n]) ** 2
        return jnp.mean(l)

    @jax.jit
    def ref_step(state, key):
        loss, grads = jax.value_and_grad(ref_loss)(state["params"], key)
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        return (
            {"params": optax.apply_updates(state["params"], updates),
             "opt_state": opt_state, "step": state["step"] + 1},
            loss,
        )

    ref_state = jax.tree.map(lambda x: x, state)
    for i in range(2):
        key = jax.random.key(50 + i)
        state, metrics = part_step(state, batch, key)
        ref_state, ref_l = ref_step(ref_state, key)
        np.testing.assert_allclose(float(metrics["train/loss"]), float(ref_l), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(state["params"]), jax.tree.leaves(ref_state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_ms_dataset_partition_common_shapes(rng):
    cfg = MultiScaleSimulatorConfig(num_scales=2, window_size=2, input_sequence_length=4)
    frames = [bar(nx=40, ny=8), bar(nx=48, ny=8), bar(nx=44, ny=8)]
    spec, plans = ms_dataset_partition(cfg.graph_config, frames, 4)
    shapes = [
        jax.tree.map(lambda a: a.shape, g) for _, g in plans
    ]
    assert shapes[0] == shapes[1] == shapes[2]
    assert spec.total_nodes >= max(len(f) for f in frames)
    # ms_partition_sample round-trip
    n = len(frames[1])
    batch = {
        "positions": rng.normal(size=(1, n, 4, 2)).astype(np.float32),
        "next_position": rng.normal(size=(1, n, 2)).astype(np.float32),
        "next_strain": rng.normal(size=(1, n)).astype(np.float32),
        "particle_type": np.zeros((1, n), np.int32),
        "node_mask": np.ones((1, n), bool),
    }
    order = plans[1][0]
    out = ms_partition_sample(batch, spec, order)
    assert out["positions"].shape == (spec.total_nodes, 4, 2)
    assert out["node_mask"].sum() == n
    np.testing.assert_array_equal(
        out["positions"][:n], batch["positions"][0][order]
    )


def test_ms_partitioned_multi_step_matches_single_steps(mesh, rng):
    """inner_steps x graph_parallel for the ms family: scanned steps ==
    repeated single partitioned steps with fold_in keys."""
    import optax

    from sgnn_tpu.parallel.ms_partition import make_ms_partitioned_multi_step

    cfg, stats, params, spec, order, sgraph, grid, seq_pad, types, mask, n = _setup(rng)
    nt = spec.total_nodes
    nxt = seq_pad[:, -1] + rng.normal(scale=0.01, size=(nt, 2)).astype(np.float32)
    batch = {
        "positions": jnp.asarray(seq_pad),
        "next_position": jnp.asarray(nxt),
        "next_strain": jnp.asarray(rng.normal(size=(nt,)).astype(np.float32)),
        "particle_type": jnp.asarray(types),
        "node_mask": jnp.asarray(mask),
        "graph": jax.tree.map(jnp.asarray, sgraph),
    }
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    inner = 2
    key = jax.random.key(21)

    multi = make_ms_partitioned_multi_step(
        mesh, cfg, stats, spec, tx, inner, noise_std=1e-3
    )
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (inner,) + x.shape), batch
    )
    m_state, m_metrics = multi(state, stacked, key)

    single = make_ms_partitioned_train_step(mesh, cfg, stats, spec, tx, noise_std=1e-3)
    s_state = state
    for i in range(inner):
        s_state, s_metrics = single(s_state, batch, jax.random.fold_in(key, i))
        np.testing.assert_allclose(
            float(m_metrics["train/loss"][i]), float(s_metrics["train/loss"]),
            rtol=1e-5,
        )
    for a, b in zip(jax.tree.leaves(m_state["params"]), jax.tree.leaves(s_state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)


def test_ms_partitioned_rollout_matches_single_device(mesh, rng):
    """Distributed ms rollout (static graph, no replanning needed) ==
    ms_rollout on the same sorted layout."""
    from sgnn_tpu.parallel.ms_partition import make_ms_partitioned_rollout
    from sgnn_tpu.physics.multi_scale_simulator import ms_rollout

    cfg, stats, params, spec, order, sgraph, grid, seq_pad, types, mask, n = _setup(
        rng, s=4
    )
    t_total = 7
    nt = spec.total_nodes
    traj = np.zeros((nt, t_total, 2), np.float32)
    drift = rng.normal(scale=0.003, size=(n, t_total, 2)).cumsum(axis=1).astype(np.float32)
    traj[:n] = grid[order][:, None, :] + drift
    strains = np.zeros((t_total, nt), np.float32)
    strains[:, :n] = rng.normal(size=(t_total, n)).astype(np.float32)
    types = types.copy()
    types[3] = -1  # one erosional particle follows ground truth

    sg = build_static_graph(
        cfg.graph_config, grid[order], g2m_pad=2048, m2m_pad=1024, m2g_pad=2048
    )
    ref = ms_rollout(
        params, cfg, stats, jnp.asarray(traj[:n]), jnp.asarray(types[:n]),
        jnp.asarray(strains[:, :n]), sg, node_mask=jnp.asarray(mask[:n]),
    )
    run = make_ms_partitioned_rollout(mesh, cfg, stats, spec)
    out = run(
        params, jnp.asarray(traj), jnp.asarray(types), jnp.asarray(strains),
        jnp.asarray(mask), jax.tree.map(jnp.asarray, sgraph),
    )
    m = mask
    np.testing.assert_allclose(
        np.asarray(out["predicted_rollout"])[:, m],
        np.asarray(ref["predicted_rollout"]),
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["rmse_position_per_step"]),
        np.asarray(ref["rmse_position_per_step"]),
        rtol=1e-3, atol=1e-5,
    )


def test_ms_partitioned_forward_bf16_matches_single_device(mesh, rng):
    """compute_dtype=bfloat16 flows through the sharded path (r4: the
    partitioned forward runs the consolidated _interact, so mixed
    precision is the same contract as single-device). Tolerances are
    bf16-scale: the halo exchange reorders no sums, but XLA fuses the
    bf16 chains differently across shard boundaries."""
    import dataclasses

    cfg, stats, params, spec, order, sgraph, grid, seq_pad, types, mask, n = _setup(rng)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")

    sg = build_static_graph(
        cfg.graph_config, grid[order], g2m_pad=2048, m2m_pad=1024, m2g_pad=2048
    )
    ref_acc, ref_strain = _forward(
        params, cfg16, stats, jnp.asarray(seq_pad[:n]), jnp.asarray(types[:n]), sg
    )

    fwd = make_ms_partitioned_forward(mesh, cfg16, stats, spec)
    acc, strain = fwd(
        params, jnp.asarray(seq_pad), jnp.asarray(types),
        jax.tree.map(jnp.asarray, sgraph),
    )
    np.testing.assert_allclose(
        np.asarray(acc)[:n], np.asarray(ref_acc), rtol=0.05, atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(strain)[:n], np.asarray(ref_strain), rtol=0.05, atol=0.02
    )


def _setup3(rng, s=4, nx=64, ny=8, shards=4):
    """3-scale variant: exercises the per-scale m2m tuple under sharding."""
    cfg = MultiScaleSimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2,
        num_mlp_layers=2, input_sequence_length=s,
        num_scales=3, window_size=2, radius_multiplier=2.0,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = multi_scale_simulator_init(jax.random.key(0), cfg)
    grid = bar(nx=nx, ny=ny)
    n = grid.shape[0]
    spec, order, sgraph = plan_ms_partition(
        cfg.graph_config, grid, shards, layout="dense"
    )
    drift = rng.normal(scale=0.004, size=(n, s, 2)).cumsum(axis=1).astype(np.float32)
    seq_sorted = grid[order][:, None, :] + drift
    nt = spec.total_nodes
    seq_pad = np.zeros((nt, s, 2), np.float32)
    seq_pad[:n] = seq_sorted
    types = np.zeros(nt, np.int32)
    mask = np.zeros(nt, bool)
    mask[:n] = True
    return cfg, stats, params, spec, order, sgraph, grid, seq_pad, types, mask, n


def test_ms_partitioned_dense_forward_matches_single_device(mesh, rng):
    """The dense-slot sharded forward (VERDICT r4 #4b: per-shard
    DenseEdges + transpose plans routed through _interact_dense /
    _interact_dense_scales) == the single-device dense path, 3 scales."""
    from sgnn_tpu.parallel.ms_partition import ShardedDenseMSGraph
    from sgnn_tpu.physics.multi_scale_graph import build_dense_static_graph

    cfg, stats, params, spec, order, sgraph, grid, seq_pad, types, mask, n = _setup3(rng)
    assert isinstance(sgraph, ShardedDenseMSGraph)
    assert len(sgraph.m2m) == 2  # per-scale tuple survives sharding

    dg = build_dense_static_graph(
        cfg.graph_config, grid[order],
        g2m_rows=n, m2m_rows=n, m2g_rows=n,
    )
    ref_acc, ref_strain = _forward(
        params, cfg, stats, jnp.asarray(seq_pad[:n]), jnp.asarray(types[:n]),
        jax.tree.map(jnp.asarray, dg),
    )

    fwd = make_ms_partitioned_forward(mesh, cfg, stats, spec)
    acc, strain = fwd(
        params, jnp.asarray(seq_pad), jnp.asarray(types),
        jax.tree.map(jnp.asarray, sgraph),
    )
    np.testing.assert_allclose(
        np.asarray(acc)[:n], np.asarray(ref_acc), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(strain)[:n], np.asarray(ref_strain), rtol=2e-4, atol=2e-5
    )


def test_ms_partitioned_dense_train_step_matches_single_device(mesh, rng):
    """One Adam step through the dense sharded path (planned-gather VJPs
    + halo transposes) tracks a single-device dense twin bit-close."""
    import optax

    from sgnn_tpu.physics.multi_scale_graph import build_dense_static_graph
    from sgnn_tpu.physics.multi_scale_simulator import (
        ms_predict_accelerations_batched,
    )

    cfg, stats, params, spec, order, sgraph, grid, seq_pad, types, mask, n = _setup3(rng)
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    nt = spec.total_nodes
    nxt = np.zeros((nt, 2), np.float32)
    nxt[:n] = seq_pad[:n, -1] + 0.01
    strain_t = np.zeros(nt, np.float32)
    batch = {
        "positions": jnp.asarray(seq_pad),
        "next_position": jnp.asarray(nxt),
        "next_strain": jnp.asarray(strain_t),
        "particle_type": jnp.asarray(types),
        "node_mask": jnp.asarray(mask),
        "graph": jax.tree.map(jnp.asarray, sgraph),
    }
    step = make_ms_partitioned_train_step(
        mesh, cfg, stats, spec, tx, noise_std=0.0
    )
    new_state, metrics = step(state, batch, jax.random.key(1))

    # single-device twin on the same sorted layout (dense graph, B=1)
    dg = build_dense_static_graph(
        cfg.graph_config, grid[order], g2m_rows=n, m2m_rows=n, m2g_rows=n,
    )
    dg_b = jax.tree.map(lambda a: jnp.asarray(a)[None], dg)

    def loss_fn(p):
        acc, tgt, strain = ms_predict_accelerations_batched(
            p, cfg, stats, jnp.asarray(nxt[None, :n]),
            jnp.zeros((1, n, cfg.input_sequence_length, 2)),
            jnp.asarray(seq_pad[None, :n]), jnp.asarray(types[None, :n]), dg_b,
        )
        l = jnp.sum((acc - tgt) ** 2, -1) + (strain - strain_t[None, :n]) ** 2
        return jnp.mean(l)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(
        float(metrics["train/loss"]), float(ref_loss), rtol=2e-5
    )
    upd, _ = tx.update(ref_grads, state["opt_state"], params)
    ref_params = optax.apply_updates(params, upd)
    for a, b in zip(
        jax.tree.leaves(new_state["params"]), jax.tree.leaves(ref_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_dense_shard_sizes_use_exact_slot_widths():
    """r5 regression: _dense_shard_sizes must NOT round the slot width K
    up (every padded slot row runs the full m2m stack; the old
    round-to-4 cost +73% vs matched single-chip at the 76k TPU anchor,
    BASELINE.md). Rows stay padded to pad_multiple; K and tsp_K are the
    exact per-shard maxima."""
    from sgnn_tpu.parallel.ms_partition import _dense_shard_sizes

    # one shard, receiver 0 has degree 5 (odd, not a multiple of 4)
    senders = np.array([0, 1, 2, 3, 4, 5, 6], np.int64)
    receivers = np.array([0, 0, 0, 0, 0, 1, 2], np.int64)
    rows, k, tsp_rows, tsp_k = _dense_shard_sizes(senders, receivers, per=64, num_shards=1)
    assert k == 5  # exact max degree, no round-up
    assert tsp_k == 1  # every sender appears once
    assert rows % 8 == 0 and tsp_rows % 8 == 0  # rows keep the pad multiple
