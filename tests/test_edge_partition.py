"""Edge-partitioned message passing vs single-device reference.

Runs on the virtual 8-device CPU mesh (conftest) — the distributed
forward over a 1D-partitioned graph must reproduce the single-device
forward bit-for-bit-close on the same (spatially sorted) node order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sgnn_tpu.parallel.edge_partition import (
    PartitionSpec1D,
    make_partitioned_forward,
    make_partitioned_loss,
    make_partitioned_predict_positions,
    partition_plan,
    scatter_to_shards,
)
from sgnn_tpu.physics.simulator import (
    NormStats,
    SimulatorConfig,
    predict_positions,
    simulator_init,
)


def bar_lattice(nx=64, ny=8, spacing=0.5, jitter=0.02, seed=0):
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(nx) * spacing, np.arange(ny) * spacing, indexing="ij")
    pos = np.stack([xs.ravel() - 1.0, ys.ravel()], -1).astype(np.float32)
    return pos + rng.normal(scale=jitter, size=pos.shape).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    devices = np.asarray(jax.devices()[:8])
    return Mesh(devices.reshape(8), ("graph",))


def setup(seed=0, s=5, nx=64, ny=8):
    rng = np.random.default_rng(seed)
    pos = bar_lattice(nx=nx, ny=ny, seed=seed)
    n = pos.shape[0]
    cfg = SimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=3,
        input_sequence_length=s, connectivity_radius=0.6, max_neighbors=20,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    params = simulator_init(jax.random.key(seed), cfg)
    drift = rng.normal(scale=0.005, size=(n, s, 2)).cumsum(axis=1).astype(np.float32)
    seq = pos[:, None, :] + drift
    return cfg, stats, params, seq, n


def test_partition_plan_validates():
    pos = bar_lattice(nx=64, ny=8)
    spec, order = partition_plan(pos, 8, 0.6)
    assert spec.num_shards == 8
    assert spec.nodes_per_shard * 8 >= len(pos)
    assert spec.halo >= 8
    # x-sorted
    xs = pos[order, 0]
    assert (np.diff(xs) >= 0).all()
    # too many shards for a short bar (slabs split single x-columns) -> error
    with pytest.raises(ValueError):
        partition_plan(bar_lattice(nx=4, ny=16), 8, 0.6)


def test_partitioned_forward_matches_single_device(mesh):
    cfg, stats, params, seq, n = setup()
    spec, order = partition_plan(seq[:, -1], 8, cfg.connectivity_radius)

    seq_sorted = scatter_to_shards(seq, order, spec)
    types = np.zeros(spec.total_nodes, np.int32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True  # order maps [0,n) -> sorted positions; pad at end

    # single-device reference on the sorted+padded arrays
    ref_next, ref_strain = predict_positions(
        params, cfg, stats, jnp.asarray(seq_sorted), jnp.asarray(types),
        jnp.asarray(mask),
    )

    fwd = make_partitioned_predict_positions(mesh, cfg, stats, spec)
    next_pos, strain = fwd(
        params, jnp.asarray(seq_sorted), jnp.asarray(types), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(next_pos)[mask], np.asarray(ref_next)[mask], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(strain)[mask], np.asarray(ref_strain)[mask], rtol=2e-4, atol=2e-5
    )


def test_partitioned_loss_and_grads(mesh):
    cfg, stats, params, seq, n = setup()
    spec, order = partition_plan(seq[:, -1], 8, cfg.connectivity_radius)
    seq_sorted = scatter_to_shards(seq, order, spec)
    rng = np.random.default_rng(1)
    noise = rng.normal(scale=1e-3, size=seq_sorted.shape).astype(np.float32)
    nxt = seq_sorted[:, -1] + rng.normal(scale=0.01, size=(spec.total_nodes, 2)).astype(np.float32)
    nstrain = rng.normal(size=(spec.total_nodes,)).astype(np.float32)
    types = np.zeros(spec.total_nodes, np.int32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True

    loss_fn = make_partitioned_loss(mesh, cfg, stats, spec)
    args = (
        jnp.asarray(seq_sorted), jnp.asarray(noise), jnp.asarray(nxt),
        jnp.asarray(nstrain), jnp.asarray(types), jnp.asarray(mask),
    )
    loss, grads = jax.value_and_grad(lambda p: loss_fn(p, *args))(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))

    # distributed grads match single-device grads of the same objective
    from sgnn_tpu.physics.simulator import predict_accelerations

    def ref_loss(p):
        pa, ta, ps = predict_accelerations(
            p, cfg, stats, args[2], args[1], args[0], args[4], args[5]
        )
        m = args[5].astype(pa.dtype)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        l = jnp.sum((pa - ta) ** 2, axis=-1) + (ps - args[3]) ** 2
        return jnp.sum(l * m) / denom

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)


def test_multihost_global_batch_single_process():
    """make_global_batch on a single process == plain sharded device_put."""
    import numpy as np
    from sgnn_tpu.parallel import make_mesh, multihost

    data_mesh = make_mesh(data=8, graph=1)
    local = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    out = multihost.make_global_batch(local, data_mesh)
    assert out["x"].shape == (8, 4)
    np.testing.assert_allclose(np.asarray(out["x"]), local["x"])
    assert multihost.host_seed(7) == 7 * 1_000_003
    assert multihost.host_batch_slice(16) == 16
    # no coordinator configured -> initialize is a no-op
    multihost.initialize()


def test_partitioned_forward_celltable_domain(mesh):
    """The per-shard cell-table search (cfg.domain set) matches the
    single-device forward, same as the bruteforce branch."""
    import dataclasses

    cfg, stats, params, seq, n = setup()
    cfg = dataclasses.replace(cfg, domain=((-2.0, -2.0), (34.0, 6.0)))
    spec, order = partition_plan(seq[:, -1], 8, cfg.connectivity_radius)

    seq_sorted = scatter_to_shards(seq, order, spec)
    types = np.zeros(spec.total_nodes, np.int32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True

    ref_next, ref_strain = predict_positions(
        params, cfg, stats, jnp.asarray(seq_sorted), jnp.asarray(types),
        jnp.asarray(mask),
    )
    fwd = make_partitioned_predict_positions(mesh, cfg, stats, spec)
    next_pos, strain = fwd(
        params, jnp.asarray(seq_sorted), jnp.asarray(types), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(next_pos)[mask], np.asarray(ref_next)[mask], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(strain)[mask], np.asarray(ref_strain)[mask], rtol=2e-4, atol=2e-5
    )


def test_partitioned_train_step_matches_single_device(mesh):
    """3 optimizer steps of the partitioned trainer == a single-device
    trainer on the same flat objective (same noise bits via same keys)."""
    import optax
    from sgnn_tpu.parallel.edge_partition import make_partitioned_train_step
    from sgnn_tpu.physics.noise import random_walk_position_noise
    from sgnn_tpu.physics.simulator import predict_accelerations

    cfg, stats, params, seq, n = setup()
    spec, order = partition_plan(seq[:, -1], 8, cfg.connectivity_radius)
    seq_sorted = scatter_to_shards(seq, order, spec)
    rng = np.random.default_rng(3)
    nxt = seq_sorted[:, -1] + rng.normal(scale=0.01, size=(spec.total_nodes, 2)).astype(np.float32)
    nstrain = rng.normal(size=(spec.total_nodes,)).astype(np.float32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True
    batch = {
        "positions": jnp.asarray(seq_sorted),
        "next_position": jnp.asarray(nxt),
        "next_strain": jnp.asarray(nstrain),
        "particle_type": jnp.zeros(spec.total_nodes, jnp.int32),
        "node_mask": jnp.asarray(mask),
    }
    noise_std = 1e-3
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    part_step = make_partitioned_train_step(
        mesh, cfg, stats, spec, tx, noise_std=noise_std
    )

    # single-device twin: same flat arrays, same noise function + key
    def ref_loss(p, key):
        noise = random_walk_position_noise(key, batch["positions"].shape, noise_std)
        pa, ta, ps = predict_accelerations(
            p, cfg, stats, batch["next_position"], noise, batch["positions"],
            batch["particle_type"], batch["node_mask"],
        )
        m = batch["node_mask"].astype(pa.dtype)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        l = jnp.sum((pa - ta) ** 2, axis=-1) + (ps - batch["next_strain"]) ** 2
        return jnp.sum(l * m) / denom

    @jax.jit
    def ref_step(state, key):
        loss, grads = jax.value_and_grad(ref_loss)(state["params"], key)
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state,
                "step": state["step"] + 1}, loss

    ref_state = jax.tree.map(lambda x: x, state)
    for i in range(3):
        key = jax.random.key(100 + i)
        state, metrics = part_step(state, batch, key)
        ref_state, ref_l = ref_step(ref_state, key)
        np.testing.assert_allclose(
            float(metrics["train/loss"]), float(ref_l), rtol=2e-4
        )
        assert int(metrics["train/halo_violations"]) == 0
    assert int(state["step"]) == 3
    for a, b in zip(jax.tree.leaves(state["params"]), jax.tree.leaves(ref_state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_partitioned_rollout_matches_single_device(mesh):
    from sgnn_tpu.parallel.edge_partition import make_partitioned_rollout
    from sgnn_tpu.physics.rollout import rollout as rollout_ref

    cfg, stats, params, seq, n = setup(s=5)
    t_total = 9
    rng = np.random.default_rng(7)
    # full trajectory [N, T, dim]: the window drifts gently
    drift = rng.normal(scale=0.003, size=(n, t_total, 2)).cumsum(axis=1).astype(np.float32)
    traj = seq[:, :1] + drift
    spec, order = partition_plan(traj[:, 0], 8, cfg.connectivity_radius)
    traj_sorted = scatter_to_shards(traj, order, spec)
    strains = rng.normal(size=(t_total, n)).astype(np.float32)
    strains_sorted = np.zeros((t_total, spec.total_nodes), np.float32)
    strains_sorted[:, : n] = strains[:, order]
    types = np.zeros(spec.total_nodes, np.int32)
    types[5] = -1  # one erosional particle follows ground truth
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True

    args = (
        jnp.asarray(traj_sorted), jnp.asarray(types),
        jnp.asarray(strains_sorted), jnp.asarray(mask),
    )
    ref = rollout_ref(params, cfg, stats, args[0], args[1], args[2], node_mask=args[3])
    run = make_partitioned_rollout(mesh, cfg, stats, spec)
    out = run(params, *args)

    assert np.asarray(out["halo_violations"]).shape == (t_total - 5,)
    assert int(np.asarray(out["halo_violations"]).sum()) == 0
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out["predicted_rollout"])[:, m],
        np.asarray(ref["predicted_rollout"])[:, m],
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["rmse_position"]), np.asarray(ref["rmse_position"]),
        rtol=1e-3, atol=1e-5,
    )


def test_halo_guard_fires_on_drift(mesh):
    """Deforming nodes past their slab's reach trips the violation counter
    instead of silently losing edges (VERDICT r1 weak #3)."""
    from sgnn_tpu.parallel.edge_partition import make_partitioned_train_step
    import optax

    cfg, stats, params, seq, n = setup()
    spec, order = partition_plan(seq[:, -1], 8, cfg.connectivity_radius)
    seq_sorted = scatter_to_shards(seq, order, spec)
    # teleport the first slab's interior nodes far to the right: their x
    # extent now reaches non-adjacent slabs
    bad = seq_sorted.copy()
    bad[: spec.nodes_per_shard // 2, :, 0] += 20.0
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    step = make_partitioned_train_step(mesh, cfg, stats, spec, tx, noise_std=1e-4)
    batch = {
        "positions": jnp.asarray(bad),
        "next_position": jnp.asarray(bad[:, -1]),
        "next_strain": jnp.zeros(spec.total_nodes, jnp.float32),
        "particle_type": jnp.zeros(spec.total_nodes, jnp.int32),
        "node_mask": jnp.asarray(mask),
    }
    new_state, metrics = step(state, batch, jax.random.key(0))
    assert int(metrics["train/halo_violations"]) > 0
    # r4: a violated step is REJECTED — its gradients were computed on a
    # truncated edge set, so params and optimizer state must be no-ops
    assert int(metrics["train/halo_rejected"]) == 1
    for a, b in zip(jax.tree.leaves(new_state["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(new_state["opt_state"]), jax.tree.leaves(state["opt_state"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # pristine geometry stays quiet and the update applies
    batch["positions"] = jnp.asarray(seq_sorted)
    batch["next_position"] = jnp.asarray(seq_sorted[:, -1])
    new_state, metrics = step(state, batch, jax.random.key(0))
    assert int(metrics["train/halo_violations"]) == 0
    assert int(metrics["train/halo_rejected"]) == 0
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(new_state["params"]), jax.tree.leaves(params))
    )
    assert changed


def test_dataset_partition_plan_covers_frames():
    from sgnn_tpu.parallel.edge_partition import dataset_partition_plan

    f0 = bar_lattice(nx=64, ny=8, seed=0)
    f1 = f0.copy()
    f1[:, 0] *= 0.7  # compressed bar (impact) — denser boundaries
    spec = dataset_partition_plan([f0, f1], 8, 0.6)
    # the combined halo covers what each frame needs on the pinned slab size
    for f in (f0, f1):
        spec_f, _ = partition_plan(
            f, 8, 0.6, nodes_per_shard=spec.nodes_per_shard
        )
        assert spec.halo >= spec_f.halo
    assert spec.total_nodes >= len(f0)
    # an incompatible frame (bar crushed inside one radius) still raises
    f2 = f0.copy()
    f2[:, 0] *= 0.01
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dataset_partition_plan([f0, f2], 8, 0.6)


def test_partitioned_multi_step_matches_single_steps(mesh):
    """lax.scan'd partitioned steps (inner_steps x graph_parallel) ==
    repeated make_partitioned_train_step calls with fold_in keys."""
    import optax
    from sgnn_tpu.parallel.edge_partition import (
        make_partitioned_multi_step,
        make_partitioned_train_step,
    )

    cfg, stats, params, seq, n = setup()
    spec, order = partition_plan(seq[:, -1], 8, cfg.connectivity_radius)
    seq_sorted = scatter_to_shards(seq, order, spec)
    rng = np.random.default_rng(9)
    nxt = seq_sorted[:, -1] + rng.normal(scale=0.01, size=(spec.total_nodes, 2)).astype(np.float32)
    nstrain = rng.normal(size=(spec.total_nodes,)).astype(np.float32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True
    batch = {
        "positions": jnp.asarray(seq_sorted),
        "next_position": jnp.asarray(nxt),
        "next_strain": jnp.asarray(nstrain),
        "particle_type": jnp.zeros(spec.total_nodes, jnp.int32),
        "node_mask": jnp.asarray(mask),
    }
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    inner = 3
    key = jax.random.key(11)

    multi = make_partitioned_multi_step(
        mesh, cfg, stats, spec, tx, inner, noise_std=1e-3
    )
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (inner,) + x.shape), batch
    )
    m_state, m_metrics = multi(state, stacked, key)

    single = make_partitioned_train_step(mesh, cfg, stats, spec, tx, noise_std=1e-3)
    s_state = state
    for i in range(inner):
        s_state, s_metrics = single(s_state, batch, jax.random.fold_in(key, i))
        np.testing.assert_allclose(
            float(m_metrics["train/loss"][i]), float(s_metrics["train/loss"]),
            rtol=1e-5,
        )
    assert int(m_state["step"]) == inner
    for a, b in zip(jax.tree.leaves(m_state["params"]), jax.tree.leaves(s_state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)


def test_replanning_rollout_clean_matches_plain(mesh):
    """On gently drifting geometry (no violations) the replanning driver
    reproduces the scan-based distributed rollout and replans zero times."""
    from sgnn_tpu.parallel.edge_partition import (
        make_partitioned_rollout,
        make_replanning_rollout,
    )

    cfg, stats, params, seq, n = setup(s=5)
    t_total = 8
    rng = np.random.default_rng(7)
    drift = rng.normal(scale=0.003, size=(n, t_total, 2)).cumsum(axis=1).astype(np.float32)
    traj = seq[:, :1] + drift
    strains = rng.normal(size=(t_total, n)).astype(np.float32)
    types = np.zeros(n, np.int32)
    mask = np.ones(n, bool)
    spec, order = partition_plan(traj[:, 0], 8, cfg.connectivity_radius)

    run_replan = make_replanning_rollout(mesh, cfg, stats, spec)
    out = run_replan(params, traj, types, strains, mask)
    assert out["replans"] == 0
    assert int(out["halo_violations"].sum()) == 0

    # scan-based twin on the pre-sorted layout
    traj_sorted = scatter_to_shards(traj, order, spec)
    strains_sorted = np.zeros((t_total, spec.total_nodes), np.float32)
    strains_sorted[:, :n] = strains[:, order]
    mask_s = np.zeros(spec.total_nodes, bool)
    mask_s[:n] = True
    plain = make_partitioned_rollout(mesh, cfg, stats, spec)
    ref = plain(
        params, jnp.asarray(traj_sorted),
        jnp.zeros(spec.total_nodes, jnp.int32),
        jnp.asarray(strains_sorted), jnp.asarray(mask_s),
    )
    ref_pred = np.zeros_like(out["predicted_rollout"])
    ref_pred[:, order] = np.asarray(ref["predicted_rollout"])[:, :n]
    np.testing.assert_allclose(
        out["predicted_rollout"], ref_pred, rtol=1e-4, atol=1e-6
    )


def test_replanning_rollout_resolves_deformation(mesh):
    """A block of (erosional) particles migrates across every slab
    mid-rollout: the warn-only driver would silently truncate their
    edges; the replanning driver re-sorts, re-runs, matches the
    single-device rollout, and reports replans > 0 with zero residual
    violations (VERDICT r2 #5)."""
    import dataclasses as dc

    from sgnn_tpu.parallel.edge_partition import make_replanning_rollout
    from sgnn_tpu.physics.rollout import rollout as rollout_ref

    cfg, stats, params, seq, n = setup(s=5, nx=64, ny=8)
    t_total = 10
    s = 5
    pos0 = seq[:, -1]  # [n, 2]
    x_min, x_max = pos0[:, 0].min(), pos0[:, 0].max()
    migrate = pos0[:, 0] < x_min + 4.0  # leftmost block of columns
    assert 50 < migrate.sum() < n // 2

    traj = np.repeat(pos0[:, None, :], t_total, axis=1).astype(np.float32)
    shift = np.linspace(0.0, x_max - x_min, t_total, dtype=np.float32)
    traj[migrate, :, 0] += shift[None, :]  # crosses every slab by the end
    types = np.where(migrate, -1, 0).astype(np.int32)  # migrators follow gt
    strains = np.zeros((t_total, n), np.float32)
    mask = np.ones(n, bool)

    spec, _ = partition_plan(traj[:, 0], 4, cfg.connectivity_radius)
    # generous halo (but < slab) so post-replan layouts always validate
    spec = dc.replace(spec, halo=spec.nodes_per_shard // 2)

    run = make_replanning_rollout(mesh, cfg, stats, spec)
    out = run(params, traj, types, strains, mask)
    assert out["replans"] > 0
    assert int(out["halo_violations"].sum()) == 0

    ref = rollout_ref(
        params, cfg, stats, jnp.asarray(traj), jnp.asarray(types),
        jnp.asarray(strains), node_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        out["predicted_rollout"], np.asarray(ref["predicted_rollout"]),
        rtol=2e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        out["rmse_position"], np.asarray(ref["rmse_position"]),
        rtol=2e-3, atol=1e-5,
    )


def test_partitioned_forward_bf16_matches_single_device(mesh):
    """compute_dtype=bfloat16 through the partitioned path vs the tuned
    single-device bf16 forward (r4: _sharded_forward now runs
    epd_flat._process_decode, so the mixed-precision contract is
    identical; only bf16 fusion boundaries differ across shards)."""
    import dataclasses

    cfg, stats, params, seq, n = setup()
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    spec, order = partition_plan(seq[:, -1], 8, cfg.connectivity_radius)

    seq_sorted = scatter_to_shards(seq, order, spec)
    types = np.zeros(spec.total_nodes, np.int32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True

    ref_next, ref_strain = predict_positions(
        params, cfg16, stats, jnp.asarray(seq_sorted), jnp.asarray(types),
        jnp.asarray(mask),
    )
    fwd = make_partitioned_predict_positions(mesh, cfg16, stats, spec)
    next_pos, strain = fwd(
        params, jnp.asarray(seq_sorted), jnp.asarray(types), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(next_pos)[mask], np.asarray(ref_next)[mask], rtol=0.05, atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(strain)[mask], np.asarray(ref_strain)[mask], rtol=0.05, atol=0.02
    )


def test_partitioned_symmetric_gather_grads_match(mesh, monkeypatch):
    """symmetric_gather=True routes the sharded sender-gather VJP through
    the ext-table reverse index (scatter-free); gradients must equal the
    plain scatter-add path AND the single-device reference. Boundary
    contributions (reverses owned by neighbor shards) flow back through
    the halo-exchange transpose — this test's 8-shard split exercises
    those paths on every interior boundary."""
    import dataclasses

    from sgnn_tpu.parallel import edge_partition as ep

    monkeypatch.setattr(ep, "_SYM_MIN_LOCAL_ROWS", 0)  # engage at test size
    cfg, stats, params, seq, n = setup()
    cfg_sym = dataclasses.replace(cfg, symmetric_gather=True)
    spec, order = partition_plan(seq[:, -1], 8, cfg.connectivity_radius)
    seq_sorted = scatter_to_shards(seq, order, spec)
    rng = np.random.default_rng(1)
    noise = rng.normal(scale=1e-3, size=seq_sorted.shape).astype(np.float32)
    nxt = seq_sorted[:, -1] + rng.normal(scale=0.01, size=(spec.total_nodes, 2)).astype(np.float32)
    nstrain = rng.normal(size=(spec.total_nodes,)).astype(np.float32)
    types = np.zeros(spec.total_nodes, np.int32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True
    args = (
        jnp.asarray(seq_sorted), jnp.asarray(noise), jnp.asarray(nxt),
        jnp.asarray(nstrain), jnp.asarray(types), jnp.asarray(mask),
    )

    loss_plain = make_partitioned_loss(mesh, cfg, stats, spec)
    loss_sym = make_partitioned_loss(mesh, cfg_sym, stats, spec)
    l0, g0 = jax.value_and_grad(lambda p: loss_plain(p, *args))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_sym(p, *args))(params)
    # forward identical (the rev index only changes the VJP)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_rejection_tracker_contract():
    """Skip semantics + the consecutive-rejection abort (ADVICE r4): a
    rejected step is a params/opt no-op (asserted above in
    test_halo_guard_fires_on_drift) and the trainer SKIPS the sample —
    there is no re-feed — while RejectionTracker fails loudly once every
    consecutive check point is rejected (permanently outgrown plan)."""
    import pytest

    from sgnn_tpu.parallel.edge_partition import RejectionTracker

    t = RejectionTracker(limit=3)
    t.update(True)
    t.update(True)
    t.update(False)  # a clean step resets the consecutive count
    t.update(True)
    t.update(True)
    assert t.total == 4 and t.consecutive == 2
    with pytest.raises(RuntimeError, match="halo-contract"):
        t.update(True)


def test_partitioned_banded_gathers_exact(mesh, monkeypatch):
    """Per-shard banded gathers (VERDICT r4 #5): with band_nodes set and
    the engagement thresholds forced down to test scale, the sharded
    forward's banded fwd sender gathers and banded sym-VJP
    reverse-gathers produce outputs and grads bit-equal to the unbanded
    sharded path, and the guard counts zero violations (the halo offset
    centers the band in ext coordinates correctly)."""
    import dataclasses

    from sgnn_tpu.ops import sym_gather as sg
    from sgnn_tpu.parallel.edge_partition import (
        _build_forward,
        partition_plan,
        scatter_to_shards,
    )

    cfg, stats, params, seq, n = setup()
    # a bar lattice in x-major order: index distance <= one x-column +
    # jitter; ny=8 per column, radius reaches ~2 columns
    base = dataclasses.replace(
        cfg, symmetric_gather=True, max_neighbors=20,
        domain=((-2.0, -2.0), (40.0, 6.0)),
    )
    spec, order = partition_plan(seq[:, -1], 4, base.connectivity_radius)
    seq_sorted = scatter_to_shards(seq, order, spec)
    types = np.zeros(spec.total_nodes, np.int32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True

    def run(band_cfg):
        fwd = jax.jit(_build_forward(mesh, band_cfg, stats, spec, "graph"))
        out = fwd(
            params, jnp.asarray(seq_sorted), jnp.asarray(types),
            jnp.asarray(mask),
        )

        def loss(p):
            acc, strain, _ = fwd(
                p, jnp.asarray(seq_sorted), jnp.asarray(types),
                jnp.asarray(mask),
            )
            return jnp.sum(acc**2) + jnp.sum(strain**2)

        return out, jax.grad(loss)(params)

    (ref_acc, ref_strain, ref_v), ref_g = run(base)
    assert int(ref_v) == 0

    monkeypatch.setattr(sg, "_BANDED_MIN_ROWS", 64)
    monkeypatch.setattr(sg, "_BANDED_MIN_FANOUT_ROWS", 64)
    monkeypatch.setattr(sg, "_BANDED_TILE_ROWS", 128)
    banded_cfg = dataclasses.replace(base, band_nodes=64)
    (acc, strain, viol), g = run(banded_cfg)
    assert int(viol) == 0  # band holds in ext coordinates
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref_acc))
    np.testing.assert_array_equal(np.asarray(strain), np.asarray(ref_strain))
    for a, b_ in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    # a too-small band is CAUGHT by the guard (not silently wrong)
    tight_cfg = dataclasses.replace(base, band_nodes=2)
    (_, _, viol_bad), _ = run(tight_cfg)
    assert int(viol_bad) > 0


def test_partitioned_remat_matches_plain(mesh):
    """cfg.remat flows through the sharded forward (needed for 500k+-node
    shards=1 capacity anchors): loss and grads equal the non-remat path."""
    import dataclasses

    from sgnn_tpu.parallel.edge_partition import (
        _build_forward,
        partition_plan,
        scatter_to_shards,
    )

    cfg, stats, params, seq, n = setup()
    spec, order = partition_plan(seq[:, -1], 4, cfg.connectivity_radius)
    seq_sorted = scatter_to_shards(seq, order, spec)
    types = np.zeros(spec.total_nodes, np.int32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True

    def run(c):
        fwd = jax.jit(_build_forward(mesh, c, stats, spec, "graph"))

        def loss(p):
            acc, strain, _ = fwd(
                p, jnp.asarray(seq_sorted), jnp.asarray(types), jnp.asarray(mask)
            )
            return jnp.sum(acc**2) + jnp.sum(strain**2)

        return jax.value_and_grad(loss)(params)

    ref_l, ref_g = run(cfg)
    got_l, got_g = run(dataclasses.replace(cfg, remat=True))
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-7)


def test_partitioned_packed_banded_grads_match(mesh, monkeypatch):
    """r5 packed ext-table gather (the single-chip 3-streams-in-1 lever
    in the sharded forward) composed with banded gathers: with sym
    engagement forced down to test scale and banded thresholds forced
    down, outputs and grads must equal the plain scatter-add sharded
    path. Covers the packed VJP's zero-cotangent handling of
    halo-duplicate edges across 4 interior boundaries."""
    import dataclasses

    from sgnn_tpu.ops import sym_gather as sg
    from sgnn_tpu.parallel import edge_partition as ep
    from sgnn_tpu.parallel.edge_partition import (
        _build_forward,
        partition_plan,
        scatter_to_shards,
    )

    cfg, stats, params, seq, n = setup()
    base = dataclasses.replace(
        cfg, max_neighbors=20, domain=((-2.0, -2.0), (40.0, 6.0)),
    )
    spec, order = partition_plan(seq[:, -1], 4, base.connectivity_radius)
    seq_sorted = scatter_to_shards(seq, order, spec)
    types = np.zeros(spec.total_nodes, np.int32)
    mask = np.zeros(spec.total_nodes, bool)
    mask[:n] = True

    def run(c):
        fwd = jax.jit(_build_forward(mesh, c, stats, spec, "graph"))

        def loss(p):
            acc, strain, _ = fwd(
                p, jnp.asarray(seq_sorted), jnp.asarray(types),
                jnp.asarray(mask),
            )
            return jnp.sum(acc**2) + jnp.sum(strain**2)

        out = fwd(params, jnp.asarray(seq_sorted), jnp.asarray(types),
                  jnp.asarray(mask))
        return out, jax.grad(loss)(params)

    (ref_acc, ref_strain, ref_v), ref_g = run(base)  # plain scatter path
    assert int(ref_v) == 0

    monkeypatch.setattr(ep, "_SYM_MIN_LOCAL_ROWS", 0)  # engage sym+packed
    sym_cfg = dataclasses.replace(base, symmetric_gather=True)
    (acc, strain, v1), g1 = run(sym_cfg)
    assert int(v1) == 0
    np.testing.assert_allclose(np.asarray(acc), np.asarray(ref_acc),
                               rtol=1e-6, atol=1e-7)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)

    monkeypatch.setattr(sg, "_BANDED_MIN_ROWS", 64)
    monkeypatch.setattr(sg, "_BANDED_MIN_FANOUT_ROWS", 64)
    monkeypatch.setattr(sg, "_BANDED_TILE_ROWS", 128)
    banded_cfg = dataclasses.replace(sym_cfg, band_nodes=64)
    (acc_b, strain_b, v2), g2 = run(banded_cfg)
    assert int(v2) == 0
    # banded packed == unbanded packed bit-exact (same contract as the
    # single-chip banded path)
    np.testing.assert_array_equal(np.asarray(acc_b), np.asarray(acc))
    np.testing.assert_array_equal(np.asarray(strain_b), np.asarray(strain))
    for a, b_ in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
