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
