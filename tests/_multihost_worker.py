"""Subprocess worker for the two-process jax.distributed CPU test.

Launched by tests/test_multihost_process.py: each process owns 2 virtual
CPU devices, joins a 2-process group via a localhost coordinator, feeds
its half of a deterministic global batch through the DP train step, and
prints one JSON line with the global device count and the loss. The
parent asserts both processes agree and match a single-process run.
"""

import argparse
import json
import os
import sys

_p = argparse.ArgumentParser()
_p.add_argument("--port", type=int, required=True)
_p.add_argument("--pid", type=int, required=True)
_p.add_argument("--nprocs", type=int, default=2)
_p.add_argument("--local-devices", type=int, default=2)
args = _p.parse_args()

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={args.local_devices}"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from sgnn_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nprocs,
        process_id=args.pid,
    )
    assert jax.process_index() == args.pid
    assert jax.local_device_count() == args.local_devices

    import jax.numpy as jnp
    import optax

    from sgnn_tpu.parallel import make_mesh
    from sgnn_tpu.physics.simulator import (
        NormStats,
        SimulatorConfig,
        simulator_init,
    )
    from sgnn_tpu.train.config import TrainConfig
    from sgnn_tpu.train.train import make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = jax.device_count()
    mesh = make_mesh(data=n_dev, graph=1)

    s, n, b = 5, 32, n_dev
    sim_cfg = SimulatorConfig(
        dim=2, latent_dim=16, num_message_passing_steps=2,
        input_sequence_length=s, connectivity_radius=0.6, max_neighbors=20,
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    cfg = TrainConfig(batch_size=b, noise_std=0.001, input_sequence_length=s,
                      hidden_dim=16, layers=2)
    params = simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.asarray(0, jnp.int32),
    }
    # replicate host-local values over the global (partly non-addressable)
    # mesh — allowed because every process holds the same bytes
    state = jax.tree.map(np.asarray, state)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    rng = np.random.default_rng(0)  # same on every process
    xs, ys = np.meshgrid(np.arange(8) * 0.5, np.arange(4) * 0.5, indexing="ij")
    pos = np.stack([xs.ravel() - 1.0, ys.ravel()], -1).astype(np.float32)
    batch = {
        "positions": (
            pos[None, :, None, :]
            + rng.normal(scale=0.005, size=(b, n, s, 2)).cumsum(2)
        ).astype(np.float32),
        "next_position": (
            pos[None] + rng.normal(scale=0.01, size=(b, n, 2))
        ).astype(np.float32),
        "next_strain": rng.normal(size=(b, n)).astype(np.float32),
        "particle_type": np.zeros((b, n), np.int32),
        "node_mask": np.ones((b, n), bool),
    }
    per = multihost.host_batch_slice(b)
    local = {k: v[args.pid * per : (args.pid + 1) * per] for k, v in batch.items()}
    gbatch = multihost.make_global_batch(local, mesh)

    step = make_train_step(sim_cfg, stats, cfg, tx)
    new_state, metrics = step(state, gbatch, jax.random.key(7))
    # loss is fully replicated -> fetchable on every process
    out = {
        "process": args.pid,
        "process_count": jax.process_count(),
        "device_count": int(jax.device_count()),
        "loss": float(metrics["train/loss"]),
        "step": int(new_state["step"]),  # replicated -> fetchable
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
