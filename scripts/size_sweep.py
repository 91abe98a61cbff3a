"""Throughput vs graph size: edges/s for the full train step as N grows.

Fixed per-step costs (search bookkeeping, node-sized ops, dispatch)
amortize with graph size, so edges/s should RISE toward the gather/
bandwidth asymptote — this sweep documents the framework's capacity
headroom beyond the reference's ~4.8k-particle graphs.

Usage: python scripts/size_sweep.py  (TPU; ~minutes of compiles)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

import bench
from sgnn_tpu.physics.simulator import (
    NormStats,
    SimulatorConfig,
    compute_neighbors,
    simulator_init,
)
from sgnn_tpu.train.config import TrainConfig
from sgnn_tpu.train.train import make_train_multi_step

S, LAYERS, HIDDEN, ITERS = 11, 5, 64, 10


def lattice(n, spacing=0.5):
    # keep the bar aspect ratio (~4:1) as n grows
    ny = max(int(np.sqrt(n / 4)), 2)
    nx = -(-n // ny)
    xs, ys = np.meshgrid(np.arange(nx) * spacing, np.arange(ny) * spacing, indexing="ij")
    pos = np.stack([xs.ravel() - 1.0, ys.ravel()], -1).astype(np.float32)
    return pos[:n]


def run_one(n_particles, batch):
    pos = lattice(n_particles)
    n = pos.shape[0]
    extent = (pos.min(0) - 1.0, pos.max(0) + 1.0)
    sim_cfg = SimulatorConfig(
        dim=2, latent_dim=HIDDEN, num_message_passing_steps=LAYERS,
        input_sequence_length=S, connectivity_radius=0.6, max_neighbors=20,
        neighbor_slots=8, domain=(tuple(extent[0]), tuple(extent[1])),
        symmetric_gather=True, compute_dtype="bfloat16",
        # lattice is x-major sorted: CLEAN neighbors live within one
        # x-column (ny indices), but the training graph is built from
        # NOISY positions — the reference's double-cumsum position noise
        # (sigma ~0.12, max ~0.4 at noise_std=0.02, S=11) bridges ~1% of
        # the 1.0-apart two-column pairs under r=0.6, so the band must
        # cover TWO columns (r5: the one-column band left ~0.4% of real
        # edges outside the band at 1M nodes — caught by the
        # train/band_violations guard, now sized away; three-column
        # bridging needs a 6-sigma tail, ~1e-7/pair/step, which is what
        # the guard remains for).
        band_nodes=2 * max(int(np.sqrt(n_particles / 4)), 2) + 16,
        # layer remat by scale (r5 bisection: the 16 GiB temp-HBM wall
        # is the binding constraint; save-xj peaks 14.8 GiB at 700k,
        # "full" fits 830k at 15.99 GiB, "group" cuts the layer-input
        # residual class for ~1M+). REMAT env overrides.
        remat=(os.environ.get("REMAT") or (
            False if n_particles < 500_000
            else True if n_particles <= 700_000
            else "full" if n_particles <= 850_000
            else "group"
        )),
    )
    stats = NormStats(jnp.zeros(2), jnp.ones(2), jnp.zeros(2), jnp.ones(2))
    cfg = TrainConfig(batch_size=batch, noise_std=0.02, input_sequence_length=S,
                      hidden_dim=HIDDEN, layers=LAYERS)
    params = simulator_init(jax.random.key(0), sim_cfg)
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32)}
    rng = np.random.default_rng(0)
    b = batch
    batch_data = {
        "positions": jnp.asarray(pos[None, :, None, :] + rng.normal(
            scale=0.002, size=(b, n, S, 2)).cumsum(2).astype(np.float32)),
        "next_position": jnp.asarray(pos[None] + rng.normal(
            scale=0.004, size=(b, n, 2)).astype(np.float32)),
        "next_strain": jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)),
        "particle_type": jnp.zeros((b, n), jnp.int32),
        "node_mask": jnp.ones((b, n), bool),
    }
    nl = compute_neighbors(sim_cfg, batch_data["positions"][0, :, -1])
    edges = int(nl.count_edges())

    multi = make_train_multi_step(sim_cfg, stats, cfg, tx, num_steps=ITERS)
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (ITERS,) + x.shape), batch_data)
    state, m = multi(state, stacked, jax.random.key(1))
    float(m["train/loss"][-1])
    t0 = time.perf_counter()
    for _ in range(3):
        state, m = multi(state, stacked, jax.random.key(1))
    float(m["train/loss"][-1])
    dt = (time.perf_counter() - t0) / (3 * ITERS)
    return {
        "n_particles": n, "batch": b, "edges_per_graph": edges,
        "step_ms": round(dt * 1e3, 2),
        "edges_per_s": round(b * edges * LAYERS / dt, 1),
    }


def main():
    entries = [(4797, 8), (19188, 2), (76752, 1), (307008, 1),
               (614016, 1), (830208, 1), (1228032, 1)]
    if len(sys.argv) > 1:  # run one entry (compiles are minutes each)
        i = int(sys.argv[1])
        entries = entries[i : i + 1]
    for n, b in entries:
        try:
            print(json.dumps(run_one(n, b)))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"n_particles": n, "batch": b,
                              "error": f"{type(e).__name__}: {str(e)[:120]}"}))


if __name__ == "__main__":
    main()
